"""Batched on-device policy evaluation.

The reference evaluates agents with a host Python loop, one env, 100-step cap
(reference ``enjoy.py:87,107``).  Here the whole evaluation — B independent
episodes, policy forward pass, env step, first-done bookkeeping — is ONE
jitted ``lax.scan``: evaluating 100+ episodes costs about as much as stepping
a single env for 100 steps on the host.

An episode is "solved" when it terminates before the cap with terminal
reward above ``reward_done/2`` (the goal step pays ``reward_done``=+50 on
every env, SURVEY.md §2.2; non-goal terminations pay at most +10 — v2's
dead-end done can land right after a successful craft — or are negative,
like FireWall death at −25, so the half-threshold separates them exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import spec as S
from ..transforms import lidar_in_front
from ..vector import make_vec
from .models import ActorCritic


def make_eval(spec, hidden=(64, 64), cap: int = 100, apply_logits=None,
              wrap_lidar: bool = True):
    """Build ``run(params, key, episodes) -> metrics`` for ``spec``.

    ``params=None`` evaluates the uniform-random policy (the baseline the
    reference's random_action.py driver amounts to).  Observations follow the
    training setup: LidarInFront over the base spec (reference trains SB2 on
    exactly that, ``tests/train.py:104-122``).

    ``apply_logits(params, obs_f32) -> logits`` swaps in a different policy
    forward pass (e.g. the reference's SB2 MLP, ngx.rl.sb2) — default is the
    native flax ActorCritic.  ``wrap_lidar=False`` evaluates on the spec's
    own observation (the legacy envs' built-in lidar arrays — what the
    reference's SB2 agents were trained on, reference tests/train.py:104-107).
    """
    if wrap_lidar and spec.obs_mode != S.OBS_LIDAR_FRONT:
        spec = lidar_in_front(spec)
    vec = make_vec(spec)
    if apply_logits is None:
        model = ActorCritic(n_actions=spec.n_actions, hidden=tuple(hidden))

        def apply_logits(params, obs):
            return model.apply(params, obs)[0]
    n_actions = spec.n_actions

    def run(params, key, episodes: int):
        @jax.jit
        def _run(key):
            k0, k1 = jax.random.split(key)
            state, obs = vec.reset(jax.random.split(k0, episodes))

            def body(carry, key_t):
                state, obs, ret, length, done_ever, solved = carry
                k_act, k_reset = jax.random.split(key_t)
                if params is None:
                    action = jax.random.randint(
                        k_act, (episodes,), 0, n_actions)
                else:
                    logits = apply_logits(params, obs.astype(jnp.float32))
                    action = jax.random.categorical(k_act, logits)
                state, obs, r, done, _ = vec.step(
                    state, action, jax.random.split(k_reset, episodes))
                active = ~done_ever
                ret = ret + jnp.where(active, r, 0.0)
                length = length + active.astype(jnp.int32)
                # solved = GOAL termination: the goal step pays exactly
                # reward_done (+50) on every env; thresholding at half of
                # it excludes non-goal dones that follow a POSITIVE step —
                # v2's dead-end fires right after a successful +10 craft
                # (novel_gridworld_v2_env.py:263-266), which a bare r > 0
                # miscounted as a solve (round-5 fix, same class as
                # evaluate_chain's cap-truncation fix)
                solved = solved | (active & done
                                   & (r > 0.5 * spec.reward_done))
                done_ever = done_ever | done
                return (state, obs, ret, length, done_ever, solved), None

            z = jnp.zeros((episodes,))
            carry = (state, obs, z, z.astype(jnp.int32),
                     jnp.zeros((episodes,), bool), jnp.zeros((episodes,), bool))
            (_, _, ret, length, done_ever, solved), _ = jax.lax.scan(
                body, carry, jax.random.split(k1, cap))
            return {
                "mean_return": ret.mean(),
                "solve_rate": solved.mean(),
                "done_rate": done_ever.mean(),
                "mean_length": length.astype(jnp.float32).mean(),
            }

        return {k: float(v) for k, v in _run(key).items()}

    return run


def evaluate_checkpoint(env_id: str, ckpt_path: str, episodes: int = 128,
                        cap: int = 100, seed: int = 0,
                        include_random: bool = True):
    """Evaluate a saved agent (and, by default, the random baseline) on
    ``env_id``.

    Returns {'trained': {...}[, 'random': {...}]} metric dicts.
    """
    import ngx
    from ..utils.checkpoint import restore_pytree

    spec = ngx.make_spec(env_id)
    tree = restore_pytree(ckpt_path)
    hidden = tuple(tree.get("config", {}).get("hidden", (64, 64)))
    run = make_eval(spec, hidden=hidden, cap=cap)
    key = jax.random.key(seed)
    out = {"trained": run(tree["params"], key, episodes)}
    if include_random:
        out["random"] = run(None, jax.random.fold_in(key, 1), episodes)
    return out


def evaluate_expert(env_id: str, episodes: int = 128, cap: int = 100,
                    seed: int = 0):
    """Evaluate the scripted expert (ngx.rl.experts) under the same protocol
    as the batched evaluator: ``episodes`` episodes, ``cap``-step cap,
    solved = goal termination before the cap (terminal reward above
    reward_done/2).

    The experts are host-side state machines (BFS over the live map), so
    this runs through the compat facade one env at a time — the measured
    solve/return ceiling for the eval table, not a throughput path.
    """
    import numpy as np
    import ngx.compat as C
    from .experts import get_expert

    env = C.make(env_id)
    expert = get_expert(env_id)
    ret = np.zeros(episodes)
    length = np.zeros(episodes, np.int32)
    done_ever = np.zeros(episodes, bool)
    solved = np.zeros(episodes, bool)
    for ep in range(episodes):
        np.random.seed(seed * 100_000 + ep)
        env.reset()
        total, done, r = 0.0, False, 0.0
        t = 0
        for t in range(cap):
            _, r, done, _ = env.step(expert(env))
            total += r
            if done:
                break
        ret[ep] = total
        length[ep] = t + 1
        done_ever[ep] = done
        # goal-termination test (see make_eval's threshold note): v2's
        # dead-end done can follow a +10 craft
        solved[ep] = done and r > 0.5 * env.reward_done
    return {
        "mean_return": float(ret.mean()),
        "solve_rate": float(solved.mean()),
        "done_rate": float(done_ever.mean()),
        "mean_length": float(length.mean()),
    }


def evaluate_sb2_zip(env_id: str, zip_path: str, episodes: int = 128,
                     cap: int = 100, seed: int = 0):
    """Run one of the reference's shipped SB2 checkpoints through the ngx
    engine under the same 128-episode / 100-step protocol (reference
    ``enjoy.py:49-72,87``; stochastic actions, SB2 predict's default).

    Returns one metrics dict (mean_return / solve_rate / ...)."""
    import ngx
    from .sb2 import load_sb2_params, sb2_apply, check_dims

    spec = ngx.make_spec(env_id)
    params = load_sb2_params(zip_path)
    _, obs0 = jax.jit(ngx.make_reset(spec))(jax.random.key(0))
    check_dims(params, int(obs0.shape[-1]), spec.n_actions, zip_path)
    run = make_eval(spec, cap=cap, wrap_lidar=False,
                    apply_logits=lambda p, obs: sb2_apply(p, obs)[0])
    return run(params, jax.random.key(seed), episodes)
