"""Actor-learner tests: jitted PPO train step, mesh-sharded dryrun, learning
signal on the easy v0 task."""

import numpy as np
import pytest

import jax

from ngx.rl.train import PPOConfig, dryrun, make_train


def test_train_step_runs_and_is_finite():
    cfg = PPOConfig(env_id="NovelGridworld-Pogostick-v1", num_envs=32,
                    rollout_steps=8, epochs=1, num_minibatches=2,
                    hidden=(16, 16))
    init, train_step = make_train(cfg)
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    for u in range(3):
        carry, metrics = step(carry, jax.random.key(u + 1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # params actually changed
    ts = carry[0]
    assert int(ts.step) == 3 * cfg.epochs * cfg.num_minibatches


def test_dryrun_multichip_8():
    dryrun(8)


def _v0_expert_action(env):
    """Scripted v0 expert: turn toward the crafting table and walk up to it
    (the done condition is facing it from an adjacent cell)."""
    from ngx.core.spec import TURN_LEFT
    m = env.map
    r, c = env.agent_location
    tr, tc = map(int, np.argwhere(m == env.items_id["crafting_table"])[0])
    f = env.agent_facing_id
    dr, dc = tr - r, tc - c
    if dr != 0 and (abs(dr) >= abs(dc) or dc == 0):
        want = 0 if dr < 0 else 1      # NORTH / SOUTH
    else:
        want = 2 if dc < 0 else 3      # WEST / EAST
    A = env.actions_id
    if f == want:
        return A["Forward"]
    return A["Left"] if int(TURN_LEFT[f]) == want else A["Right"]


def test_bc_pretrain_beats_cold_init(tmp_path):
    """Behavior cloning from scripted-expert demos (the reference's
    ExpertDataset pretrain, tests/train.py:125-132): the pretrained policy
    must decisively beat a cold-init policy on v0 eval return."""
    import jax.numpy as jnp
    import ngx
    import ngx.compat as C
    from ngx.rl.bc import pretrain_from_npz
    from ngx.rl.evaluate import make_eval
    from ngx.rl.models import ActorCritic

    # record demos through the same .npz path the CLI writes
    env = C.LidarInFront(C.make("NovelGridworld-v0"))
    obs_l, act_l = [], []
    for ep in range(20):
        np.random.seed(ep)
        obs = env.reset()
        for t in range(60):
            a = _v0_expert_action(env)
            obs_l.append(np.asarray(obs))
            act_l.append(a)
            obs, r, done, _ = env.step(a)
            if done:
                break
    npz = tmp_path / "demos.npz"
    np.savez(npz, obs=np.stack(obs_l).astype(np.float64),
             actions=np.asarray(act_l, np.int64)[:, None],
             rewards=np.zeros(len(act_l)), episode_returns=np.zeros(20),
             episode_starts=np.zeros(len(act_l), bool))

    model = ActorCritic(n_actions=3, hidden=(32, 32))
    cold = model.init(jax.random.key(1),
                      jnp.zeros((1, obs_l[0].shape[0]), jnp.float32))
    params, m = pretrain_from_npz(model, cold, str(npz), steps=500)
    assert m["accuracy"] > 0.7, m

    run = make_eval(ngx.make_spec("NovelGridworld-v0"), hidden=(32, 32),
                    cap=50)
    pre = run(params, jax.random.key(2), 128)
    base = run(cold, jax.random.key(2), 128)
    assert pre["mean_return"] > base["mean_return"] + 20, (pre, base)
    assert pre["solve_rate"] > base["solve_rate"] + 0.3, (pre, base)


def test_learning_on_v0():
    """40 updates of 256 envs must clearly improve the v0 face-the-table task
    (random ≈ 0.4 mean reward; learned > 1.5)."""
    cfg = PPOConfig(env_id="NovelGridworld-v0", num_envs=256,
                    rollout_steps=32, episode_cap=50)
    init, train_step = make_train(cfg)
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    first = None
    for u in range(40):
        carry, metrics = step(carry, jax.random.key(u + 1))
        if u == 0:
            first = float(metrics["mean_reward"])
    last = float(metrics["mean_reward"])
    assert last > first + 1.0, (first, last)
    assert last > 1.5, last


def test_solve_shaped_reward_transform():
    """solve_shaped replaces rollout rewards with -1/step and +reward_done
    only on goal terminations — the shaped episode return of a solved
    episode is bounded by reward_done, and farming pays nothing."""
    import jax
    from ngx.rl.train import PPOConfig, make_train

    cfg = PPOConfig(env_id="NovelGridworld-v0", num_envs=64, rollout_steps=8,
                    num_minibatches=2, epochs=1, hidden=(16, 16),
                    episode_cap=20, solve_shaped=True)
    init, step = make_train(cfg)
    carry = init(jax.random.key(0))
    carry, m = jax.jit(step)(carry, jax.random.key(1))
    m = {k: float(v) for k, v in m.items()}
    assert m["ep_count"] > 0
    # every completed episode's shaped return is in [-cap, reward_done]
    mean_ep = m["ep_return_sum"] / m["ep_count"]
    assert -cfg.episode_cap <= mean_ep <= 50.0, m
    # solve bookkeeping still works under the shaped reward
    assert 0 <= m["ep_solved"] <= m["ep_count"]
    # episode-length tally: every completed episode has length >= 1
    assert m["ep_len_sum"] >= m["ep_count"]
