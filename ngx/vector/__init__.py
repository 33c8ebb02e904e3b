"""Batched environments: ``jit(vmap(step))`` with auto-reset and scan rollouts.

This is the layer the reference doesn't have (its vectorized path is commented
out — reference ``tests/train.py:114-120``; training steps one Python env at a
time).  Here the whole env batch is one device-resident ``EnvState`` pytree
with a leading env axis; stepping 8k+ envs is a single XLA program launch, and
a T-step rollout is one ``lax.scan`` launch (no host round-trips at all).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.reset import make_reset
from ..core.step import make_step
from ..core.state import EnvState


class VecEnv(NamedTuple):
    """Pure-function bundle for a batched environment."""
    spec: object
    reset: Callable    # (keys[B]) -> (state, obs)
    step: Callable     # (state, actions[B], keys[B]) -> (state, obs, r, done, info)
    rollout: Callable  # (state, key, policy, T) -> (state, Trajectory)


class Trajectory(NamedTuple):
    """Time-major stacked rollout output (T leading, then batch)."""
    obs: object
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    step_costs: jnp.ndarray


def make_vec(spec) -> VecEnv:
    """Build the batched env for ``spec``.

    ``step`` auto-resets finished envs: when an env reports done, its next
    state is a fresh ``reset`` draw (one key per env per step, cheap — the
    fresh state is only selected where done).  The returned ``obs`` is the
    terminal observation (gym-classic semantics) and ``done`` flags the
    boundary; the *state* carried forward is the reset one.
    """
    single_reset = make_reset(spec)
    single_step = make_step(spec)

    v_reset = jax.vmap(single_reset)
    v_step = jax.vmap(single_step)

    def reset(keys):
        return v_reset(keys)

    def step(state: EnvState, actions, keys):
        new_state, obs, reward, done, info = v_step(state, actions)
        fresh_state, _ = v_reset(keys)
        carried = jax.tree_util.tree_map(
            lambda f, n: jnp.where(
                done.reshape(done.shape + (1,) * (n.ndim - 1)), f, n),
            fresh_state, new_state)
        return carried, obs, reward, done, info

    def rollout(state: EnvState, key, policy, T: int):
        """Scan ``T`` steps.  ``policy(key, obs_or_state) -> actions[B]``;
        pass ``policy=None`` for uniform-random actions."""
        B = state.step_count.shape[0]
        n_actions = spec.n_actions

        def body(carry, key_t):
            state = carry
            k_act, k_reset = jax.random.split(key_t)
            if policy is None:
                actions = jax.random.randint(k_act, (B,), 0, n_actions)
            else:
                actions = policy(k_act, state)
            reset_keys = jax.random.split(k_reset, B)
            state, obs, reward, done, info = step(state, actions, reset_keys)
            return state, Trajectory(obs, actions, reward, done, info.step_cost)

        keys = jax.random.split(key, T)
        state, traj = jax.lax.scan(body, state, keys)
        return state, traj

    return VecEnv(spec=spec, reset=reset, step=step, rollout=rollout)


def throughput_fn(spec, batch: int, steps: int):
    """One fused jit computing ``steps`` batched random-action steps — the
    benchmark kernel (BASELINE.json's env-steps/s/chip metric).  Returns a
    function key -> (final_state, mean_reward) so nothing escapes the device
    until the final scalar."""
    vec = make_vec(spec)

    @jax.jit
    def run(key):
        k0, k1 = jax.random.split(key)
        state, _ = vec.reset(jax.random.split(k0, batch))
        state, traj = vec.rollout(state, k1, None, steps)
        return state, traj.rewards.mean()

    return run
