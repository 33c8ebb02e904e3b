"""Bit-exact conformance of the ngx step kernel vs the mounted reference for
the legacy env family (NovelGridworld-v0 … v5), including the lidar
observation arrays produced by the precomputed-gather kernel
(ngx/ops/rays.py) vs the reference's Python ray-march
(novel_gridworld_v1_env.py:139-175, novel_gridworld_v0_env.py:136-173).
"""

import numpy as np
import pytest

import jax

import ngx
from reference_loader import make_ref_env, reference_available, snapshot_state

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

LEGACY_ENVS = [
    "NovelGridworld-v0",
    "NovelGridworld-v1",
    "NovelGridworld-v2",
    "NovelGridworld-v3",
    "NovelGridworld-v4",
    "NovelGridworld-v5",
]


def compare_legacy_step(spec, base, state, ngx_out, ref_out, t):
    ref_obs, ref_r, ref_done, _ = ref_out
    new_state, obs, r, done, info = ngx_out

    np.testing.assert_array_equal(
        np.asarray(new_state.map2d), np.asarray(base.map),
        err_msg=f"map mismatch at step {t}")
    assert tuple(np.asarray(new_state.agent)) == tuple(base.agent_location), \
        f"agent mismatch at step {t}"
    assert int(new_state.facing) == int(base.agent_facing_id), \
        f"facing mismatch at step {t}"
    inv_ref = np.zeros((spec.n_items,), np.int32)
    for item, q in getattr(base, "inventory_items_quantity", {}).items():
        inv_ref[spec.items.index(item)] = q
    np.testing.assert_array_equal(np.asarray(new_state.inventory), inv_ref,
                                  err_msg=f"inventory mismatch at step {t}")
    np.testing.assert_array_equal(
        np.asarray(obs), np.asarray(ref_obs),
        err_msg=f"lidar observation mismatch at step {t}")
    assert float(r) == float(ref_r), f"reward {float(r)} != {ref_r} at step {t}"
    assert bool(done) == bool(ref_done), f"done mismatch at step {t}"


def run_legacy(env_id, seed, n_steps=400):
    spec = ngx.make_spec(env_id)
    step = jax.jit(ngx.make_step(spec))

    ref = make_ref_env(env_id)
    np.random.seed(seed)
    ref.reset()

    base = ref
    while hasattr(base, "env") and base.env is not None:
        base = base.env
    state = snapshot_state(ref, spec)

    rng = np.random.RandomState(seed + 1)
    assert ref.action_space.n == spec.n_actions, \
        f"{env_id}: action count {spec.n_actions} != {ref.action_space.n}"

    for t in range(n_steps):
        a = int(rng.randint(spec.n_actions))
        ref_out = ref.step(a)
        out = step(state, a)
        compare_legacy_step(spec, base, state, out, ref_out, t)
        state = out[0]
        if ref_out[2]:
            np.random.seed(seed + 1000 + t)
            ref.reset()
            state = snapshot_state(ref, spec)


@pytest.mark.parametrize("env_id", LEGACY_ENVS)
def test_random_actions(env_id):
    run_legacy(env_id, seed=0)


@pytest.mark.parametrize("env_id", LEGACY_ENVS)
def test_random_actions_seed7(env_id):
    run_legacy(env_id, seed=7, n_steps=250)


def test_v5_scripted_chain():
    """Craft chain on v5 exercising legacy table-first craft gating, the fused
    place+extract action and the ±10 break economy."""
    env_id = "NovelGridworld-v5"
    spec = ngx.make_spec(env_id)
    step = jax.jit(ngx.make_step(spec))
    aid = spec.actions_id

    for seed in range(4):
        ref = make_ref_env(env_id)
        np.random.seed(seed)
        ref.reset()
        base = ref
        while hasattr(base, "env") and base.env is not None:
            base = base.env
        for item, q in [("tree_log", 3), ("plank", 9), ("stick", 9),
                        ("rubber", 1), ("tree_tap", 1)]:
            base.inventory_items_quantity[item] = q
        state = snapshot_state(ref, spec)

        seq = ["Craft_plank", "Craft_stick", "Craft_tree_tap",
               "Place_tree_tap_Extract_rubber", "Break", "Forward", "Left",
               "Craft_pogo_stick", "Craft_pogo_stick"]
        for t, name in enumerate(seq):
            ref_out = ref.step(aid[name])
            out = step(state, aid[name])
            compare_legacy_step(spec, base, state, out, ref_out, t)
            state = out[0]
            if ref_out[2]:
                break
