"""Bit-exact conformance of the ngx step kernel vs the mounted reference for
the modern env family (Pogostick-v0/v1, Bow-v0/v1, NovelGridworld-v6).

Protocol: seed NumPy's global RNG, reset the reference env, snapshot its state
into an ngx EnvState, then drive both with the same action sequence and
require identical map / agent / facing / inventory / selected / reward / done /
result / step_cost at every step (SURVEY.md §7 conformance mode).
"""

import numpy as np
import pytest

import jax

import ngx
from reference_loader import (compare_step, make_ref_env, reference_available,
                              snapshot_state)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

MODERN_ENVS = [
    "NovelGridworld-Pogostick-v1",
    "NovelGridworld-Pogostick-v0",
    "NovelGridworld-Bow-v0",
    "NovelGridworld-Bow-v1",
    "NovelGridworld-v6",
]


def run_conformance(env_id, seed, n_steps=400, policy="random"):
    spec = ngx.make_spec(env_id)
    step = jax.jit(ngx.make_step(spec))

    ref = make_ref_env(env_id)
    np.random.seed(seed)
    ref.reset()
    state = snapshot_state(ref, spec)

    rng = np.random.RandomState(seed + 1)
    n_actions = spec.n_actions
    assert ref.action_space.n == n_actions

    for t in range(n_steps):
        a = int(rng.randint(n_actions))
        ref_out = ref.step(a)
        out = step(state, a)
        compare_step(spec, ref, state, out, ref_out, t, modern=True)
        state = out[0]
        if ref_out[2]:  # done — reference keeps the terminal state; re-reset both
            np.random.seed(seed + 1000 + t)
            ref.reset()
            state = snapshot_state(ref, spec)


@pytest.mark.parametrize("env_id", MODERN_ENVS)
def test_random_actions(env_id):
    run_conformance(env_id, seed=0)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pogostick_v1_seeds(seed):
    run_conformance("NovelGridworld-Pogostick-v1", seed=seed)


def test_scripted_craft_chain():
    """Drive Pogostick-v1 through a full break→craft→place→extract→craft chain
    so the success paths (not just random failures) are conformance-checked."""
    env_id = "NovelGridworld-Pogostick-v1"
    spec = ngx.make_spec(env_id)
    step = jax.jit(ngx.make_step(spec))
    aid = spec.actions_id

    for seed in range(5):
        ref = make_ref_env(env_id)
        np.random.seed(seed)
        ref.reset()
        state = snapshot_state(ref, spec)

        # hand the agent ingredients by mutating the reference, then re-snapshot
        for item, q in [("tree_log", 3), ("plank", 7), ("stick", 5),
                        ("rubber", 1), ("tree_tap", 1)]:
            ref.inventory_items_quantity[item] = q
        state = snapshot_state(ref, spec)

        seq = ["Craft_plank", "Craft_stick", "Craft_tree_tap", "Place_tree_tap",
               "Extract_rubber", "Craft_pogo_stick", "Select_plank",
               "Select_tree_tap", "Break", "Forward", "Left",
               "Craft_pogo_stick"]
        for t, name in enumerate(seq):
            a = aid[name]
            ref_out = ref.step(a)
            out = step(state, a)
            compare_step(spec, ref, state, out, ref_out, t, modern=True)
            state = out[0]
