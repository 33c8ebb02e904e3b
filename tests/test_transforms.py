"""Conformance of ngx transforms (LidarInFront / AgentMap / LimitActions) vs
the reference wrapper classes, stacked the way the reference drivers stack
them (tests/random_action.py:16-42: LimitActions innermost, then the
observation wrapper)."""

import numpy as np
import pytest

import jax

import ngx
from ngx.transforms import agent_map, lidar_in_front, limit_actions
from reference_loader import load_reference, make_ref_env, reference_available, \
    snapshot_state

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

LIMIT_SET = {'Forward', 'Left', 'Right', 'Break', 'Place_tree_tap',
             'Extract_rubber', 'Craft_plank', 'Craft_stick', 'Craft_tree_tap',
             'Craft_pogo_stick', 'Select_tree_tap'}


def _wrapped_ref(env_id, limited=None, obs="lidar", num_beams=8):
    load_reference()
    from gym_novel_gridworlds.wrappers import LimitActions
    from gym_novel_gridworlds.observation_wrappers import LidarInFront, AgentMap
    env = make_ref_env(env_id)
    if limited is not None:
        env = LimitActions(env, limited)
    if obs == "lidar":
        env = LidarInFront(env, num_beams=num_beams)
    elif obs == "agent_map":
        env = AgentMap(env)
    return env


def run_stack(env_id, seed, limited=None, obs="lidar", num_beams=8, n_steps=300):
    spec = ngx.make_spec(env_id)
    if limited is not None:
        spec = limit_actions(spec, limited)
    if obs == "lidar":
        spec = lidar_in_front(spec, num_beams=num_beams)
    elif obs == "agent_map":
        spec = agent_map(spec)
    step = jax.jit(ngx.make_step(spec))

    ref = _wrapped_ref(env_id, limited, obs, num_beams)
    np.random.seed(seed)
    ref.reset()
    state = snapshot_state(ref, spec)
    assert ref.action_space.n == spec.n_actions

    rng = np.random.RandomState(seed + 1)
    for t in range(n_steps):
        a = int(rng.randint(spec.n_actions))
        ref_obs, ref_r, ref_done, ref_info = ref.step(a)
        new_state, o, r, done, info = step(state, a)
        if obs == "lidar":
            np.testing.assert_array_equal(
                np.asarray(o), np.asarray(ref_obs),
                err_msg=f"LidarInFront obs mismatch at step {t}")
        elif obs == "agent_map":
            np.testing.assert_array_equal(
                np.asarray(o["agent_map"]), np.asarray(ref_obs["agent_map"]),
                err_msg=f"AgentMap window mismatch at step {t}")
            assert int(o["agent_facing_id"]) == int(ref_obs["agent_facing_id"])
        assert float(r) == float(ref_r), f"reward mismatch at {t}"
        assert bool(done) == bool(ref_done), f"done mismatch at {t}"
        assert bool(info.result) == bool(ref_info["result"]), f"result at {t}"
        state = new_state
        if ref_done:
            np.random.seed(seed + 1000 + t)
            ref.reset()
            state = snapshot_state(ref, spec)


@pytest.mark.parametrize("env_id", ["NovelGridworld-Pogostick-v1",
                                    "NovelGridworld-Bow-v0"])
def test_lidar_in_front(env_id):
    run_stack(env_id, seed=0, obs="lidar")


def test_lidar_in_front_num_beams():
    run_stack("NovelGridworld-Bow-v1", seed=3, obs="lidar", num_beams=4)


def test_agent_map():
    run_stack("NovelGridworld-Pogostick-v1", seed=1, obs="agent_map")


def test_limit_actions_with_lidar():
    run_stack("NovelGridworld-Pogostick-v1", seed=2, limited=LIMIT_SET,
              obs="lidar")


def test_limit_actions_invalid_name():
    spec = ngx.make_spec("NovelGridworld-Bow-v0")
    with pytest.raises(ValueError):
        limit_actions(spec, {"Forward", "Fly"})
