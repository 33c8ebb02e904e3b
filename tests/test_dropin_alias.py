"""The `gym_novel_gridworlds` import-name drop-in surface.

A reference user's code does ``import gym_novel_gridworlds`` + ``gym.make``
or direct class construction (reference README.md usage block,
``tests/random_action.py:1-10``).  These tests drive that exact surface on
top of the ngx engine.
"""

import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def fresh_alias():
    """The conformance suites load the MOUNTED reference under this same
    module name (tests/reference_loader.py); purge it so these tests import
    the repo's drop-in package, and purge again afterwards so later
    load_reference() calls re-pin the reference."""
    def purge():
        for n in [n for n in sys.modules
                  if n.split(".")[0] == "gym_novel_gridworlds"]:
            del sys.modules[n]

    purge()
    import gym_novel_gridworlds as gnw
    assert gnw.__file__.startswith(_REPO), gnw.__file__
    yield
    purge()


def test_package_imports_reference_surface():
    import gym_novel_gridworlds as gnw

    assert len(gnw.ENV_IDS) == 11
    # the reference imports these modules at package import time
    assert hasattr(gnw, "constant")
    assert hasattr(gnw, "wrappers")
    assert hasattr(gnw, "observation_wrappers")
    assert hasattr(gnw, "novelty_wrappers")
    assert "NovelGridworld-v0" in gnw.constant.env_key


def test_env_classes_construct_and_step():
    from gym_novel_gridworlds.envs import (BowV0Env, NovelGridworldV1Env,
                                           PogostickV1Env)

    np.random.seed(7)
    env = PogostickV1Env()
    obs = env.reset()
    assert set(obs) == {"map", "agent_location", "agent_facing_id",
                        "inventory_items_quantity"}
    obs, r, done, info = env.step(env.actions_id["Forward"])
    assert set(info) == {"result", "step_cost", "message"}

    env = NovelGridworldV1Env()
    obs = env.reset()
    assert obs.ndim == 1  # legacy lidar + inventory vector

    env = BowV0Env()
    env.reset()
    assert env.goal_item_to_craft == "bow"


def test_restore_chaining_ctor():
    from gym_novel_gridworlds.envs import (NovelGridworldV2Env,
                                           NovelGridworldV3Env)

    np.random.seed(11)
    e2 = NovelGridworldV2Env()
    e2.reset()
    for a in (0, 1, 0):
        e2.step(a)
    e3 = NovelGridworldV3Env(env=e2)
    e3.reset()
    assert e3.agent_location == e2.agent_location
    assert np.array_equal(e3.map, e2.map)


def test_wrapper_stack_reference_style():
    """The canonical reference stack: make -> LimitActions -> LidarInFront ->
    inject_novelty (tests/random_action.py:16-42)."""
    import gym_novel_gridworlds as gnw
    from gym_novel_gridworlds.observation_wrappers import LidarInFront
    from gym_novel_gridworlds.wrappers import LimitActions
    from gym_novel_gridworlds.novelty_wrappers import inject_novelty

    np.random.seed(3)
    env = gnw.make("NovelGridworld-Bow-v0")
    env = LimitActions(env, {"Forward", "Left", "Right", "Break",
                             "Extract_string", "Craft_bow"})
    env = LidarInFront(env, num_beams=8)
    env = inject_novelty(env, "firewall", "easy")
    obs = env.reset()
    # FireWall's reset returns the BASE env's raw dict obs even under a lidar
    # wrapper (ReplaceItem.reset returns env.get_observation(),
    # novelty_wrappers.py:1146) — steps return the lidar array
    assert isinstance(obs, dict) and "map" in obs
    for a in range(env.action_space.n):
        obs, r, done, info = env.step(a)
        assert np.asarray(obs).ndim == 1
        if done:
            env.reset()


def test_novelty_classes_direct_construction():
    import gym_novel_gridworlds as gnw
    from gym_novel_gridworlds import novelty_wrappers as nw

    np.random.seed(5)
    base = gnw.make("NovelGridworld-Pogostick-v1")
    base.reset()

    env = nw.AxeEasy(base, "wooden")
    env.reset()
    assert "wooden_axe" in env.items_id
    assert "Select_wooden_axe" in env.actions_id

    env = nw.AxetoBreakHard(gnw.make("NovelGridworld-Pogostick-v1"), "iron")
    env.reset()
    assert "Craft_iron_axe" in env.actions_id

    env = nw.Fence(gnw.make("NovelGridworld-Pogostick-v1"), "easy", "oak")
    env.reset()
    assert "oak_fence" in env.items_id

    env = nw.Crate(gnw.make("NovelGridworld-Pogostick-v1"), "easy")
    env.reset()
    assert "crate" in env.items_id

    env = nw.FireWall(gnw.make("NovelGridworld-Pogostick-v1"), "easy")
    env.reset()
    assert "fire_wall" in env.items_id

    env = nw.AddJumpAction(gnw.make("NovelGridworld-Pogostick-v1"))
    env.reset()
    assert "Jump" in env.actions_id

    # direct construction bypasses inject_novelty's combination asserts:
    # increase on Bow-v1 is class-only reachable in the reference too
    env = nw.ExtractIncDec(gnw.make("NovelGridworld-Bow-v1"), "increase")
    env.reset()
    with pytest.raises(AssertionError):
        gnw.novelty_wrappers.inject_novelty(
            gnw.make("NovelGridworld-Bow-v1"), "extractincdec", "hard",
            "increase")


def test_remap_action_difficulty_function_form():
    import gym_novel_gridworlds as gnw
    from gym_novel_gridworlds.novelty_wrappers import remap_action_difficulty

    np.random.seed(9)
    env = gnw.make("NovelGridworld-Pogostick-v1")
    env.reset()
    before = dict(env.actions_id)
    env2 = remap_action_difficulty(env, "hard")
    assert set(env2.actions_id) == set(before)
    assert env2.actions_id != before  # reshuffled until changed
    # live state survives the remap, as in the in-place reference mutation
    assert env2.agent_location == env.agent_location


def test_gym_registration_when_gym_present(monkeypatch):
    """With the test gym shim importable, importing the package registers
    all 11 ids and gym.make constructs them (reference __init__.py:7-60)."""
    import pathlib
    import sys

    shim_dir = pathlib.Path(__file__).parent / "_gym_shim"
    monkeypatch.syspath_prepend(str(shim_dir))
    for mod in [m for m in list(sys.modules)
                if m == "gym" or m.startswith("gym.")
                or m.startswith("gym_novel_gridworlds")]:
        sys.modules.pop(mod)
    import gym
    import gym_novel_gridworlds as gnw
    assert gnw.GYM_REGISTERED
    env = gym.make("NovelGridworld-Bow-v0")
    np.random.seed(1)
    env.reset()
    obs, r, done, info = env.step(0)
    assert isinstance(info, dict)
    # leave a clean module table for other tests
    for mod in [m for m in list(sys.modules)
                if m == "gym" or m.startswith("gym.")
                or m.startswith("gym_novel_gridworlds")]:
        sys.modules.pop(mod)
