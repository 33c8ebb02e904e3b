"""Facade conformance: full episodes bit-exact vs the reference INCLUDING
procedural reset (the np.random mirror) and the decoded info['message']
strings, plus restore-chaining, wrappers, trajectories and rgb rendering."""

import os
import pickle

import numpy as np
import pytest

import ngx.compat as C
from reference_loader import load_reference, make_ref_env, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

MODERN = ["NovelGridworld-Pogostick-v1", "NovelGridworld-Bow-v0",
          "NovelGridworld-Bow-v1", "NovelGridworld-v6"]
LEGACY = ["NovelGridworld-v0", "NovelGridworld-v1", "NovelGridworld-v2",
          "NovelGridworld-v3", "NovelGridworld-v4", "NovelGridworld-v5"]


def compare_obs(o, ref_o, t):
    if isinstance(ref_o, dict):
        for k, v in ref_o.items():
            if k == "inventory_items_quantity":
                assert dict(o[k]) == {kk: int(vv) for kk, vv in v.items()}, \
                    f"inv mismatch at {t}"
            elif k in ("agent_location",):
                assert tuple(o[k]) == tuple(v), f"{k} mismatch at {t}"
            elif k in ("agent_facing_id",):
                assert int(o[k]) == int(v)
            else:
                np.testing.assert_array_equal(np.asarray(o[k]), np.asarray(v),
                                              err_msg=f"{k} mismatch at {t}")
    else:
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref_o),
                                      err_msg=f"obs mismatch at {t}")


def run_episode(env_id, seed, n_steps=200, modern=True):
    ref = make_ref_env(env_id)
    env = C.make(env_id)

    np.random.seed(seed)
    ref_obs = ref.reset()
    np.random.seed(seed)
    obs = env.reset()
    compare_obs(obs, ref_obs, "reset")

    rng = np.random.RandomState(seed + 1)
    for t in range(n_steps):
        a = int(rng.randint(env.action_space.n))
        ref_o, ref_r, ref_d, ref_i = ref.step(a)
        o, r, d, i = env.step(a)
        compare_obs(o, ref_o, t)
        assert r == ref_r, f"reward {r} != {ref_r} at {t}"
        assert d == ref_d, f"done at {t}"
        if modern:
            assert i["result"] == ref_i["result"], f"result at {t}"
            assert abs(i["step_cost"] - ref_i["step_cost"]) < 1e-3, \
                f"step_cost at {t}"
            assert i["message"] == ref_i["message"], \
                f"message {i['message']!r} != {ref_i['message']!r} at {t}"
        if ref_d:
            np.random.seed(seed + 1000 + t)
            ref_obs = ref.reset()
            np.random.seed(seed + 1000 + t)
            obs = env.reset()
            compare_obs(obs, ref_obs, f"re-reset {t}")


@pytest.mark.parametrize("env_id", MODERN)
def test_full_episode_modern(env_id):
    run_episode(env_id, seed=0, modern=True)


@pytest.mark.parametrize("env_id", LEGACY)
def test_full_episode_legacy(env_id):
    run_episode(env_id, seed=0, modern=False)


@pytest.mark.parametrize("seed", [3, 11])
def test_pogostick_v0_reset_mirror(seed):
    """Pogostick-v0's reset pre-places a tree_tap via a rejection loop — the
    mirror must replay it draw-for-draw."""
    run_episode("NovelGridworld-Pogostick-v0", seed=seed, n_steps=60)


def test_restore_chaining_v2_to_v5():
    """The enjoy.py v5 curriculum path (enjoy.py:58-100): each env restores
    the previous env's terminal state."""
    load_reference()
    import gym

    chain = ["NovelGridworld-v2", "NovelGridworld-v3", "NovelGridworld-v4",
             "NovelGridworld-v5"]
    np.random.seed(0)
    ref_prev = gym.make(chain[0])
    ref_prev.reset()
    np.random.seed(0)
    ngx_prev = C.make(chain[0])
    ngx_prev.reset()

    rng = np.random.RandomState(1)
    for _ in range(20):
        a = int(rng.randint(ref_prev.action_space.n))
        ref_prev.step(a)
        ngx_prev.step(a)

    for nxt in chain[1:]:
        ref_env = gym.make(nxt, env=ref_prev)
        ngx_env = C.make(nxt, env=ngx_prev)
        np.random.seed(42)
        ref_obs = ref_env.reset()
        np.random.seed(42)
        obs = ngx_env.reset()
        np.testing.assert_array_equal(ngx_env.map, ref_env.map)
        assert ngx_env.agent_location == tuple(ref_env.agent_location)
        assert ngx_env.inventory_items_quantity == \
            {k: int(v) for k, v in ref_env.inventory_items_quantity.items()}
        rng2 = np.random.RandomState(7)
        for t in range(15):
            a = int(rng2.randint(ngx_env.action_space.n))
            ro = ref_env.step(a)
            no = ngx_env.step(a)
            assert no[1] == ro[1] and no[2] == ro[2], (nxt, t)
        ref_prev, ngx_prev = ref_env, ngx_env


def test_compat_wrappers_stack():
    """LimitActions + LidarInFront through the facade vs reference classes."""
    load_reference()
    from gym_novel_gridworlds.wrappers import LimitActions as RefLimit
    from gym_novel_gridworlds.observation_wrappers import LidarInFront as RefLidar

    limited = {'Forward', 'Left', 'Right', 'Break', 'Craft_plank'}
    ref = RefLidar(RefLimit(make_ref_env("NovelGridworld-Pogostick-v1"),
                            limited), num_beams=8)
    env = C.LidarInFront(
        C.LimitActions(C.make("NovelGridworld-Pogostick-v1"), limited),
        num_beams=8)

    np.random.seed(5)
    ref_obs = ref.reset()
    np.random.seed(5)
    obs = env.reset()
    np.testing.assert_array_equal(obs, np.asarray(ref_obs))
    rng = np.random.RandomState(6)
    for t in range(100):
        a = int(rng.randint(env.action_space.n))
        ro, rr, rd, ri = ref.step(a)
        o, r, d, i = env.step(a)
        np.testing.assert_array_equal(o, np.asarray(ro), err_msg=str(t))
        assert r == rr and d == rd


def test_compat_inject_novelty_mirror():
    """Novelty injection through the facade, incl. the construction-reset RNG
    side effect of AxeMedium."""
    load_reference()
    from gym_novel_gridworlds.novelty_wrappers import inject_novelty as ref_inject

    for novelty, diff, a1 in [("axe", "medium", "wooden"),
                              ("fence", "easy", "oak"),
                              ("firewall", "easy", "")]:
        np.random.seed(9)
        ref = ref_inject(make_ref_env("NovelGridworld-Pogostick-v1"),
                         novelty, diff, a1)
        np.random.seed(9)
        env = C.inject_novelty(C.make("NovelGridworld-Pogostick-v1"),
                               novelty, diff, a1)
        np.random.seed(10)
        ref.reset()
        np.random.seed(10)
        env.reset()
        base = ref
        while hasattr(base, "env") and base.env is not None:
            base = base.env
        np.testing.assert_array_equal(env.map, base.map, err_msg=novelty)
        rng = np.random.RandomState(11)
        for t in range(80):
            a = int(rng.randint(env.action_space.n))
            ro, rr, rd, ri = ref.step(a)
            o, r, d, i = env.step(a)
            assert r == rr and d == rd, (novelty, t)
            assert i["message"] == ri["message"], (novelty, t)
            if rd:
                break


def test_save_trajectories(tmp_path):
    env = C.SaveTrajectories(C.make("NovelGridworld-Pogostick-v1"),
                             str(tmp_path))
    np.random.seed(0)
    env.reset()
    for a in [0, 1, 2, 3]:
        env.step(a)
    path = env.save()
    with open(path, "rb") as f:
        traj = pickle.load(f)
    assert len(traj) == 4
    assert traj[0]["map"].shape == (10, 10)
    assert "inventory_items_quantity" in traj[0]


def test_render_rgb_array():
    env = C.make("NovelGridworld-Pogostick-v1")
    np.random.seed(0)
    env.reset()
    env.step(0)
    img = env.render(mode="rgb_array")
    assert img.ndim == 3 and img.shape[2] == 3 and img.shape[0] > 100


def test_keyboard_keymaps():
    from ngx.compat.constant import assign_keys, env_key
    assert env_key["NovelGridworld-v5"]["4"] == 8
    env = C.make("NovelGridworld-Pogostick-v1")
    keys = assign_keys(env)
    # manipulation keys fixed; every craft and select action reachable
    assert keys["w"] == env.actions_id["Forward"]
    assert keys["e"] == env.actions_id["Break"]
    ids = set(keys.values())
    for name, i in env.actions_id.items():
        assert i in ids, f"{name} unreachable from keyboard"


def test_mutation_hooks_vs_reference():
    """block_items / add_fence_around / set_lasts bit-exact vs the reference
    (pogostick_v1_env.py:503-536, :192-198)."""
    ref = make_ref_env("NovelGridworld-Pogostick-v1")
    env = C.make("NovelGridworld-Pogostick-v1")
    np.random.seed(7)
    ref.reset()
    np.random.seed(7)
    env.reset()

    ref.block_items("tree_log", "wall")
    env.block_items("tree_log", "wall")
    np.testing.assert_array_equal(env.map, np.asarray(ref.map))

    rows, cols = np.where(np.asarray(ref.map)
                          == ref.items_id["crafting_table"])
    loc = (int(rows[0]), int(cols[0]))
    ref.add_fence_around(loc, "wall")
    env.add_fence_around(loc, "wall")
    np.testing.assert_array_equal(env.map, np.asarray(ref.map))

    lasts = {"last_action": "Forward", "step_count": 5,
             "last_step_cost": 3.5, "last_reward": 2.0, "last_done": False}
    ref.set_lasts(lasts)
    env.set_lasts(lasts)
    assert env.step_count == ref.step_count == 5
    assert env.last_reward == ref.last_reward == 2.0
    assert env.last_step_cost == ref.last_step_cost == 3.5
    assert env.last_action == ref.last_action == "Forward"
    assert env.last_done is ref.last_done is False


def test_add_new_items_vs_reference():
    """add_new_items appends ids without Select actions and respawns
    (pogostick_v1_env.py:495-501)."""
    ref = make_ref_env("NovelGridworld-Pogostick-v1")
    env = C.make("NovelGridworld-Pogostick-v1")
    np.random.seed(3)
    ref.reset()
    np.random.seed(3)
    env.reset()

    np.random.seed(11)
    ref.add_new_items({"rock": 2})
    np.random.seed(11)
    env.add_new_items({"rock": 2})

    assert env.items_id == dict(ref.items_id)
    assert "Select_rock" not in env.actions_id
    assert env.items_quantity == ref.items_quantity
    np.testing.assert_array_equal(env.map, np.asarray(ref.map))
    assert env.agent_location == tuple(ref.agent_location)
    assert (np.asarray(env.map) == env.items_id["rock"]).sum() == 2

    # the grown env still steps bit-exactly
    rng = np.random.RandomState(1)
    for t in range(30):
        a = int(rng.randint(env.action_space.n))
        ro, rr, rd, _ = ref.step(a)
        o, r, d, _ = env.step(a)
        compare_obs(o, ro, t)
        assert r == rr and d == rd


def test_block_item_wrapper():
    """BlockItem fences every crafting_table after a successful extraction
    (novelty_wrappers.py:1232-1264; the reference's own step path has a
    latent TypeError there, so this is intent-level, not replay, coverage)."""
    env = C.make("NovelGridworld-Pogostick-v1")
    np.random.seed(5)
    env.reset()
    w = C.BlockItem(env)
    assert "fence" in w.items_id
    assert "Select_fence" not in w.actions_id

    m = np.asarray(w.map).copy()
    ct = w.items_id["crafting_table"]
    # plant tap+log in a row whose cells don't hold the crafting_table
    row = 4 if not np.any(m[4, 4:7] == ct) else 6
    m[row, 5] = w.items_id["tree_tap"]
    m[row, 6] = w.items_id["tree_log"]
    w.env._state = w.env._state.replace(map=m.reshape(-1).astype(np.int32))
    w.env.set_agent_location(row, 4)
    w.env.set_agent_facing("EAST")

    _, _, _, info = w.step(w.actions_id["Extract_rubber"])
    assert info["result"]
    assert w.inventory_items_quantity["rubber"] == 1

    mm = np.asarray(w.map)
    rows, cols = np.where(mm == ct)
    assert len(rows) >= 1
    for r0, c0 in zip(rows, cols):
        for rr in (r0 - 1, r0, r0 + 1):
            for cc in (c0 - 1, c0, c0 + 1):
                assert mm[rr][cc] != 0 or (rr, cc) == w.agent_location


def test_v0_remap_action_stdlib_random():
    """v0's remap_action draws from the STDLIB random module — the only
    stdlib-RNG site in the reference (novel_gridworld_v0_env.py:271-285).
    Seeding random.seed(s) must yield the reference's permutation."""
    import random

    for seed in (0, 7, 123):
        ref = make_ref_env("NovelGridworld-v0")
        random.seed(seed)
        np.random.seed(seed)  # must NOT be consumed by the v0 path
        np_state = np.random.get_state()
        ref.remap_action()
        ref_map = dict(ref.action_str)

        env = C.make("NovelGridworld-v0")
        random.seed(seed)
        got = env.remap_action()
        assert got == ref_map, (seed, got, ref_map)
        assert env.action_str == ref_map
        # the numpy stream is untouched (the reference never touches it here)
        random.seed(seed)
        env2 = C.make("NovelGridworld-v0")
        np.random.set_state(np_state)
        env2.remap_action()
        assert np.random.get_state()[1][0] == np_state[1][0]

        # the remapped table actually drives dispatch: stepping 'Forward' by
        # its NEW id moves like the reference
        np.random.seed(seed)
        ref2 = make_ref_env("NovelGridworld-v0")
        ref2.reset()
        random.seed(seed)
        ref2.remap_action()
        fwd_id = [i for i, n in ref2.action_str.items() if n == "Forward"][0]
        ref_out = ref2.step(fwd_id)

        np.random.seed(seed)
        env3 = C.make("NovelGridworld-v0")
        env3.reset()
        random.seed(seed)
        env3.remap_action()
        assert env3.action_str[fwd_id] == "Forward"
        out = env3.step(fwd_id)
        compare_obs(out[0], ref_out[0], 0)
        assert float(out[1]) == float(ref_out[1])
        assert bool(out[2]) == bool(ref_out[2])
