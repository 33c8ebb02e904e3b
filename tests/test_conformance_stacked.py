"""Wrapper-STACK conformance: novelty over LidarInFront over LimitActions —
the reference's canonical driver stack (tests/random_action.py:16-42) — and
map-size variation, bit-exact vs the mounted reference at facade level
(mirrored resets included).

The reference's novelty wrappers observe the stack (``limited_actions_id``
duck-typing, per-step asserts, ``self.observation()`` calls —
novelty_wrappers.py:39-43,88-91; SURVEY §2.4 "wrapper-stack protocol"), so
behavior of the STACKED system differs from the bare env; these tests drive
the composed stacks, not components.
"""

import numpy as np
import pytest

import ngx.compat as C
from reference_loader import load_reference, make_ref_env, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _novelty_list(novelty):
    """``novelty`` is None, one (name, difficulty, ...) tuple, or a list of
    tuples applied inner-first — the reference's free wrapper nesting
    (novelty_wrappers.py:1586 wraps whatever env it is given)."""
    if novelty is None:
        return []
    return list(novelty) if isinstance(novelty, list) else [novelty]


def _ref_stack(env_id, limited, num_beams, novelty=None):
    load_reference()
    from gym_novel_gridworlds.wrappers import LimitActions as RefLimit
    from gym_novel_gridworlds.observation_wrappers import LidarInFront as RefLidar
    from gym_novel_gridworlds.novelty_wrappers import inject_novelty as ref_inject

    env = RefLidar(RefLimit(make_ref_env(env_id), set(limited)), num_beams)
    for nov in _novelty_list(novelty):
        env = ref_inject(env, *nov)
    return env


def _ngx_stack(env_id, limited, num_beams, novelty=None):
    env = C.LidarInFront(C.LimitActions(C.make(env_id), set(limited)),
                         num_beams)
    for nov in _novelty_list(novelty):
        env = C.inject_novelty(env, *nov)
    return env


def assert_obs_equal(obs, ref_obs, msg):
    """Obs compare that also handles the raw-dict reset obs the
    fence/additem/replaceitem novelties return through the stack
    (novelty_wrappers.py:885,1030,1146)."""
    if isinstance(ref_obs, dict):
        assert isinstance(obs, dict), f"{msg}: expected dict obs"
        assert set(obs) == set(ref_obs), f"{msg}: keys"
        for k, rv in ref_obs.items():
            if isinstance(rv, dict):
                assert obs[k] == rv, f"{msg}: {k}"
            else:
                np.testing.assert_array_equal(
                    np.asarray(obs[k]).ravel(), np.asarray(rv).ravel(),
                    err_msg=f"{msg}: {k}")
    else:
        np.testing.assert_array_equal(obs, np.asarray(ref_obs), err_msg=msg)


def drive(env_id, limited, novelty, seed, n_steps=250, num_beams=8):
    np.random.seed(seed)
    ref = _ref_stack(env_id, limited, num_beams, novelty)
    np.random.seed(seed)
    env = _ngx_stack(env_id, limited, num_beams, novelty)

    np.random.seed(seed + 1)
    try:
        ref_obs = ref.reset()
    except AssertionError as e:
        # reference capacity crash: the reset rejection loop pops tried
        # locations regardless of validity and asserts when the list
        # empties (pogostick_v0_env.py:191) — probabilistic on item-heavy
        # stacks; no comparable episode exists for this seed
        assert "increase map size" in str(e), e
        pytest.skip(f"reference reset capacity crash ({env_id}, seed "
                    f"{seed}): {e}")
    np.random.seed(seed + 1)
    obs = env.reset()
    assert_obs_equal(obs, ref_obs, "reset")
    assert env.action_space.n == ref.action_space.n

    rng = np.random.RandomState(seed + 2)
    for t in range(n_steps):
        a = int(rng.randint(env.action_space.n))
        # AddJump/AddChop advertise Discrete(len(full actions_id)) over a
        # limiter (novelty_wrappers.py:1278,1350) while stepping still
        # translates through the limited table — ids beyond it raise the
        # limiter's per-step assert in BOTH implementations, identically
        try:
            ro, rr, rd, ri = ref.step(a)
        except AssertionError as e_ref:
            with pytest.raises(AssertionError) as e_ngx:
                env.step(a)
            assert str(e_ngx.value) == str(e_ref), f"assert at {t} (a={a})"
            continue
        o, r, d, i = env.step(a)
        assert_obs_equal(o, ro, f"obs at {t} (a={a})")
        assert r == rr, f"reward {r} != {rr} at {t} (a={a})"
        assert d == rd, f"done at {t}"
        if ri:
            assert i["result"] == ri["result"], f"result at {t}"
            assert abs(i["step_cost"] - ri["step_cost"]) < 1e-3, \
                f"step_cost {i['step_cost']} != {ri['step_cost']} at {t}"
            assert i["message"] == ri["message"], \
                f"message {i['message']!r} != {ri['message']!r} at {t}"
        if rd:
            np.random.seed(seed + 1000 + t)
            try:
                ref_obs = ref.reset()
            except AssertionError as e:
                # the reference's reset rejection loop pops tried locations
                # REGARDLESS of validity and asserts when the list empties
                # ("Cannot place items, increase map size!",
                # pogostick_v0_env.py:191) — probabilistic capacity crash on
                # item-heavy stacks; the comparable action stream ends here
                # (ngx's reset skips unplaceable items by design,
                # docs/PARITY.md deviations)
                assert "increase map size" in str(e), e
                return
            np.random.seed(seed + 1000 + t)
            obs = env.reset()
            assert_obs_equal(obs, ref_obs, f"re-reset at {t}")


BOW_LIMIT = {"Forward", "Left", "Right", "Break", "Craft_bow",
             "Extract_string"}
POGO_LIMIT = {"Forward", "Left", "Right", "Break", "Craft_plank",
              "Select_tree_log"}


def test_stack_breakincrease_bow():
    """random_action.py's shipped default: breakincrease medium on Bow-v0."""
    drive("NovelGridworld-Bow-v0", BOW_LIMIT, ("breakincrease", "medium"),
          seed=0)


def test_stack_axe_easy_pogostick():
    """Axe over a limited stack: Select_wooden_axe is added to the base table
    but stays outside the limited space (unreachable), so the axe is never
    selected and Break keeps base cost — the stack, not the bare env."""
    drive("NovelGridworld-Pogostick-v1", POGO_LIMIT,
          ("axe", "easy", "wooden"), seed=3)


def test_stack_axe_limited_with_select():
    """The reference pattern of pre-listing a future novelty action in
    LimitActions: Select_wooden_axe is limited-listed BEFORE the novelty
    exists, becomes steppable after injection, and the axe break-discount
    path (cost 1800) runs through the whole stack."""
    limited = POGO_LIMIT | {"Select_wooden_axe"}
    drive("NovelGridworld-Pogostick-v1", limited,
          ("axe", "easy", "wooden"), seed=5, n_steps=300)


def test_stack_axetobreak_hard_stale_grant():
    """AxetoBreakHard re-grants recipe ingredients AFTER the inner reset
    materialized the lidar obs (novelty_wrappers.py:664-673) — the reset obs
    must show the pre-grant inventory (stick=0, plank=0), the first step obs
    the granted one."""
    limited = POGO_LIMIT | {"Craft_wooden_axe", "Select_wooden_axe"}
    drive("NovelGridworld-Pogostick-v1", limited,
          ("axetobreak", "hard", "wooden"), seed=17, n_steps=300)


def test_lidar_range_frozen_across_map_size():
    """LidarInFront's max_beam_range freezes at wrap time
    (observation_wrappers.py:25): growing the map via reset(map_size=N)
    keeps the original beam bound in both implementations."""
    load_reference()
    from gym_novel_gridworlds.observation_wrappers import LidarInFront as RL
    ref = RL(make_ref_env("NovelGridworld-Pogostick-v1"), 8)
    env = C.LidarInFront(C.make("NovelGridworld-Pogostick-v1"), 8)
    for sz in (10, 16, 13):
        np.random.seed(sz)
        ref_obs = ref.reset(map_size=sz)
        np.random.seed(sz)
        obs = env.reset(map_size=sz)
        assert_obs_equal(obs, ref_obs, f"reset size={sz}")
        rng = np.random.RandomState(sz + 1)
        for t in range(60):
            a = int(rng.randint(env.action_space.n))
            ro, rr, rd, _ = ref.step(a)
            o, r, d, _ = env.step(a)
            assert_obs_equal(o, ro, f"size={sz} t={t}")
            assert r == rr and d == rd
            if rd:
                np.random.seed(sz + 100 + t)
                ref.reset(map_size=sz)
                np.random.seed(sz + 100 + t)
                env.reset(map_size=sz)


def test_stack_fencerestriction():
    drive("NovelGridworld-Pogostick-v1", POGO_LIMIT,
          ("fencerestriction", "medium", "oak"), seed=7)


def test_stack_crate():
    drive("NovelGridworld-Bow-v0", BOW_LIMIT, ("crate", "easy"), seed=9)


def test_stack_firewall():
    drive("NovelGridworld-Bow-v0", BOW_LIMIT, ("firewall", "easy"), seed=11)


def test_stack_no_novelty_4beams():
    drive("NovelGridworld-Bow-v0", BOW_LIMIT, None, seed=13, num_beams=4)


def test_limited_missing_action_asserts_per_step():
    """Stepping a limited id whose action does not exist yet raises the
    reference's per-step assert, not a construction error
    (wrappers.py:80: '<name> is not a valid action for <env_id>')."""
    limited = {"Forward", "Break", "Select_wooden_axe"}
    np.random.seed(1)
    ref = _ref_stack("NovelGridworld-Pogostick-v1", limited, 8)
    np.random.seed(1)
    env = _ngx_stack("NovelGridworld-Pogostick-v1", limited, 8)
    np.random.seed(2)
    ref.reset()
    np.random.seed(2)
    env.reset()
    missing_id = sorted(limited).index("Select_wooden_axe")
    with pytest.raises(AssertionError) as e_ref:
        ref.step(missing_id)
    with pytest.raises(AssertionError) as e_ngx:
        env.step(missing_id)
    assert str(e_ngx.value) == str(e_ref.value)
    # Forward still works on both
    fid = sorted(limited).index("Forward")
    _, rr, _, _ = ref.step(fid)
    _, r, _, _ = env.step(fid)
    assert r == rr


def test_novelty_limited_assert_matches_reference():
    """A novelty whose action did not survive limiting asserts on the first
    step in both implementations, with the same message (e.g. fencerestriction
    without Break, novelty_wrappers.py:912-914)."""
    limited = {"Forward", "Left", "Right"}
    np.random.seed(1)
    ref = _ref_stack("NovelGridworld-Pogostick-v1", limited, 8,
                     ("fencerestriction", "easy", "oak"))
    np.random.seed(1)
    env = _ngx_stack("NovelGridworld-Pogostick-v1", limited, 8,
                     ("fencerestriction", "easy", "oak"))
    np.random.seed(2)
    ref.reset()
    np.random.seed(2)
    env.reset()
    with pytest.raises(AssertionError) as e_ref:
        ref.step(0)
    with pytest.raises(AssertionError) as e_ngx:
        env.step(0)
    assert str(e_ngx.value) == str(e_ref.value)


def test_remap_action_difficulty_limited_table():
    """remap over a limited stack reshuffles ONLY the limited table, with the
    reference's exact np.random draws (novelty_wrappers.py:1209-1210)."""
    load_reference()
    from gym_novel_gridworlds.novelty_wrappers import (
        remap_action_difficulty as ref_remap)
    import sys
    # the repo's drop-in alias module (purged afterwards by reloading refs)
    limited = {"Forward", "Left", "Right", "Break"}
    np.random.seed(21)
    ref = _ref_stack("NovelGridworld-Pogostick-v1", limited, 8)
    np.random.seed(21)
    env = _ngx_stack("NovelGridworld-Pogostick-v1", limited, 8)
    np.random.seed(22)
    ref.reset()
    np.random.seed(22)
    env.reset()

    np.random.seed(23)
    ref2 = ref_remap(ref, "easy")
    np.random.seed(23)
    env.set_limited_actions_id(env.remap_action(env.limited_actions_id, 0))
    assert env.limited_actions_id == ref2.limited_actions_id
    for a in range(4):
        ro, rr, rd, _ = ref2.step(a)
        o, r, d, _ = env.step(a)
        np.testing.assert_array_equal(o, np.asarray(ro), err_msg=str(a))
        assert r == rr and d == rd


def test_stack_two_novelties_addjump_over_firewall():
    """AddJumpAction(FireWall(env)) — outer Jump handler plus the inner
    post-step fire-death check both active (novelty_wrappers.py:1340-1412
    over :1151-1200)."""
    drive("NovelGridworld-Bow-v0", BOW_LIMIT | {"Jump"},
          [("firewall", "easy"), ("addjump", "easy")], seed=31)


def test_stack_two_novelties_breakincrease_over_fence():
    """BreakIncrease(Fence(env)) — fence cells block reach while the outer
    Break override doubles yields (novelty_wrappers.py:1415-1488 over
    :847-889)."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_oak_fence"},
          [("fence", "easy", "oak"), ("breakincrease", "easy", "tree_log")],
          seed=33)


def test_stack_two_novelties_addchop_over_axe():
    """AddChopAction(AxeEasy(env)) — the outer Chop (2-yield break at cost
    4320) coexists with the inner axe Break discount; Break is intercepted by
    the INNER axe wrapper here because AddChop only handles Chop
    (novelty_wrappers.py:1267-1337 over :9-114)."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Chop", "Select_wooden_axe"},
          [("axe", "easy", "wooden"), ("addchop", "easy")],
          seed=35, n_steps=300)


def test_stack_two_novelties_additem_over_replaceitem():
    """AddItem(ReplaceItem(env)) — both reset-time map rewrites run
    inner-first on the same reset (novelty_wrappers.py:991-1034 over
    :1095-1148)."""
    drive("NovelGridworld-Bow-v0",
          BOW_LIMIT | {"Select_spring", "Select_brick"},
          [("replaceitem", "easy", "wall", "brick"),
           ("additem", "easy", "spring")], seed=37)


def test_stack_two_novelties_breakincrease_over_axe():
    """BreakIncrease(AxeEasy(env)) — BOTH override Break; the OUTER wrapper
    wins (BreakIncrease's inline break path runs at base cost 3600, never
    reaching the axe discount) — override shadowing must match the
    reference's wrapper dispatch exactly."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_wooden_axe"},
          [("axe", "easy", "wooden"), ("breakincrease", "easy", "tree_log")],
          seed=39, n_steps=300)


def test_stack_two_novelties_fencerestriction_over_axe():
    """FenceRestriction(AxeEasy(env)) — the gate delegates allowed breaks to
    the inner axe path (keeping the axe's reward) but REPORTS cost 3600 and
    result=True regardless of the inner outcome (the wrapper rebuilds info
    after delegation, novelty_wrappers.py:950-984), masking the axe's 1800
    discount in info/last_step_cost."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_wooden_axe"},
          [("axe", "easy", "wooden"), ("fencerestriction", "medium", "oak")],
          seed=41, n_steps=300)


def test_stack_two_novelties_fencerestriction_over_axetobreak():
    """FenceRestriction(AxetoBreakEasy(env)) — a delegated break that FAILS
    inside (no axe selected) still reports result=True / msg='' / cost 3600
    through the outer gate, with the inner -1 reward kept."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_wooden_axe"},
          [("axetobreak", "easy", "wooden"),
           ("fencerestriction", "medium", "oak")],
          seed=43, n_steps=300)


def test_stack_two_novelties_axe_over_fencerestriction():
    """AxeEasy(FenceRestriction(env)) — the OUTER axe handler intercepts
    Break before the gate runs: fence gating is dead, axe costs unmasked
    (the fence cells themselves remain on the map)."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_wooden_axe"},
          [("fencerestriction", "medium", "oak"), ("axe", "easy", "wooden")],
          seed=45, n_steps=300)


def test_stack_two_novelties_breakincrease_over_fencerestriction():
    """BreakIncrease(FenceRestriction(env)) — the outer inline Break path
    shadows the gate entirely: fenced-in items break freely at 2x yield."""
    drive("NovelGridworld-Pogostick-v1", POGO_LIMIT,
          [("fencerestriction", "hard", "oak"),
           ("breakincrease", "easy", "tree_log")],
          seed=47)


def test_stack_two_novelties_crate_over_breakincrease():
    """Crate(BreakIncrease(env, '')) — breaking the crate grants its
    contents AND falls through to the inner blanket break (2 crate items,
    +10); the crate item was appended AFTER BreakIncrease, so it must
    inherit the blanket yield/reward rules (the reference decides them at
    step time, novelty_wrappers.py:1444-1454)."""
    drive("NovelGridworld-Bow-v0", BOW_LIMIT | {"Select_crate"},
          [("breakincrease", "easy", ""), ("crate", "easy")], seed=51)


def test_stack_two_novelties_breakincrease_over_crate():
    """BreakIncrease(Crate(env)) — the OUTER inline Break path never reaches
    Crate's intercept: breaking a crate yields plain crate items and NO
    contents grant."""
    drive("NovelGridworld-Bow-v0", BOW_LIMIT | {"Select_crate"},
          [("crate", "easy"), ("breakincrease", "easy", "tree_log")],
          seed=53)


def test_stack_two_novelties_double_additem():
    """AddItem(AddItem(env)) — the same novelty twice; the ordered
    reset_edits machinery replays both map fills inner-first with the
    reference's exact draw sequence."""
    drive("NovelGridworld-Bow-v0",
          BOW_LIMIT | {"Select_spring", "Select_brick"},
          [("additem", "easy", "spring"), ("additem", "medium", "brick")],
          seed=55)


def test_stack_agentmap_novelty():
    """A novelty over an AgentMap observation stack.  Upstream this
    combination is BROKEN for the novelty's overridden actions: the novelty
    wrappers call ``self.observation()`` with no argument
    (novelty_wrappers.py:89), which only LidarInFront accepts
    (``observation(self, obs=None)``, observation_wrappers.py:70) —
    AgentMap's ``observation(self, obs)`` raises TypeError on the first
    overridden action.  Conformance here: every NON-overridden action is
    bit-exact through the stack; on the overridden action (Break) the
    reference raises TypeError while ngx returns the correct AgentMap obs —
    a deliberate, documented divergence (the BlockItem precedent)."""
    load_reference()
    from gym_novel_gridworlds.wrappers import LimitActions as RefLimit
    from gym_novel_gridworlds.observation_wrappers import AgentMap as RefMap
    from gym_novel_gridworlds.novelty_wrappers import inject_novelty as ref_inject

    limited = POGO_LIMIT | {"Select_wooden_axe"}
    np.random.seed(61)
    ref = ref_inject(RefMap(RefLimit(
        make_ref_env("NovelGridworld-Pogostick-v1"), set(limited))),
        "axe", "easy", "wooden")
    np.random.seed(61)
    env = C.inject_novelty(
        C.AgentMap(C.LimitActions(C.make("NovelGridworld-Pogostick-v1"),
                                  set(limited))),
        "axe", "easy", "wooden")

    np.random.seed(62)
    ref_obs = ref.reset()
    np.random.seed(62)
    obs = env.reset()
    assert_obs_equal(obs, ref_obs, "reset")
    break_id = sorted(limited).index("Break")
    rng = np.random.RandomState(63)
    steps = 0
    for t in range(400):
        a = int(rng.randint(env.action_space.n))
        if a == break_id:
            continue
        ro, rr, rd, ri = ref.step(a)
        o, r, d, i = env.step(a)
        assert_obs_equal(o, ro, f"obs at {t} (a={a})")
        assert r == rr and d == rd, f"t={t} a={a}"
        steps += 1
        if rd:
            np.random.seed(1061 + t)
            ref_obs = ref.reset()
            np.random.seed(1061 + t)
            obs = env.reset()
            assert_obs_equal(obs, ref_obs, f"re-reset at {t}")
    assert steps > 200
    # the documented divergence on the overridden action
    with pytest.raises(TypeError):
        ref.step(break_id)
    o, r, d, i = env.step(break_id)     # ngx: works, correct AgentMap obs
    assert isinstance(o, dict) or hasattr(o, "shape")


def test_stack_three_novelties():
    """A 3-deep novelty stack: AddJump(FireWall(BreakIncrease(env))) — the
    inner blanket break, the middle reset-time wall replacement + fire-death
    post-check, and the outer Jump handler all active at once."""
    drive("NovelGridworld-Bow-v0", BOW_LIMIT | {"Jump"},
          [("breakincrease", "easy", ""), ("firewall", "easy"),
           ("addjump", "easy")], seed=71)


def test_stack_three_novelties_reset_edit_chain():
    """Three reset-time map edits in one stack: additem over replaceitem
    over fence — the ordered reset_edits replay all three inner-first with
    the reference's exact draw sequence."""
    drive("NovelGridworld-Pogostick-v1",
          POGO_LIMIT | {"Select_oak_fence", "Select_brick", "Select_spring"},
          [("fence", "easy", "oak"),
           ("replaceitem", "easy", "wall", "brick"),
           ("additem", "easy", "spring")], seed=73)


@pytest.mark.parametrize("map_size", [12, 15, 20])
def test_map_size_variation(map_size):
    """reset(map_size=N) conformance (random_action.py:62-65 re-resets with
    random sizes; reset signature pogostick_v1_env.py:86)."""
    env_id = "NovelGridworld-Pogostick-v1"
    ref = make_ref_env(env_id)
    env = C.make(env_id)
    np.random.seed(map_size)
    ref_obs = ref.reset(map_size=map_size)
    np.random.seed(map_size)
    obs = env.reset(map_size=map_size)
    np.testing.assert_array_equal(obs["map"].reshape(map_size, map_size),
                                  np.asarray(ref_obs["map"]))
    rng = np.random.RandomState(map_size + 1)
    for t in range(150):
        a = int(rng.randint(env.action_space.n))
        ro, rr, rd, ri = ref.step(a)
        o, r, d, i = env.step(a)
        assert r == rr and d == rd, f"t={t}"
        assert i["message"] == ri["message"], f"t={t}"
        np.testing.assert_array_equal(
            np.asarray(o["map"]).ravel(), np.asarray(ro["map"]).ravel(),
            err_msg=f"map at {t}")
        if rd:
            np.random.seed(map_size + 1000 + t)
            ref.reset(map_size=map_size)
            np.random.seed(map_size + 1000 + t)
            env.reset(map_size=map_size)


@pytest.mark.parametrize("map_size", [12, 17])
def test_map_size_legacy_lidar(map_size):
    """v0's lidar Box bound and beam fill depend on map size
    (novel_gridworld_v0_env.py:136-173) — conformance off the default size."""
    env_id = "NovelGridworld-v0"
    ref = make_ref_env(env_id)
    env = C.make(env_id)
    np.random.seed(map_size)
    ref_obs = ref.reset(map_size=map_size)
    np.random.seed(map_size)
    obs = env.reset(map_size=map_size)
    np.testing.assert_array_equal(obs, np.asarray(ref_obs))
    rng = np.random.RandomState(map_size + 1)
    for t in range(100):
        a = int(rng.randint(env.action_space.n))
        ro, rr, rd, _ = ref.step(a)
        o, r, d, _ = env.step(a)
        np.testing.assert_array_equal(o, np.asarray(ro), err_msg=f"t={t}")
        assert r == rr and d == rd
        if rd:
            np.random.seed(map_size + 1000 + t)
            ref.reset(map_size=map_size)
            np.random.seed(map_size + 1000 + t)
            env.reset(map_size=map_size)


def _drive_extractincdec_direct(env_id, incdec, seed, n_steps=300):
    """ExtractIncDec by DIRECT class construction — the reference reaches
    Bow-v1+increase and both Pogostick modes only this way, bypassing
    inject_novelty's combination asserts (novelty_wrappers.py:1491-1581 vs
    :1641-1653)."""
    from ngx import novelty as _N
    from ngx.compat.wrappers import _rewrap

    limited = ({"Forward", "Left", "Right", "Break", "Craft_bow",
                "Craft_stick", "Craft_plank", "Extract_string"}
               if "Bow" in env_id else
               {"Forward", "Left", "Right", "Break", "Craft_plank",
                "Craft_tree_tap", "Place_tree_tap", "Extract_rubber",
                "Select_tree_tap"})
    load_reference()
    from gym_novel_gridworlds.wrappers import LimitActions as RefLimit
    from gym_novel_gridworlds.observation_wrappers import LidarInFront as RefLidar
    from gym_novel_gridworlds.novelty_wrappers import ExtractIncDec as RefX

    np.random.seed(seed)
    ref = RefX(RefLidar(RefLimit(make_ref_env(env_id), set(limited)), 8),
               incdec)
    np.random.seed(seed)
    base = C.LidarInFront(C.LimitActions(C.make(env_id), set(limited)), 8)
    env = _rewrap(base, _N._extractincdec(base._spec, incdec))
    env._state = None

    np.random.seed(seed + 1)
    ref_obs = ref.reset()
    np.random.seed(seed + 1)
    obs = env.reset()
    assert_obs_equal(obs, ref_obs, "reset")

    rng = np.random.RandomState(seed + 2)
    # bias toward walk + extract so the Extract success path is actually
    # reached (the action stream is an external input — identical for both
    # implementations, so the bias cannot mask a divergence)
    bias_ids = [sorted(limited).index(a)
                for a in ("Forward", "Left", "Right", "Extract_string",
                          "Extract_rubber") if a in limited]
    extracted = 0
    for t in range(n_steps):
        if rng.rand() < 0.6:
            a = int(bias_ids[rng.randint(len(bias_ids))])
        else:
            a = int(rng.randint(env.action_space.n))
        ro, rr, rd, ri = ref.step(a)
        o, r, d, i = env.step(a)
        assert_obs_equal(o, ro, f"obs at {t} (a={a})")
        assert r == rr, f"reward {r} != {rr} at {t} (a={a})"
        assert d == rd, f"done at {t}"
        if ri:
            assert i["result"] == ri["result"], f"result at {t}"
            assert abs(i["step_cost"] - ri["step_cost"]) < 1e-3, \
                f"step_cost at {t}"
            assert i["message"] == ri["message"], f"message at {t}"
        if ri and ri.get("step_cost") in (5000, 50000):
            extracted += 1
        if rd:
            np.random.seed(seed + 1000 + t)
            try:
                ref_obs = ref.reset()
            except AssertionError as e:
                # the reference's reset rejection loop pops tried locations
                # REGARDLESS of validity and asserts when the list empties
                # ("Cannot place items, increase map size!",
                # pogostick_v0_env.py:191) — probabilistic capacity crash on
                # item-heavy stacks; the comparable action stream ends here
                # (ngx's reset skips unplaceable items by design,
                # docs/PARITY.md deviations)
                assert "increase map size" in str(e), e
                return
            np.random.seed(seed + 1000 + t)
            obs = env.reset()
            assert_obs_equal(obs, ref_obs, f"re-reset at {t}")
    return extracted


def test_extractincdec_direct_bow_v1_increase():
    """Bow-v1 + increase: wool -> 8 string (4*2, novelty_wrappers.py:1527)."""
    _drive_extractincdec_direct("NovelGridworld-Bow-v1", "increase", seed=91)


def test_extractincdec_direct_pogostick_v1_increase():
    """Pogostick-v1 + increase: rubber 2 per extraction (:1542)."""
    _drive_extractincdec_direct("NovelGridworld-Pogostick-v1", "increase",
                                seed=93)


def test_extractincdec_direct_pogostick_v1_decrease():
    """Pogostick-v1 + decrease: the += is skipped — rubber 0, reward/cost
    unchanged (:1542-1543)."""
    _drive_extractincdec_direct("NovelGridworld-Pogostick-v1", "decrease",
                                seed=95)


def test_extractincdec_direct_pogostick_v0_increase():
    """Pogostick-v0 (tap pre-placed at reset) + increase."""
    _drive_extractincdec_direct("NovelGridworld-Pogostick-v0", "increase",
                                seed=97)


def test_extractincdec_direct_pogostick_v0_decrease():
    """Pogostick-v0 + decrease — with the pre-placed tap the Extract path is
    actually reachable; assert the drive hit it at least once."""
    total = 0
    for seed in (99, 199, 299):
        total += _drive_extractincdec_direct(
            "NovelGridworld-Pogostick-v0", "decrease", seed=seed)
        if total:
            break
    assert total > 0, "no Extract_rubber success reached in 900 steps"


def test_stack_two_novelties_extractincdec_over_additem():
    """ExtractIncDec(AddItem(env)) on Bow-v1 (the only reference-legal
    extractincdec target, novelty_wrappers.py:1641-1653) — decreased string
    yield over a reset-time map fill."""
    limited = {"Forward", "Left", "Right", "Break", "Craft_bow",
               "Craft_stick", "Craft_plank", "Extract_string",
               "Select_spring"}
    drive("NovelGridworld-Bow-v1", limited,
          [("additem", "easy", "spring"),
           ("extractincdec", "easy", "decrease")], seed=81)
