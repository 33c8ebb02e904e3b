"""Generated stacked-novelty conformance matrix.

The hand-picked stacks in test_conformance_stacked.py probe known shadowing
hazards; residual parity risk lives in the combinations nobody hand-picked.
This module ENUMERATES legal ordered novelty stacks from ``inject_novelty``'s
own constraints plus the reference's own crash classes (novelty_wrappers.py:
1586-1674 arg requirements, no duplicate item names, extractincdec's env
gating; v6's missing set_lasts, fence-after-wall-replacement,
extractincdec-over-action-adders — docs/PARITY.md) and replays a
deterministic 68-stack sample (2-/3-/4-deep over all five modern envs, plus
forced reset-edit-over-Pogostick-v0 cases) bit-exactly against the stacked
reference, reusing the same drive harness.
"""

import random
import zlib

import pytest

from reference_loader import reference_available
from test_conformance_stacked import drive

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


# (name, difficulty, *args) instance pool; item each instance ADDS (for the
# no-duplicate-item legality rule) computed below.
POOL = [
    ("axe", "easy", "wooden"),
    ("axe", "medium", "iron"),
    ("axe", "hard", "wooden"),
    ("axe", "easy", "iron", "true"),
    ("axetobreak", "easy", "wooden"),
    ("axetobreak", "hard", "iron"),
    ("fence", "easy", "oak"),
    ("fence", "hard", "jungle"),
    ("fencerestriction", "medium", "oak"),
    ("fencerestriction", "hard", "jungle"),
    ("additem", "easy", "spring"),
    ("additem", "hard", "brick"),
    ("crate", "medium"),
    ("replaceitem", "medium", "wall", "brick"),
    ("replaceitem", "hard", "wall", "spring"),
    ("firewall", "medium"),
    ("remapaction", "easy"),
    ("remapaction", "hard"),
    ("addchop", "easy"),
    ("addjump", "easy"),
    ("breakincrease", "easy", ""),
    ("breakincrease", "hard", "tree_log"),
    ("extractincdec", "easy", "decrease"),        # Bow-v1 only (ref asserts)
]

ENVS = ["NovelGridworld-Bow-v0", "NovelGridworld-Bow-v1",
        "NovelGridworld-Pogostick-v1", "NovelGridworld-Pogostick-v0",
        "NovelGridworld-v6"]

# actions a novelty asserts must survive limiting on EVERY step
# (novelty_wrappers.py:39-43,262-268,677-683,912-914,1079-1081,1282-1284,
# 1427-1429,1506-1511)
_BASE_LIMIT = {
    "NovelGridworld-Bow-v0": {"Forward", "Left", "Right", "Break",
                              "Craft_bow", "Extract_string"},
    "NovelGridworld-Bow-v1": {"Forward", "Left", "Right", "Break",
                              "Craft_bow", "Craft_plank", "Extract_string"},
    "NovelGridworld-Pogostick-v1": {"Forward", "Left", "Right", "Break",
                                    "Craft_plank", "Select_tree_log"},
    "NovelGridworld-Pogostick-v0": {"Forward", "Left", "Right", "Break",
                                    "Craft_plank", "Select_tree_log",
                                    "Extract_rubber"},
    "NovelGridworld-v6": {"Forward", "Left", "Right", "Break",
                          "Craft_plank", "Select_tree_log"},
}


def _added_item(nov):
    name = nov[0]
    if name in ("axe", "axetobreak"):
        return nov[2] + "_axe"
    if name in ("fence", "fencerestriction"):
        return nov[2] + "_fence"
    if name == "additem":
        return nov[2]
    if name == "crate":
        return "crate"
    if name == "replaceitem":
        return nov[3]
    if name == "firewall":
        return "fire_wall"
    return None


def _required_actions(nov):
    name = nov[0]
    req = set()
    if name in ("axe", "axetobreak", "fencerestriction", "crate",
                "breakincrease"):
        req.add("Break")
    if name in ("axe", "axetobreak") and nov[1] == "hard":
        req.add("Craft_" + nov[2] + "_axe")
    if name == "addchop":
        req.add("Chop")
    if name == "addjump":
        req.add("Jump")
    return req


# v6 predates the set_lasts bookkeeping hook (only Bow-v0/v1 and
# Pogostick-v0/v1 define it): every step-overriding novelty (axe families,
# addchop/addjump, breakincrease, fencerestriction, firewall, extractincdec)
# raises AttributeError on v6 in the REFERENCE — deprecated-env dead code,
# documented in docs/PARITY.md.  Only reset-only novelties + remapaction are
# reachable.
_V6_SAFE = {"fence", "additem", "replaceitem", "crate", "remapaction"}


def _legal(env_id, stack):
    added = set()
    wall_replaced = False
    action_added = False
    for nov in stack:
        if nov[0] == "extractincdec" and env_id != "NovelGridworld-Bow-v1":
            return False
        if nov[0] == "extractincdec" and action_added:
            # reference crash class: ExtractIncDec reverse-looks-up EVERY
            # action id in its own view of actions_id
            # (novelty_wrappers.py:1515), which excludes ids appended by a
            # lower action-adding novelty (Chop/Jump/Craft_axe) ->
            # ValueError when that id is played; probabilistic, untestable
            return False
        if (nov[0] in ("addchop", "addjump")
                or (nov[0] in ("axe", "axetobreak") and nov[1] == "hard")):
            action_added = True
        if env_id == "NovelGridworld-v6" and nov[0] not in _V6_SAFE:
            return False          # reference crash: v6 has no set_lasts
        if nov[0] in ("fence", "fencerestriction") and wall_replaced:
            # reference crash class: a wall-replacing novelty (firewall /
            # replaceitem-from-wall) makes BORDER cells fence-eligible, and
            # add_fence_around indexes r±1/c±1 unguarded -> IndexError
            # (novelty_wrappers.py:880-883 + pogostick_v1_env.py:524-536);
            # probabilistic in the reference, so the stack is untestable
            return False
        if nov[0] == "firewall" or (nov[0] == "replaceitem"
                                    and nov[2] == "wall"):
            wall_replaced = True
        if nov[0] == "breakincrease" and len(nov) > 2 and nov[2]:
            if nov[2] == "tree_log" and "Bow-v0" in env_id:
                return False      # Bow-v0 has no tree_log
        item = _added_item(nov)
        if item is not None:
            if item in added:
                return False      # _append_item asserts on duplicates
            added.add(item)
        # two remapactions in one stack double-shuffle — legal, keep
    return True


def _generate(n_target=60, seed=0):
    rng = random.Random(seed)
    combos = []
    seen = set()
    attempts = 0
    while len(combos) < n_target and attempts < 10_000:
        attempts += 1
        env_id = ENVS[len(combos) % len(ENVS)]
        # mostly 2-deep, every 3rd 3-deep, every 7th 4-deep (shadowing and
        # reverse-lookup hazards compound with stack depth)
        k = 4 if len(combos) % 7 == 0 else (3 if len(combos) % 3 == 0 else 2)
        stack = tuple(rng.sample(POOL, k))
        if not _legal(env_id, stack):
            continue
        key = (env_id, stack)
        if key in seen:
            continue
        seen.add(key)
        combos.append((env_id, list(stack)))
    assert len(combos) >= n_target, len(combos)
    return combos


# Forced stacks: reset-edit novelties OVER Pogostick-v0 — the one env whose
# BASE reset already pre-places a tree_tap via a rejection loop
# (pogostick_v0_env.py:155-178), so the percent-fill reset edits
# (novelty_wrappers.py:868-889,1013-1034,1126-1148) draw AFTER the tap
# placement; the mirror must replay exactly that draw ordering.
_FORCED = [
    ("NovelGridworld-Pogostick-v0", [("fence", "hard", "jungle")]),
    ("NovelGridworld-Pogostick-v0", [("additem", "hard", "brick")]),
    ("NovelGridworld-Pogostick-v0",
     [("replaceitem", "hard", "wall", "spring")]),
    ("NovelGridworld-Pogostick-v0", [("firewall", "medium")]),
    ("NovelGridworld-Pogostick-v0",
     [("fence", "easy", "oak"), ("additem", "easy", "spring")]),
    ("NovelGridworld-Pogostick-v0",
     [("axe", "easy", "wooden"), ("replaceitem", "medium", "wall", "brick"),
      ("crate", "medium")]),
    # v6 only reaches reset-only novelties + remapaction (see _V6_SAFE)
    ("NovelGridworld-v6",
     [("fence", "easy", "oak"), ("additem", "easy", "spring")]),
    ("NovelGridworld-v6",
     [("replaceitem", "medium", "wall", "brick"), ("crate", "medium")]),
]

MATRIX = _generate() + _FORCED
assert sum(1 for _, s in MATRIX if len(s) == 3) >= 15
assert sum(1 for _, s in MATRIX if len(s) == 4) >= 6
assert sum(1 for e, _ in MATRIX
           if e == "NovelGridworld-Pogostick-v0") >= 10
assert sum(1 for e, _ in MATRIX if e == "NovelGridworld-v6") >= 10


@pytest.mark.parametrize(
    "env_id,stack", MATRIX,
    ids=[f"{e.split('-', 1)[1]}-" + "+".join(n[0] for n in s)
         for e, s in MATRIX])
def test_generated_stack(env_id, stack):
    limited = set(_BASE_LIMIT[env_id])
    for nov in stack:
        limited |= _required_actions(nov)
    # deterministic per-stack seed (builtin hash is salted per process)
    seed = zlib.crc32(repr((env_id, stack)).encode()) % 10_000
    drive(env_id, limited, stack, seed=seed, n_steps=120)
