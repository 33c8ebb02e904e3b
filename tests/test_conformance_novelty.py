"""Bit-exact conformance of the 13 ngx novelty spec-rewrites vs the reference
novelty wrappers (novelty_wrappers.py), driven with random actions from
snapshotted reset states.

Protocol per case: seed np.random, build the reference stack (gym.make +
inject_novelty — construction itself may draw, e.g. Crate contents and the
AxeMedium add_new_items reset), reset, snapshot into an ngx EnvState, then
step both sides in lockstep comparing map / inventory / reward / done /
result / step_cost.
"""

import numpy as np
import pytest

import jax

import ngx
from reference_loader import (compare_step, load_reference, make_ref_env,
                              reference_available, snapshot_state)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

POGO = "NovelGridworld-Pogostick-v1"


def make_pair(env_id, novelty, difficulty, arg1="", arg2="", seed=0):
    """Build (reference wrapped env, ngx spec) with identical RNG draws."""
    load_reference()
    from gym_novel_gridworlds.novelty_wrappers import inject_novelty as ref_inject

    np.random.seed(seed)
    ref = ref_inject(make_ref_env(env_id), novelty, difficulty, arg1, arg2)

    np.random.seed(seed)
    spec = ngx.inject_novelty(ngx.make_spec(env_id), novelty, difficulty,
                              arg1, arg2)
    return ref, spec


def base_env(ref):
    base = ref
    while hasattr(base, "env") and base.env is not None:
        base = base.env
    return base


def run_novelty(env_id, novelty, difficulty, arg1="", arg2="", seed=0,
                n_steps=300):
    ref, spec = make_pair(env_id, novelty, difficulty, arg1, arg2, seed)
    base = base_env(ref)

    # id layout must match the reference's mutated dicts exactly
    assert spec.actions_id == dict(base.actions_id), \
        f"actions_id mismatch:\n{spec.actions_id}\nvs\n{base.actions_id}"
    assert spec.items_id == dict(base.items_id), \
        f"items_id mismatch:\n{spec.items_id}\nvs\n{base.items_id}"

    step = jax.jit(ngx.make_step(spec))

    np.random.seed(seed + 1)
    ref.reset()
    state = snapshot_state(ref, spec)

    rng = np.random.RandomState(seed + 2)
    for t in range(n_steps):
        a = int(rng.randint(spec.n_actions))
        ref_out = ref.step(a)
        out = step(state, a)
        compare_step(spec, ref, state, out, ref_out, t, modern=True)
        state = out[0]
        if ref_out[2]:
            np.random.seed(seed + 1000 + t)
            ref.reset()
            state = snapshot_state(ref, spec)


AXE_CASES = [
    ("easy", "wooden", ""), ("easy", "iron", "true"),
    ("medium", "iron", ""), ("medium", "wooden", "true"),
    ("hard", "wooden", ""), ("hard", "iron", ""),
]


@pytest.mark.parametrize("difficulty,material,bi", AXE_CASES)
def test_axe(difficulty, material, bi):
    run_novelty(POGO, "axe", difficulty, material, bi)


@pytest.mark.parametrize("difficulty,material", [
    ("easy", "wooden"), ("medium", "wooden"),
    ("hard", "wooden"), ("hard", "iron")])
def test_axetobreak(difficulty, material):
    run_novelty(POGO, "axetobreak", difficulty, material)


@pytest.mark.parametrize("difficulty", ["easy", "medium", "hard"])
def test_fence(difficulty):
    run_novelty(POGO, "fence", difficulty, "oak")


@pytest.mark.parametrize("difficulty", ["easy", "medium", "hard"])
def test_fencerestriction(difficulty):
    run_novelty(POGO, "fencerestriction", difficulty, "jungle")


@pytest.mark.parametrize("difficulty", ["easy", "hard"])
def test_additem(difficulty):
    run_novelty(POGO, "additem", difficulty, "rock")


@pytest.mark.parametrize("difficulty", ["easy", "medium", "hard"])
def test_crate(difficulty):
    run_novelty(POGO, "crate", difficulty)


@pytest.mark.parametrize("difficulty,old,new", [
    ("easy", "wall", "brick"), ("medium", "tree_log", "rock"),
    ("hard", "wall", "brick")])
def test_replaceitem(difficulty, old, new):
    run_novelty(POGO, "replaceitem", difficulty, old, new)


@pytest.mark.parametrize("difficulty", ["easy", "hard"])
def test_firewall(difficulty):
    run_novelty(POGO, "firewall", difficulty)


def test_addchop():
    run_novelty(POGO, "addchop", "hard")


def test_addjump():
    run_novelty(POGO, "addjump", "hard")


@pytest.mark.parametrize("arg1", ["", "tree_log"])
def test_breakincrease(arg1):
    run_novelty(POGO, "breakincrease", "hard", arg1)


def test_extractincdec_bow_v1_decrease():
    run_novelty("NovelGridworld-Bow-v1", "extractincdec", "hard", "decrease")


@pytest.mark.parametrize("difficulty", ["easy", "medium", "hard"])
def test_remapaction(difficulty):
    """Remap draws from np.random; same seed ⇒ same permutation, then the
    remapped spec must agree with the reference's mutated actions_id and
    behave identically."""
    run_novelty(POGO, "remapaction", difficulty)


def test_crate_contents_bit_exact():
    """The construction-time crate draw must replay the reference exactly."""
    load_reference()
    from gym_novel_gridworlds.novelty_wrappers import Crate
    for seed in range(5):
        np.random.seed(seed)
        ref = Crate(make_ref_env(POGO), "medium")
        np.random.seed(seed)
        spec = ngx.inject_novelty(ngx.make_spec(POGO), "crate", "medium")
        ref_contents = np.zeros((spec.n_items,), np.int32)
        for item in ref.crate_ingredients:
            ref_contents[spec.items.index(item)] += 1
        np.testing.assert_array_equal(spec.crate_contents, ref_contents)


def test_invalid_novelty_args():
    spec = ngx.make_spec(POGO)
    with pytest.raises(AssertionError):
        ngx.inject_novelty(spec, "nope")
    with pytest.raises(AssertionError):
        ngx.inject_novelty(spec, "axe", "easy", "stone")
    with pytest.raises(AssertionError):
        ngx.inject_novelty(spec, "extractincdec", "hard", "decrease")
    with pytest.raises(AssertionError):
        ngx.inject_novelty(
            ngx.make_spec("NovelGridworld-Bow-v1"), "extractincdec", "hard",
            "increase")
