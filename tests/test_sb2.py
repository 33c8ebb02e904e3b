"""The reference's shipped SB2 checkpoints replayed through the ngx engine.

The reference evaluates ``trained_agents/NovelGridworld-v{0..4}.zip`` with
SB2 PPO2 (reference enjoy.py:49-72).  ngx loads the same zips TF-free
(``ngx/rl/sb2.py``: the 'parameters' member is a plain npz of MLP weights)
and runs them as a JAX forward pass.  Because these policies were trained on
the REFERENCE dynamics, their solve rates on ngx dynamics are an independent
behavioral conformance check — a dynamics mismatch would tank them.
"""

import os

import numpy as np
import pytest

REF_DIR = "/root/reference/trained_agents"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkpoints not mounted")


def _zip(v):
    return os.path.join(REF_DIR, f"NovelGridworld-v{v}.zip")


@pytest.mark.parametrize("v,n_actions", [(0, 3), (1, 4), (2, 2), (3, 5),
                                         (4, 4)])
def test_load_shapes(v, n_actions):
    from ngx.rl.sb2 import load_sb2_params

    p = load_sb2_params(_zip(v))
    # SB2 MlpPolicy default: two 64-wide tanh hidden layers per tower
    assert [w.shape[1] for w, _ in p["pi"][:-1]] == [64, 64]
    assert p["pi"][-1][0].shape[1] == n_actions
    assert p["vf"][-1][0].shape == (64, 1)


def test_apply_matches_numpy():
    import jax
    from ngx.rl.sb2 import load_sb2_params, sb2_apply

    p = load_sb2_params(_zip(0))
    obs = np.random.RandomState(0).uniform(0, 10, (7, 10)).astype(np.float32)
    logits, value = jax.jit(sb2_apply)(p, obs)
    h = obs
    for W, b in p["pi"][:-1]:
        h = np.tanh(h @ W + b)
    ref_logits = h @ p["pi"][-1][0] + p["pi"][-1][1]
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-5)
    assert value.shape == (7,)


def test_dim_mismatch_raises():
    from ngx.rl.sb2 import load_sb2_params, check_dims

    p = load_sb2_params(_zip(0))
    with pytest.raises(ValueError, match="obs_dim"):
        check_dims(p, 32, 3, "x.zip")


@pytest.mark.parametrize("v,min_solve", [(0, 0.9), (1, 0.9), (2, 0.9),
                                         (3, 0.7), (4, 0.9)])
def test_reference_agents_solve_on_ngx(v, min_solve):
    """The reference authors' own policies, trained on reference dynamics,
    solve the ngx envs at high rates (measured 89-100% at 128 episodes) —
    behavioral conformance beyond the bit-exact replay suites."""
    from ngx.rl.evaluate import evaluate_sb2_zip

    m = evaluate_sb2_zip(f"NovelGridworld-v{v}", _zip(v), episodes=64,
                         cap=100, seed=0)
    assert m["solve_rate"] >= min_solve, m
