"""Differential LONG-HORIZON fuzzing (SURVEY §4 conformance-harness mandate).

The per-stack conformance drives cap at ~120-250 steps; divergence classes
that only build up over many episodes (reset-RNG mirror drift, inventory
accumulation past obs clamps, novelty state carried across resets) would
slip through.  This suite replays >=5,000-step random-action streams —
through dozens of mirrored resets — bit-exactly against the stacked
reference on a sample of stacks, plus an NGX_DEBUG invariant soak of the
batched kernel over 5,000 steps.
"""

import numpy as np
import pytest

import jax

from reference_loader import reference_available
from test_conformance_stacked import BOW_LIMIT, POGO_LIMIT, drive

pytestmark = pytest.mark.slow

N_STEPS = 5000

STACKS = [
    # (env_id, limited, novelty-stack)
    ("NovelGridworld-Pogostick-v1", POGO_LIMIT, None),
    ("NovelGridworld-Pogostick-v0", POGO_LIMIT | {"Extract_rubber"}, None),
    ("NovelGridworld-Bow-v0", BOW_LIMIT, [("axe", "easy", "wooden")]),
    ("NovelGridworld-Pogostick-v1", POGO_LIMIT, [("firewall", "easy")]),
    ("NovelGridworld-Pogostick-v1", POGO_LIMIT,
     [("fence", "medium", "oak"), ("breakincrease", "easy", "")]),
    ("NovelGridworld-Bow-v1",
     BOW_LIMIT | {"Craft_plank"}, [("extractincdec", "easy", "decrease")]),
]


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
@pytest.mark.parametrize(
    "env_id,limited,stack", STACKS,
    ids=[f"{e.split('-', 1)[1]}-"
         + ("+".join(n[0] for n in s) if s else "plain")
         for e, _, s in STACKS])
def test_long_horizon_replay(env_id, limited, stack):
    """>=5k steps of random actions, bit-exact obs/reward/done/info at every
    step, mirrored reset at every episode boundary."""
    drive(env_id, limited, stack, seed=313, n_steps=N_STEPS)


def test_debug_soak_batched_kernel(monkeypatch):
    """NGX_DEBUG invariant soak: 5,000 batched steps (64 envs) of the fused
    XLA kernel with in-kernel state asserts armed — map/inventory/agent
    invariants must hold through hundreds of auto-resets."""
    monkeypatch.setenv("NGX_DEBUG", "1")
    import importlib

    import ngx
    from ngx.utils import debug
    assert debug.enabled()
    import ngx.core.step as step_mod
    import ngx.core.reset as reset_mod
    importlib.reload(step_mod)            # rebuild kernels with asserts
    importlib.reload(reset_mod)
    from ngx.vector import make_vec

    spec = ngx.make_spec("NovelGridworld-Pogostick-v1")
    # 100-step cap so episodes actually cycle (random actions essentially
    # never craft a pogo_stick) — hundreds of auto-resets under asserts
    vec = make_vec(spec, episode_cap=100)
    B = 64
    state, obs = jax.jit(vec.reset)(
        jax.random.split(jax.random.key(0), B))

    @jax.jit
    def run_chunk(state, key):
        import jax.numpy as jnp

        def body(carry, key_t):
            state, d = carry
            k_a, k_r = jax.random.split(key_t)
            a = jax.random.randint(k_a, (B,), 0, spec.n_actions)
            state, _, _, done, _ = vec.step(state, a,
                                            jax.random.split(k_r, B))
            return (state, d + done.sum()), None

        (state, d), _ = jax.lax.scan(
            body, (state, jnp.int32(0)), jax.random.split(key, 500))
        return state, d

    total_done = 0
    for i in range(10):                   # 10 x 500 = 5,000 steps
        state, d = run_chunk(state, jax.random.fold_in(jax.random.key(1), i))
        total_done += int(d)
    st = jax.tree_util.tree_map(np.asarray, state)
    assert total_done > 100, total_done   # many episodes crossed
    assert (st.inventory >= 0).all()
    assert (st.step_count >= 0).all()


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("env_id", ["NovelGridworld-v0", "NovelGridworld-v3",
                                    "NovelGridworld-v5"])
def test_long_horizon_legacy(env_id):
    """Legacy-env long soak: 5k steps of snapshot-injected step conformance
    through many episodes (v3 exercises the wall-coin + random-inventory
    reset path on every episode boundary)."""
    from test_conformance_legacy import run_legacy

    run_legacy(env_id, seed=99, n_steps=N_STEPS)


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("env_id", ["NovelGridworld-Pogostick-v1",
                                    "NovelGridworld-v5",
                                    "NovelGridworld-Bow-v1"])
def test_expert_driven_replay(env_id):
    """Differential replay under the SCRIPTED EXPERT's actions: random
    actions almost never reach deep craft-chain states (multi-ingredient
    crafts at the table, tap extraction cycles, goal terminations every
    episode), so this drive exercises exactly the success paths the random
    fuzz undersamples — 1,500 steps, mirrored resets, bit-exact obs /
    reward / done / info."""
    import ngx.compat as C
    from ngx.rl.experts import get_expert
    from reference_loader import make_ref_env
    from test_conformance_stacked import assert_obs_equal

    seed = 424
    np.random.seed(seed)
    ref = make_ref_env(env_id)
    np.random.seed(seed)
    env = C.make(env_id)
    expert = get_expert(env_id)

    np.random.seed(seed + 1)
    ref_obs = ref.reset()
    np.random.seed(seed + 1)
    obs = env.reset()
    assert_obs_equal(obs, ref_obs, "reset")

    solves = 0
    for t in range(1500):
        a = int(expert(env))
        ro, rr, rd, ri = ref.step(a)
        o, r, d, i = env.step(a)
        assert_obs_equal(o, ro, f"obs at {t} (a={a})")
        assert r == rr, f"reward {r} != {rr} at {t} (a={a})"
        assert d == rd, f"done at {t}"
        if ri:
            assert i["result"] == ri["result"], f"result at {t}"
            assert abs(i["step_cost"] - ri["step_cost"]) < 1e-3, t
            assert i["message"] == ri["message"], t
        if d:
            solves += int(r > 0.5 * env.reward_done)
            np.random.seed(seed + 1000 + t)
            ref_obs = ref.reset()
            np.random.seed(seed + 1000 + t)
            obs = env.reset()
            assert_obs_equal(obs, ref_obs, f"re-reset at {t}")
    # the expert must actually be solving (deep-path coverage, not walking)
    assert solves >= 10, solves
