"""Parity tests for the Pallas fused-rollout kernel (ngx/ops/pallas_rollout.py).

Runs in interpret mode on CPU (tests/conftest.py forces the CPU platform);
the kernel's dynamics are jax.vmap(make_step(...)) traced inside the kernel,
so parity against the plain XLA scan with an identical action stream checks
the whole Pallas plumbing (const hoisting, block specs, fori_loop state
carry, RNG) rather than a re-implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ngx
from ngx.core.step import make_step
from ngx.ops.pallas_rollout import make_pallas_rollout, supports_pallas_rollout

POGO = "NovelGridworld-Pogostick-v1"


def test_supports_gate():
    assert supports_pallas_rollout(ngx.make_spec(POGO))
    assert supports_pallas_rollout(ngx.make_spec("NovelGridworld-Bow-v0"))
    assert not supports_pallas_rollout(
        ngx.make_spec("NovelGridworld-Pogostick-v0"))  # tap pre-placement
    assert not supports_pallas_rollout(
        ngx.make_spec("NovelGridworld-v3"))            # wall coin-flip
    fenced = ngx.inject_novelty(ngx.make_spec(POGO), "fence", "easy", "oak")
    assert not supports_pallas_rollout(fenced)


@pytest.mark.parametrize("env_id", [POGO, "NovelGridworld-Bow-v1",
                                    "NovelGridworld-v5"])
def test_pallas_rollout_matches_xla_scan(env_id):
    """Same initial state + same action stream => bit-identical final state."""
    spec = ngx.make_spec(env_id)
    B, T, TB = 64, 64, 32
    seed = 7

    # the kernel's own reset (steps=0 -> fori_loop is a no-op)
    run0 = make_pallas_rollout(spec, B, 0, block=TB, interpret=True)
    st0, _, _ = jax.jit(run0)(seed)

    rng = np.random.RandomState(3)
    actions = jnp.asarray(rng.randint(spec.n_actions, size=(T, B)), jnp.int32)

    # plain XLA scan from the same st0, no auto-reset
    v_step = jax.vmap(make_step(spec, with_obs=False))

    @jax.jit
    def xla_rollout(st):
        def body(st, a):
            ns, _, r, done, _ = v_step(st, a)
            return ns, (r, done)
        return jax.lax.scan(body, st, actions)

    st_x, (r_x, d_x) = xla_rollout(st0)
    assert not bool(np.asarray(d_x).any()), \
        "test assumes no episode ends (else reset draws diverge)"

    run = make_pallas_rollout(spec, B, T, block=TB, action_source="input",
                              interpret=True)
    st_p, mean_r, n_done = jax.jit(run)(seed, actions)

    assert int(n_done) == 0
    np.testing.assert_allclose(float(mean_r),
                               float(np.asarray(r_x).mean()), rtol=1e-6)
    for name in ("map", "agent", "facing", "inventory", "selected",
                 "step_count", "last_action", "last_reward", "last_cost",
                 "last_done"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st_p, name)), np.asarray(getattr(st_x, name)),
            err_msg=f"state leaf {name} diverged")


def test_pallas_reset_distribution():
    """Kernel reset matches the native reset's marginals: exact item counts,
    interior-only support, uniform-ish occupancy, 4-neighbor-air invariant."""
    spec = ngx.make_spec(POGO)
    B = 2048
    run0 = make_pallas_rollout(spec, B, 0, block=128, interpret=True)
    st, _, _ = jax.jit(run0)(11)
    maps = np.asarray(st.map2d)
    tree = spec.items.index("tree_log")
    ct = spec.items.index("crafting_table")

    assert ((maps == tree).sum(axis=(1, 2)) == 5).all()
    assert ((maps == ct).sum(axis=(1, 2)) == 1).all()

    outside = np.ones(maps.shape[1:], bool)
    outside[2:-2, 2:-2] = False
    assert (maps[:, outside] == 0).sum() + (maps[:, outside] == 8).sum() \
        == maps[:, outside].size

    occ = (maps == tree).mean(axis=0)
    inner = occ[2:-2, 2:-2]
    # per-cell expectation 5/36 ~ 0.139; loose MC bound
    np.testing.assert_allclose(inner, 5 / 36, atol=0.05)

    # no two items adjacent at reset (placement requires 4 air neighbors)
    for m in maps[:100]:
        occ_m = m.copy()
        occ_m[0, :] = occ_m[-1, :] = occ_m[:, 0] = occ_m[:, -1] = 0
        rs, cs = np.nonzero(occ_m)
        for r, c in zip(rs, cs):
            for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                assert m[rr, cc] in (0, 8)

    # agent on air, in the interior
    agents = np.asarray(st.agent)
    assert agents.min() >= 2 and agents.max() <= spec.map_size - 3
    vals = maps[np.arange(B), agents[:, 0], agents[:, 1]]
    assert (vals == 0).all()

    # facing roughly uniform
    faces = np.bincount(np.asarray(st.facing), minlength=4) / B
    np.testing.assert_allclose(faces, 0.25, atol=0.05)


def test_pallas_prng_mode_runs():
    spec = ngx.make_spec(POGO)
    run = make_pallas_rollout(spec, 32, 16, block=32, interpret=True)
    st, mean_r, n_done = jax.jit(run)(0)
    assert np.isfinite(float(mean_r))
    assert (np.asarray(st.step_count) == 16).all() or int(n_done) > 0


def test_pallas_policy_rollout_obs_and_logits_parity():
    """The fused policy kernel's in-Mosaic LidarInFront observation and MLP
    logits must match ngx.ops.rays + flax ActorCritic exactly (same state)."""
    from ngx.ops.pallas_rollout import make_xla_policy_rollout
    from ngx.rl.models import ActorCritic
    from ngx.transforms import lidar_in_front

    spec = lidar_in_front(ngx.make_spec(POGO))
    TB = 16
    vreset = jax.vmap(ngx.make_reset(spec))
    state, obs_ref = vreset(jax.random.split(jax.random.key(0), TB))
    model = ActorCritic(n_actions=spec.n_actions, hidden=(64, 64))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, obs_ref.shape[1]), jnp.float32))

    run = make_pallas_rollout(spec, batch=32, steps=8, block=TB,
                              action_source="policy", interpret=True,
                              policy_params=params)
    assert run.obs_dim == obs_ref.shape[1]
    np.testing.assert_array_equal(np.asarray(run.lidar_obs_fn(state)),
                                  np.asarray(obs_ref))
    logits_ref, _ = model.apply(params, jnp.asarray(obs_ref, jnp.float32))
    np.testing.assert_allclose(np.asarray(run.policy_logits_fn(state)),
                               np.asarray(logits_ref), atol=1e-5)

    # fused rollout executes (interpret mode) and the comparator runs too
    st, mean_r, n_done = jax.jit(run)(0)
    assert np.isfinite(float(mean_r))
    assert (np.asarray(st.step_count) > 0).any()
    xla = make_xla_policy_rollout(spec, params, 32, 8)
    st2, mean_r2, _ = xla(jax.random.key(3))
    assert np.isfinite(float(mean_r2))


def test_pallas_train_rollout_parity():
    """The trainer kernel (params-as-inputs, trajectory emission, episode
    cap): emitted obs[0] is bit-identical to the carried XLA obs, and
    replaying the emitted actions through the XLA vec from the same initial
    state reproduces reward/done per step (until an env resets — the kernel
    and the XLA path use different reset RNG streams)."""
    from ngx.ops.pallas_rollout import make_pallas_train_rollout
    from ngx.rl.models import ActorCritic
    from ngx.transforms import lidar_in_front
    from ngx.vector import make_vec

    spec = lidar_in_front(ngx.make_spec(POGO))
    B, T, cap = 256, 8, 100
    vec = make_vec(spec)
    state, obs0 = jax.jit(vec.reset)(jax.random.split(jax.random.key(0), B))
    model = ActorCritic(n_actions=spec.n_actions)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, obs0.shape[-1]), jnp.float32))

    run = make_pallas_train_rollout(spec, B, T, block=128, cap=cap,
                                    interpret=True)
    st2, obs, act, rew, done = jax.jit(
        lambda s, st, p: run(s, st, p))(7, state, params)
    assert obs.shape == (T, B, obs0.shape[-1]) and done.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(obs[0]),
                                  np.asarray(obs0, np.float32))

    s, ok = state, np.ones((B,), bool)
    for t in range(T):
        s, _, r, d, _ = jax.jit(vec.step)(
            s, act[t], jax.random.split(jax.random.key(t), B))
        np.testing.assert_allclose(
            np.where(ok, np.asarray(r), 0),
            np.where(ok, np.asarray(rew[t]), 0), err_msg=f"reward t={t}")
        capped = np.asarray(s.step_count) >= cap
        np.testing.assert_array_equal(
            np.where(ok, np.asarray(d) | capped, False),
            np.where(ok, np.asarray(done[t]), False), err_msg=f"done t={t}")
        ok &= ~np.asarray(done[t])


def test_train_step_pallas_backend_smoke():
    """One full PPO train step through the fused Pallas acting backend
    (interpret mode off-chip): finite losses, carried state advances."""
    from ngx.rl.train import PPOConfig, make_train

    cfg = PPOConfig(num_envs=128, rollout_steps=4, num_minibatches=2,
                    epochs=1, hidden=(16, 16))
    init, train_step = make_train(cfg, rollout_backend="pallas")
    carry = init(jax.random.key(0))
    carry, metrics = jax.jit(train_step)(carry, jax.random.key(1))
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["pg_loss"]) and np.isfinite(m["v_loss"]), m
    assert int(np.asarray(carry[1].step_count).max()) >= 4


def test_train_step_pallas_backend_mesh():
    """The fused acting kernel under shard_map: one PPO train step over an
    8-device mesh with the env axis sharded, each device running the kernel
    on its shard (interpret mode off-chip)."""
    import numpy as _np
    from jax.sharding import Mesh
    from ngx.rl.train import PPOConfig, make_train

    mesh = Mesh(_np.asarray(jax.devices()[:8]), ("env",))
    cfg = PPOConfig(num_envs=8 * 128, rollout_steps=4, num_minibatches=2,
                    epochs=1, hidden=(16, 16))
    with mesh:
        init, train_step = make_train(cfg, mesh, rollout_backend="pallas")
        carry = init(jax.random.key(0))
        assert len(carry[1].map.sharding.device_set) == 8
        carry, metrics = jax.jit(train_step)(carry, jax.random.key(1))
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(m["pg_loss"]) and np.isfinite(m["v_loss"]), m
