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
    """Round 4: the kernel reset covers EVERY spec — plain, irregular
    (wall-coin / tap pre-placement) and novelty-injected."""
    assert supports_pallas_rollout(ngx.make_spec(POGO))
    assert supports_pallas_rollout(ngx.make_spec("NovelGridworld-Bow-v0"))
    assert supports_pallas_rollout(
        ngx.make_spec("NovelGridworld-Pogostick-v0"))  # tap pre-placement
    assert supports_pallas_rollout(
        ngx.make_spec("NovelGridworld-v3"))            # wall coin-flip
    fenced = ngx.inject_novelty(ngx.make_spec(POGO), "fence", "easy", "oak")
    assert supports_pallas_rollout(fenced)


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


def test_pallas_reset_wall_coin_v3():
    """v3's 50% wall-in-front coin (novel_gridworld_v3_env.py:148-152) in
    the kernel reset: frequency matches the XLA reset's, wall only on air,
    and the random start inventory stays in its U[lo, hi] ranges."""
    spec = ngx.make_spec("NovelGridworld-v3")
    B = 2048
    run0 = make_pallas_rollout(spec, B, 0, block=128, interpret=True)
    st, _, _ = jax.jit(run0)(5)
    maps = np.asarray(st.map2d)
    agents = np.asarray(st.agent)
    faces = np.asarray(st.facing)
    deltas = np.array([[-1, 0], [1, 0], [0, -1], [0, 1]])
    wall = spec.items.index("wall")
    fr = agents + deltas[faces]
    front = maps[np.arange(B), fr[:, 0], fr[:, 1]]
    frac_wall = (front == wall).mean()
    # interior front cells are predominantly air, so P(front wall) ~ 0.5
    assert 0.35 < frac_wall < 0.6, frac_wall

    # XLA reset comparator on the same spec
    vreset = jax.vmap(ngx.make_reset(spec))
    st_x, _ = jax.jit(vreset)(jax.random.split(jax.random.key(0), B))
    fx = np.asarray(st_x.agent) + deltas[np.asarray(st_x.facing)]
    front_x = np.asarray(st_x.map2d)[np.arange(B), fx[:, 0], fx[:, 1]]
    assert abs(frac_wall - (front_x == wall).mean()) < 0.06

    # random inventory ranges (plank U[2,10], stick U[1,8], rubber 1)
    inv = np.asarray(st.inventory)
    lo = np.asarray(spec.start_inv_lo)
    hi = np.asarray(spec.start_inv_hi)
    assert (inv >= lo).all() and (inv <= hi).all()
    plank = spec.items.index("plank")
    assert inv[:, plank].min() == 2 and inv[:, plank].max() == 10


def test_pallas_reset_tap_preplacement_pogostick_v0():
    """Pogostick-v0's tap pre-placement (pogostick_v0_env.py:155-178):
    exactly one tap per reset, 4-adjacent to a tree, placed on air."""
    spec = ngx.make_spec("NovelGridworld-Pogostick-v0")
    B = 1024
    run0 = make_pallas_rollout(spec, B, 0, block=128, interpret=True)
    st, _, _ = jax.jit(run0)(9)
    maps = np.asarray(st.map2d)
    tap = spec.items.index("tree_tap")
    tree = spec.items.index("tree_log")
    n_tap = (maps == tap).sum(axis=(1, 2))
    assert (n_tap == 1).all()
    for m in maps[:200]:
        r, c = [int(v[0]) for v in np.nonzero(m == tap)]
        assert any(m[r + dr, c + dc] == tree
                   for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)))


def test_pallas_reset_novelty_edits():
    """Novelty percent-fill reset edits in-kernel: the replaceitem-hard
    fill is DETERMINISTIC (p=99 over 36 walls -> ceil = 36, every wall
    replaced — an exact-count check of the integer-bisection selection),
    and the fence/additem marginals match the XLA reset's."""
    base = ngx.make_spec(POGO)
    B = 512

    # firewall hard == ReplaceItem(wall -> fire_wall, p=99): all 36 walls
    fw = ngx.inject_novelty(base, "firewall", "hard")
    run0 = make_pallas_rollout(fw, B, 0, block=128, interpret=True)
    st, _, _ = jax.jit(run0)(3)
    maps = np.asarray(st.map2d)
    wall = fw.items.index("wall")
    fire = fw.items.index("fire_wall")
    assert ((maps == fire).sum(axis=(1, 2)) == 36).all()
    assert ((maps == wall).sum(axis=(1, 2)) == 0).all()

    # fence medium over POGO: fence cells only on former air, and the mean
    # fence count tracks the XLA reset within MC tolerance
    fe = ngx.inject_novelty(base, "fence", "medium", "oak")
    runf = make_pallas_rollout(fe, B, 0, block=128, interpret=True)
    stf, _, _ = jax.jit(runf)(4)
    fid = fe.items.index("oak_fence")
    mf = np.asarray(stf.map2d)
    n_pallas = (mf == fid).sum(axis=(1, 2))
    assert (n_pallas > 0).all()          # p >= 50% of 6 items -> >= 3 centers
    vreset = jax.vmap(ngx.make_reset(fe))
    stx, _ = jax.jit(vreset)(jax.random.split(jax.random.key(1), B))
    n_xla = (np.asarray(stx.map2d) == fid).sum(axis=(1, 2))
    assert abs(n_pallas.mean() - n_xla.mean()) < 1.5, \
        (n_pallas.mean(), n_xla.mean())

    # additem: count bounded by ceil(air * (hi-1)/100), item on former air
    ai = ngx.inject_novelty(base, "additem", "medium", "crate")
    runa = make_pallas_rollout(ai, B, 0, block=128, interpret=True)
    sta, _, _ = jax.jit(runa)(6)
    cid = ai.items.index("crate")
    ma = np.asarray(sta.map2d)
    n_add = (ma == cid).sum(axis=(1, 2))
    # air before the edit: 100 - 36 wall - 6 placements = 58 cells
    assert (n_add >= int(np.ceil(58 * 10 / 100)) - 1).all()   # agent slot
    assert (n_add <= int(np.ceil(58 * 19 / 100))).all()
    sta_x, _ = jax.jit(jax.vmap(ngx.make_reset(ai)))(
        jax.random.split(jax.random.key(2), B))
    n_add_x = (np.asarray(sta_x.map2d) == cid).sum(axis=(1, 2))
    assert abs(n_add.mean() - n_add_x.mean()) < 0.6, \
        (n_add.mean(), n_add_x.mean())


def test_pallas_reset_novelty_edits_map16():
    """The subset selector's lane tie-break must stay exact beyond 256
    cells (map_size 16 -> HW=256, the 8-bit-lane boundary): firewall-hard
    at size 16 deterministically replaces ALL 60 wall cells."""
    base = ngx.make_spec(POGO, map_size=16)
    fw = ngx.inject_novelty(base, "firewall", "hard")
    B = 256
    run0 = make_pallas_rollout(fw, B, 0, block=128, interpret=True)
    st, _, _ = jax.jit(run0)(13)
    maps = np.asarray(st.map2d)
    fire = fw.items.index("fire_wall")
    wall = fw.items.index("wall")
    assert ((maps == fire).sum(axis=(1, 2)) == 60).all()
    assert ((maps == wall).sum(axis=(1, 2)) == 0).all()


def test_pallas_train_rollout_novelty_spec():
    """The trainer kernel on a novelty-injected spec (the reference's
    central scenario, tests/train.py:73-89): builds, runs, and the emitted
    first-step obs is bit-identical to the XLA vec reset obs."""
    from ngx.ops.pallas_rollout import make_pallas_train_rollout
    from ngx.rl.models import ActorCritic
    from ngx.transforms import lidar_in_front
    from ngx.vector import make_vec

    spec = lidar_in_front(
        ngx.inject_novelty(ngx.make_spec(POGO), "fence", "easy", "oak"))
    B, T = 128, 4
    vec = make_vec(spec)
    state, obs0 = jax.jit(vec.reset)(jax.random.split(jax.random.key(0), B))
    model = ActorCritic(n_actions=spec.n_actions)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, obs0.shape[-1]), jnp.float32))
    run = make_pallas_train_rollout(spec, B, T, block=128, interpret=True)
    st2, obs, act, rew, done = jax.jit(
        lambda s, st, p: run(s, st, p))(7, state, params)
    np.testing.assert_array_equal(np.asarray(obs[0]),
                                  np.asarray(obs0, np.float32))
    assert np.isfinite(np.asarray(rew)).all()


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


def test_pallas_train_rollout_pool_reset():
    """reset_source='pool': episode-boundary restores must take EXACTLY the
    caller-provided pool rows, cycling slot (reset# % pool_slots) per env,
    with selected=-1/last_action=0 and base=pool step_count (the chain
    restore surface + the fast-config path for novelty-injected specs)."""
    from ngx.core.reset import make_reset
    from ngx.ops.pallas_rollout import make_pallas_train_rollout
    from ngx.rl.models import ActorCritic
    from ngx.transforms import lidar_in_front

    spec = lidar_in_front(
        ngx.inject_novelty(ngx.make_spec(POGO), "firewall", "easy"))
    B, T, R, CAP = 128, 15, 4, 5       # cap-dones land at t=4,9,14=T-1
    run = make_pallas_train_rollout(spec, B, T, block=128, cap=CAP,
                                    hidden=(16, 16), reset_source="pool",
                                    pool_slots=R, interpret=True)
    model = ActorCritic(n_actions=spec.n_actions, hidden=(16, 16))
    vreset = jax.jit(jax.vmap(make_reset(spec)))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))
    pool, _ = vreset(jax.random.split(jax.random.key(2), B * R))
    pool = jax.tree_util.tree_map(
        lambda x: x.reshape((B, R) + x.shape[1:]), pool)
    st2, obs_t, act, rew, done, base = jax.jit(
        lambda s, st, p, pl, b: run(s, st, p, pl, b))(
        7, state, params, pool, jnp.zeros((B,), jnp.int32))
    done = np.asarray(done)
    nd = done.sum(0)
    # every env hits the 5-step cap three times; the last restore is at the
    # final step, so the emitted final state IS the selected pool row
    assert (done[14]).all(), done[14]
    pm, pinv = np.asarray(pool.map), np.asarray(pool.inventory)
    for b in range(B):
        slot = (nd[b] - 1) % R
        np.testing.assert_array_equal(np.asarray(st2.map)[b], pm[b, slot])
        np.testing.assert_array_equal(np.asarray(st2.inventory)[b],
                                      pinv[b, slot])
        assert np.asarray(st2.agent)[b, 0] == np.asarray(
            pool.agent)[b, slot, 0]
        assert np.asarray(st2.facing)[b] == np.asarray(pool.facing)[b, slot]
        assert np.asarray(st2.selected)[b] == -1
        assert np.asarray(st2.last_action)[b] == 0
        assert np.asarray(base)[b] == np.asarray(pool.step_count)[b, slot]


def test_train_step_pallas_pool_novelty_spec():
    """make_train routes novelty-injected specs (reset edits) through the
    pool reset source automatically; a full train step completes with
    episode boundaries crossed."""
    from ngx.rl.train import PPOConfig, make_train

    spec = ngx.inject_novelty(ngx.make_spec(POGO), "fence", "medium", "oak")
    cfg = PPOConfig(num_envs=128, rollout_steps=12, num_minibatches=2,
                    epochs=1, hidden=(16, 16), episode_cap=8)
    init, train_step = make_train(cfg, spec_override=spec,
                                  rollout_backend="pallas")
    carry = init(jax.random.key(0))
    carry, metrics = jax.jit(train_step)(carry, jax.random.key(1))
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["pg_loss"]) and np.isfinite(m["v_loss"]), m
    assert m["episodes"] >= cfg.num_envs, m   # 8-step cap inside T=12
    carry, m2 = jax.jit(train_step)(carry, jax.random.key(2))
    assert np.isfinite(float(m2["pg_loss"]))


def test_train_step_pallas_pool_mesh():
    """The pool reset source under shard_map over an 8-device mesh: pool and
    base shard along the env axis with the state."""
    import numpy as _np
    from jax.sharding import Mesh
    from ngx.rl.train import PPOConfig, make_train

    spec = ngx.inject_novelty(ngx.make_spec(POGO), "firewall", "easy")
    mesh = Mesh(_np.asarray(jax.devices()[:8]), ("env",))
    cfg = PPOConfig(num_envs=8 * 128, rollout_steps=6, num_minibatches=2,
                    epochs=1, hidden=(16, 16), episode_cap=4)
    with mesh:
        init, train_step = make_train(cfg, mesh, spec_override=spec,
                                      rollout_backend="pallas")
        carry = init(jax.random.key(0))
        assert len(carry[1].map.sharding.device_set) == 8
        carry, metrics = jax.jit(train_step)(carry, jax.random.key(1))
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(m["pg_loss"]) and np.isfinite(m["v_loss"]), m
        assert m["episodes"] >= cfg.num_envs, m


def test_trainer_block_frontier():
    """The auto-picked trainer-kernel config must match the measured
    frontier in docs/PERF.md (a regression guard: these picks are measured
    preferences, and every config compiles since the scoped-VMEM fix)."""
    from ngx.rl.train import pick_trainer_block

    assert pick_trainer_block(8192, 64) == (256, 16)    # 5.62M measured
    assert pick_trainer_block(8192, 48) == (256, 16)    # chain shape
    assert pick_trainer_block(8192, 256) == (256, 64)   # 7.16M measured
    assert pick_trainer_block(8192, 40) == (256, 64)    # solver, 4.82M
    assert pick_trainer_block(8192, 16) == (256, 64)
    assert pick_trainer_block(128, 64) == (128, 64)     # non-256 batch
    assert pick_trainer_block(384, 64) == (128, 64)


def test_t_chunk_respects_block_shape_constraint():
    """Chunk sizes must be 8-divisible or the full T (Pallas trajectory
    out-block constraint, chip-verified at T=100): the kernel builder must
    pick a legal TC for every T."""
    from ngx.ops.pallas_rollout import make_pallas_train_rollout
    from ngx.transforms import lidar_in_front

    spec = lidar_in_front(ngx.make_spec(POGO))
    for T in (4, 15, 40, 48, 64, 100, 250, 256):
        run = make_pallas_train_rollout(spec, 128, T, block=128, t_chunk=64,
                                        interpret=True)
        assert run.obs_dim > 0   # built without assert failure


def test_pallas_train_rollout_pool_parity_through_resets():
    """FULL-horizon parity for the pool-reset trainer kernel: because pool
    restores are deterministic (slot k % R per env), the emitted trajectory
    can be replayed through the XLA step INCLUDING every episode boundary —
    a stronger guarantee than the native-reset parity test, which must stop
    comparing at the first reset (different reset RNG streams)."""
    from ngx.core.reset import make_reset
    from ngx.core.step import make_step
    from ngx.ops.pallas_rollout import make_pallas_train_rollout
    from ngx.rl.models import ActorCritic
    from ngx.transforms import lidar_in_front

    spec = lidar_in_front(ngx.make_spec(POGO))
    B, T, R, CAP = 128, 30, 4, 10
    run = make_pallas_train_rollout(spec, B, T, block=128, cap=CAP,
                                    hidden=(16, 16), reset_source="pool",
                                    pool_slots=R, interpret=True)
    model = ActorCritic(n_actions=spec.n_actions, hidden=(16, 16))
    vreset = jax.jit(jax.vmap(make_reset(spec)))
    state0, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))
    pool, _ = vreset(jax.random.split(jax.random.key(2), B * R))
    pool = jax.tree_util.tree_map(
        lambda x: x.reshape((B, R) + x.shape[1:]), pool)

    st2, obs_t, act, rew, done, base = jax.jit(
        lambda s, st, p, pl, b: run(s, st, p, pl, b))(
        7, state0, params, pool, jnp.zeros((B,), jnp.int32))
    obs_t, act, rew, done = (np.asarray(obs_t), np.asarray(act),
                             np.asarray(rew), np.asarray(done))

    # replay: same actions through the vmapped XLA step; at every done,
    # substitute the KNOWN pool row (slot = resets-so-far % R)
    v_step = jax.jit(jax.vmap(make_step(spec)))
    step1 = make_step(spec)
    get_obs_v = jax.jit(jax.vmap(step1.get_obs))
    state = state0
    nresets = np.zeros((B,), np.int64)
    base_ref = np.zeros((B,), np.int64)
    for t in range(T):
        np.testing.assert_array_equal(
            np.asarray(get_obs_v(state), np.float32), obs_t[t],
            err_msg=f"obs at t={t}")
        ns, _, r, d, _ = v_step(state, jnp.asarray(act[t]))
        np.testing.assert_allclose(np.asarray(r), rew[t],
                                   err_msg=f"reward t={t}")
        d = np.asarray(d) | (np.asarray(ns.step_count) - base_ref >= CAP)
        np.testing.assert_array_equal(d, done[t], err_msg=f"done t={t}")
        ns_np = jax.tree_util.tree_map(np.asarray, ns)
        leaves = {f: np.array(getattr(ns_np, f))
                  for f in ns_np.__dataclass_fields__}
        for b in np.nonzero(d)[0]:
            slot = nresets[b] % R
            for f in leaves:
                pv = np.asarray(getattr(pool, f))[b, slot]
                leaves[f][b] = pv
            leaves["selected"][b] = -1
            leaves["last_action"][b] = 0
            leaves["last_reward"][b] = 0.0
            leaves["last_cost"][b] = 0.0
            leaves["last_done"][b] = False
            base_ref[b] = leaves["step_count"][b]
            nresets[b] += 1
        from ngx.core.state import EnvState
        state = EnvState(**{f: jnp.asarray(v) for f, v in leaves.items()})
    assert nresets.sum() > 2 * B, nresets.sum()   # boundaries were crossed
    np.testing.assert_array_equal(base_ref, np.asarray(base))


def test_train_step_pallas_pool_stacked_novelties():
    """A STACKED novelty spec (axe-medium spawn-add + fence reset edit)
    through the fused trainer: the pool generator must reproduce the
    composed reset surface (extra spawn placements + percent fill) and the
    kernel must act on the grown item/action space."""
    from ngx.rl.train import PPOConfig, make_train

    spec = ngx.inject_novelty(
        ngx.inject_novelty(ngx.make_spec(POGO), "axe", "medium", "wooden"),
        "fence", "easy", "oak")
    cfg = PPOConfig(num_envs=128, rollout_steps=12, num_minibatches=2,
                    epochs=1, hidden=(16, 16), episode_cap=8)
    init, train_step = make_train(cfg, spec_override=spec,
                                  rollout_backend="pallas")
    carry = init(jax.random.key(0))
    carry, m = jax.jit(train_step)(carry, jax.random.key(1))
    assert np.isfinite(float(m["pg_loss"])), m
    assert float(m["episodes"]) >= cfg.num_envs
    # the wooden_axe spawn survives pool resets: some env should hold one
    # after auto-grab over a few rollouts
    axe = spec.items.index("wooden_axe")
    for i in range(3):
        carry, m = jax.jit(train_step)(carry, jax.random.fold_in(
            jax.random.key(2), i))
    maps_have_axe = (np.asarray(carry[1].map) == axe).any()
    inv_have_axe = (np.asarray(carry[1].inventory)[:, axe] > 0).any()
    assert maps_have_axe or inv_have_axe
