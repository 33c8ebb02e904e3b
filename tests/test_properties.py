"""Property tests over the step kernel (the automated-test layer the
reference lacks — SURVEY.md §4): conservation laws and invariants that must
hold for every env and any action sequence.  Each case collects a whole
random trajectory in ONE jitted scan and asserts on the stacked arrays."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ngx

ALL_ENVS = list(ngx.SPEC_BUILDERS)
_CACHE = {}


def collect(env_id, seed=0, T=150, B=32):
    """Stacked trajectory arrays: maps[T,B,H,W], agents[T,B,2], invs[T,B,I],
    selected[T,B], rewards[T,B], dones[T,B], costs[T,B] (no auto-reset, so
    conservation can be checked across consecutive steps)."""
    key = (env_id, seed, T, B)
    if key in _CACHE:
        return _CACHE[key]
    spec = ngx.make_spec(env_id)
    v_step = jax.vmap(ngx.make_step(spec))
    v_reset = jax.vmap(ngx.make_reset(spec))

    @jax.jit
    def run(k):
        state, _ = v_reset(jax.random.split(k, B))
        def body(st, kt):
            a = jax.random.randint(kt, (B,), 0, spec.n_actions)
            st2, _, r, d, info = v_step(st, a)
            return st2, (st2.map, st2.agent, st2.inventory, st2.selected,
                         r, d, info.step_cost)
        st0 = (state.map, state.agent, state.inventory)
        _, tr = jax.lax.scan(body, state,
                             jax.random.split(jax.random.fold_in(k, 1), T))
        return st0, tr

    st0, tr = run(jax.random.key(seed))
    H = spec.map_size
    st0 = (np.asarray(st0[0]).reshape(B, H, H),) + \
        tuple(np.asarray(x) for x in st0[1:])
    tr = (np.asarray(tr[0]).reshape(T, B, H, H),) + \
        tuple(np.asarray(x) for x in tr[1:])
    out = (spec, st0, tr)
    _CACHE[key] = out
    return out


@pytest.mark.parametrize("env_id", ALL_ENVS)
def test_wall_ring_invariant(env_id):
    """The wall ring can never be modified by any action."""
    spec, _, (maps, *_rest) = collect(env_id)
    wall = spec.items.index("wall")
    assert (maps[:, :, 0, :] == wall).all()
    assert (maps[:, :, -1, :] == wall).all()
    assert (maps[:, :, :, 0] == wall).all()
    assert (maps[:, :, :, -1] == wall).all()


@pytest.mark.parametrize("env_id", ["NovelGridworld-Pogostick-v1",
                                    "NovelGridworld-Bow-v0",
                                    "NovelGridworld-v5"])
def test_matter_conservation(env_id):
    """tree_log (a raw, non-craftable resource) can never be created: its
    map count + inventory count is non-increasing over any step."""
    spec, (m0, _, inv0), (maps, agents, invs, *_r) = collect(env_id, seed=1)
    tree = spec.items.index("tree_log")
    total0 = (m0 == tree).sum(axis=(1, 2)) + inv0[:, tree]
    totals = (maps == tree).sum(axis=(2, 3)) + invs[:, :, tree]
    prev = total0
    for t in range(totals.shape[0]):
        assert (totals[t] <= prev).all(), f"tree_log created at step {t}"
        prev = totals[t]


@pytest.mark.parametrize("env_id", ALL_ENVS)
def test_agent_in_bounds_on_air(env_id):
    spec, _, (maps, agents, *_r) = collect(env_id, seed=2)
    assert (agents >= 1).all() and (agents <= spec.map_size - 2).all()
    T, B = agents.shape[:2]
    vals = maps[np.arange(T)[:, None], np.arange(B)[None, :],
                agents[..., 0], agents[..., 1]]
    assert (vals == 0).all(), "agent standing on a non-air cell"


@pytest.mark.parametrize("env_id", ["NovelGridworld-Pogostick-v1",
                                    "NovelGridworld-Bow-v1"])
def test_done_implies_goal(env_id):
    """For modern envs, done ⇒ goal item in inventory and reward_done."""
    spec, _, (maps, agents, invs, sel, rewards, dones, costs) = \
        collect(env_id, seed=3)
    d = dones.astype(bool)
    if d.any():
        assert (invs[d][:, spec.goal_item] >= 1).all()
        assert (rewards[d] == spec.reward_done).all()


@pytest.mark.parametrize("env_id", ALL_ENVS)
def test_inventory_never_negative(env_id):
    _, _, (maps, agents, invs, *_r) = collect(env_id, seed=4)
    assert (invs >= 0).all()


def test_step_cost_nonnegative_and_bounded():
    _, _, (*_a, costs) = collect("NovelGridworld-Pogostick-v1", seed=5)
    assert (costs >= 0).all() and (costs <= 50000.0).all()


def test_selected_item_always_valid():
    spec, _, (maps, agents, invs, sel, *_r) = collect(
        "NovelGridworld-Pogostick-v1", seed=6)
    assert ((sel >= -1) & (sel < spec.n_items)).all()
