"""Procedural generation under ``jax.random`` — the native reset.

The reference reset rejection-samples placements from a mutating Python list on
the global NumPy RNG (``pogostick_v1_env.py:86-181``).  Picking uniformly
without replacement from a shrinking list is distribution-identical to walking
one uniform permutation of the interior cells, so the native reset draws a
single permutation and assigns items along it with a ``lax.scan`` — fixed
shapes, no while-loops, vmappable.  (Bit-exact replay of the reference's exact
NumPy draw sequence lives host-side in :mod:`ngx.core.mirror` for the
conformance harness.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import spec as S
from .state import EnvState
from ..utils import debug


def _interior_cells(H: int) -> np.ndarray:
    """Cells ≥2 away from the wall, row-major — pogostick_v1_env.py:136-138."""
    cells = [(r, c) for r in range(2, H - 2) for c in range(2, H - 2)]
    return np.asarray(cells, dtype=np.int32)


def make_reset(sp: S.EnvSpec):
    """Compile ``reset(key) -> (state, obs)`` for one spec."""
    H = sp.map_size
    I = sp.n_items
    wall = sp.items.index("wall") if "wall" in sp.items else 0
    tree = sp.items.index("tree_log") if "tree_log" in sp.items else -1
    tap = sp.items.index("tree_tap") if "tree_tap" in sp.items else -1

    # host numpy constants, embedded at trace time (avoids committing to a
    # device at build time — see the matching note in ngx/core/step.py)
    interior = _interior_cells(H)
    N = interior.shape[0]
    K = len(sp.spawn_items)
    spawn_items = np.asarray(sp.spawn_items, dtype=np.int32)
    spawn_qty = np.asarray(sp.spawn_qty, dtype=np.int32)

    base_map = np.zeros((H, H), dtype=np.int32)
    base_map[0, :] = wall
    base_map[-1, :] = wall
    base_map[:, 0] = wall
    base_map[:, -1] = wall
    base_map_j = base_map

    inv_lo = np.asarray(
        sp.start_inv_lo if sp.start_inv_lo is not None else np.zeros((I,), np.int32))
    inv_hi = np.asarray(
        sp.start_inv_hi if sp.start_inv_hi is not None else np.zeros((I,), np.int32))
    random_inv = sp.start_inv_hi is not None and bool(
        (np.asarray(sp.start_inv_hi) != np.asarray(
            sp.start_inv_lo if sp.start_inv_lo is not None else 0)).any())

    deltas = S.FACING_DELTAS

    from .step import make_step
    get_obs = make_step(sp).get_obs

    # Flat per-placement item list, e.g. [ct, tree, tree, tree, tree, tree]
    # in spawn-table order (reset places item-by-item in items_quantity
    # insertion order — pogostick_v1_env.py:147-148).
    placement_items = np.repeat(spawn_items, spawn_qty).astype(np.int32)

    # Interior mask [H, H]: cells eligible for placement (2-cell margin,
    # pogostick_v1_env.py:136-138).
    interior_mask = np.zeros((H, H), bool)
    interior_mask[2:H - 2, 2:H - 2] = True

    def _place_items(key, m, agent):
        """One uniform draw over the currently-valid cells per placement.

        Distribution-identical to the reference's pop-regardless rejection
        loop (pogostick_v1_env.py:159-181): during reset the map only gains
        items, so a cell that fails the cell+4-neighbors-air test can never
        pass it later — popping invalid cells early does not change the
        conditional distribution of later picks, which is always uniform over
        the valid set.  This form needs only K≈6 sequential units of fully
        vectorized work instead of a 36-step scan, which is what keeps
        per-step auto-reset cheap at an 8k batch.
        """
        if len(placement_items) == 0:
            return m
        rr = jnp.arange(H)[:, None]
        cc = jnp.arange(H)[None, :]
        not_agent = ~((rr == agent[0]) & (cc == agent[1]))
        imask = jnp.asarray(interior_mask)

        def free_mask(m):
            p = jnp.pad(m, 1, constant_values=1)  # borders are never free
            ctr = p[1:-1, 1:-1] == 0
            nb = ((p[:-2, 1:-1] == 0) & (p[2:, 1:-1] == 0)
                  & (p[1:-1, :-2] == 0) & (p[1:-1, 2:] == 0))
            return ctr & nb & not_agent & imask

        keys = jax.random.split(key, len(placement_items))
        for j, item in enumerate(placement_items):
            valid = free_mask(m).reshape(-1)
            logits = jnp.where(valid, 0.0, -jnp.inf)
            pick = jax.random.categorical(keys[j], logits)
            pr, pc = pick // H, pick % H
            # reference asserts placement succeeds ("increase map size!");
            # with a valid cell guaranteed at default sizes this is a no-op
            ok = jnp.any(valid)
            m = m.at[pr, pc].set(jnp.where(ok, int(item), m[pr, pc]))
        return m

    def reset(key) -> EnvState:
        k_agent, k_face, k_items, k_inv, k_coin, k_tap, k_edits = \
            jax.random.split(key, 7)

        agent_idx = jax.random.randint(k_agent, (), 0, N)
        agent = jnp.asarray(interior)[agent_idx]
        facing = jax.random.randint(k_face, (), 0, 4)

        m = _place_items(k_items, jnp.asarray(base_map_j), agent)

        # starting inventory (fixed + uniform ranges, novel_gridworld_v3_env.py:45-47)
        if random_inv:
            inv = jax.random.randint(k_inv, (I,), jnp.asarray(inv_lo),
                                     jnp.asarray(inv_hi) + 1)
        else:
            inv = jnp.asarray(inv_lo)

        # v3: 50% chance of a wall in front of the agent (v3:148-152)
        if sp.reset_wall_coin:
            d = jnp.asarray(deltas)[facing]
            fr, fc = agent[0] + d[0], agent[1] + d[1]
            coin = jax.random.bernoulli(k_coin, 0.5)
            m = m.at[fr, fc].set(
                jnp.where(coin & (m[fr, fc] == 0), wall, m[fr, fc]))

        # Pogostick-v0: pre-place one tree_tap next to a random tree
        # (pogostick_v0_env.py:155-178) — uniform over valid (tree, direction)
        # pairs, matching the retry loop's conditional distribution.
        if sp.reset_place_tap:
            is_tree = m == tree
            cand_valid = []
            cand_pos = []
            for d in np.asarray(S.FACING_DELTAS):
                tr = jnp.roll(is_tree, shift=(int(d[0]), int(d[1])), axis=(0, 1))
                # rolled: True at the would-be tap cell; mask wrapped edges
                edge = np.ones((H, H), bool)
                if d[0] == -1:
                    edge[-1, :] = False
                if d[0] == 1:
                    edge[0, :] = False
                if d[1] == -1:
                    edge[:, -1] = False
                if d[1] == 1:
                    edge[:, 0] = False
                cand_valid.append(tr & jnp.asarray(edge))
                cand_pos.append(True)
            valid = jnp.stack(cand_valid)            # [4, H, W] — tap target cells
            rr = jnp.arange(H)[None, :, None]
            cc = jnp.arange(H)[None, None, :]
            is_air = (m == 0)[None]
            not_agent = ~((rr == agent[0]) & (cc == agent[1]))
            valid = valid & is_air & not_agent
            flat = valid.reshape(-1)
            logits = jnp.where(flat, 0.0, -jnp.inf)
            pick = jax.random.categorical(k_tap, logits)
            pr = (pick % (H * H)) // H
            pc = pick % H
            any_valid = jnp.any(flat)
            m = m.at[pr, pc].set(jnp.where(any_valid, tap, m[pr, pc]))

        # novelty reset transforms, in injection order (inner wrapper first)
        for j, edit in enumerate(sp.reset_edits):
            k_edit = jax.random.fold_in(k_edits, j)
            if edit[0] == "fence":
                _, fence_id, lo, hi = edit
                m = _percent_fill_fence(k_edit, m, agent, fence_id, lo, hi,
                                        wall, H)
            elif edit[0] == "additem":
                _, item_id, lo, hi = edit
                m = _percent_place(k_edit, m, agent, m == 0, item_id, lo, hi)
            else:
                _, from_id, to_id, lo, hi = edit
                m = _percent_place(k_edit, m, agent, m == from_id, to_id,
                                   lo, hi)

        if sp.reset_inv_set is not None:
            setv = jnp.asarray(sp.reset_inv_set, dtype=jnp.int32)
            inv = jnp.where(setv >= 0, setv, inv)

        state = EnvState(
            # generation works on the [H, H] view; EnvState stores the map
            # flat (see ngx.core.state) — the reshape is layout-free
            map=m.reshape(-1),
            agent=agent,
            facing=facing,
            inventory=inv.astype(jnp.int32),
            selected=jnp.int32(-1),
            step_count=jnp.int32(0),
            last_action=jnp.int32(0),
            last_reward=jnp.float32(0.0),
            last_cost=jnp.float32(0.0),
            last_done=jnp.asarray(False),
        )
        return state, get_obs(state)

    if debug.enabled():
        inner_reset = reset

        def reset(key) -> EnvState:  # noqa: F811 — debug wrapper
            state, obs = inner_reset(key)
            debug.kernel_asserts(sp, state, "reset")
            return state, obs

    return reset


import functools


@functools.lru_cache(maxsize=None)
def ceil_percent_pairs(max_count: int):
    """(count, p) pairs in [0, max_count] x [1, 100) where the reference's
    f64 ``int(np.ceil(count * (p / 100)))`` (novelty_wrappers.py:881,1025,
    1139) EXCEEDS the exact integer ceil(count*p/100): the f64 value of
    p/100 rounds the product just above an exact multiple (e.g. 25 * 0.28 ->
    7.000000000000001 -> ceil 8, exact 7).  Both resets add +1 on these
    pairs so the drawn fill count replays the reference bit-for-bit (an f32
    reimplementation diverges in 29/9900 cases, in both directions)."""
    pairs = []
    for count in range(max_count + 1):
        for p in range(1, 100):
            if int(np.ceil(count * (p / 100))) != (count * p + 99) // 100:
                pairs.append((count, p))
    return tuple(pairs)


def _ceil_percent(count, p, max_count: int):
    """ceil-percent with the reference's f64 rounding, as exact int32 ops."""
    n = (count * p + 99) // 100
    for c_, p_ in ceil_percent_pairs(max_count):
        n = n + jnp.where((count == c_) & (p == p_), 1, 0)
    return n


def _percent_place(key, m, agent, eligible, item_id, lo, hi):
    """Place ``item_id`` on ceil(count(eligible) * p%) eligible cells, p ~
    U[lo, hi); agent cell skipped but still consumes a slot
    (novelty_wrappers.py:1013-1034, 1126-1148)."""
    k_p, k_shuf = jax.random.split(key)
    p = jax.random.randint(k_p, (), lo, hi)
    count = jnp.sum(eligible)
    n = _ceil_percent(count, p, m.size)
    scores = jnp.where(eligible, jax.random.uniform(k_shuf, m.shape), jnp.inf)
    order = jnp.argsort(scores.reshape(-1))
    rank = jnp.zeros((m.size,), jnp.int32).at[order].set(jnp.arange(m.size))
    rank = rank.reshape(m.shape)
    H = m.shape[0]
    rr = jnp.arange(H)[:, None]
    cc = jnp.arange(H)[None, :]
    not_agent = ~((rr == agent[0]) & (cc == agent[1]))
    sel = eligible & (rank < n) & not_agent
    return jnp.where(sel, item_id, m)


def _percent_fill_fence(key, m, agent, fence_id, lo, hi, wall, H):
    """Fence p% of the non-air non-wall cells with a 3x3 air-fill around each
    (novelty_wrappers.py:868-889).  Order-independent: the final map is the
    union of the selected 3x3 neighborhoods written onto air cells."""
    k_p, k_shuf = jax.random.split(key)
    eligible = (m != 0) & (m != wall)
    p = jax.random.randint(k_p, (), lo, hi)
    count = jnp.sum(eligible)
    n = _ceil_percent(count, p, m.size)
    scores = jnp.where(eligible, jax.random.uniform(k_shuf, m.shape), jnp.inf)
    order = jnp.argsort(scores.reshape(-1))
    rank = jnp.zeros((m.size,), jnp.int32).at[order].set(jnp.arange(m.size))
    centers = eligible & (rank.reshape(m.shape) < n)
    # dilate 3x3
    cp = jnp.pad(centers, 1)
    dil = jnp.zeros_like(centers)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            dil = dil | cp[1 + dr:1 + dr + H, 1 + dc:1 + dc + H]
    rr = jnp.arange(H)[:, None]
    cc = jnp.arange(H)[None, :]
    not_agent = ~((rr == agent[0]) & (cc == agent[1]))
    sel = dil & (m == 0) & not_agent
    return jnp.where(sel, fence_id, m)
