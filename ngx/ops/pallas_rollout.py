"""Whole-rollout Pallas kernel: T env steps with block state resident in VMEM.

The ``lax.scan`` rollout (ngx/vector) materializes the carried ``EnvState``
through HBM on every step — ~2T full-state round-trips per rollout.  This
kernel instead grids over env blocks and runs the ENTIRE T-step rollout for a
block inside one Pallas program: the state lives in VMEM scratch for all T
steps, actions come from an on-core counter-hash RNG, and HBM sees exactly
one state write per block at the end.

Semantic parity is structural, not re-implemented: the per-step dynamics are
``jax.vmap(ngx.core.step.make_step(spec, with_obs=False))`` traced *inside*
the kernel — the same masked-arithmetic step the conformance suites verify
bit-exactly against the reference (pogostick_v1_env.py:230-367 etc.).  Only
reset is hand-written here (uniform-over-valid-cells placement via
max-of-uniforms; distribution-identical to the reference's rejection loop —
see ngx/core/reset.py's proof), because `jax.random` keys don't exist inside
Mosaic.  Auto-reset semantics match ngx.vector.make_vec: a done env's carried
state is a fresh reset draw under a `lax.cond`.

Measured results (v5e, Pogostick-v1, T=256 — full tables in docs/PERF.md):

* ``action_source='prng'`` (random-action env stepping): ~25M env-steps/s —
  correct, but ~3x SLOWER than the jit(vmap(step)) lax.scan path (~85M).
  The step kernel is VPU-compute-bound, not HBM-bound (state traffic is
  ~8.5us/step vs ~96us compute at this batch), so eliminating the scan's HBM
  round-trips buys <10% while Mosaic's codegen for this mask-heavy int32
  workload loses to XLA's fusion autotuning.  The XLA path stays the
  default/bench path for that workload.
* ``action_source='policy'`` (the fused policy+env acting loop: in-kernel
  LidarInFront obs + MLP actor on the MXU + Gumbel sampling + step +
  auto-reset): **7.5-8.1M steps/s vs 0.49M for the un-fused XLA scan — a
  15-16x win**, because the un-fused acting loop pays per-step HBM round
  trips of the whole state plus gather-based lidar and tiny-matmul launches
  that fusion eliminates.  This is the backend's reason to exist.

Mosaic port pitfalls this file documents executable workarounds for: no i1
rank expansion, no multi-leaf vector loop carries, no lane rotates of
non-128-multiple vectors (hence the ADJ matmul), no uint->float converts, no
gathers (hence one-hot map reads and the facing-permutation lidar).

Reset coverage (round 4): the in-kernel reset implements the full
procedural-generation surface — plain placements, the v3 wall-coin, the
Pogostick-v0 tap pre-placement, and the novelty percent-fill edits
(fence/additem/replaceitem) via an exact integer-bisection uniform-subset
selection — so every preset and every novelty-injected spec runs the fused
path (`supports_pallas_rollout` is always True).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import spec as S
from ..core.state import EnvState
from ..core.step import make_step

# v5e has 128MiB of VMEM per core; Mosaic's default SCOPED-vmem check caps a
# kernel at 16MiB, and exceeding it is what round 4 misread as a "Mosaic
# compile cliff" (the remote compile helper surfaces the OOM as a bare
# HTTP 500 — docs/MOSAIC_BUGS.md).  Raising the limit legitimizes the
# larger configs (block 256 with pool inputs, block 512); 96MiB leaves
# headroom for the pipeline's double buffers.
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params():
    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams")
    return cp(vmem_limit_bytes=_VMEM_LIMIT)


def supports_pallas_rollout(sp) -> bool:
    """The Pallas fast path covers EVERY spec since round 4: the in-kernel
    reset implements the plain procedural generation, the v3 wall-coin
    (novel_gridworld_v3_env.py:148-152), the Pogostick-v0 tap pre-placement
    (pogostick_v0_env.py:155-178) AND the novelty percent-fill reset edits
    (fence 3x3 dilate / additem / replaceitem,
    novelty_wrappers.py:868-889,1013-1034,1126-1148) — so training under
    injected novelty (the reference's central scenario, tests/train.py:73-89)
    rides the fused kernel too.  Kept as a function for API stability."""
    return True


# packed int32 scalar-register columns (one row per env)
_R, _C, _FACE, _SEL, _CNT, _LACT, _LDONE, _PAD = range(8)
# trainer kernel only: 9th column = step_count at the last restore (the
# episode budget counts from the restore — pool-restored states inherit the
# chain's step_count, reference novel_gridworld_v2_env.py:87-97)
_BASE = 8
_NIR = 9          # int-reg columns in the trainer kernel


# ---- stateless counter-based RNG (shared by all kernels) -------------------
# A murmur3-finalizer hash over (seed, step counter, call-site salt, lane)
# instead of the pltpu hardware PRNG: pure uint32 jnp ops, so the same kernel
# runs bit-identically under interpret mode on CPU (where ``pltpu.prng_seed``
# has no lowering) and compiled on TPU.  Statistical quality (two avalanche
# rounds) is ample for uniform cell picks and random actions.
_GOLD = np.uint32(0x9E3779B1)


def _mix(x):
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _bits(seed, ctr, salt, shape):
    salt_c = np.uint32((int(salt) * 0x85EBCA77) & 0xFFFFFFFF)
    # scalar int32 -> uint32: same-width convert (tpu.bitcast needs vectors)
    seed_u = seed.astype(jnp.uint32)
    ctr_u = ctr.astype(jnp.uint32)
    base = _mix(seed_u * _GOLD ^ ctr_u * np.uint32(0x632BE59B) ^ salt_c)
    lane = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            * np.uint32(0x01000193)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
            * np.uint32(0x9E3779B9))
    return _mix(_mix(lane ^ base))


def _i32(x):
    # Mosaic has no uint32->{int32,float32} convert; a bitcast is exact
    # here because callers pre-shift the value under 2^31.
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _u01(seed, ctr, salt, shape):
    # 24-bit mantissa uniforms in [0, 1)
    return (_i32(_bits(seed, ctr, salt, shape) >> 8).astype(jnp.float32)
            * np.float32(2.0 ** -24))


def _randint(seed, ctr, salt, shape, n):
    # top-31-bits modulo; bias < 2^-27 for n <= 64
    return _i32(_bits(seed, ctr, salt, shape) >> 1) % n


def _build_lidar_tables(sp):
    """Host tables for the in-kernel LidarInFront observation.

    The 8 full-circle beams sweep the SAME compass directions for every
    facing (linspace(rad-pi, rad+pi) mod 2pi is facing-invariant,
    observation_wrappers.py:42) — facing only permutes which direction lands
    in which beam slot.  So the kernel computes 8 per-direction first-hits
    once and applies a static per-facing column permutation.
    """
    from .rays import beam_offsets
    assert sp.obs_mode == S.OBS_LIDAR_FRONT, \
        "policy rollout needs a lidar_in_front spec"
    I = sp.n_items
    NB, K = sp.lidar_num_beams, sp.lidar_max_range
    _tb = beam_offsets(NB, K, full_circle=True)        # [4, NB, K, 2]
    PERM = np.zeros((4, NB), np.int64)
    for _f in range(4):
        for _b in range(NB):
            _m = [d for d in range(NB)
                  if np.array_equal(_tb[_f, _b], _tb[0, d])]
            assert _m, "beam/direction decomposition failed"
            PERM[_f, _b] = _m[0]
    DIRS = _tb[0]                                      # [NB, K, 2]
    _sorted = sorted(sp.lidar_items)
    N_SLOTS = len(_sorted)
    SLOT_OF_ITEM = np.full((I,), -1, np.int64)
    for _i, _n in enumerate(sp.items):
        if _n in _sorted:
            SLOT_OF_ITEM[_i] = _sorted.index(_n)
    KEEP = [i for _, i in sorted((n, i) for i, n in enumerate(sp.items))
            if not sp.unbreakable[i]]
    OBS_DIM = NB * N_SLOTS + len(KEEP)
    return dict(NB=NB, K=K, DIRS=DIRS, PERM=PERM, SLOT_OF_ITEM=SLOT_OF_ITEM,
                KEEP=KEEP, N_SLOTS=N_SLOTS, OBS_DIM=OBS_DIM)


def _make_reset_block(sp, TB):
    """Build the in-kernel block reset (native-mode distribution; see
    ngx/core/reset.py's distribution-equivalence argument).  All host
    constants become hoisted jaxpr consts of the returned function."""
    H, I = sp.map_size, sp.n_items
    HW = H * H
    wall = sp.items.index("wall") if "wall" in sp.items else 0
    base = np.zeros((H, H), np.int32)
    base[0, :] = base[-1, :] = base[:, 0] = base[:, -1] = wall
    BASE_FLAT = base.reshape(-1)

    interior = np.zeros((H, H), bool)
    interior[2:H - 2, 2:H - 2] = True
    INTERIOR_FLAT = interior.reshape(-1).astype(np.int32)  # bool consts load
    # as i8 in Mosaic and the i8->i1 trunc has no lowering; compare in-kernel
    INTERIOR_IDS = np.nonzero(interior.reshape(-1))[0].astype(np.int32)  # [N]
    N = INTERIOR_IDS.shape[0]

    PLACEMENTS = np.repeat(np.asarray(sp.spawn_items, np.int32),
                           np.asarray(sp.spawn_qty, np.int32))

    inv_lo = np.asarray(sp.start_inv_lo if sp.start_inv_lo is not None
                        else np.zeros((I,), np.int32), np.int32)
    inv_hi = np.asarray(sp.start_inv_hi if sp.start_inv_hi is not None
                        else inv_lo, np.int32)
    RANDOM_INV = bool((inv_hi != inv_lo).any())
    INV_SET = (np.asarray(sp.reset_inv_set, np.int32)
               if sp.reset_inv_set is not None else None)

    IOTA_HW = np.arange(HW, dtype=np.int32)
    IOTA_N = np.arange(N, dtype=np.int32)

    # 4-neighbor adjacency over the flat map, as a matmul operand: Mosaic
    # cannot lane-rotate a 100-wide vector (jnp.roll crashes the backend), so
    # the placement free-test counts air neighbors with one tiny MXU matmul
    # air[TB,HW] @ ADJ[HW,HW] instead.
    ADJ = np.zeros((HW, HW), np.float32)
    for _r in range(H):
        for _c in range(H):
            _i = _r * H + _c
            for _rr, _cc in ((_r - 1, _c), (_r + 1, _c),
                             (_r, _c - 1), (_r, _c + 1)):
                if 0 <= _rr < H and 0 <= _cc < H:
                    ADJ[_rr * H + _cc, _i] = 1.0

    # 3x3-neighborhood (incl. center) operand for the fence dilation
    # (add_fence_around fills the 3x3 block, pogostick_v1_env.py:524-536) —
    # built lazily only for specs with a fence edit.
    def _adj9():
        A9 = np.zeros((HW, HW), np.float32)
        for _r in range(H):
            for _c in range(H):
                _i = _r * H + _c
                for _dr in (-1, 0, 1):
                    for _dc in (-1, 0, 1):
                        _rr, _cc = _r + _dr, _c + _dc
                        if 0 <= _rr < H and 0 <= _cc < H:
                            A9[_rr * H + _cc, _i] = 1.0
        return A9

    # directional shift operands for the tap pre-placement: SHIFT[d][i, j]=1
    # where j = i + delta_d (in-bounds) — tree_f @ SHIFT[d] is True at the
    # would-be tap cell one step in direction d from a tree.
    def _shift_mats():
        mats = []
        for _d in np.asarray(S.FACING_DELTAS):
            M9 = np.zeros((HW, HW), np.float32)
            for _r in range(H):
                for _c in range(H):
                    _rr, _cc = _r + int(_d[0]), _c + int(_d[1])
                    if 0 <= _rr < H and 0 <= _cc < H:
                        M9[_r * H + _c, _rr * H + _cc] = 1.0
            mats.append(M9)
        return mats

    # score layout for the subset selection: top bits uniform, low bits the
    # lane index as a tie-break — distinct within a row by construction.
    # Lane width scales with the map (map_size 10 -> 8 bits; reset(map_size=
    # 20) -> HW=400 needs 9); total stays <= 30 bits so the bisection bound
    # fits int32.
    LANE_BITS = max(8, (HW - 1).bit_length())
    U_BITS = 30 - LANE_BITS
    assert U_BITS >= 12, f"map too large for the subset selector (HW={HW})"

    def _select_n_uniform(valid, n, seed, ctr, salt):
        """Boolean [TB, HW] mask of EXACTLY min(n, count(valid)) cells per
        row, drawn uniformly without replacement among that row's valid
        cells (``n``: int32 [TB, 1]).

        Selecting the n smallest of iid uniform scores over the valid set is
        a uniform n-subset.  Mosaic has no argsort, so the rank cut is found
        by exact INTEGER bisection on the score threshold: scores are U_BITS
        uniform bits concatenated with the LANE_BITS lane index (distinct
        within a row by construction), and 30 halvings of the [0, 2^30)
        interval pin the unique threshold with count(valid & s < t) == n."""
        bits = _bits(seed, ctr, salt, (TB, HW))
        lane = jax.lax.broadcasted_iota(jnp.int32, (TB, HW), 1)
        s = _i32((bits >> np.uint32(32 - U_BITS))
                 << np.uint32(LANE_BITS)) | lane
        count = jnp.sum(jnp.where(valid, 1, 0), axis=1, keepdims=True)
        n = jnp.minimum(n, count)
        lo = jnp.zeros((TB, 1), jnp.int32)
        hi = jnp.full((TB, 1), 1 << 30, jnp.int32)
        for _ in range(30):   # static unroll — no vector loop carries
            mid = (lo + hi) // 2
            c = jnp.sum(jnp.where(valid & (s < mid), 1, 0), axis=1,
                        keepdims=True)
            go_up = c < n
            lo = jnp.where(go_up, mid, lo)
            hi = jnp.where(go_up, hi, mid)
        return valid & (s < hi) & (n > 0)

    def _pick_uniform_valid(valid, seed, ctr, salt):
        """One-hot [TB, HW] of a uniform pick among each row's valid cells
        (empty row -> all-false).  max-of-iid-uniforms == uniform pick; the
        min-index tie-break avoids relying on argmax lowering in Mosaic."""
        u = _u01(seed, ctr, salt, (TB, HW))
        score = jnp.where(valid, u, -1.0)
        mx = jnp.max(score, axis=1, keepdims=True)
        cand = (score >= mx) & valid
        pick = jnp.min(jnp.where(cand, jnp.asarray(IOTA_HW)[None, :], HW),
                       axis=1)
        return (jnp.asarray(IOTA_HW)[None, :] == pick[:, None])

    tree = sp.items.index("tree_log") if "tree_log" in sp.items else -1
    tap = sp.items.index("tree_tap") if "tree_tap" in sp.items else -1
    DELTAS = np.asarray(S.FACING_DELTAS)

    def _reset_block(seed, ctr) -> EnvState:
        # agent cell: uniform over the 2-margin interior (reset draw 1-2,
        # pogostick_v1_env.py:141-145)
        aidx = _randint(seed, ctr, 2, (TB, 1), N)[:, 0]        # [TB]
        oh_a = jnp.asarray(IOTA_N)[None, :] == aidx[:, None]   # [TB, N]
        acell = jnp.sum(jnp.where(oh_a, jnp.asarray(INTERIOR_IDS)[None, :], 0),
                        axis=1)
        facing = _randint(seed, ctr, 3, (TB, 1), 4)[:, 0]

        m = jnp.broadcast_to(jnp.asarray(BASE_FLAT)[None, :], (TB, HW))
        not_agent = jnp.asarray(IOTA_HW)[None, :] != acell[:, None]
        imask = jnp.asarray(INTERIOR_FLAT)[None, :] > 0
        for j, item in enumerate(PLACEMENTS.tolist()):
            air = m == 0
            # cell + all 4 neighbors air (pogostick_v1_env.py:171-173):
            # count air neighbors via the ADJ matmul; every interior cell has
            # exactly 4 in-bounds neighbors, so == 4 means all-air
            air_f = jnp.where(air, 1.0, 0.0)
            nb4 = jnp.dot(air_f, jnp.asarray(ADJ),
                          preferred_element_type=jnp.float32) >= 3.5
            valid = air & nb4 & imask & not_agent
            oh = _pick_uniform_valid(valid, seed, ctr, 16 + j)
            m = jnp.where(oh, jnp.int32(item), m)

        # v3: 50% chance of a wall in front of the agent, only onto air
        # (novel_gridworld_v3_env.py:148-152).  Per-facing delta via 4-term
        # one-hot sum (no gathers in Mosaic); the agent sits >= 2 cells from
        # the border, so the front cell is always in-bounds.
        if sp.reset_wall_coin:
            dr = sum(jnp.where(facing == f, int(DELTAS[f, 0]), 0)
                     for f in range(4))
            dc = sum(jnp.where(facing == f, int(DELTAS[f, 1]), 0)
                     for f in range(4))
            fcell = acell + dr * H + dc
            oh_f = jnp.asarray(IOTA_HW)[None, :] == fcell[:, None]
            front_val = jnp.sum(jnp.where(oh_f, m, 0), axis=1)
            # top bit as the coin; _i32 bitcast (Mosaic has no uint->int
            # convert), exact because the value is 0/1
            coin = _i32(_bits(seed, ctr, 40, (TB, 1))
                        >> np.uint32(31))[:, 0] > 0
            place = coin & (front_val == 0)
            m = jnp.where(oh_f & place[:, None], jnp.int32(wall), m)

        # Pogostick-v0: one tree_tap pre-placed next to a random tree
        # (pogostick_v0_env.py:155-178) — uniform over valid (tree,
        # direction) pairs (a cell adjacent to k trees carries weight k),
        # exactly the XLA reset's categorical over the [4, H, W] stack.
        if sp.reset_place_tap:
            tree_f = jnp.where(m == tree, 1.0, 0.0)
            air_row = m == 0
            # per-direction f32 score planes (Mosaic cannot concat i1
            # vectors, so validity rides as score=-1), concatenated into one
            # [TB, 4*HW] categorical over (cell, direction) pairs — a cell
            # adjacent to k trees carries weight k, like the XLA reset
            scores = []
            for d, SH in enumerate(_shift_mats()):
                tap_here = jnp.dot(tree_f, jnp.asarray(SH),
                                   preferred_element_type=jnp.float32) > 0.5
                valid_d = tap_here & air_row & not_agent
                u = _u01(seed, ctr, 41 + d, (TB, HW))
                scores.append(jnp.where(valid_d, u, -1.0))
            score = jnp.concatenate(scores, axis=1)        # f32 [TB, 4*HW]
            mx = jnp.max(score, axis=1, keepdims=True)
            cand = (score >= mx) & (score >= 0.0)
            iota4 = jax.lax.broadcasted_iota(jnp.int32, (TB, 4 * HW), 1)
            pick = jnp.min(jnp.where(cand, iota4, 4 * HW), axis=1)
            cell = pick % HW
            any_valid = mx[:, 0] >= 0.0
            oh_t = jnp.asarray(IOTA_HW)[None, :] == cell[:, None]
            m = jnp.where(oh_t & any_valid[:, None], jnp.int32(tap), m)

        # novelty percent-fill reset edits, in injection order
        # (novelty_wrappers.py:868-889, 1013-1034, 1126-1148; same
        # eligibility/agent-slot semantics as ngx.core.reset, incl. the
        # reference's f64 ceil-percent rounding via the correction pairs)
        if sp.reset_edits:
            from ..core.reset import ceil_percent_pairs
            CPAIRS = ceil_percent_pairs(HW)

            def _n_fill(eligible, p):
                count = jnp.sum(jnp.where(eligible, 1, 0), axis=1,
                                keepdims=True)
                n = (count * p + 99) // 100
                for c_, p_ in CPAIRS:
                    n = n + jnp.where((count == c_) & (p == p_), 1, 0)
                return n

        for j, edit in enumerate(sp.reset_edits):
            salt = 100 + 4 * j
            p_lo, p_hi = int(edit[-2]), int(edit[-1])
            p = _randint(seed, ctr, salt, (TB, 1), p_hi - p_lo) + p_lo
            if edit[0] == "fence":
                _, fence_id, _, _ = edit
                eligible = (m != 0) & (m != wall)
                centers = _select_n_uniform(eligible, _n_fill(eligible, p),
                                            seed, ctr, salt + 1)
                cf = jnp.where(centers, 1.0, 0.0)
                dil = jnp.dot(cf, jnp.asarray(_adj9()),
                              preferred_element_type=jnp.float32) > 0.5
                sel = dil & (m == 0) & not_agent
                m = jnp.where(sel, jnp.int32(fence_id), m)
            else:
                if edit[0] == "additem":
                    _, to_id, _, _ = edit
                    eligible = m == 0
                else:                      # replace
                    _, from_id, to_id, _, _ = edit
                    eligible = m == from_id
                sel = _select_n_uniform(eligible, _n_fill(eligible, p),
                                        seed, ctr, salt + 1)
                m = jnp.where(sel & not_agent, jnp.int32(to_id), m)

        if RANDOM_INV:
            span = jnp.asarray((inv_hi - inv_lo + 1)[None, :])
            inv = jnp.asarray(inv_lo)[None, :] + \
                _i32(_bits(seed, ctr, 4, (TB, I)) >> 1) % span
        else:
            inv = jnp.broadcast_to(jnp.asarray(inv_lo)[None, :], (TB, I))
        if INV_SET is not None:
            setv = jnp.asarray(INV_SET)[None, :]
            inv = jnp.where(setv >= 0, setv, inv)

        zi = jnp.zeros((TB,), jnp.int32)
        return EnvState(
            map=m.astype(jnp.int32),
            agent=jnp.stack([acell // H, acell % H], axis=-1),
            facing=facing,
            inventory=inv.astype(jnp.int32),
            selected=zi - 1,
            step_count=zi,
            last_action=zi,
            last_reward=jnp.zeros((TB,), jnp.float32),
            last_cost=jnp.zeros((TB,), jnp.float32),
            # carried as int32 inside the kernel: a bool loop-carry leaf
            # lowers as i8 and Mosaic has no i8->i1 trunc for the merge select
            last_done=jnp.zeros((TB,), jnp.int32),
        )

    return _reset_block


def make_xla_pool_reset(sp, n: int):
    """The in-kernel reset math as a plain-XLA batched generator:
    ``gen(seed[, ctr]) -> EnvState[n]`` (flat-map layout, int32 last_done).

    Used to fill the trainer's reset POOL (``reset_source='pool'``): the
    conformance-anchored ``ngx.core.reset.make_reset`` costs ~30ms per
    8k x 4 pool on the chip (vmapped scatters: per-placement ``.at[].set``
    and the percent-fill rank scatter serialize badly on TPU), while this
    form is scatter-free — one-hot where-writes, matmul adjacency, integer-
    bisection subset selection — and runs in ~1ms at the same batch.  Same
    distribution as the reference reset (see _make_reset_block /
    ngx/core/reset.py's equivalence argument), same counter-RNG streams as
    the kernel's native resets."""
    rb = _make_reset_block(sp, n)

    def gen(seed, ctr=0):
        return rb(jnp.asarray(seed, jnp.int32), jnp.asarray(ctr, jnp.int32))

    return gen


def _make_lidar_obs_fn(sp, tab, TB):
    """LidarInFront obs [TB, OBS_DIM] f32, Mosaic-lowerable: one-hot map
    reads (no gathers), static permutations, column stacks.  Same probe
    sequence/rounding as ngx.ops.rays.make_lidar_fn."""
    H, I = sp.map_size, sp.n_items
    HW = H * H
    NB, K = tab["NB"], tab["K"]
    DIRS, PERM = tab["DIRS"], tab["PERM"]
    SLOT_OF_ITEM, KEEP, N_SLOTS = (tab["SLOT_OF_ITEM"], tab["KEEP"],
                                   tab["N_SLOTS"])
    IOTA_HW = np.arange(HW, dtype=np.int32)

    def _lidar_front_obs(st):
        m, r, c, f = st.map, st.agent[:, 0], st.agent[:, 1], st.facing
        iota_hw = jnp.asarray(IOTA_HW)[None, :]
        dist_d, hv_d = [], []
        for d in range(NB):
            found = jnp.zeros((TB,), jnp.int32)
            dist = jnp.zeros((TB,), jnp.int32)
            hv = jnp.zeros((TB,), jnp.int32)
            for k in range(K):
                dr, dc = int(DIRS[d, k, 0]), int(DIRS[d, k, 1])
                rr = jnp.clip(r + dr, 0, H - 1)
                cc = jnp.clip(c + dc, 0, H - 1)
                p = rr * H + cc
                v = jnp.sum(jnp.where(iota_hw == p[:, None], m, 0), axis=1)
                new = (found == 0) & (v != 0)
                dist = jnp.where(new, k + 1, dist)
                hv = jnp.where(new, v, hv)
                found = jnp.where(new, 1, found)
            dist_d.append(dist)
            hv_d.append(hv)
        dist_dir = jnp.stack(dist_d, axis=1)           # [TB, NB]
        hv_dir = jnp.stack(hv_d, axis=1)
        fb_dist = jnp.zeros((TB, NB), jnp.int32)
        fb_hv = jnp.zeros((TB, NB), jnp.int32)
        for fc_ in range(4):                           # static beam perm
            sel = jnp.where(f == fc_, 1, 0)[:, None]
            pd_ = jnp.stack([dist_dir[:, int(PERM[fc_, b])]
                             for b in range(NB)], axis=1)
            ph_ = jnp.stack([hv_dir[:, int(PERM[fc_, b])]
                             for b in range(NB)], axis=1)
            fb_dist = fb_dist + sel * pd_
            fb_hv = fb_hv + sel * ph_
        slot = jnp.full((TB, NB), -1, jnp.int32)
        for i in range(I):                             # tiny item table
            if SLOT_OF_ITEM[i] >= 0:
                slot = jnp.where(fb_hv == i,
                                 jnp.int32(SLOT_OF_ITEM[i]), slot)
        cols = []
        for b in range(NB):
            for s_ in range(N_SLOTS):
                cols.append(jnp.where(
                    (fb_dist[:, b] > 0) & (slot[:, b] == s_),
                    fb_dist[:, b], 0))
        for i in KEEP:
            cols.append(st.inventory[:, i])
        return jnp.stack(cols, axis=1).astype(jnp.float32)

    return _lidar_front_obs


def make_pallas_rollout(sp, batch: int, steps: int, block: int = 512,
                        action_source: str = "prng", interpret: bool = False,
                        policy_params=None):
    """Build ``run(seed[, actions]) -> (EnvState[batch], mean_reward, n_done)``.

    ``action_source='prng'``: uniform-random actions drawn on-core (bench
    mode, zero HBM traffic).  ``action_source='input'``: the caller passes
    ``actions: int32[T, batch]`` — used by the parity tests so the XLA scan
    and this kernel can be driven with identical action streams.
    ``action_source='policy'``: the FUSED policy+env rollout — actions come
    from an MLP actor (``policy_params``, the flax ActorCritic tree) applied
    to the LidarInFront observation, with the lidar, the policy matmuls (MXU)
    and the Gumbel-argmax sample all computed inside the kernel; the whole
    PPO acting loop runs on-core with zero HBM round-trips.  Requires
    ``sp.obs_mode == OBS_LIDAR_FRONT`` (apply ngx.transforms.lidar_in_front).
    """
    assert action_source in ("prng", "input", "policy"), action_source
    assert supports_pallas_rollout(sp), sp.env_id
    from ..utils import debug
    if debug.enabled():
        # make_step's NGX_DEBUG wrapper emits jax.debug.callback, which has
        # no Mosaic lowering — fail here with a clear message instead of an
        # opaque Pallas lowering error mid-trace.
        raise RuntimeError(
            "NGX_DEBUG=1 is unsupported in the Pallas rollout path (host "
            "callbacks cannot lower inside a Mosaic kernel); unset NGX_DEBUG "
            "or use the XLA scan path (ngx.vector)")
    assert batch % block == 0, (batch, block)
    H, I, A = sp.map_size, sp.n_items, sp.n_actions
    HW = H * H
    TB, T = block, steps
    nblk = batch // block

    vstep = jax.vmap(make_step(sp, with_obs=False))

    POLICY = action_source == "policy"
    if POLICY:
        tab = _build_lidar_tables(sp)
        OBS_DIM = tab["OBS_DIM"]
        # flax ActorCritic pi tower -> plain numpy (becomes hoisted consts)
        _pp = policy_params.get("params", policy_params)
        _nh = sum(1 for k in _pp if k.startswith("pi_") and k != "pi_out")
        PI_LAYERS = [(np.asarray(_pp[f"pi_{i}"]["kernel"], np.float32),
                      np.asarray(_pp[f"pi_{i}"]["bias"], np.float32))
                     for i in range(_nh)]
        PI_OUT = (np.asarray(_pp["pi_out"]["kernel"], np.float32),
                  np.asarray(_pp["pi_out"]["bias"], np.float32))
        assert PI_LAYERS[0][0].shape[0] == OBS_DIM, \
            (PI_LAYERS[0][0].shape, OBS_DIM)
        assert PI_OUT[0].shape[1] == A, (PI_OUT[0].shape, A)

        _lidar_front_obs = _make_lidar_obs_fn(sp, tab, TB)

        def _policy_logits(st):
            h = _lidar_front_obs(st)
            for W, bvec in PI_LAYERS:                      # MXU matmuls
                h = jnp.tanh(jnp.dot(h, jnp.asarray(W),
                                     preferred_element_type=jnp.float32)
                             + jnp.asarray(bvec)[None, :])
            return (jnp.dot(h, jnp.asarray(PI_OUT[0]),
                            preferred_element_type=jnp.float32)
                    + jnp.asarray(PI_OUT[1])[None, :])

    _reset_block = _make_reset_block(sp, TB)

    def _merge_done(done, fresh, stepped):
        # rank-expand through int32 (Mosaic can't insert minor dims on i1)
        di = jnp.where(done, 1, 0)

        def mrg(f, n):
            d = di.reshape(di.shape + (1,) * (n.ndim - 1)) != 0
            return jnp.where(d, f, n)

        return jax.tree_util.tree_map(mrg, fresh, stepped)

    # ---- the per-block compute, as two pure functions ----------------------
    # The block state lives in VMEM *scratch refs* across the T-step loop:
    # `lax.fori_loop` with more than one vector carry miscompiles in the
    # current Mosaic/jellyfish backend ("limits[i] <= dim(i)" check failure),
    # so the loop carries only its index and the body reads/writes scratch.
    # Pallas kernels also cannot close over array constants (the spec tables
    # make_step embeds), so reset and step are traced to jaxprs up front and
    # every captured table is hoisted into an explicit kernel input.
    WITH_INPUT = action_source == "input"

    def _pack(st, rs, ds):
        iregs = jnp.stack(
            [st.agent[:, 0], st.agent[:, 1], st.facing, st.selected,
             st.step_count, st.last_action, st.last_done, ds], axis=-1)
        fregs = jnp.stack([st.last_reward, st.last_cost, rs,
                           jnp.zeros((TB,), jnp.float32)], axis=-1)
        return st.map, iregs, fregs, st.inventory

    def _unpack(m, ir, fc, inv):
        return EnvState(
            map=m, agent=ir[:, :2], facing=ir[:, _FACE],
            inventory=inv, selected=ir[:, _SEL], step_count=ir[:, _CNT],
            last_action=ir[:, _LACT], last_reward=fc[:, 0],
            last_cost=fc[:, 1], last_done=ir[:, _LDONE])

    def _reset_arrays(seed):
        z = jnp.zeros((TB,), jnp.float32)
        return _pack(_reset_block(seed, jnp.int32(0)), z,
                     jnp.zeros((TB,), jnp.int32))

    def _step_arrays(seed, t, m, ir, fc, inv, acts_row=None):
        st = _unpack(m, ir, fc, inv)
        ctr = t + 1
        if WITH_INPUT:
            a = acts_row
        elif POLICY:
            # Gumbel-argmax == categorical(logits); argmax via the same
            # max + min-index trick as _pick_uniform_valid (Mosaic-safe)
            logits = _policy_logits(st)
            u = _u01(seed, ctr, 5, (TB, A))
            score = logits - jnp.log(-jnp.log(u + 1e-10) + 1e-10)
            mx = jnp.max(score, axis=1, keepdims=True)
            cand = score >= mx
            a = jnp.min(jnp.where(cand,
                                  jnp.asarray(np.arange(A, dtype=np.int32))[None, :],
                                  A), axis=1)
        else:
            a = _randint(seed, ctr, 1, (TB, 1), A)[:, 0]
        ns, _, r, done, _info = vstep(st, a)
        ns = ns.replace(last_done=jnp.where(done, 1, 0))  # i32 (no i1 leaves)
        # auto-reset under lax.cond so the common no-done step skips the
        # fresh-state computation.  Everything crossing the branch boundary
        # must be 2-D: rank-1 [TB] leaves there trip a Mosaic layout check
        # ("arr.size() >= layout_rank"), so the state rides packed and the
        # done mask/accumulators ride as [TB, 1] columns.
        di = jnp.where(done, 1, 0)
        packed = _pack(ns, fc[:, 2] + r, ir[:, _PAD] + di)

        def do_merge(ops):
            p, d2 = ops
            fresh = _pack(_reset_block(seed, ctr), p[2][:, 2], p[1][:, _PAD])
            return tuple(
                jnp.where(d2 != 0, f, n) for f, n in zip(fresh, p))

        return jax.lax.cond(jnp.any(done), do_merge, lambda ops: ops[0],
                            (packed, di[:, None]))

    T_in = T if WITH_INPUT else 1
    _seed_ex = jnp.zeros((), jnp.int32)
    _state_ex = (jnp.zeros((TB, HW), jnp.int32), jnp.zeros((TB, 8), jnp.int32),
                 jnp.zeros((TB, 4), jnp.float32), jnp.zeros((TB, I), jnp.int32))
    reset_jaxpr = jax.make_jaxpr(_reset_arrays)(_seed_ex)
    if WITH_INPUT:
        step_jaxpr = jax.make_jaxpr(_step_arrays)(
            _seed_ex, _seed_ex, *_state_ex, jnp.zeros((TB,), jnp.int32))
    else:
        step_jaxpr = jax.make_jaxpr(_step_arrays)(_seed_ex, _seed_ex,
                                                  *_state_ex)

    # dedupe the union of both jaxprs' consts (the one-hot iotas recur dozens
    # of times); each unique table becomes one small VMEM kernel input
    consts = []

    def _slots(jaxpr):
        slots = []
        for cv in jaxpr.consts:
            c = np.asarray(cv)
            for k, u in enumerate(consts):
                if (u.shape == c.shape and u.dtype == c.dtype
                        and np.array_equal(u, c)):
                    slots.append(k)
                    break
            else:
                slots.append(len(consts))
                consts.append(c)
        return slots

    slot_r = _slots(reset_jaxpr)
    slot_s = _slots(step_jaxpr)
    consts = [jnp.asarray(c) for c in consts]
    n_consts = len(consts)

    def kernel(seed_ref, *refs):
        if WITH_INPUT:
            actions_ref, refs = refs[0], refs[1:]
        const_refs = refs[:n_consts]
        map_out, iregs_out, fregs_out, inv_out = refs[n_consts:n_consts + 4]
        map_s, ir_s, fc_s, inv_s = refs[n_consts + 4:]
        blk = pl.program_id(0)
        # independent per-(call, block) stream
        seed = seed_ref[0] + blk * jnp.int32(7919)

        cr = [const_refs[k][...] for k in slot_r]
        m0, ir0, fc0, inv0 = jax.core.eval_jaxpr(reset_jaxpr.jaxpr, cr, seed)
        map_s[:, :] = m0
        ir_s[:, :] = ir0
        fc_s[:, :] = fc0
        inv_s[:, :] = inv0

        cs = [const_refs[k][...] for k in slot_s]

        def body(t, _):
            args = (seed, t, map_s[:, :], ir_s[:, :], fc_s[:, :], inv_s[:, :])
            if WITH_INPUT:
                args = args + (actions_ref[t, :],)
            m, ir, fc, inv = jax.core.eval_jaxpr(step_jaxpr.jaxpr, cs, *args)
            map_s[:, :] = m
            ir_s[:, :] = ir
            fc_s[:, :] = fc
            inv_s[:, :] = inv
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        map_out[:, :] = map_s[:, :]
        iregs_out[:, :] = ir_s[:, :]
        fregs_out[:, :] = fc_s[:, :]
        inv_out[:, :] = inv_s[:, :]

    out_shape = (
        jax.ShapeDtypeStruct((batch, HW), jnp.int32),   # map
        jax.ShapeDtypeStruct((batch, 8), jnp.int32),    # int regs + done count
        jax.ShapeDtypeStruct((batch, 4), jnp.float32),  # float regs + r sum
        jax.ShapeDtypeStruct((batch, I), jnp.int32),    # inventory
    )
    out_specs = (
        pl.BlockSpec((TB, HW), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 8), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 4), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, I), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
    )
    # actions stream is blocked per env-block (input mode only); the hoisted
    # spec tables ride along whole.
    in_specs = ([pl.BlockSpec((T_in, TB), lambda i, *_: (0, i),
                              memory_space=pltpu.VMEM)] if WITH_INPUT else [])
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TB, HW), jnp.int32),   # map
            pltpu.VMEM((TB, 8), jnp.int32),    # packed int regs + done count
            pltpu.VMEM((TB, 4), jnp.float32),  # packed float regs + reward sum
            pltpu.VMEM((TB, I), jnp.int32),    # inventory
        ],
    )
    call = pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                          compiler_params=_compiler_params(),
                          interpret=interpret)

    def run(seed, actions=None):
        seed_arr = jnp.asarray([seed], jnp.int32)
        if WITH_INPUT:
            m, iregs, fregs, inv = call(
                seed_arr, jnp.asarray(actions, jnp.int32), *consts)
        else:
            m, iregs, fregs, inv = call(seed_arr, *consts)
        state = EnvState(
            map=m,
            agent=iregs[:, :2],
            facing=iregs[:, _FACE],
            inventory=inv,
            selected=iregs[:, _SEL],
            step_count=iregs[:, _CNT],
            last_action=iregs[:, _LACT],
            last_reward=fregs[:, 0],
            last_cost=fregs[:, 1],
            last_done=iregs[:, _LDONE].astype(bool),
        )
        denom = max(batch * steps, 1)
        return (state, jnp.sum(fregs[:, 2]) / denom,
                jnp.sum(iregs[:, _PAD]))

    if POLICY:
        # test hooks: the SAME traced obs/logits code, runnable as plain jnp
        # on a [TB]-batched EnvState (parity vs rays.make_lidar_fn + flax)
        run.lidar_obs_fn = _lidar_front_obs
        run.policy_logits_fn = _policy_logits
        run.obs_dim = OBS_DIM
    return run


def make_pallas_train_rollout(sp, batch: int, steps: int, block: int = 128,
                              cap: int = 100, hidden=(64, 64),
                              interpret=None, t_chunk: int = 64,
                              reset_source: str = "native",
                              pool_slots: int = 8,
                              spec_start_states: bool = True):
    """The fused acting rollout FOR THE PPO TRAINER — the 'policy' kernel
    re-plumbed for training:

    * policy params are runtime INPUTS (VMEM refs), not trace-time constants
      — the same compiled kernel serves every update step;
    * the initial EnvState is an INPUT (training persists env state across
      updates), packed as (map, iregs, fregs, inv) blocks;
    * per-step trajectories (obs, action, reward, done) stream to HBM —
      T x block outputs per grid program.  logp/value are NOT computed
      in-kernel: the trainer recomputes them outside in ONE batched MXU pass
      over the emitted obs, which makes old_logp consistent with the update's
      recompute path bit-for-bit by construction;
    * the trainer's episode-cap truncation (ngx/rl/train.py: capped envs
      auto-reset and count as done for GAE) runs in-kernel, counted from the
      per-env restore baseline (the ``_BASE`` register — 0 for procedural
      resets; the inherited ``step_count`` for chain restores).

    ``reset_source``:

    * ``'native'`` — episode-boundary resets are the in-kernel procedural
      generation (:func:`_make_reset_block`).
    * ``'pool'`` — boundary resets DRAW FROM AN INPUT POOL of pre-computed
      states: ``run(seed, state, params, pool, base)`` where ``pool`` is an
      ``EnvState`` whose leaves carry leading dims ``[batch, pool_slots]``
      and ``base`` is int32[batch] (steps consumed before the current
      episode's restore).  Env ``b``'s k-th in-rollout reset (k counted
      from 0) takes
      ``pool[b, k % pool_slots]`` — the caller refreshes the pool every
      launch, so slots are fresh iid draws unless an env finishes more than
      ``pool_slots`` episodes in one rollout (then slots cycle).  This is
      (a) how the CHAIN trainer restores chain-terminal states in-kernel
      (reference ``tests/train_last_agent.py:77-87``), and (b) how
      novelty-injected specs keep the fast (block 256, t_chunk 16) config:
      the percent-fill/wall-coin/tap reset edits run OUTSIDE the kernel
      (ngx.rl.train fills the pool with :func:`make_xla_pool_reset`),
      and replicating them in-kernel is exactly what pushed those specs
      over the Mosaic compile cliff (docs/MOSAIC_BUGS.md).  Pool restores set ``selected=-1``,
      ``last_action=0`` and ``last_reward/cost=0`` (none feed obs, reward
      or done; the restore semantics for the fields that matter — map,
      agent, facing, inventory, step_count — follow the reference's
      deep-copy, novel_gridworld_v2_env.py:77-97).

    Returns ``run(seed, state: EnvState[batch], params[, pool, base]) ->
    (EnvState[batch], obs[T,B,OBS_DIM] f32, action[T,B] i32,
    reward[T,B] f32, done[T,B] bool[, base_out[B] i32])``.
    """
    assert supports_pallas_rollout(sp), sp.env_id
    assert batch % block == 0, (batch, block)
    assert reset_source in ("native", "pool"), reset_source
    POOL_RESET = reset_source == "pool"
    R = int(pool_slots)
    if interpret is None:     # auto: Mosaic on the chip, interpreter elsewhere
        interpret = jax.default_backend() != "tpu"
    from ..utils import debug
    if debug.enabled():
        raise RuntimeError("NGX_DEBUG=1 is unsupported in the Pallas rollout "
                           "path (host callbacks cannot lower in Mosaic)")
    H, I, A = sp.map_size, sp.n_items, sp.n_actions
    HW = H * H
    TB, T = block, steps
    nblk = batch // block
    nh = len(hidden)

    vstep = jax.vmap(make_step(sp, with_obs=False))
    tab = _build_lidar_tables(sp)
    OBS_DIM = tab["OBS_DIM"]
    lidar_obs = _make_lidar_obs_fn(sp, tab, TB)
    reset_block = None if POOL_RESET else _make_reset_block(sp, TB)

    # bf16 trajectory-obs emission is lossless only while every obs
    # component stays < 256 (8-bit mantissa).  Lidar distances are bounded
    # by the map hypotenuse; inventory counts need a static episode bound.
    # Conservative reachability terms under the cap (dominant farming
    # loops, docs/EVAL.md): repeatable extraction (the tap persists,
    # pogostick_v1_env.py:315-331: +amount/step); place/break cycles (net
    # yield-1 per 2 steps); craft mass amplification (<= 4x the total
    # obtainable resource mass — plank is the biggest multiplier); crate
    # grants (<= crates placeable x per-item content).  The terms are
    # SUMMED, not maxed: mechanisms combine within one episode (crate
    # grants + craft amplification on top of tap extraction), so the bound
    # must cover their union.  Specs whose summed bound reaches 256 (e.g.
    # extractincdec-increase string farming at cap 100) emit f32 obs
    # instead — exact for ints < 2^24 — at 2x the HBM traffic.
    start_hi = np.zeros((I,), np.int64)
    if sp.start_inv_hi is not None:
        start_hi = np.maximum(start_hi, np.asarray(sp.start_inv_hi))
    if sp.reset_inv_set is not None:
        start_hi = np.maximum(start_hi, np.asarray(sp.reset_inv_set))
    _by_max = int(np.asarray(sp.break_yield).max()) if I else 1
    _spawn_total = int(np.asarray(sp.spawn_qty).sum())
    _terms = [
        cap * max(int(sp.extract_amount) if sp.extract_yield_item >= 0
                  else 0, 0),
        (cap // 2) * max(_by_max - 1, 1),
        4 * (_spawn_total * _by_max + int(start_hi.sum())),
    ]
    if sp.crate_contents is not None:
        _terms.append(((3 * HW) // 10)
                      * int(np.asarray(sp.crate_contents).max()))
    _obs_bound = int(start_hi.max()) + sum(_terms)
    # the bound assumes episodes START from the spec's procedural reset
    # distribution; pool restores that inject arbitrary states (the CHAIN
    # trainer's chain-terminal states carry inventory accumulated across
    # prior stages) void it — callers pass spec_start_states=False and get
    # exact f32 emission instead
    OBS_DTYPE = (jnp.bfloat16 if _obs_bound < 256 and spec_start_states
                 else jnp.float32)

    def _pack(st, rs, ds, base):
        iregs = jnp.stack(
            [st.agent[:, 0], st.agent[:, 1], st.facing, st.selected,
             st.step_count, st.last_action, st.last_done, ds, base], axis=-1)
        fregs = jnp.stack([st.last_reward, st.last_cost, rs,
                           jnp.zeros_like(st.last_reward)], axis=-1)
        return st.map, iregs, fregs, st.inventory

    def _unpack(m, ir, fc, inv):
        return EnvState(
            map=m, agent=ir[:, :2], facing=ir[:, _FACE],
            inventory=inv, selected=ir[:, _SEL], step_count=ir[:, _CNT],
            last_action=ir[:, _LACT], last_reward=fc[:, 0],
            last_cost=fc[:, 1], last_done=ir[:, _LDONE])

    # ---- the per-step compute, traced to a jaxpr with params as ARGS ------
    # pool mode: the slot-concatenated pool arrays ride as three extra args
    # (map [TB, R*HW], inv [TB, R*I], scalars [TB, R*4] = per-slot
    # (r, c, facing, step_count)); slot selection is R static lane slices
    # merged by a per-row (slot == r) select — no gathers.
    def _step_arrays(seed, t, m, ir, fc, inv, *rest):
        if POOL_RESET:
            pmap, pinv, psc = rest[:3]
            pi = rest[3:]
        else:
            pi = rest
        st = _unpack(m, ir, fc, inv)
        ctr = t + 1
        obs = lidar_obs(st)                              # [TB, OBS_DIM] f32
        h = obs
        k = 0
        for _ in range(nh):                              # MXU matmuls
            h = jnp.tanh(jnp.dot(h, pi[k],
                                 preferred_element_type=jnp.float32)
                         + pi[k + 1])
            k += 2
        logits = (jnp.dot(h, pi[k], preferred_element_type=jnp.float32)
                  + pi[k + 1])
        # Gumbel-argmax == categorical(logits); argmax via max + min-index
        u = _u01(seed, ctr, 5, (TB, A))
        score = logits - jnp.log(-jnp.log(u + 1e-10) + 1e-10)
        mx = jnp.max(score, axis=1, keepdims=True)
        a = jnp.min(jnp.where(score >= mx,
                              jnp.asarray(np.arange(A, dtype=np.int32))[None, :],
                              A), axis=1)
        ns, _, r, done, _info = vstep(st, a)
        ns = ns.replace(last_done=jnp.where(done, 1, 0))
        # the trainer's time-limit truncation: capped envs reset, done for
        # GAE.  The budget counts from the restore baseline (_BASE): 0 for
        # procedural resets, the inherited step_count for chain restores.
        done_t = done | (ns.step_count - ir[:, _BASE] >= cap)
        di = jnp.where(done_t, 1, 0)
        packed = _pack(ns, fc[:, 2] + r, ir[:, _PAD] + di, ir[:, _BASE])

        if POOL_RESET:
            def do_merge(ops):
                p, d2 = ops
                ds_new = p[1][:, _PAD]
                slot = jnp.maximum(ds_new - 1, 0) % R
                zsel = jnp.zeros((TB, 1), jnp.int32)

                def pick(arr, w):
                    out = jnp.zeros((TB, w), arr.dtype)
                    for rr in range(R):
                        out = jnp.where((slot == rr)[:, None],
                                        arr[:, rr * w:(rr + 1) * w], out)
                    return out

                fm = pick(pmap, HW)
                fi = pick(pinv, I)
                sc = pick(psc, 4)
                fcnt = sc[:, 3]
                fresh_ir = jnp.stack(
                    [sc[:, 0], sc[:, 1], sc[:, 2], zsel[:, 0] - 1, fcnt,
                     zsel[:, 0], zsel[:, 0], ds_new, fcnt], axis=-1)
                zf = jnp.zeros((TB,), jnp.float32)
                fresh_fc = jnp.stack([zf, zf, p[2][:, 2], zf], axis=-1)
                fresh = (fm, fresh_ir, fresh_fc, fi)
                return tuple(jnp.where(d2 != 0, f, n)
                             for f, n in zip(fresh, p))
        else:
            def do_merge(ops):
                p, d2 = ops
                fresh = _pack(reset_block(seed, ctr), p[2][:, 2],
                              p[1][:, _PAD], jnp.zeros((TB,), jnp.int32))
                return tuple(jnp.where(d2 != 0, f, n)
                             for f, n in zip(fresh, p))

        merged = jax.lax.cond(jnp.any(done_t), do_merge, lambda ops: ops[0],
                              (packed, di[:, None]))
        return merged + (obs, a, r, di)

    _seed_ex = jnp.zeros((), jnp.int32)
    _state_ex = (jnp.zeros((TB, HW), jnp.int32),
                 jnp.zeros((TB, _NIR), jnp.int32),
                 jnp.zeros((TB, 4), jnp.float32), jnp.zeros((TB, I), jnp.int32))
    _pool_ex = ((jnp.zeros((TB, R * HW), jnp.int32),
                 jnp.zeros((TB, R * I), jnp.int32),
                 jnp.zeros((TB, R * 4), jnp.int32)) if POOL_RESET else ())
    _pi_ex = []
    d_in = OBS_DIM
    for hdim in hidden:
        _pi_ex += [jnp.zeros((d_in, hdim), jnp.float32),
                   jnp.zeros((1, hdim), jnp.float32)]
        d_in = hdim
    _pi_ex += [jnp.zeros((d_in, A), jnp.float32),
               jnp.zeros((1, A), jnp.float32)]
    n_pi = len(_pi_ex)
    step_jaxpr = jax.make_jaxpr(_step_arrays)(_seed_ex, _seed_ex, *_state_ex,
                                              *_pool_ex, *_pi_ex)
    consts = [jnp.asarray(np.asarray(c)) for c in step_jaxpr.consts]
    n_consts = len(consts)
    n_pool = len(_pool_ex)

    # For long rollouts the time axis is CHUNKED into a second grid
    # dimension: the state scratch persists across the sequential
    # (blk-major, tc-minor) grid iterations, while the trajectory out-blocks
    # shrink to (TC, TB, ·) — T=256 otherwise fails to compile at any block
    # (full-T output blocks exhaust the compiler).  The 2D grid costs a far
    # slower Mosaic compile (~8min vs ~10s, same runtime throughput), so it
    # engages ONLY when T > t_chunk; the common trainer shape (T<=64) keeps
    # the fast 1D grid.
    # largest divisor of T that fits the chunk budget AND satisfies the
    # Pallas block constraint (the trajectory out-block's leading dim must
    # be divisible by 8 or equal T itself — chip-verified: TC=50 for T=100
    # is rejected by the lowering); lengths with no such divisor fall back
    # to the 1-D full-T grid, which always satisfies it
    _cands = [d for d in range(1, min(T, t_chunk) + 1)
              if T % d == 0 and d % 8 == 0]
    TC = max(_cands) if _cands else T
    nTC = T // TC
    TWO_D = nTC > 1

    def kernel(seed_ref, *refs):
        state_in = refs[:4]
        pool_refs = refs[4:4 + n_pool]
        pi_refs = refs[4 + n_pool:4 + n_pool + n_pi]
        n_fixed = 4 + n_pool + n_pi
        const_refs = refs[n_fixed:n_fixed + n_consts]
        (map_out, iregs_out, fregs_out, inv_out,
         obs_out, act_out, rew_out, done_out) = refs[n_fixed + n_consts:
                                                     n_fixed + n_consts + 8]
        map_s, ir_s, fc_s, inv_s = refs[n_fixed + n_consts + 8:]
        blk = pl.program_id(0)
        tc = pl.program_id(1) if TWO_D else jnp.int32(0)
        seed = seed_ref[0] + blk * jnp.int32(7919)

        @pl.when(tc == 0)
        def _load_state():
            map_s[:, :] = state_in[0][...]
            ir_s[:, :] = state_in[1][...]
            fc_s[:, :] = state_in[2][...]
            inv_s[:, :] = state_in[3][...]

        cs = [const_refs[k][...] for k in range(n_consts)]
        pool = tuple(pool_refs[k][...] for k in range(n_pool))
        pi = tuple(pi_refs[k][...] for k in range(n_pi))

        def body(tl, _):
            t = tc * TC + tl                     # global step index (RNG ctr)
            args = (seed, t, map_s[:, :], ir_s[:, :], fc_s[:, :],
                    inv_s[:, :]) + pool + pi
            (m, ir, fc, inv, obs, a, r, di) = jax.core.eval_jaxpr(
                step_jaxpr.jaxpr, cs, *args)
            map_s[:, :] = m
            ir_s[:, :] = ir
            fc_s[:, :] = fc
            inv_s[:, :] = inv
            # bf16 when the build-time bound proves losslessness (see
            # OBS_DTYPE above) — halves the VMEM output block and the HBM
            # traffic; f32 for specs whose counts could reach 256.
            obs_out[tl, :, :] = obs.astype(OBS_DTYPE)
            act_out[tl, :] = a
            rew_out[tl, :] = r
            done_out[tl, :] = di
            return 0

        jax.lax.fori_loop(0, TC, body, 0)
        # final-state out-block is the same for every tc — last write wins
        map_out[:, :] = map_s[:, :]
        iregs_out[:, :] = ir_s[:, :]
        fregs_out[:, :] = fc_s[:, :]
        inv_out[:, :] = inv_s[:, :]

    out_shape = (
        jax.ShapeDtypeStruct((batch, HW), jnp.int32),
        jax.ShapeDtypeStruct((batch, _NIR), jnp.int32),
        jax.ShapeDtypeStruct((batch, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, I), jnp.int32),
        jax.ShapeDtypeStruct((T, batch, OBS_DIM), OBS_DTYPE),
        jax.ShapeDtypeStruct((T, batch), jnp.int32),
        jax.ShapeDtypeStruct((T, batch), jnp.float32),
        jax.ShapeDtypeStruct((T, batch), jnp.int32),
    )
    if TWO_D:
        def env_ix(i, t, *_):
            return (i, 0)

        def traj3_ix(i, t, *_):
            return (t, i, 0)

        def traj2_ix(i, t, *_):
            return (t, i)
    else:
        def env_ix(i, *_):
            return (i, 0)

        def traj3_ix(i, *_):
            return (0, i, 0)

        def traj2_ix(i, *_):
            return (0, i)

    out_specs = (
        pl.BlockSpec((TB, HW), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, _NIR), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 4), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, I), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, TB, OBS_DIM), traj3_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, TB), traj2_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, TB), traj2_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TC, TB), traj2_ix, memory_space=pltpu.VMEM),
    )
    in_specs = [
        pl.BlockSpec((TB, HW), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, _NIR), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 4), env_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, I), env_ix, memory_space=pltpu.VMEM),
    ]
    if POOL_RESET:
        in_specs += [
            pl.BlockSpec((TB, R * HW), env_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R * I), env_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, R * 4), env_ix, memory_space=pltpu.VMEM),
        ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                 for _ in range(n_pi + n_consts)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk, nTC) if TWO_D else (nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((TB, HW), jnp.int32),
            pltpu.VMEM((TB, _NIR), jnp.int32),
            pltpu.VMEM((TB, 4), jnp.float32),
            pltpu.VMEM((TB, I), jnp.int32),
        ],
    )
    call = pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                          compiler_params=_compiler_params(),
                          interpret=interpret)

    def run(seed, state: EnvState, params, pool: EnvState = None, base=None):
        pp = params.get("params", params)
        flat = []
        for i in range(nh):
            flat += [jnp.asarray(pp[f"pi_{i}"]["kernel"], jnp.float32),
                     jnp.asarray(pp[f"pi_{i}"]["bias"],
                                 jnp.float32).reshape(1, -1)]
        flat += [jnp.asarray(pp["pi_out"]["kernel"], jnp.float32),
                 jnp.asarray(pp["pi_out"]["bias"], jnp.float32).reshape(1, -1)]
        seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
        ld = jnp.asarray(state.last_done)
        if base is None:
            base = jnp.zeros((batch,), jnp.int32)
        iregs = jnp.stack(
            [state.agent[:, 0], state.agent[:, 1], state.facing,
             state.selected, state.step_count, state.last_action,
             jnp.where(ld, 1, 0).astype(jnp.int32),
             jnp.zeros((batch,), jnp.int32),
             jnp.asarray(base, jnp.int32)], axis=-1)
        fregs = jnp.stack(
            [state.last_reward, state.last_cost,
             jnp.zeros((batch,), jnp.float32),
             jnp.zeros((batch,), jnp.float32)], axis=-1)
        pool_args = ()
        if POOL_RESET:
            assert pool is not None, "reset_source='pool' needs a pool"
            pmap = jnp.asarray(pool.map, jnp.int32).reshape(batch, R * HW)
            pinv = jnp.asarray(pool.inventory,
                               jnp.int32).reshape(batch, R * I)
            psc = jnp.stack(
                [pool.agent[..., 0], pool.agent[..., 1], pool.facing,
                 pool.step_count], axis=-1).astype(jnp.int32)
            pool_args = (pmap, pinv, psc.reshape(batch, R * 4))
        m, ir, fc, inv, obs, act, rew, done = call(
            seed_arr, jnp.asarray(state.map, jnp.int32), iregs, fregs,
            jnp.asarray(state.inventory, jnp.int32), *pool_args, *flat,
            *consts)
        out_state = EnvState(
            map=m, agent=ir[:, :2], facing=ir[:, _FACE], inventory=inv,
            selected=ir[:, _SEL], step_count=ir[:, _CNT],
            last_action=ir[:, _LACT], last_reward=fc[:, 0],
            last_cost=fc[:, 1], last_done=ir[:, _LDONE].astype(bool))
        # -> f32 is exact here (bf16 only when the bound proves it)
        out = (out_state, obs.astype(jnp.float32), act, rew,
               done.astype(bool))
        if POOL_RESET:
            out = out + (ir[:, _BASE],)
        return out

    run.obs_dim = OBS_DIM
    run.pool_slots = R
    return run


def make_xla_policy_rollout(sp, policy_params, batch: int, steps: int):
    """The un-fused comparator for the policy rollout benchmark: one jit of
    ``lax.scan`` over (policy MLP -> vmapped env step with LidarInFront obs)
    — exactly the acting loop ngx.rl.train's PPO uses, minus trajectory
    stacking.  Same MLP arithmetic as the Pallas 'policy' kernel."""
    from ..vector import make_vec

    assert sp.obs_mode == S.OBS_LIDAR_FRONT
    vec = make_vec(sp)
    pp = policy_params.get("params", policy_params)
    nh = sum(1 for k in pp if k.startswith("pi_") and k != "pi_out")

    def apply(obs):
        h = obs
        for i in range(nh):
            h = jnp.tanh(h @ pp[f"pi_{i}"]["kernel"] + pp[f"pi_{i}"]["bias"])
        return h @ pp["pi_out"]["kernel"] + pp["pi_out"]["bias"]

    @jax.jit
    def run(key):
        k0, k1 = jax.random.split(key)
        state, obs = vec.reset(jax.random.split(k0, batch))

        def body(carry, key_t):
            state, obs, rs, ds = carry
            ka, kr = jax.random.split(key_t)
            a = jax.random.categorical(ka, apply(obs.astype(jnp.float32)))
            state, obs, r, done, _ = vec.step(
                state, a, jax.random.split(kr, batch))
            return (state, obs, rs + r.sum(), ds + done.sum()), None

        carry = (state, obs, jnp.float32(0), jnp.int32(0))
        (state, obs, rs, ds), _ = jax.lax.scan(
            body, carry, jax.random.split(k1, steps))
        return state, rs / (batch * steps), ds

    return run
