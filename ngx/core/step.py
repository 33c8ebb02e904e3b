"""The fused, branchless step kernel.

One compiled function implements the step semantics of *all* reference
environments and novelty wrappers, driven entirely by :class:`ngx.core.spec.EnvSpec`
tables.  The reference dispatches through a Python if/elif chain per action
(``pogostick_v1_env.py:230-367``) and novelty wrappers re-implement whole
Break/Craft paths inline (``novelty_wrappers.py:37-114``); here every op class
is evaluated as masked arithmetic and combined with ``jnp.where`` selects so the
kernel is a single straight-line XLA program — no per-env control-flow
divergence under ``vmap``, which is what keeps 8k+ environments stepping in
lockstep on a TPU core.

Semantics are cited per-op to the reference implementation and verified
bit-exactly by ``tests/test_conformance.py`` against the mounted reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import spec as S
from .state import EnvState, StepInfo


def _goal_check(sp: S.EnvSpec, inv, front_after):
    """Termination predicate evaluated at the tail of every step
    (pogostick_v1_env.py:354-357, novel_gridworld_v0_env.py:236-239)."""
    if sp.goal_mode == S.GOAL_FRONT_ITEM:
        return front_after == sp.goal_front_item
    counts = jnp.asarray(sp.goal_counts, dtype=jnp.int32)
    active = counts > 0
    ge = inv >= counts
    if sp.goal_any:
        return jnp.any(ge & active)
    return jnp.all(ge | ~active)


def make_step(sp: S.EnvSpec):
    """Compile a pure ``step(state, action) -> (state, obs, reward, done, info)``
    for one spec.  All spec tables become XLA constants."""

    I = sp.n_items
    H = sp.map_size

    # All tables stay host-side numpy here and are converted with jnp.asarray
    # at trace time below: they become embedded XLA constants directly from
    # host memory.  (jnp.asarray at closure-build time would commit them to
    # the default device, and MLIR constant lowering then has to fetch them
    # back — a D2H that stalls on tunneled-TPU setups.)
    action_op = np.asarray(sp.action_op, dtype=np.int32)
    action_arg = np.asarray(sp.action_arg, dtype=np.int32)
    cost_ok = np.asarray(sp.action_cost_success, dtype=np.float32)
    cost_fail = np.asarray(sp.action_cost_fail, dtype=np.float32)
    unbreakable = np.asarray(sp.unbreakable)
    break_reward = np.asarray(sp.break_reward, dtype=np.float32)
    break_yield = np.asarray(sp.break_yield, dtype=np.int32)
    entity_mask = np.asarray(sp.entity_mask)

    R = max(sp.n_recipes, 1)
    recipes_in = np.asarray(
        sp.recipes_in if sp.n_recipes else np.zeros((1, I), np.int32), dtype=np.int32)
    recipes_out = np.asarray(
        sp.recipes_out if sp.n_recipes else np.zeros((1, I), np.int32), dtype=np.int32)
    recipe_multi = np.asarray(
        sp.recipe_multi if sp.n_recipes else np.zeros((1,), bool))
    ccost_ok = np.asarray(
        sp.craft_cost_success if sp.n_recipes else np.zeros((1,), np.float32), dtype=np.float32)
    ccost_missing = np.asarray(
        sp.craft_cost_missing if sp.n_recipes else np.zeros((1,), np.float32), dtype=np.float32)
    ccost_notable = np.asarray(
        sp.craft_cost_no_table if sp.n_recipes else np.zeros((1,), np.float32), dtype=np.float32)
    deadend_recipes = np.asarray(
        sp.deadend_recipes if sp.n_recipes else np.zeros((1,), bool))

    goal_counts = np.asarray(sp.goal_counts, dtype=np.int32)
    crate_contents = np.asarray(
        sp.crate_contents if sp.crate_contents is not None else np.zeros((I,), np.int32),
        dtype=np.int32)

    deltas = S.FACING_DELTAS
    turn_left = S.TURN_LEFT
    turn_right = S.TURN_RIGHT

    # legacy craft-nag recipe/item indices (novel_gridworld_v2_env.py:313-323,
    # novel_gridworld_v4_env.py:398-405)
    stick_r = sp.recipe_names.index("stick") if "stick" in sp.recipe_names else -1
    tap_r = sp.recipe_names.index("tree_tap") if "tree_tap" in sp.recipe_names else -1
    plank_i = sp.items.index("plank") if "plank" in sp.items else 0
    stick_i = sp.items.index("stick") if "stick" in sp.items else 0
    tap_i = sp.items.index("tree_tap") if "tree_tap" in sp.items else 0
    rubber_i = sp.items.index("rubber") if "rubber" in sp.items else 0

    from ..ops.rays import make_lidar_fn  # local import to avoid cycles
    lidar_fn = (make_lidar_fn(sp)
                if sp.obs_mode not in (S.OBS_DICT, S.OBS_AGENT_MAP) else None)

    def get_obs(state: EnvState):
        if sp.obs_mode == S.OBS_DICT:
            # pogostick_v1_env.py:214-228 — raw-state dict
            return {
                "map": state.map,
                "agent_location": state.agent,
                "agent_facing_id": state.facing,
                "inventory_items_quantity": state.inventory,
            }
        if sp.obs_mode == S.OBS_AGENT_MAP:
            # observation_wrappers.py:102-129 — 11x11 window centred on the
            # agent (extend=5, zero-padded), + facing + inventory.  One
            # dynamic_slice of the padded map instead of the reference's
            # full-map copy per step.
            ext = 5
            padded = jnp.pad(state.map, ext)
            win = jax.lax.dynamic_slice(
                padded, (state.agent[0], state.agent[1]),
                (2 * ext + 1, 2 * ext + 1))
            return {
                "agent_map": win,
                "agent_facing_id": state.facing,
                "inventory_items_quantity": state.inventory,
            }
        lidar = lidar_fn(state.map, state.agent, state.facing)
        if sp.obs_mode == S.OBS_LIDAR_V0:
            return lidar
        if sp.obs_mode == S.OBS_LIDAR_FRONT:
            # observation_wrappers.py:70-80 — lidar + inventory over
            # name-sorted items minus unbreakables (the reference reads the
            # live inventory dict in sorted order, so novelty-appended item
            # ids interleave alphabetically)
            keep = [i for _, i in sorted((n, i) for i, n in enumerate(sp.items))
                    if not sp.unbreakable[i]]
            return jnp.concatenate([lidar, state.inventory[jnp.asarray(keep)]])
        # novel_gridworld_v1_env.py:194-204 — lidar + name-sorted inventory
        # (all items except air; sorted == id order until a novelty appends)
        keep = [i for _, i in sorted((n, i) for i, n in enumerate(sp.items))
                if i != 0]
        return jnp.concatenate([lidar, state.inventory[jnp.asarray(keep)]])

    def _neighbors4(m, r, c):
        """Values of the 4-neighborhood, replicating the bounds-checked reads of
        is_block_in_front_next_to (pogostick_v1_env.py:391-411)."""
        rm = jnp.clip(r - 1, 0, H - 1)
        rp = jnp.clip(r + 1, 0, H - 1)
        cm = jnp.clip(c - 1, 0, H - 1)
        cp = jnp.clip(c + 1, 0, H - 1)
        vals = jnp.stack([m[rm, c], m[rp, c], m[r, cm], m[r, cp]])
        ok = jnp.stack([r - 1 >= 0, r + 1 <= H - 1, c - 1 >= 0, c + 1 <= H - 1])
        return vals, ok

    def step(state: EnvState, action):
        # trace-time constant embedding of the host tables (see note above)
        action_op_, action_arg_ = jnp.asarray(action_op), jnp.asarray(action_arg)
        cost_ok_, cost_fail_ = jnp.asarray(cost_ok), jnp.asarray(cost_fail)
        unbreakable_ = jnp.asarray(unbreakable)
        break_reward_, break_yield_ = jnp.asarray(break_reward), jnp.asarray(break_yield)
        entity_mask_ = jnp.asarray(entity_mask)
        recipes_in_, recipes_out_ = jnp.asarray(recipes_in), jnp.asarray(recipes_out)
        recipe_multi_ = jnp.asarray(recipe_multi)
        ccost_ok_, ccost_missing_, ccost_notable_ = (
            jnp.asarray(ccost_ok), jnp.asarray(ccost_missing), jnp.asarray(ccost_notable))
        deadend_recipes_ = jnp.asarray(deadend_recipes)
        crate_contents_ = jnp.asarray(crate_contents)
        deltas_ = jnp.asarray(deltas)
        turn_left_, turn_right_ = jnp.asarray(turn_left), jnp.asarray(turn_right)

        action = jnp.asarray(action, dtype=jnp.int32)
        op = action_op_[action]
        arg = action_arg_[action]

        m = state.map
        r, c = state.agent[0], state.agent[1]
        inv = state.inventory
        facing = state.facing

        d = deltas_[facing]
        fr, fc = r + d[0], c + d[1]
        front = m[fr, fc]

        # ---------------- Forward / turns (pogostick_v1_env.py:244-279) ----
        is_fwd = op == S.OP_FORWARD
        fwd_ok = front == 0
        new_agent = jnp.where(is_fwd & fwd_ok, jnp.stack([fr, fc]), state.agent)

        is_left = op == S.OP_LEFT
        is_right = op == S.OP_RIGHT
        new_facing = jnp.where(is_left, turn_left_[facing],
                               jnp.where(is_right, turn_right_[facing], facing))

        # ---------------- Jump (novelty_wrappers.py:1360-1382) -------------
        is_jump = op == S.OP_JUMP
        jr, jc = r + 2 * d[0], c + 2 * d[1]
        j_in = (jr >= 0) & (jr <= H - 1) & (jc >= 0) & (jc <= H - 1)
        j_val = m[jnp.clip(jr, 0, H - 1), jnp.clip(jc, 0, H - 1)]
        jump_ok = j_in & (j_val == 0)
        new_agent = jnp.where(is_jump & jump_ok, jnp.stack([jr, jc]), new_agent)

        # ---------------- Break (+ axe / fence / crate folds) --------------
        is_break = op == S.OP_BREAK
        breakable = (front != 0) & ~unbreakable_[front]

        axe_sel = jnp.asarray(False)
        if sp.axe_mode != S.AXE_NONE:
            # novelty_wrappers.py:56,67 — axe in inventory AND selected
            axe_sel = (inv[sp.axe_id] >= 1) & (state.selected == sp.axe_id)

        fence_blocked = jnp.asarray(False)
        if sp.fence_restrict == S.FENCE_MEDIUM:
            # novelty_wrappers.py:933-941 — agent's perpendicular sides fence-free
            ns = (facing == S.NORTH) | (facing == S.SOUTH)
            side_a = jnp.where(ns, m[r, jnp.clip(c - 1, 0, H - 1)], m[jnp.clip(r - 1, 0, H - 1), c])
            side_b = jnp.where(ns, m[r, jnp.clip(c + 1, 0, H - 1)], m[jnp.clip(r + 1, 0, H - 1), c])
            fence_blocked = (side_a == sp.fence_id) | (side_b == sp.fence_id)
        elif sp.fence_restrict == S.FENCE_HARD:
            # novelty_wrappers.py:943-949 — whole 3x3 around target fence-free
            win = jax.lax.dynamic_slice(
                jnp.pad(m, 1), (fr, fc), (3, 3))  # pad so fr-1..fr+1 shifts to fr..fr+2
            fence_blocked = jnp.any(win == sp.fence_id)
        if sp.fence_restrict != S.FENCE_NONE:
            # the fence itself is always breakable (novelty_wrappers.py:928-930)
            fence_blocked = fence_blocked & (front != sp.fence_id)

        if sp.axe_mode == S.AXE_REQUIRED:
            break_ok = breakable & ~fence_blocked & axe_sel
        else:
            break_ok = breakable & ~fence_blocked

        if sp.axe_mode != S.AXE_NONE:
            # axe overrides: +10 with axe on ANY breakable; reward stays -1
            # without axe even for bonus items; the cost discount only applies
            # on a successful axe break — failures stay 3600
            # (novelty_wrappers.py:45-84: step_cost starts 3600, reduced
            # inside the success branches only)
            brk_reward = jnp.where(axe_sel, sp.reward_intermediate, sp.reward_step)
            byield = jnp.where(axe_sel & sp.axe_breakincrease, 2, 1)
            brk_cost = jnp.where(axe_sel & break_ok,
                                 sp.break_cost * sp.axe_cost_mult,
                                 jnp.float32(sp.break_cost))
        else:
            brk_reward = break_reward_[front]
            byield = break_yield_[front]
            brk_cost = jnp.float32(sp.break_cost)

        # Crate novelty adds contents whenever Break targets a crate, before the
        # inner break resolves (novelty_wrappers.py:1085-1088).
        crate_add = is_break & (front == sp.crate_id) if sp.crate_id >= 0 else jnp.asarray(False)

        # FenceRestriction's delegated-break path re-runs the post-step tail,
        # double-counting step_count and reporting result=True/cost=3600/msg=''
        # (novelty_wrappers.py:930,960-984). Reproduced via fence_double below.
        fence_active = sp.fence_restrict != S.FENCE_NONE

        # ---------------- Chop (novelty_wrappers.py:1288-1307) -------------
        is_chop = op == S.OP_CHOP
        chop_ok = breakable

        # ---------------- Place (pogostick_v1_env.py:295-314) --------------
        is_place = op == S.OP_PLACE
        have_place = inv[arg] >= 1
        place_ok = have_place & (front == 0)
        nb_vals, nb_in = _neighbors4(m, fr, fc)
        next_to_tree = jnp.any(nb_in & (nb_vals == sp.place_adjacent_item))

        # ---------------- Extract rubber (pogostick_v1_env.py:315-331) -----
        is_exr = op == S.OP_EXTRACT_RUBBER
        exr_at_tap = front == sp.extract_source_item
        exr_ok = exr_at_tap & next_to_tree

        # ---------------- Extract string (bow_v0_env.py:293-304) -----------
        is_exs = op == S.OP_EXTRACT_STRING
        exs_ok = front == sp.extract_source_item

        # ---------------- Fused place+extract (v4:277-305, v5:291-319) -----
        is_fused = op == S.OP_FUSED_PLACE_EXTRACT
        taps_on_map = jnp.sum(m == tap_i)
        fused_place = (taps_on_map == 0) & (inv[tap_i] >= 1) & next_to_tree & (front == 0)
        fused_extract = (taps_on_map == 1) & next_to_tree & (front == tap_i)

        # ---------------- Craft (pogostick_v1_env.py:413-474 + legacy) -----
        is_craft = op == S.OP_CRAFT
        rec = jnp.clip(arg, 0, R - 1)
        need = recipes_in_[rec]
        have_all = jnp.all(inv >= need)
        multi = recipe_multi_[rec]
        at_table = front == sp.crafting_table_id
        if sp.craft_variant == S.CRAFT_MODERN:
            craft_missing = ~have_all
            craft_notable = have_all & multi & ~at_table
        elif sp.craft_variant == S.CRAFT_LEGACY_TABLE_FIRST:
            craft_notable = multi & ~at_table
            craft_missing = ~craft_notable & ~have_all
        else:  # CRAFT_LEGACY_NO_TABLE (v2)
            craft_notable = jnp.asarray(False)
            craft_missing = ~have_all
        craft_ok = ~craft_missing & ~craft_notable

        if sp.craft_nag == S.NAG_V2:
            # plank count checked AFTER consumption (novel_gridworld_v2_env.py:306-323)
            plank_after = inv[plank_i] + recipes_out_[rec][plank_i] - need[plank_i]
            nag = (rec == stick_r) & (plank_after < 8)
        elif sp.craft_nag == S.NAG_V4:
            nag = ((rec == stick_r) & (inv[plank_i] < 8)) | \
                  ((rec == tap_r) & (inv[stick_i] < 8))
        else:
            nag = jnp.asarray(False)
        craft_reward = jnp.where(craft_ok,
                                 jnp.where(nag, sp.reward_step,
                                           jnp.float32(sp.craft_success_reward)),
                                 sp.reward_step)

        # ---------------- Select (pogostick_v1_env.py:338-347) -------------
        is_select = op == S.OP_SELECT
        sel_ok = inv[arg] >= 1
        new_selected = jnp.where(is_select & sel_ok, arg, state.selected)

        # ================= consolidate map write (all ops write front) =====
        write_break = (is_break & break_ok) | (is_chop & chop_ok) | (is_exs & exs_ok)
        write_place = (is_place & place_ok) | (is_fused & fused_place)
        front_new = jnp.where(write_break, 0,
                              jnp.where(write_place,
                                        jnp.where(is_fused, tap_i, arg), front))
        new_map = m.at[fr, fc].set(front_new)

        # ================= consolidate inventory =============================
        inv_delta = jnp.zeros((I,), dtype=jnp.int32)
        gain_break = jnp.where(is_break & break_ok, byield,
                               jnp.where(is_chop & chop_ok, 2, 0))
        inv_delta = inv_delta.at[front].add(gain_break)
        inv_delta = inv_delta + jnp.where(crate_add, crate_contents_, 0)
        inv_delta = inv_delta.at[arg].add(
            jnp.where(is_place & place_ok, -1, 0))
        inv_delta = inv_delta.at[rubber_i].add(
            jnp.where(is_exr & exr_ok, sp.extract_amount, 0)
            + jnp.where(is_fused & (fused_place | fused_extract), 1, 0))
        if sp.extract_yield_item >= 0 and sp.extract_source_item >= 0:
            inv_delta = inv_delta.at[sp.extract_yield_item].add(
                jnp.where(is_exs & exs_ok, sp.extract_amount, 0))
        inv_delta = inv_delta.at[tap_i].add(jnp.where(is_fused & fused_place, -1, 0))
        inv_delta = inv_delta + jnp.where(is_craft & craft_ok,
                                          recipes_out_[rec] - need, 0)
        new_inv = inv + inv_delta

        # ================= reward / result / cost / message ==================
        reward = jnp.float32(sp.reward_step)
        result = jnp.asarray(True)
        cost = jnp.float32(0.0)
        msg = jnp.int32(S.MSG_NONE)
        msg_arg = jnp.int32(0)

        def sel(cond, a, b):
            return jnp.where(cond, a, b)

        # forward / jump failures
        result = sel(is_fwd & ~fwd_ok, False, result)
        msg = sel((is_fwd & ~fwd_ok) | (is_jump & ~jump_ok), S.MSG_BLOCK_IN_PATH, msg)
        result = sel(is_jump & ~jump_ok, False, result)

        # break
        reward = sel(is_break & break_ok, brk_reward, reward)
        result = sel(is_break & ~break_ok, False, result)
        msg = sel(is_break & ~breakable, S.MSG_CANNOT_BREAK, msg)
        msg_arg = sel(is_break & ~breakable, front, msg_arg)
        if sp.fence_restrict != S.FENCE_NONE:
            fb = is_break & breakable & fence_blocked
            msg = sel(fb, S.MSG_FENCE_RESTRICTION, msg)
        if sp.axe_mode == S.AXE_REQUIRED:
            nb = is_break & breakable & ~fence_blocked & ~axe_sel
            msg = sel(nb, S.MSG_NEED_AXE, msg)
            msg_arg = sel(nb, sp.axe_id, msg_arg)

        # chop
        reward = sel(is_chop & chop_ok, jnp.float32(sp.reward_intermediate), reward)
        result = sel(is_chop & ~chop_ok, False, result)
        msg = sel(is_chop & ~chop_ok, S.MSG_CANNOT_CHOP, msg)
        msg_arg = sel(is_chop & ~chop_ok, front, msg_arg)

        # place
        reward = sel(is_place & place_ok & next_to_tree,
                     jnp.float32(sp.reward_intermediate), reward)
        result = sel(is_place & ~place_ok, False, result)
        msg = sel(is_place & place_ok, S.MSG_TAP_PLACED, msg)
        msg = sel(is_place & have_place & (front != 0), S.MSG_BLOCK_EXISTS, msg)
        msg_arg = sel(is_place & have_place & (front != 0), front, msg_arg)
        msg = sel(is_place & ~have_place, S.MSG_ITEM_NOT_FOUND, msg)

        # extract rubber
        reward = sel(is_exr & exr_ok, jnp.float32(sp.reward_intermediate), reward)
        result = sel(is_exr & ~exr_ok, False, result)
        msg = sel(is_exr & exr_at_tap & ~next_to_tree, S.MSG_NO_TREE_NEAR_TAP, msg)
        msg = sel(is_exr & ~exr_at_tap, S.MSG_NO_TAP, msg)

        # extract string
        reward = sel(is_exs & exs_ok, jnp.float32(sp.reward_intermediate), reward)
        result = sel(is_exs & ~exs_ok, False, result)
        msg = sel(is_exs & ~exs_ok, S.MSG_NO_WOOL, msg)

        # craft
        reward = sel(is_craft, craft_reward, reward)
        result = sel(is_craft & ~craft_ok, False, result)
        msg = sel(is_craft & craft_missing, S.MSG_MISSING_ITEMS, msg)
        msg = sel(is_craft & craft_notable, S.MSG_NEED_TABLE, msg)
        msg = sel(is_craft & craft_ok, S.MSG_CRAFTED, msg)
        msg_arg = sel(is_craft, rec, msg_arg)

        # fused place+extract (v4:291-303) — rewards 20 / 15
        reward = sel(is_fused & fused_place, 20.0, reward)
        reward = sel(is_fused & fused_extract, 15.0, reward)

        # select
        result = sel(is_select & ~sel_ok, False, result)
        msg = sel(is_select & ~sel_ok, S.MSG_ITEM_NOT_FOUND, msg)

        # step costs (zero for legacy envs — their tables are all 0)
        base_cost = jnp.where(result, cost_ok_[action], cost_fail_[action])
        cost = base_cost
        cost = sel(is_break, brk_cost, cost)
        if sp.n_recipes:
            craft_cost = jnp.where(craft_ok, ccost_ok_[rec],
                                   jnp.where(craft_notable, ccost_notable_[rec],
                                             ccost_missing_[rec]))
            cost = sel(is_craft, craft_cost, cost)

        # FenceRestriction tail-override quirk: allowed breaks report
        # result=True / cost=3600 / msg='' and step_count += 2
        # (novelty_wrappers.py:930,960-984).
        if fence_active:
            fdel = is_break & break_ok
            result = sel(fdel, True, result)
            msg = sel(fdel, S.MSG_NONE, msg)
            cost = sel(fdel, jnp.float32(sp.break_cost), cost)
            step_inc = jnp.where(fdel, 2, 1)
        else:
            step_inc = jnp.int32(1)

        # ================= post-step tail ====================================
        # grab_entities (pogostick_v1_env.py:538-554) — 3x3 around agent
        nr, nc = new_agent[0], new_agent[1]
        if sp.grab_entities_enabled and bool(sp.entity_mask.any()):
            win = jax.lax.dynamic_slice(new_map, (nr - 1, nc - 1), (3, 3))
            grab = entity_mask_[win]
            onehot = (win[..., None] == jnp.arange(I)) & grab[..., None]
            new_inv = new_inv + jnp.sum(onehot, axis=(0, 1), dtype=jnp.int32)
            new_map = jax.lax.dynamic_update_slice(
                new_map, jnp.where(grab, 0, win), (nr - 1, nc - 1))

        # block-in-front AFTER the action (pogostick_v1_env.py:352)
        d2 = deltas_[new_facing]
        front_after = new_map[new_agent[0] + d2[0], new_agent[1] + d2[1]]

        goal_met = _goal_check(sp, new_inv, front_after)
        reward = jnp.where(goal_met, jnp.float32(sp.reward_done), reward)
        done = goal_met

        # dead-end termination (novel_gridworld_v2_env.py:263-266)
        if bool(sp.deadend_recipes.any()):
            craftable = jnp.all(new_inv[None, :] >= recipes_in_, axis=1)
            deadend = ~jnp.any(craftable & deadend_recipes_)
            done = done | (~goal_met & deadend)

        # firewall death — post-everything override (novelty_wrappers.py:1171-1189)
        if sp.fire_item >= 0:
            fv, fok = _neighbors4(new_map, new_agent[0], new_agent[1])
            on_fire = jnp.any(fok & (fv == sp.fire_item))
            reward = jnp.where(on_fire, jnp.float32(-(int(sp.reward_done) // 2)), reward)
            done = done | on_fire
            msg = jnp.where(on_fire, S.MSG_DIED_FIREWALL, msg)

        new_state = EnvState(
            map=new_map,
            agent=new_agent,
            facing=new_facing,
            inventory=new_inv,
            selected=new_selected,
            step_count=state.step_count + step_inc,
            last_action=action,
            last_reward=reward,
            last_cost=cost,
            last_done=done,
        )
        obs = get_obs(new_state)
        info = StepInfo(result=result, step_cost=cost, msg_code=msg, msg_arg=msg_arg)
        return new_state, obs, reward, done, info

    step.get_obs = get_obs
    return step
