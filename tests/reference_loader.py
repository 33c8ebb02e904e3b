"""Load the mounted reference repo (/root/reference) for conformance testing.

Prepends the gym shim and the reference path to sys.path, patches the
matplotlib API the (2020-era) reference expects, and exposes helpers to
snapshot a reference env into an ngx EnvState.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = os.environ.get("NGX_REFERENCE_PATH", "/root/reference")

_loaded = False


def load_reference():
    global _loaded
    if _loaded:
        import gym_novel_gridworlds
        return gym_novel_gridworlds
    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.cm as cm
    if not hasattr(cm, "get_cmap"):  # removed in matplotlib >= 3.9
        cm.get_cmap = matplotlib.colormaps.get
    sys.path.insert(0, os.path.join(HERE, "_gym_shim"))
    sys.path.insert(0, REFERENCE)
    import gym_novel_gridworlds  # noqa: F401
    _loaded = True
    return gym_novel_gridworlds


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def make_ref_env(env_id: str):
    load_reference()
    import gym
    return gym.make(env_id)


def snapshot_state(ref_env, spec):
    """Extract an ngx EnvState from a (possibly wrapped) reference env."""
    from ngx.core.state import state_from_numpy

    base = ref_env
    while hasattr(base, "env") and base.env is not None and not hasattr(base, "map_size"):
        base = base.env
    # unwrap to the innermost env that owns .map
    while hasattr(base, "env") and base.env is not None and hasattr(base.env, "map"):
        base = base.env

    inv = np.zeros((spec.n_items,), np.int32)
    for item, q in getattr(base, "inventory_items_quantity", {}).items():
        inv[spec.items.index(item)] = q
    selected = -1
    sel = getattr(base, "selected_item", "")
    if sel:
        selected = spec.items.index(sel)
    return state_from_numpy(
        spec,
        map_arr=base.map,
        agent=base.agent_location,
        facing=base.agent_facing_id,
        inventory=inv,
        selected=selected,
        step_count=getattr(base, "step_count", 0),
        last_done=getattr(base, "last_done", False),
    )


def compare_step(spec, ref_env, ngx_state, ngx_out, ref_out, t, modern=True):
    """Assert one step of the reference and ngx agree bit-for-bit."""
    ref_obs, ref_r, ref_done, ref_info = ref_out
    state, obs, r, done, info = ngx_out

    base = ref_env
    while hasattr(base, "env") and base.env is not None and hasattr(base.env, "map"):
        base = base.env

    np.testing.assert_array_equal(
        np.asarray(state.map2d), np.asarray(base.map),
        err_msg=f"map mismatch at step {t}")
    assert tuple(np.asarray(state.agent)) == tuple(base.agent_location), \
        f"agent mismatch at step {t}"
    assert int(state.facing) == int(base.agent_facing_id), f"facing mismatch at {t}"
    inv = np.zeros((spec.n_items,), np.int32)
    for item, q in getattr(base, "inventory_items_quantity", {}).items():
        inv[spec.items.index(item)] = q
    np.testing.assert_array_equal(np.asarray(state.inventory), inv,
                                  err_msg=f"inventory mismatch at step {t}")
    assert float(r) == float(ref_r), f"reward {float(r)} != {ref_r} at step {t}"
    assert bool(done) == bool(ref_done), f"done mismatch at step {t}"
    if modern:
        assert bool(info.result) == bool(ref_info["result"]), \
            f"result mismatch at step {t}: {ref_info}"
        assert abs(float(info.step_cost) - float(ref_info["step_cost"])) < 1e-3, \
            f"step_cost {float(info.step_cost)} != {ref_info['step_cost']} at {t}"
        sel = getattr(base, "selected_item", "")
        sel_id = spec.items.index(sel) if sel else -1
        assert int(state.selected) == sel_id, f"selected mismatch at {t}"
