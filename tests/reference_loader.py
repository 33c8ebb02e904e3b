"""Load the mounted reference repo (/root/reference) for conformance testing.

Prepends the gym shim and the reference path to sys.path, patches the
matplotlib API the (2020-era) reference expects, and exposes helpers to
snapshot a reference env into an ngx EnvState.
"""

import importlib.util
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = os.environ.get("NGX_REFERENCE_PATH", "/root/reference")


def _module_is_reference(mod) -> bool:
    return (getattr(mod, "__file__", "") or "").startswith(REFERENCE)


def load_reference():
    """Import the MOUNTED reference package by file path.

    The repo ships its own drop-in package under the same import name
    (``/root/repo/gym_novel_gridworlds``); importing by sys.path order could
    silently pick that one up and conformance-test ngx against itself.  Here
    the reference is loaded explicitly from ``REFERENCE`` (its absolute
    intra-package imports resolve through the parent module's ``__path__``,
    pinned to the reference dir), and any same-named modules from elsewhere
    are purged from ``sys.modules`` first.
    """
    mod = sys.modules.get("gym_novel_gridworlds")
    if mod is not None and _module_is_reference(mod):
        return mod

    import matplotlib
    matplotlib.use("Agg", force=True)
    import matplotlib.cm as cm
    if not hasattr(cm, "get_cmap"):  # removed in matplotlib >= 3.9
        cm.get_cmap = matplotlib.colormaps.get
    shim = os.path.join(HERE, "_gym_shim")
    if shim not in sys.path:
        sys.path.insert(0, shim)

    for name in [n for n in sys.modules
                 if n.split(".")[0] == "gym_novel_gridworlds"]:
        del sys.modules[name]

    pkg_dir = os.path.join(REFERENCE, "gym_novel_gridworlds")
    spec = importlib.util.spec_from_file_location(
        "gym_novel_gridworlds", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["gym_novel_gridworlds"] = mod
    spec.loader.exec_module(mod)
    assert _module_is_reference(mod), mod.__file__
    return mod


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


_ENV_CLASSES = {
    "NovelGridworld-v0": "NovelGridworldV0Env",
    "NovelGridworld-v1": "NovelGridworldV1Env",
    "NovelGridworld-v2": "NovelGridworldV2Env",
    "NovelGridworld-v3": "NovelGridworldV3Env",
    "NovelGridworld-v4": "NovelGridworldV4Env",
    "NovelGridworld-v5": "NovelGridworldV5Env",
    "NovelGridworld-v6": "NovelGridworldV6Env",
    "NovelGridworld-Bow-v0": "BowV0Env",
    "NovelGridworld-Bow-v1": "BowV1Env",
    "NovelGridworld-Pogostick-v0": "PogostickV0Env",
    "NovelGridworld-Pogostick-v1": "PogostickV1Env",
}


def make_ref_env(env_id: str, **kwargs):
    """Construct a reference env class directly (not via the gym registry,
    whose shim table the repo's same-named drop-in package also writes to)."""
    import importlib

    load_reference()
    # resolves through the pinned parent package's __path__ -> reference dir
    envs = importlib.import_module("gym_novel_gridworlds.envs")
    assert _module_is_reference(envs), envs.__file__
    return getattr(envs, _ENV_CLASSES[env_id])(**kwargs)


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
    # last_action is a string in the reference ('Craft_plank'); map it by
    # name (0 when unset or unknown — the reference initializes it to 0)
    la = getattr(base, "last_action", 0)
    if isinstance(la, str):
        la = spec.actions_id.get(la, 0)
    return state_from_numpy(
        spec,
        map_arr=base.map,
        agent=base.agent_location,
        facing=base.agent_facing_id,
        inventory=inv,
        selected=selected,
        step_count=getattr(base, "step_count", 0),
        last_action=la,
        last_reward=getattr(base, "last_reward", 0.0),
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
