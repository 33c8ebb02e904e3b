"""Compiled (Mosaic) vs interpreted bit-identity of the POOL-mode trainer
kernel, on the chip: same seed/state/params/pool through both lowerings
must produce identical trajectories and final states (the counter-based
RNG guarantees it by design; this verifies the Mosaic lowering)."""
import json, os, sys, time
import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT); sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import ngx
from ngx.transforms import lidar_in_front
from ngx.ops.pallas_rollout import make_pallas_train_rollout, make_xla_pool_reset
from ngx.core.reset import make_reset
from ngx.rl.models import ActorCritic

OUT = os.path.join(ROOT, "results", "r5_chip11.json")
res = {}
def bank(k, v):
    res[k] = v
    json.dump(res, open(OUT, "w"), indent=1)
    print("BANK", k, v, flush=True)

print("devices:", jax.devices(), flush=True)
B, T, R, CAP = 256, 32, 4, 10
spec = lidar_in_front(ngx.inject_novelty(
    ngx.make_spec("NovelGridworld-Pogostick-v1"), "firewall", "easy"))
model = ActorCritic(n_actions=spec.n_actions, hidden=(16, 16))
vreset = jax.jit(jax.vmap(make_reset(spec)))
state, _ = vreset(jax.random.split(jax.random.key(0), B))
obs_dim = None
pool, _ = vreset(jax.random.split(jax.random.key(2), B * R))
pool = jax.tree_util.tree_map(lambda x: x.reshape((B, R) + x.shape[1:]), pool)
outs = {}
for mode, interp in (("compiled", False), ("interpret", True)):
    run = make_pallas_train_rollout(spec, B, T, block=128, cap=CAP,
                                    hidden=(16, 16), reset_source="pool",
                                    pool_slots=R, interpret=interp)
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))
    o = jax.jit(lambda s, st, p, pl, b: run(s, st, p, pl, b))(
        7, state, params, pool, jnp.zeros((B,), jnp.int32))
    outs[mode] = jax.tree_util.tree_map(np.asarray, o)
    bank(f"{mode}_done_total", int(np.asarray(o[4]).sum()))

names = ["state", "obs", "act", "rew", "done", "base"]
ok = True
for i, nm in enumerate(names):
    a, b = outs["compiled"][i], outs["interpret"][i]
    la = jax.tree_util.tree_leaves(a); lb = jax.tree_util.tree_leaves(b)
    same = all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))
    bank(f"identical_{nm}", bool(same))
    ok &= same
bank("BIT_IDENTICAL", bool(ok))
