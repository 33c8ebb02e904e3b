"""Compiled-vs-interpret parity on TPU + scale the fused-policy measurement."""
import time
import jax, jax.numpy as jnp
import ngx
from ngx.transforms import lidar_in_front
from ngx.ops.pallas_rollout import make_pallas_rollout, make_xla_policy_rollout
from ngx.rl.models import ActorCritic

spec = lidar_in_front(ngx.make_spec("NovelGridworld-Pogostick-v1"))
model = ActorCritic(n_actions=spec.n_actions, hidden=(64, 64))
obs0 = ngx.make_reset(spec)(jax.random.key(0))[1]
params = model.init(jax.random.key(1), jnp.zeros((1, obs0.shape[0]), jnp.float32))

# 1. compiled == interpret (same counter-hash RNG -> identical trajectories)
kw = dict(block=64, action_source="policy", policy_params=params)
ci = make_pallas_rollout(spec, 128, 8, interpret=True, **kw)
cc = make_pallas_rollout(spec, 128, 8, interpret=False, **kw)
si, mi, di = ci(3); sc, mc, dc = jax.jit(cc)(3)
print("interpret mean_r", float(mi), "dones", int(di), flush=True)
print("compiled  mean_r", float(mc), "dones", int(dc), flush=True)
import numpy as np
print("state equal:", all(np.array_equal(np.asarray(a), np.asarray(b))
      for a, b in zip(jax.tree_util.tree_leaves(si), jax.tree_util.tree_leaves(sc))), flush=True)

# 2. scale: fused at B=65536
for B, blk in ((65536, 256), (65536, 512)):
    try:
        run = make_pallas_rollout(spec, B, 256, block=blk,
                                  action_source="policy", policy_params=params)
        f = jax.jit(run)
        out = f(0); float(out[1])
        t0 = time.perf_counter(); out = f(1); float(out[1])
        dt = time.perf_counter() - t0
        print(f"fused B={B} blk={blk}: {B*256/dt/1e6:.1f}M steps/s", flush=True)
    except Exception as e:
        print(f"fused B={B} blk={blk} failed: {repr(e)[:160]}", flush=True)

# 3. XLA comparator at B=65536
x = make_xla_policy_rollout(spec, params, 65536, 256)
out = x(jax.random.key(0)); float(out[1])
t0 = time.perf_counter(); out = x(jax.random.key(1)); float(out[1])
dt = time.perf_counter() - t0
print(f"xla B=65536: {65536*256/dt/1e6:.1f}M steps/s", flush=True)
