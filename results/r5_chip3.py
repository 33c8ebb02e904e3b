"""Round-5 chip measurement #3: fused chain-trainer throughput.

Measures the chain train step (pallas pool-restore backend), the per-launch
re-chain refresh (P=1024 pool), and the combined steady rate at
updates_per_launch=16 — VERDICT item 4's >=2M steps/s target.
"""
import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ngx.rl.curriculum import make_train_chain                # noqa: E402
from ngx.rl.train import PPOConfig                            # noqa: E402
from ngx.utils.checkpoint import restore_pytree               # noqa: E402

OUT = os.path.join(HERE, "r5_chip3.json")
res = {}


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


B, T, K = 8192, 48, 16
CH = ["NovelGridworld-v2", "NovelGridworld-v3", "NovelGridworld-v4",
      "NovelGridworld-v5"]
stage_params = [
    restore_pytree(os.path.join("trained_agents/chain", e, "best"))["params"]
    for e in CH[:-1]]

print("devices:", jax.devices(), flush=True)

try:
    cfg = PPOConfig(env_id=CH[-1], num_envs=B, rollout_steps=T,
                    hidden=(64, 64), solve_shaped=True)
    init, train_step = make_train_chain(cfg, CH, stage_params,
                                        rollout_backend="pallas")
    refresh = jax.jit(train_step.refresh_pool)
    multi = jax.jit(lambda c, ks: jax.lax.scan(train_step, c, ks))

    t0 = time.time()
    carry = init(jax.random.key(0))
    jax.block_until_ready(carry[0].params)
    bank("init_s", round(time.time() - t0, 1))

    t0 = time.time()
    carry = refresh(carry, jax.random.key(1))
    jax.block_until_ready(carry[5].map)
    bank("refresh_compile_s", round(time.time() - t0, 1))
    ts_ = []
    for i in range(3):
        t0 = time.perf_counter()
        carry = refresh(carry, jax.random.fold_in(jax.random.key(1), i))
        jax.block_until_ready(carry[5].map)
        ts_.append(time.perf_counter() - t0)
    bank("refresh_s", round(min(ts_), 3))

    keys = jnp.stack([jax.random.fold_in(jax.random.key(2), i)
                      for i in range(K)])
    t0 = time.time()
    carry, m = multi(carry, keys)
    float(m["mean_reward"][-1])
    bank("launch_compile_s", round(time.time() - t0, 1))
    ts_ = []
    for i in range(3):
        keys = jnp.stack([jax.random.fold_in(jax.random.key(3 + i), j)
                          for j in range(K)])
        t0 = time.perf_counter()
        carry = refresh(carry, jax.random.fold_in(jax.random.key(9), i))
        carry, m = multi(carry, keys)
        float(m["mean_reward"][-1])
        ts_.append(time.perf_counter() - t0)
    t_launch = min(ts_)
    bank("steady", dict(
        s_per_launch=round(t_launch, 2),
        updates_per_launch=K,
        steps_per_s=round(K * B * T / t_launch),
        note="includes the per-launch P=1024 re-chain refresh"))
except Exception as e:
    bank("error", f"{type(e).__name__}: {e}"[:500])
    traceback.print_exc()

bank("done", True)
