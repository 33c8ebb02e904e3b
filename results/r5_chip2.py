"""Round-5 chip measurement #2: fast pool gen, cliff retirement, roofline.

1. Re-measures the pool-reset configs with make_xla_pool_reset (scatter-free
   pool generation) — target: within ~5% of the plain native config.
2. Retires the round-4 "Mosaic compile cliffs": re-tries every config that
   previously crashed, under the raised scoped-VMEM limit.
3. Roofline inputs: compiled-HLO cost analysis (flops / bytes accessed) for
   the env-stepping kernel and measured times.
"""
import json
import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import ngx                                                    # noqa: E402
from ngx.transforms import lidar_in_front                     # noqa: E402
from ngx.rl.train import PPOConfig, make_train                # noqa: E402
from ngx.ops.pallas_rollout import (                          # noqa: E402
    make_pallas_train_rollout, make_xla_pool_reset)
from ngx.core.reset import make_reset                         # noqa: E402
from ngx.rl.models import ActorCritic                         # noqa: E402

OUT = os.path.join(HERE, "r5_chip2.json")
res = {}


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


B, T, R = 8192, 64, 4


def measure_roll(spec, blk, tck, source, reps=3, steps=T):
    spec_l = lidar_in_front(spec)
    run = make_pallas_train_rollout(spec_l, B, steps, block=blk, t_chunk=tck,
                                    cap=100, hidden=(64, 64),
                                    reset_source=source, pool_slots=R)
    model = ActorCritic(n_actions=spec_l.n_actions, hidden=(64, 64))
    vreset = jax.jit(jax.vmap(make_reset(spec_l)))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))

    if source == "pool":
        pool_gen = make_xla_pool_reset(spec_l, B * R)

        @jax.jit
        def launch(seed, state, params):
            pool = pool_gen(seed * 7 + 13)
            pool = jax.tree_util.tree_map(
                lambda x: x.reshape((B, R) + x.shape[1:]), pool)
            out = run(seed, state, params, pool, jnp.zeros((B,), jnp.int32))
            return out[0], out[3]
    else:
        @jax.jit
        def launch(seed, state, params):
            out = run(seed, state, params)
            return out[0], out[3]

    t0 = time.time()
    st, rew = launch(7, state, params)
    jax.block_until_ready(rew)
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        st, rew = launch(7 + i, st, params)
        float(rew.sum())
        times.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                steps_per_s=round(B * steps / min(times)))


def measure_train_step(spec, reps=3, backend="pallas"):
    cfg = PPOConfig(num_envs=B, rollout_steps=T, hidden=(64, 64))
    init, train_step = make_train(cfg, spec_override=spec,
                                  rollout_backend=backend)
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    t0 = time.time()
    carry, m = step(carry, jax.random.key(1))
    float(m["mean_reward"])
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        carry, m = step(carry, jax.random.key(2 + i))
        float(m["mean_reward"])
        times.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                steps_per_s=round(B * T / min(times)),
                ms_per_update=round(1e3 * min(times)))


SPECS = {
    "plain": ngx.make_spec("NovelGridworld-Pogostick-v1"),
    "firewall_easy": ngx.inject_novelty(
        ngx.make_spec("NovelGridworld-Pogostick-v1"), "firewall", "easy"),
    "fence_medium": ngx.inject_novelty(
        ngx.make_spec("NovelGridworld-Pogostick-v1"), "fence", "medium",
        "oak"),
    "pogostick_v0": ngx.make_spec("NovelGridworld-Pogostick-v0"),
}

print("devices:", jax.devices(), flush=True)
t0 = time.time()
jnp.zeros((8, 128)).block_until_ready()
bank("spinup_s", round(time.time() - t0, 1))

# 1. fast pool gen at the fast config
for name, sk, blk, tck, src in [
        ("roll_plain_native_256_16", "plain", 256, 16, "native"),
        ("roll_firewall_fastpool_256_16", "firewall_easy", 256, 16, "pool"),
        ("roll_fence_fastpool_256_16", "fence_medium", 256, 16, "pool"),
        ("roll_pogov0_fastpool_256_16", "pogostick_v0", 256, 16, "pool")]:
    try:
        bank(name, measure_roll(SPECS[sk], blk, tck, src))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:400]))
        traceback.print_exc()

# 2. cliff retirement: every round-4 crasher, raised scoped-VMEM limit
for name, sk, blk, tck, src in [
        ("cliff_plain_native_256_1d", "plain", 256, 64, "native"),  # 1D grid
        ("cliff_plain_native_256_32", "plain", 256, 32, "native"),
        ("cliff_firewall_NATIVE_256_16", "firewall_easy", 256, 16, "native"),
        ("cliff_plain_native_512_64_1d", "plain", 512, 64, "native")]:
    try:
        bank(name, measure_roll(SPECS[sk], blk, tck, src))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:400]))
        traceback.print_exc()

# 3. end-to-end train steps with the fast pool
for name, sk in [("train_firewall_fastpool", "firewall_easy"),
                 ("train_pogov0_fastpool", "pogostick_v0")]:
    try:
        bank(name, measure_train_step(SPECS[sk]))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:400]))
        traceback.print_exc()

# 4. roofline: cost analysis + measured time of the env-stepping kernel
try:
    from ngx.vector import throughput_fn
    spec = SPECS["plain"]
    for nm, bb, ss in [("roofline_8192", 8192, 1024),
                       ("roofline_262144", 262144, 256)]:
        runf = throughput_fn(spec, bb, ss)
        key = jax.random.key(0)
        lowered = jax.jit(lambda k: runf(k)).lower(key)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", -1))
        bytes_ = float(ca.get("bytes accessed", -1))
        state, mr = runf(key)
        float(mr)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            state, mr = runf(jax.random.fold_in(key, i + 1))
            float(mr)
            times.append(time.perf_counter() - t0)
        tmin = min(times)
        bank(nm, dict(
            flops=flops, bytes_accessed=bytes_,
            transcendentals=float(ca.get("transcendentals", -1)),
            time_s=round(tmin, 4),
            steps_per_s=round(bb * ss / tmin),
            flops_per_step=round(flops / (bb * ss), 1),
            bytes_per_step=round(bytes_ / (bb * ss), 1),
            achieved_gflops=round(flops / tmin / 1e9, 1),
            achieved_gbs=round(bytes_ / tmin / 1e9, 2)))
except Exception as e:
    bank("roofline_error", f"{type(e).__name__}: {e}"[:400])
    traceback.print_exc()

bank("done", True)
