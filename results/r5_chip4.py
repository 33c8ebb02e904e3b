"""Round-5 chip measurement #4: perf corners opened by the VMEM fix.

1. firewall pool with pool_slots=2 (halves pool-gen) — close the 9% gap?
2. policy-rollout (non-trainer) kernel at block 512 (previously VMEM-OOM).
3. T=256 trainer rollouts with bigger t_chunks / full-T blocks.
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

import ngx                                                    # noqa: E402
from ngx.transforms import lidar_in_front                     # noqa: E402
from ngx.ops.pallas_rollout import (                          # noqa: E402
    make_pallas_rollout, make_pallas_train_rollout, make_xla_pool_reset)
from ngx.core.reset import make_reset                         # noqa: E402
from ngx.rl.models import ActorCritic                         # noqa: E402

OUT = os.path.join(HERE, "r5_chip4.json")
res = {}


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


B = 8192


def measure_train_roll(spec, blk, tck, source, steps, slots=4, reps=3):
    spec_l = lidar_in_front(spec)
    run = make_pallas_train_rollout(spec_l, B, steps, block=blk, t_chunk=tck,
                                    cap=100, hidden=(64, 64),
                                    reset_source=source, pool_slots=slots)
    model = ActorCritic(n_actions=spec_l.n_actions, hidden=(64, 64))
    vreset = jax.jit(jax.vmap(make_reset(spec_l)))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))
    if source == "pool":
        pool_gen = make_xla_pool_reset(spec_l, B * slots)

        @jax.jit
        def launch(seed, state, params):
            pool = pool_gen(seed * 7 + 13)
            pool = jax.tree_util.tree_map(
                lambda x: x.reshape((B, slots) + x.shape[1:]), pool)
            out = run(seed, state, params, pool, jnp.zeros((B,), jnp.int32))
            return out[0], out[3]
    else:
        @jax.jit
        def launch(seed, state, params):
            out = run(seed, state, params)
            return out[0], out[3]
    t0 = time.time()
    st, rew = launch(7, state, params)
    float(rew.sum())
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        st, rew = launch(7 + i, st, params)
        float(rew.sum())
        times.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                steps_per_s=round(B * steps / min(times)))


def measure_policy_roll(blk, steps=256, reps=3):
    spec_l = lidar_in_front(ngx.make_spec("NovelGridworld-Pogostick-v1"))
    model = ActorCritic(n_actions=spec_l.n_actions, hidden=(64, 64))
    vreset = jax.jit(jax.vmap(make_reset(spec_l)))
    _, obs0 = vreset(jax.random.split(jax.random.key(0), 1))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, obs0.shape[-1]), jnp.float32))
    run = make_pallas_rollout(spec_l, B, steps, block=blk,
                              action_source="policy", policy_params=params)
    t0 = time.time()
    st, mr, nd = jax.jit(run)(3)
    float(mr)
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        st, mr, nd = jax.jit(run)(4 + i)
        float(mr)
        times.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                steps_per_s=round(B * steps / min(times)))


print("devices:", jax.devices(), flush=True)

PLAIN = ngx.make_spec("NovelGridworld-Pogostick-v1")
FIRE = ngx.inject_novelty(PLAIN, "firewall", "easy")

JOBS = [
    ("roll_firewall_pool2_256_16",
     lambda: measure_train_roll(FIRE, 256, 16, "pool", 64, slots=2)),
    ("policy_roll_512", lambda: measure_policy_roll(512)),
    ("policy_roll_256", lambda: measure_policy_roll(256)),
    ("roll_T256_256_t64",
     lambda: measure_train_roll(PLAIN, 256, 64, "native", 256)),
    ("roll_T256_128_full1d",
     lambda: measure_train_roll(PLAIN, 128, 256, "native", 256)),
    ("roll_T256_256_t128",
     lambda: measure_train_roll(PLAIN, 256, 128, "native", 256)),
]
for name, fn in JOBS:
    try:
        bank(name, fn())
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:400]))
        traceback.print_exc()

bank("done", True)
