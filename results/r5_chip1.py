"""Round-5 chip measurement #1: pool-reset trainer kernel configs.

Verifies VERDICT item 1: novelty-injected specs (reset edits / wall-coin /
tap pre-placement) reach the fast (block 256, t_chunk 16) trainer-kernel
config via reset_source='pool', and measures acting + full-train-step
throughput.  Banks results progressively to results/r5_chip1.json.
"""
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import ngx                                                    # noqa: E402
from ngx.transforms import lidar_in_front                     # noqa: E402
from ngx.rl.train import PPOConfig, make_train                # noqa: E402
from ngx.ops.pallas_rollout import make_pallas_train_rollout  # noqa: E402
from ngx.core.reset import make_reset                         # noqa: E402
from ngx.rl.models import ActorCritic                         # noqa: E402

OUT = os.path.join(HERE, "r5_chip1.json")
res = {}


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


B, T, R = 8192, 64, 4


def measure_roll(spec, blk, tck, source, reps=3):
    spec_l = lidar_in_front(spec)
    run = make_pallas_train_rollout(spec_l, B, T, block=blk, t_chunk=tck,
                                    cap=100, hidden=(64, 64),
                                    reset_source=source, pool_slots=R)
    model = ActorCritic(n_actions=spec_l.n_actions, hidden=(64, 64))
    reset1 = make_reset(spec_l)
    vreset = jax.jit(jax.vmap(reset1))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))

    if source == "pool":
        @jax.jit
        def launch(seed, state, params, key):
            pool, _ = jax.vmap(reset1)(jax.random.split(key, B * R))
            pool = jax.tree_util.tree_map(
                lambda x: x.reshape((B, R) + x.shape[1:]), pool)
            out = run(seed, state, params, pool, jnp.zeros((B,), jnp.int32))
            return out[0], out[3]
    else:
        @jax.jit
        def launch(seed, state, params, key):
            out = run(seed, state, params)
            return out[0], out[3]

    t0 = time.time()
    st, rew = launch(7, state, params, jax.random.key(2))
    jax.block_until_ready(rew)
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        st, rew = launch(7 + i, st, params, jax.random.key(3 + i))
        float(rew.sum())
        times.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                steps_per_s=round(B * T / min(times)))


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

JOBS = [
    ("roll_firewall_pool_256_16", "firewall_easy", 256, 16, "pool"),
    ("roll_fence_pool_256_16", "fence_medium", 256, 16, "pool"),
    ("roll_pogov0_pool_256_16", "pogostick_v0", 256, 16, "pool"),
    ("roll_plain_native_512_16", "plain", 512, 16, "native"),
    ("roll_plain_native_512_32", "plain", 512, 32, "native"),
    ("roll_firewall_pool_512_16", "firewall_easy", 512, 16, "pool"),
]
for name, sk, blk, tck, src in JOBS:
    try:
        bank(name, measure_roll(SPECS[sk], blk, tck, src))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:500]))
        traceback.print_exc()

for name, sk in [("train_firewall_pallas", "firewall_easy"),
                 ("train_plain_pallas", "plain")]:
    try:
        bank(name, measure_train_step(SPECS[sk]))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:500]))
        traceback.print_exc()

bank("done", True)
