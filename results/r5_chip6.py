"""Round-5 chip measurement #6: where the PPO update phase's time goes.

The train step at B=8192/T=64 costs ~220ms of which acting is ~93ms; the
remaining ~130ms is the minibatch-epoch update.  Sweep epochs x
num_minibatches to attribute it (sequential minibatch iterations vs per-
sample math), and measure the SB2-default (4 epochs x 4 minibatches) shape.
"""
import json
import os
import sys
import time
import traceback

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from ngx.rl.train import PPOConfig, make_train                # noqa: E402

OUT = os.path.join(HERE, "r5_chip6.json")
res = {}


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


B, T = 8192, 64


def measure(epochs, mb, reps=3):
    cfg = PPOConfig(num_envs=B, rollout_steps=T, hidden=(64, 64),
                    epochs=epochs, num_minibatches=mb)
    init, train_step = make_train(cfg, rollout_backend="pallas")
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    t0 = time.time()
    carry, m = step(carry, jax.random.key(1))
    float(m["mean_reward"])
    compile_s = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        carry, m = step(carry, jax.random.key(2 + i))
        float(m["mean_reward"])
        ts.append(time.perf_counter() - t0)
    return dict(compile_s=round(compile_s, 1),
                ms_per_update=round(1e3 * min(ts)),
                steps_per_s=round(B * T / min(ts)))


print("devices:", jax.devices(), flush=True)
for ep, mb in [(4, 8), (4, 4), (4, 1), (1, 8), (1, 1), (4, 32)]:
    try:
        bank(f"train_e{ep}_mb{mb}", measure(ep, mb))
    except Exception as e:
        bank(f"train_e{ep}_mb{mb}", dict(error=f"{type(e).__name__}: {e}"[:300]))
        traceback.print_exc()
bank("done", True)
