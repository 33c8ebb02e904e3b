"""Round-5 chip measurement #5: validate the new 256-block frontier at
off-sweet-spot rollout lengths (T=40 solver shape, T=16, T=100)."""
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
from ngx.ops.pallas_rollout import make_pallas_train_rollout  # noqa: E402
from ngx.core.reset import make_reset                         # noqa: E402
from ngx.rl.models import ActorCritic                         # noqa: E402

OUT = os.path.join(HERE, "r5_chip5.json")
res = {}
B = 8192


def bank(k, v):
    res[k] = v
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print("BANK", k, v, flush=True)


def measure(spec, blk, tck, steps, reps=3):
    spec_l = lidar_in_front(spec)
    run = make_pallas_train_rollout(spec_l, B, steps, block=blk, t_chunk=tck,
                                    cap=100, hidden=(64, 64))
    model = ActorCritic(n_actions=spec_l.n_actions, hidden=(64, 64))
    vreset = jax.jit(jax.vmap(make_reset(spec_l)))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))

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


print("devices:", jax.devices(), flush=True)
PLAIN = ngx.make_spec("NovelGridworld-Pogostick-v1")
for name, blk, tck, steps in [
        ("roll_T40_256_t64", 256, 64, 40),     # solver shape, now blk 256
        ("roll_T40_128_t64", 128, 64, 40),     # old solver config
        ("roll_T16_256_t64", 256, 64, 16),
        ("roll_T100_256_t64", 256, 64, 100)]:
    try:
        bank(name, measure(PLAIN, blk, tck, steps))
    except Exception as e:
        bank(name, dict(error=f"{type(e).__name__}: {e}"[:400]))
        traceback.print_exc()
bank("done", True)
