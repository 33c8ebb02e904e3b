import json, os, sys, time, traceback
import jax
ROOT = "/root/repo"
os.chdir(ROOT); sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from ngx.rl.train import PPOConfig, make_train
OUT = os.path.join(ROOT, "results", "r5_chip7.json")
res = {}
def bank(k, v):
    res[k] = v
    json.dump(res, open(OUT, "w"), indent=1)
    print("BANK", k, v, flush=True)
B, T = 8192, 64
def measure(shuffle, reps=3):
    cfg = PPOConfig(num_envs=B, rollout_steps=T, hidden=(64, 64), shuffle=shuffle)
    init, train_step = make_train(cfg, rollout_backend="pallas")
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    t0 = time.time(); carry, m = step(carry, jax.random.key(1)); float(m["mean_reward"])
    cs = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter(); carry, m = step(carry, jax.random.key(2+i)); float(m["mean_reward"])
        ts.append(time.perf_counter() - t0)
    return dict(compile_s=round(cs,1), ms_per_update=round(1e3*min(ts)),
                steps_per_s=round(B*T/min(ts)))
for sh in ("affine", "permutation"):
    try:
        bank(f"train_shuffle_{sh}", measure(sh))
    except Exception as e:
        bank(f"train_shuffle_{sh}", dict(error=str(e)[:300]))
        traceback.print_exc()
bank("done", True)
