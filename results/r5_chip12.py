"""Round-5 chip measurement #12: train-step throughput for the remaining
spec families — crate (f32 obs emission: the summed bf16 bound exceeds 255)
and axe-hard (recipe + action extended), both via the pool reset path."""
import json, os, sys, time, traceback
import jax
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT); sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import ngx
from ngx.rl.train import PPOConfig, make_train

OUT = os.path.join(ROOT, "results", "r5_chip12.json")
res = {}
def bank(k, v):
    res[k] = v
    json.dump(res, open(OUT, "w"), indent=1)
    print("BANK", k, v, flush=True)

B, T = 8192, 64
def measure(spec, reps=3):
    cfg = PPOConfig(num_envs=B, rollout_steps=T, hidden=(64, 64))
    init, step_fn = make_train(cfg, spec_override=spec,
                               rollout_backend="pallas")
    carry = init(jax.random.key(0))
    step = jax.jit(step_fn)
    t0 = time.time(); carry, m = step(carry, jax.random.key(1)); float(m["mean_reward"])
    cs = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter(); carry, m = step(carry, jax.random.key(2+i)); float(m["mean_reward"])
        ts.append(time.perf_counter() - t0)
    return dict(compile_s=round(cs,1), steps_per_s=round(B*T/min(ts)),
                ms_per_update=round(1e3*min(ts)))

print("devices:", jax.devices(), flush=True)
base = ngx.make_spec("NovelGridworld-Pogostick-v1")
for name, spec in [
        ("train_crate_f32obs", ngx.inject_novelty(base, "crate", "medium")),
        ("train_axehard", ngx.inject_novelty(base, "axe", "hard", "wooden")),
        ("train_fence_med", ngx.inject_novelty(base, "fence", "medium", "oak"))]:
    try:
        bank(name, measure(spec))
    except Exception as e:
        bank(name, dict(error=str(e)[:300]))
        traceback.print_exc()
bank("done", True)
