import json, os, sys, time
import jax
ROOT = "/root/repo"
os.chdir(ROOT); sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from ngx.rl.train import PPOConfig, make_train

B = 8192
def measure(T, reps=3):
    cfg = PPOConfig(num_envs=B, rollout_steps=T, hidden=(64, 64))
    init, train_step = make_train(cfg, rollout_backend="pallas")
    carry = init(jax.random.key(0))
    step = jax.jit(train_step)
    t0 = time.time(); carry, m = step(carry, jax.random.key(1)); float(m["mean_reward"])
    cs = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.perf_counter(); carry, m = step(carry, jax.random.key(2+i)); float(m["mean_reward"])
        ts.append(time.perf_counter() - t0)
    print(f"RESULT T={T}: compile {cs:.1f}s, {1e3*min(ts):.0f} ms/update, "
          f"{B*T/min(ts)/1e6:.2f}M steps/s", flush=True)

print("devices:", jax.devices(), flush=True)
for T in (128, 96):
    measure(T)
