import time
from ngx.cli.train import main
JOBS = [
    ("NovelGridworld-Pogostick-v1", "demos/pogostick_v1.npz"),
    ("NovelGridworld-v6", "demos/pogostick_v1.npz"),
    ("NovelGridworld-v5", "demos/NovelGridworld-v5.npz"),
    ("NovelGridworld-Bow-v1", "demos/NovelGridworld-Bow-v1.npz"),
    ("NovelGridworld-Pogostick-v0", "demos/NovelGridworld-Pogostick-v0.npz"),
]
for env, npz in JOBS:
    t0 = time.time()
    print(f"=== {env} (BC warm start + PPO) ===", flush=True)
    main(["-env", env, "-steps", "8000000", "-num_envs", "2048",
          "-lr", "1e-4", "-ent_coef", "0.005",
          "-pretrain", npz, "-pretrain_steps", "1000",
          "-log", f"results/{env}", "-ckpt", f"trained_agents/{env}"])
    print(f"=== {env} done in {time.time()-t0:.0f}s ===", flush=True)
