import time
from ngx.cli.train import main

JOBS = [
    # weak legacy agents: 4M steps
    ("NovelGridworld-v1", "4000000", "1024", "0.01"),
    ("NovelGridworld-v4", "4000000", "1024", "0.01"),
    ("NovelGridworld-v0", "2000000", "1024", "0.01"),
    # modern envs: longer, to push actual goal completion (Bow-v0 solved at 8M)
    ("NovelGridworld-v5", "12000000", "2048", "0.01"),
    ("NovelGridworld-v6", "12000000", "2048", "0.01"),
    ("NovelGridworld-Bow-v1", "8000000", "2048", "0.01"),
    ("NovelGridworld-Pogostick-v0", "8000000", "2048", "0.01"),
    ("NovelGridworld-Pogostick-v1", "12000000", "2048", "0.01"),
]
for env, steps, nenv, ent in JOBS:
    t0 = time.time()
    print(f"=== training {env} ({steps} steps) ===", flush=True)
    main(["-env", env, "-steps", steps, "-num_envs", nenv, "-ent_coef", ent,
          "-log", f"results/{env}", "-ckpt", f"trained_agents/{env}"])
    print(f"=== {env} done in {time.time()-t0:.0f}s ===", flush=True)
