"""Benchmark: env-steps/s on one chip at 256k batched Pogostick-v1 envs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is the speedup over the reference implementation
(gtatiya/gym-novel-gridworlds) stepping a single Python env on this host —
the only runnable baseline, since the reference publishes no numbers
(BASELINE.md).  If the reference mount is missing, a recorded floor of
20,000 steps/s (measured on this image) is used.

Runs on whatever JAX's default platform is (the real TPU chip under the
driver; NGX_BENCH_PLATFORM=cpu to force CPU).
"""

import json
import numpy as np
import os
import sys
import time

# 256k envs saturates one v5e chip (85M steps/s @ 8k -> 170M @ 256k; flat
# beyond); state is ~110 MB so HBM is nowhere near a constraint
BATCH = int(os.environ.get("NGX_BENCH_BATCH", 262144))
STEPS = int(os.environ.get("NGX_BENCH_STEPS", 1024))
REPEATS = int(os.environ.get("NGX_BENCH_REPEATS", 3))
ENV_ID = os.environ.get("NGX_BENCH_ENV", "NovelGridworld-Pogostick-v1")
REF_FLOOR_STEPS_PER_S = 20000.0


def measure_reference(n_steps=3000):
    """Single-env random-action throughput of the mounted reference (CPU)."""
    try:
        import numpy as np
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        from reference_loader import make_ref_env, reference_available
        if not reference_available():
            return None
        ref = make_ref_env(ENV_ID)
        np.random.seed(0)
        ref.reset()
        rng = np.random.RandomState(1)
        n = ref.action_space.n
        t0 = time.perf_counter()
        for _ in range(n_steps):
            _, _, done, _ = ref.step(int(rng.randint(n)))
            if done:
                ref.reset()
        return n_steps / (time.perf_counter() - t0)
    except Exception:
        return None


def main():
    if os.environ.get("NGX_BENCH_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["NGX_BENCH_PLATFORM"])
    import jax
    import ngx
    from ngx.vector import throughput_fn

    spec = ngx.make_spec(ENV_ID)
    run = throughput_fn(spec, BATCH, STEPS)

    key = jax.random.key(0)
    state, mean_r = run(key)                       # compile + warmup
    float(mean_r)  # value fetch — block_until_ready can return early over
                   # the tunneled-TPU transport, so force the scalar home

    # per-repeat timing with a value fetch each time; report the best repeat
    # (the tunneled-TPU transport adds noisy per-launch latency)
    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        state, mean_r = run(jax.random.fold_in(key, i))
        v = float(mean_r)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(v)

    steps_per_s = BATCH * STEPS / min(times)
    ref = measure_reference() or REF_FLOOR_STEPS_PER_S

    print(json.dumps({
        "metric": f"env-steps/s/chip, {BATCH} batched {ENV_ID} envs "
                  f"(random actions, fused scan rollout; baseline = reference "
                  f"single-env Python loop on this host)",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / ref, 2),
    }))


if __name__ == "__main__":
    main()
