"""Benchmark: env-steps/s on one chip for batched Pogostick-v1 envs.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

vs_baseline is the speedup over the reference implementation
(gtatiya/gym-novel-gridworlds) stepping a single Python env on this host —
the only runnable baseline, since the reference publishes no numbers
(BASELINE.md).  A recorded floor of 20,000 steps/s (measured on this image)
is used by default; NGX_BENCH_MEASURE_REF=1 re-measures it live.

Robustness: the tunneled-TPU transport ("axon") can stall for minutes at a
time (remote compile / fetch hangs), which is how round 1's driver run died
with rc=124 and no number.  This bench therefore:
  * runs STAGES of increasing batch size, banking a result after each, so a
    later stall can't erase an earlier measurement;
  * arms a hard watchdog (NGX_BENCH_BUDGET_S, default 210s) that prints the
    best banked JSON line and exits 0 even mid-stall;
  * keeps a persistent XLA compilation cache under .jax_cache/ so repeat runs
    skip compilation entirely.

NGX_BENCH_FULL=1 adds the chip-saturating 256k-env stage (the r1 headline
config).  NGX_BENCH_PLATFORM=cpu forces CPU.  --profile writes a
jax.profiler trace under results/profile/ (see docs/PERF.md).
"""

import json
import os
import sys
import threading
import time

import numpy as np

REF_FLOOR_STEPS_PER_S = 20000.0
ENV_ID = os.environ.get("NGX_BENCH_ENV", "NovelGridworld-Pogostick-v1")
BUDGET_S = float(os.environ.get("NGX_BENCH_BUDGET_S", 210))
_T0 = time.time()

# (batch, scan_steps, timed_repeats) — first stage is sized to bank a number
# within ~1 min even with a cold compile over the tunnel; later stages only
# raise the measurement toward the chip-saturating figure.
STAGES = [
    (8192, 128, 2),
    (65536, 256, 2),
]
if os.environ.get("NGX_BENCH_FULL"):
    STAGES.append((262144, 1024, 3))

_best = {"value": None, "batch": None}
_printed = threading.Event()


def _emit_and_exit(rc=0):
    """Print the single JSON result line exactly once, then hard-exit."""
    if _printed.is_set():
        os._exit(rc)
    _printed.set()
    v = _best["value"]
    ref = _best.get("ref") or REF_FLOOR_STEPS_PER_S
    if v is None:
        # nothing measured at all (total stall before stage 1 finished)
        print(json.dumps({
            "metric": f"env-steps/s/chip, batched {ENV_ID} envs "
                      f"(NO MEASUREMENT: device stalled for the whole "
                      f"{BUDGET_S:.0f}s budget)",
            "value": 0,
            "unit": "env-steps/s",
            "vs_baseline": 0.0,
        }), flush=True)
        os._exit(rc)
    print(json.dumps({
        "metric": f"env-steps/s/chip, {_best['batch']} batched {ENV_ID} envs "
                  f"(random actions, fused scan rollout; baseline = reference "
                  f"single-env Python loop on this host)",
        "value": round(v),
        "unit": "env-steps/s",
        "vs_baseline": round(v / ref, 2),
    }), flush=True)
    os._exit(rc)


def _watchdog():
    remaining = BUDGET_S - (time.time() - _T0)
    if remaining > 0:
        time.sleep(remaining)
    print(f"[bench] watchdog fired at {BUDGET_S}s — emitting best-so-far",
          file=sys.stderr, flush=True)
    _emit_and_exit(0)


def measure_reference(n_steps=2000):
    """Single-env random-action throughput of the mounted reference (CPU)."""
    try:
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
    profile = "--profile" in sys.argv
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    if os.environ.get("NGX_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["NGX_BENCH_PLATFORM"])
    # persistent compile cache: repeat runs (and the driver's run after this
    # session warmed it) skip XLA compilation entirely
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import ngx
    from ngx.vector import throughput_fn

    spec = ngx.make_spec(ENV_ID)
    key = jax.random.key(0)

    if os.environ.get("NGX_BENCH_MEASURE_REF"):
        _best["ref"] = measure_reference() or REF_FLOOR_STEPS_PER_S
    else:
        _best["ref"] = REF_FLOOR_STEPS_PER_S

    for batch, steps, repeats in STAGES:
        try:
            t0 = time.time()
            run = throughput_fn(spec, batch, steps)
            state, mean_r = run(key)            # compile + warmup
            float(mean_r)  # force the scalar home — block_until_ready can
            #                return early over the tunneled-TPU transport
            print(f"[bench] B={batch} S={steps}: compile+warmup "
                  f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
            times = []
            for i in range(repeats):
                t0 = time.perf_counter()
                state, mean_r = run(jax.random.fold_in(key, i + 1))
                v = float(mean_r)
                times.append(time.perf_counter() - t0)
                assert np.isfinite(v)
            sps = batch * steps / min(times)
            print(f"[bench] B={batch} S={steps}: {sps/1e6:.1f}M steps/s",
                  file=sys.stderr, flush=True)
            if _best["value"] is None or sps > _best["value"]:
                _best["value"] = sps
                _best["batch"] = batch
        except Exception as e:                  # bank what we have, move on
            print(f"[bench] stage B={batch} failed: {e!r}",
                  file=sys.stderr, flush=True)
        # don't start another cold compile without headroom for it
        if time.time() - _T0 > BUDGET_S * 0.6:
            break

    if profile and _best["value"] is not None:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "results", "profile")
        os.makedirs(outdir, exist_ok=True)
        batch, steps, _ = STAGES[0]
        run = throughput_fn(spec, batch, steps)
        with jax.profiler.trace(outdir):
            state, mean_r = run(jax.random.fold_in(key, 99))
            float(mean_r)
        print(f"[bench] profiler trace written to {outdir}",
              file=sys.stderr, flush=True)

    _emit_and_exit(0)


if __name__ == "__main__":
    main()
