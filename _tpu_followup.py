"""One-process TPU follow-up: perf ablations, profiler trace, fused-policy
bench.  Run after the training queue so nothing contends for the chip."""
import time

from ngx.cli.perf import main

t0 = time.time()
print("=== ablations (B=65536, S=256) ===", flush=True)
main(["-batch", "65536", "-steps", "256", "-repeats", "3", "--profile"])
print(f"=== done in {time.time()-t0:.0f}s ===", flush=True)

t0 = time.time()
print("=== ablations (B=262144, S=256) ===", flush=True)
main(["-batch", "262144", "-steps", "256", "-repeats", "2"])
print(f"=== done in {time.time()-t0:.0f}s ===", flush=True)

t0 = time.time()
print("=== fused policy vs XLA scan (B=8192, S=256) ===", flush=True)
main(["--policy", "-batch", "8192", "-steps", "256", "-repeats", "2"])
print(f"=== done in {time.time()-t0:.0f}s ===", flush=True)

t0 = time.time()
print("=== fused policy vs XLA scan (B=65536, S=256) ===", flush=True)
main(["--policy", "-batch", "65536", "-steps", "256", "-repeats", "2"])
print(f"=== done in {time.time()-t0:.0f}s ===", flush=True)
