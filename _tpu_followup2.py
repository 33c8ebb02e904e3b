"""Fused-policy retry at VMEM-fitting block sizes + 65536 ablation re-run."""
from ngx.cli.perf import main

print("=== ablations (B=65536, S=256) ===", flush=True)
main(["-batch", "65536", "-steps", "256", "-repeats", "3"])
for blk in (128, 256):
    print(f"=== fused policy vs XLA scan (B=8192, S=256, block={blk}) ===",
          flush=True)
    try:
        main(["--policy", "-batch", "8192", "-steps", "256", "-repeats", "2",
              "-block", str(blk)])
    except Exception as e:
        print("failed:", repr(e)[:300], flush=True)
