"""Round-5 chip measurement #8: bit-packed scan carry vs unpacked."""
import json, os, sys, time, traceback
import jax
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(ROOT); sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import ngx
from ngx.vector import throughput_fn

OUT = os.path.join(ROOT, "results", "r5_chip8.json")
res = {}
def bank(k, v):
    res[k] = v
    json.dump(res, open(OUT, "w"), indent=1)
    print("BANK", k, v, flush=True)

spec = ngx.make_spec("NovelGridworld-Pogostick-v1")
print("devices:", jax.devices(), flush=True)
for name, b, s, pk in [
        ("plain_8192_1024", 8192, 1024, False),
        ("packed_8192_1024", 8192, 1024, True),
        ("plain_262144_1024", 262144, 1024, False),
        ("packed_262144_1024", 262144, 1024, True),
        ("packed_262144_256", 262144, 256, True)]:
    try:
        run = throughput_fn(spec, b, s, packed=pk)
        key = jax.random.key(0)
        t0 = time.time(); st, mr = run(key); float(mr)
        cs = time.time() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter(); st, mr = run(jax.random.fold_in(key, i+1)); float(mr)
            ts.append(time.perf_counter() - t0)
        bank(name, dict(compile_s=round(cs,1), steps_per_s=round(b*s/min(ts))))
    except Exception as e:
        bank(name, dict(error=str(e)[:300]))
        traceback.print_exc()
# parity on-chip too
try:
    a = throughput_fn(spec, 256, 64); b2 = throughput_fn(spec, 256, 64, packed=True)
    k = jax.random.key(5)
    _, ra = a(k); _, rb = b2(k)
    bank("parity", dict(plain=float(ra), packed=float(rb),
                        identical=bool(float(ra) == float(rb))))
except Exception as e:
    bank("parity", dict(error=str(e)[:300]))
bank("done", True)
