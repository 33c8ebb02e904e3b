"""Executable repro of the rounds-2..4 "Mosaic compile cliff" root cause.

Compiles the SAME trainer-kernel config (block 256, t_chunk 16, pool
inputs) twice: once under Mosaic's historical 16MiB scoped-VMEM budget —
expected to fail with the scoped-allocation OOM that the axon
remote-compile helper surfaces as a bare HTTP 500 — and once under the
96MiB limit the kernels now pass, which compiles and runs.  See
docs/MOSAIC_BUGS.md; run on the chip: python results/mosaic_vmem_repro.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
os.chdir(ROOT)
sys.path.insert(0, ROOT)

import ngx                                                    # noqa: E402
from ngx.ops import pallas_rollout as PR                      # noqa: E402
from ngx.transforms import lidar_in_front                     # noqa: E402
from ngx.core.reset import make_reset                         # noqa: E402
from ngx.rl.models import ActorCritic                         # noqa: E402

B, T, R = 8192, 64, 4
spec = lidar_in_front(
    ngx.inject_novelty(ngx.make_spec("NovelGridworld-Pogostick-v1"),
                       "firewall", "easy"))


def build_and_run(vmem_limit):
    PR._VMEM_LIMIT = vmem_limit
    run = PR.make_pallas_train_rollout(spec, B, T, block=256, t_chunk=16,
                                       cap=100, hidden=(64, 64),
                                       reset_source="pool", pool_slots=R)
    model = ActorCritic(n_actions=spec.n_actions, hidden=(64, 64))
    vreset = jax.jit(jax.vmap(make_reset(spec)))
    state, _ = vreset(jax.random.split(jax.random.key(0), B))
    params = model.init(jax.random.key(1),
                        jnp.zeros((1, run.obs_dim), jnp.float32))
    pool_gen = PR.make_xla_pool_reset(spec, B * R)

    @jax.jit
    def launch(seed, state, params):
        pool = pool_gen(seed * 7 + 13)
        pool = jax.tree_util.tree_map(
            lambda x: x.reshape((B, R) + x.shape[1:]), pool)
        out = run(seed, state, params, pool, jnp.zeros((B,), jnp.int32))
        return out[3]

    t0 = time.time()
    rew = launch(7, state, params)
    float(rew.sum())
    return time.time() - t0


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    saved = PR._VMEM_LIMIT
    try:
        try:
            dt = build_and_run(16 * 1024 * 1024)
            print(f"UNEXPECTED: 16MiB limit compiled in {dt:.1f}s "
                  "(compiler behavior changed?)")
        except Exception as e:
            msg = str(e)
            print("16MiB limit FAILED as expected:",
                  type(e).__name__, msg[:300].replace("\n", " "))
            assert ("vmem" in msg.lower() or "remote_compile" in msg
                    or "500" in msg), "unexpected failure mode"
        dt = build_and_run(96 * 1024 * 1024)
        print(f"96MiB limit compiled and ran in {dt:.1f}s — root cause "
              "confirmed: scoped-VMEM budget, not a Mosaic bug")
    finally:
        PR._VMEM_LIMIT = saved
