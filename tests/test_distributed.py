"""REAL multi-process jax.distributed test: 2 OS processes x 4 virtual CPU
devices each join one coordinator and run the shard_map SPMD rollout over a
single global 8-device mesh; the psum'd metrics must match a single-process
8-device run of the identical program bit-for-bit.

This is the honest stand-in for multi-host TPU scaling that can't be measured
on one chip: it exercises ngx.parallel.initialize_distributed (the
jax.distributed.initialize wrapper) and proves the global-mesh + shard_map +
psum recipe is process-count invariant.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import pytest

import ngx
from ngx.parallel import make_env_mesh, make_spmd_rollout

HERE = os.path.dirname(os.path.abspath(__file__))
BATCH, STEPS = 64, 12


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_spmd_rollout_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # isolate from any inherited single-process jax state
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_distributed_worker.py"),
             str(pid), "2", coordinator, str(BATCH), str(STEPS)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        res = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert res, f"no RESULT line:\n{out}\n{err}"
        outs.append(json.loads(res[0][len("RESULT "):]))

    # both processes saw the global 8-device topology and agree on the
    # replicated psum'd metrics
    assert all(o["device_count"] == 8 for o in outs), outs
    assert outs[0]["mean_reward"] == outs[1]["mean_reward"], outs
    assert outs[0]["episodes"] == outs[1]["episodes"], outs

    # single-process 8-virtual-device run of the identical program
    spec = ngx.make_spec("NovelGridworld-Pogostick-v1")
    mesh = make_env_mesh()
    assert mesh.size == 8
    launch = make_spmd_rollout(spec, mesh, BATCH, STEPS)
    mean_r, episodes = launch(jax.random.key(0))
    assert float(mean_r) == outs[0]["mean_reward"], (
        float(mean_r), outs[0]["mean_reward"])
    assert int(episodes) == outs[0]["episodes"]


def test_scaling_harness_small():
    """The scaling harness runs end-to-end on a tiny config and produces
    sane numbers.  The CI bound is deliberately loose (virtual CPU devices
    share one host's cores and CI machines vary); the recorded measurement
    lives in docs/PERF.md."""
    from ngx.rl.scaling import measure_scaling

    r = measure_scaling(device_counts=(1, 2), per_device_batch=32,
                        rollout_steps=4, repeats=2, mode="fixed-total",
                        hidden=(16, 16))
    assert r["throughput"][1] > 0 and r["throughput"][2] > 0
    assert r["efficiency"][2] > 0.3, r
