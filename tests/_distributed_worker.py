"""Worker process for the real multi-process jax.distributed test.

Launched by tests/test_distributed.py: each process owns 4 virtual CPU
devices, joins a localhost coordinator via ngx.parallel.initialize_distributed,
builds ONE global 8-device mesh spanning both processes, and runs the
shard_map SPMD rollout.  The psum'd metrics are replicated scalars — every
process prints the same values, and the parent asserts they match a
single-process 8-device run bit-for-bit.

This exercises the actual multi-host recipe (jax.distributed.initialize +
global mesh + shard_map + psum over ICI/DCN) that the reference lacks entirely
(its distributed story is a localhost JSON socket pair, reference
tests/socket_env.py:23-51).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    coordinator = sys.argv[3]
    batch = int(sys.argv[4])
    steps = int(sys.argv[5])

    # jax is pre-imported at interpreter startup in this image, so env vars
    # are too late — select CPU and the per-process device count via
    # jax.config BEFORE any backend initializes (same pattern as conftest.py).
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # multi-process CPU needs a cross-process collectives backend
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ngx.parallel import (initialize_distributed, make_env_mesh,
                              make_spmd_rollout)
    import ngx

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    spec = ngx.make_spec("NovelGridworld-Pogostick-v1")
    mesh = make_env_mesh()  # global mesh over all 8 devices, both processes
    launch = make_spmd_rollout(spec, mesh, batch, steps)
    mean_r, episodes = launch(jax.random.key(0))
    out = {"process_id": process_id,
           "mean_reward": float(mean_r),
           "episodes": int(episodes),
           "device_count": jax.device_count()}
    print("RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
