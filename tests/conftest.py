import os
import sys

# Tests run on CPU with 8 virtual devices so the sharding layer is exercised
# without TPU hardware (the bench runs on the real chip separately).
# jax is pre-imported at interpreter startup in this image with
# JAX_PLATFORMS=axon (a tunneled TPU whose per-dispatch network latency makes
# per-step tests crawl and whose D2H fetches can stall), so mutating
# os.environ here is too late — override via jax.config before any backend
# initializes.  XLA_FLAGS is still read lazily at CPU-client init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
