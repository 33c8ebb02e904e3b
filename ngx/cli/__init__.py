"""Driver scripts (the reference's L5 layer — enjoy.py, tests/*.py —
rebuilt over the TPU engine).  Run as ``python -m ngx.cli.<name>``."""

import os


def set_platform(platform: str) -> None:
    """Pin JAX's platform for a driver before jax is imported.

    The interactive single-env drivers (enjoy/keyboard/socket/demos) step one
    env at a time, so every step is a host↔device round-trip — pure dispatch
    latency, zero chip utilisation.  They default to ``cpu``, which is both
    faster for B=1 and leaves the TPU free for training; pass
    ``-platform auto`` to use JAX's default device selection, or ``tpu`` to
    force the chip.  An already-set ``JAX_PLATFORMS`` env var wins over the
    driver default.  Uses ``jax.config.update`` rather than the env var:
    jax may already be imported by the time a driver's ``main`` runs, in
    which case ``JAX_PLATFORMS`` is silently ignored while the config update
    still takes effect (the backend initialises lazily on first device use).
    """
    if platform == "auto" or os.environ.get("JAX_PLATFORMS"):
        return
    import jax
    jax.config.update("jax_platforms", platform)
