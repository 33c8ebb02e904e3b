"""Driver scripts (the reference's L5 layer — enjoy.py, tests/*.py —
rebuilt over the TPU engine).  Run as ``python -m ngx.cli.<name>``."""

import os


def set_platform(platform: str) -> None:
    """Pin JAX's platform for a driver before jax is imported.

    The interactive single-env drivers (enjoy/keyboard/socket/demos) step one
    env at a time, so every step is a host↔device round-trip — pure dispatch
    latency, zero chip utilisation.  They default to ``cpu``, which is both
    faster for B=1 and leaves the TPU free for training; pass
    ``-platform auto`` to use JAX's default device selection (which honours
    the ``JAX_PLATFORMS`` env var — this image globally sets it to the
    tunneled-TPU 'axon' backend), or ``tpu`` to force the chip.  An explicit
    ``-platform`` always wins over the env var.  Uses ``jax.config.update``
    rather than the env var: jax may already be imported by the time a
    driver's ``main`` runs, in which case mutating ``JAX_PLATFORMS`` is
    silently ignored while the config update still takes effect (the backend
    initialises lazily on first device use).
    """
    if platform == "auto":
        enable_compile_cache()
        return
    import jax
    if platform == "tpu" and "axon" in os.environ.get(
            "JAX_PLATFORMS", "").split(","):
        platform = "axon"   # this image exposes the TPU via the axon tunnel
    jax.config.update("jax_platforms", platform)
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Persistent XLA compile cache shared by every driver (same dir as
    bench.py): repeat runs skip recompilation — which matters most for the
    trainer's (block 256, t_chunk 16) Mosaic config, whose fresh compile
    costs ~8 minutes (docs/PERF.md)."""
    import jax
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
