from . import spec, state, step, reset  # noqa: F401
