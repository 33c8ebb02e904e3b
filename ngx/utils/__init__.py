from .monitor import Monitor, load_results, ts2xy  # noqa: F401
from .checkpoint import restore_pytree, save_pytree  # noqa: F401
