"""Alias for the reference ``gym_novel_gridworlds/wrappers.py``."""

from ngx.compat.wrappers import LimitActions, SaveTrajectories  # noqa: F401
