"""Alias for the reference ``gym_novel_gridworlds/observation_wrappers.py``."""

from ngx.compat.wrappers import AgentMap, LidarInFront  # noqa: F401
