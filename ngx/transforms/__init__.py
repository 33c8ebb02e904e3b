"""Observation / action wrappers as pure EnvSpec rewrites.

The reference implements these as Gym wrapper classes that intercept Python
calls per step (``observation_wrappers.py``, ``wrappers.py``); here each one
returns a *new* spec and the single fused kernel (:mod:`ngx.core.step`)
interprets it — the whole wrapped stack stays one straight-line XLA program.
"""

from .actions import limit_actions, remap_actions  # noqa: F401
from .observations import agent_map, lidar_in_front  # noqa: F401
from .trajectories import TrajectoryRecorder  # noqa: F401
