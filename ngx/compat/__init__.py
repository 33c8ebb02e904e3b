"""Gym-classic facade over the batched core.

A drop-in surface for users of the reference (gym 0.18-era 4-tuple API,
reference ``gym_novel_gridworlds/envs/*.py``): ``ngx.compat.make(env_id)``
gives an object with ``reset() / step(a) -> (obs, reward, done, info) /
render() / close()``, name-keyed dict attributes (``items_id``,
``actions_id``, ``inventory_items_quantity``, ``selected_item`` …),
``inject_novelty``, and wrapper classes with the reference's names.  Under
the hood every env is an N=1 slice of the jitted kernel; the strings the
reference carries per step (``info['message']``, item names) are
reconstructed host-side from integer codes.
"""

from .env import NGXEnv, make  # noqa: F401
from .wrappers import (AgentMap, BlockItem, LidarInFront,  # noqa: F401
                       LimitActions, SaveTrajectories, inject_novelty)
from .messages import decode_message  # noqa: F401
from . import constant  # noqa: F401
