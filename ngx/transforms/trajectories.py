"""Trajectory recording — the ``SaveTrajectories`` wrapper (wrappers.py:9-54)
rebuilt for a batched device-resident engine.

The reference appends a Python dict of full env state per step and pickles on
``save()``.  Here recording happens on-device: batched rollouts already stack
``EnvState`` pytrees along time (see :mod:`ngx.vector`), and this recorder
just accumulates those stacked pytrees host-side with zero per-step syncs,
then serialises them in the reference's dict-per-step shape so downstream
consumers of the pickle format keep working.
"""

from __future__ import annotations

import os
import pickle
from datetime import datetime
from typing import List

import jax
import numpy as np

from ..core.spec import DIRECTION_NAMES, EnvSpec


class TrajectoryRecorder:
    def __init__(self, spec: EnvSpec, save_path: str):
        self.spec = spec
        self.save_path = save_path
        os.makedirs(save_path, exist_ok=True)
        self._chunks: List = []

    def record(self, states):
        """Append an ``EnvState`` (single step) or a time-stacked pytree of
        states (from a scan rollout). Device arrays are fetched lazily."""
        self._chunks.append(states)

    def _state_dicts(self):
        sp = self.spec
        for chunk in self._chunks:
            host = jax.device_get(chunk)
            leading = np.asarray(host.step_count).shape
            if not leading:  # single state
                host = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], host)
                leading = (1,)
            for t in range(leading[0]):
                inv = np.asarray(host.inventory[t])
                yield {
                    "map_size": sp.map_size,
                    "map": np.asarray(host.map[t]).reshape(
                        sp.map_size, sp.map_size),
                    "agent_location": tuple(np.asarray(host.agent[t])),
                    "agent_facing_str": DIRECTION_NAMES[int(host.facing[t])],
                    "block_in_front_id": None,
                    "items_id": {n: i for i, n in enumerate(sp.items) if n != "air"},
                    "items_quantity": {
                        sp.items[i]: int(q)
                        for i, q in zip(sp.spawn_items, sp.spawn_qty)},
                    "inventory_items_quantity": {
                        n: int(inv[i]) for i, n in enumerate(sp.items) if n != "air"},
                    "action_str": sp.actions_id,
                    "last_action": int(host.last_action[t]),
                    "last_done": bool(host.last_done[t]),
                }

    def save(self) -> str:
        path = os.path.join(
            self.save_path,
            datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
            + "_{env}.bin".format(env=self.spec.env_id))
        with open(path, "wb") as f:
            pickle.dump(list(self._state_dicts()), f)
        print("Trajectories saved at: ", path)
        return path
