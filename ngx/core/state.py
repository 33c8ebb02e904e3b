"""EnvState — the dynamic environment state as a JAX pytree.

Mirrors the mutable attributes of the reference env classes
(``pogostick_v1_env.py:26-84``) with fixed-shape arrays so the whole state
batches under ``vmap`` and shards over a device mesh along the env axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class StepInfo:
    """Device-side encoding of the reference ``info`` dict
    (pogostick_v1_env.py:359). Strings live host-side; see ngx.compat."""

    result: jnp.ndarray      # bool — action succeeded
    step_cost: jnp.ndarray   # float32 — simulated Minecraft time economy
    msg_code: jnp.ndarray    # int32 — MSG_* constant
    msg_arg: jnp.ndarray     # int32 — item id / recipe idx parameter


@struct.dataclass
class EnvState:
    # The map is stored FLAT, row-major int32[H*W] (use ``.map2d`` for the
    # [H, W] view).  TPU tiling pads the two minor dims of an array to the
    # (8, 128) tile, so a batched [B, 10, 10] map would be laid out as
    # [B, 16, 128] — a ~20x lane/bandwidth waste on every map-wide op in the
    # step kernel.  [B, 100] tiles to [B(↑8), 128]: 1.28x padding instead.
    map: jnp.ndarray         # int32[H*W], row-major; 0 == air
    agent: jnp.ndarray       # int32[2] (row, col)
    facing: jnp.ndarray      # int32 — NORTH/SOUTH/WEST/EAST = 0/1/2/3
    inventory: jnp.ndarray   # int32[I]
    selected: jnp.ndarray    # int32 item id; -1 == '' (nothing selected)
    step_count: jnp.ndarray  # int32
    last_action: jnp.ndarray  # int32 action id
    last_reward: jnp.ndarray  # float32
    last_cost: jnp.ndarray    # float32
    last_done: jnp.ndarray    # bool

    @property
    def map2d(self) -> jnp.ndarray:
        """[..., H, W] view of the flat map (works on batched states too)."""
        H = int(np.sqrt(self.map.shape[-1]))
        return self.map.reshape(self.map.shape[:-1] + (H, H))


def zeros_state(spec) -> EnvState:
    """Blank state (pre-reset) with the right shapes for ``spec``."""
    H = spec.map_size
    return EnvState(
        map=jnp.zeros((H * H,), dtype=jnp.int32),
        agent=jnp.array([1, 1], dtype=jnp.int32),
        facing=jnp.array(0, dtype=jnp.int32),
        inventory=jnp.zeros((spec.n_items,), dtype=jnp.int32),
        selected=jnp.array(-1, dtype=jnp.int32),
        step_count=jnp.array(0, dtype=jnp.int32),
        last_action=jnp.array(0, dtype=jnp.int32),
        last_reward=jnp.array(0.0, dtype=jnp.float32),
        last_cost=jnp.array(0.0, dtype=jnp.float32),
        last_done=jnp.array(False),
    )


def state_from_numpy(spec, map_arr, agent, facing, inventory, selected=-1,
                     step_count=0, last_action=0, last_reward=0.0,
                     last_cost=0.0, last_done=False) -> EnvState:
    """Build an EnvState from host values (e.g. a reference-env snapshot,
    for the conformance harness / restore-chaining)."""
    return EnvState(
        map=jnp.asarray(np.asarray(map_arr).reshape(-1), dtype=jnp.int32),
        agent=jnp.asarray(np.asarray(agent), dtype=jnp.int32),
        facing=jnp.asarray(facing, dtype=jnp.int32),
        inventory=jnp.asarray(np.asarray(inventory), dtype=jnp.int32),
        selected=jnp.asarray(selected, dtype=jnp.int32),
        step_count=jnp.asarray(step_count, dtype=jnp.int32),
        last_action=jnp.asarray(last_action, dtype=jnp.int32),
        last_reward=jnp.asarray(last_reward, dtype=jnp.float32),
        last_cost=jnp.asarray(last_cost, dtype=jnp.float32),
        last_done=jnp.asarray(last_done, dtype=bool),
    )
