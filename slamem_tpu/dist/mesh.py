"""Device mesh construction (SURVEY.md §2 dist components; no ref analog).

Axes:
  * ``q``  — data-parallel query-position streaming (BASELINE: "query
    sequences stream data-parallel in fixed-size batches");
  * ``shard`` (added by dist/sharded_index.py) — SA-rank-range index
    sharding for references too large to replicate (BASELINE config #5).

On a multi-host v5e pod slice the same code runs with the global device list;
locally tests fake 8 devices on CPU (SURVEY.md §4 item 4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "q") -> Mesh:
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} present")
    return Mesh(np.array(devices[:n]), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "q") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def put_replicated(tree, mesh: Mesh):
    """Place every array of a pytree replicated across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
