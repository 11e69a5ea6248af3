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


def initialize_multihost() -> bool:
    """Join a multi-host JAX runtime when launcher env vars are present.

    On a v5e pod slice each host process calls jax.distributed.initialize()
    (coordinator/process env provided by the launcher); afterwards
    jax.devices() spans every chip in the slice and make_mesh lays the ``q``
    axis across hosts x chips — collectives ride ICI within a host's chips
    and DCN between hosts, with no engine code changes. Returns True if a
    multi-host runtime was joined.
    """
    import os

    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if not coord:
        return False
    nproc = (os.environ.get("JAX_NUM_PROCESSES")
             or os.environ.get("NUM_PROCESSES"))
    pid = (os.environ.get("JAX_PROCESS_ID")
           or os.environ.get("PROCESS_ID"))
    if nproc is not None and pid is not None:
        # manual launch (also how tests/test_dist.py drives a REAL
        # two-process CPU runtime); cloud launchers omit these and rely
        # on jax's cluster auto-detection below
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()
    return jax.process_count() > 1


def is_output_process() -> bool:
    """True on the process that owns side effects (files, stdout).

    SPMD launch runs the identical program on every host; exactly one must
    write the listing/dotplot or a pod run emits duplicates (SURVEY.md §5
    distributed backend; BASELINE north star "multi-host v5e pod slice").
    Single-process runs are trivially process 0.
    """
    return jax.process_index() == 0


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
