"""1-D data-parallel mesh utilities.

Design (SURVEY.md section 2 "Distributed communication backend"): shardings
are declared on the jit boundary inputs; XLA emits the ICI collectives
(grad all-reduce) — no hand-written communication. Multi-host DCN falls out
of `jax.distributed.initialize` + the same program and is not a v1 target.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every leaf with its leading dim sharded over 'data'.

    Leaves whose leading dim doesn't divide the mesh are replicated (e.g.
    scalar step counters riding along in a batch pytree).
    """
    n = mesh.devices.size
    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, rep)

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, SMPL constants) over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jax.numpy.asarray(x), rep), tree)
