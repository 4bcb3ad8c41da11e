"""Device mesh construction.

The engine's collective backend is jax.lax collectives over a named mesh
(SURVEY.md §2.3: the reference has NO distributed execution — no NCCL/MPI,
single-process tokio streams only; this layer is the from-scratch TPU-native
replacement: all-to-all for repartition, psum/all-gather for combines,
ICI within a slice).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "x"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Rows partitioned over the data axis (hash/range-partitioned tables)."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
