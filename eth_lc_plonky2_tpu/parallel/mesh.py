"""Mesh construction and sharding helpers for the 1-D prover mesh.

The prover's scaling axes (SURVEY.md §2c): polynomial COLUMNS
(tensor-parallel analog) and evaluation-domain POINTS
(sequence-parallel analog), both expressible over one mesh axis "x".
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"need {n_devices} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def col_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (polynomial columns) across the mesh."""
    return NamedSharding(mesh, P(AXIS, None))


def point_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (evaluation points / rows) across the mesh."""
    return NamedSharding(mesh, P(AXIS, None))


def last_axis_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[-1] = AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_pair(pair, sharding: NamedSharding):
    """device_put a (lo, hi) field pair with one sharding."""
    return (jax.device_put(pair[0], sharding), jax.device_put(pair[1], sharding))
