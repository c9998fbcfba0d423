"""Device mesh + sharding helpers (SPMD data/spatial parallelism).

TPU-native replacement for the reference's parallelism story — a single-host
``nn.DataParallel`` replicate/scatter/gather (``ctunet/pytorch/Model.py:
481-486``, SURVEY.md §2 parallelism table). Here scale-out is XLA SPMD over
a ``jax.sharding.Mesh``:

- ``data`` axis: batch sharding (the DataParallel replacement) — gradients
  are reduced by XLA-inserted collectives over ICI, not host gathers;
- ``spatial`` axis: sharding of the volume depth dimension for single-volume
  scale-out (the conv analog of context parallelism) — XLA SPMD inserts the
  halo exchanges 3D convolutions need at shard boundaries automatically.

Params/optimizer state are replicated (the models are ~1M params; data, not
weights, is what needs sharding at CT-volume scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    data: int = 0,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh. ``data=0`` = all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    spatial = max(1, int(spatial))
    if data in (0, None):
        data = max(1, len(devs) // spatial)
    n = data * spatial
    if n > len(devs):
        raise ValueError(
            f"mesh {data}x{spatial} needs {n} devices, have {len(devs)}"
        )
    grid = np.array(devs[:n]).reshape(data, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None):
    """Sharding for a batch of volumes (B, D, H, W[, C]).

    Batch over ``data``; optionally the given spatial dim over ``spatial``.
    Unnamed trailing dims are replicated, so the spec fits 4D and 5D arrays.
    """
    if spatial_dim is not None and mesh.shape[SPATIAL_AXIS] > 1:
        spec = [None] * (spatial_dim + 1)
        spec[0] = DATA_AXIS
        spec[spatial_dim] = SPATIAL_AXIS
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P(DATA_AXIS))


def volume_sharding(mesh: Mesh, spatial_dim: int = 1):
    """Sharding for a single padded volume batch: depth over ``spatial``
    (halo exchange for convs is inserted by XLA SPMD)."""
    spec = [None] * (spatial_dim + 1)
    spec[spatial_dim] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Mesh):
    """Place every leaf replicated across the mesh.

    Multi-process: ``jax.device_put`` onto a non-fully-addressable sharding
    runs a cross-process ``assert_equal`` collective (a blocking rendezvous
    that deadline-exceeds when ranks reach it at different times, e.g. one
    rank still compiling); ``make_array_from_process_local_data`` places the
    same replicated value with no collective — every rank holds identical
    leaves by construction (same seed / same checkpoint).
    """
    sh = replicated(mesh)
    if jax.process_count() > 1:
        def _put(x):
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            )
    else:
        def _put(x):
            return jax.device_put(x, sh)
    return jax.tree.map(_put, tree)
