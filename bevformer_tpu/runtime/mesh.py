"""Device-mesh and sharding helpers.

Replaces the reference's NCCL DDP machinery (`apis/mmdet_train.py:75-79`,
`default_runtime.py:13`) with a jax.sharding Mesh: a `dp` axis shards the
batch (data parallel, gradients reduced by XLA-inserted collectives inside
the jitted update), and an optional `sp` axis shards the BEV query sequence
inside the encoder (spatial/sequence parallel — each BEV query samples
independently, so SCA/TSA are embarrassingly parallel over ICI; see
SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None


def make_mesh(dp: int, sp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * sp <= len(devices), (dp, sp, len(devices))
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


@contextlib.contextmanager
def activate(mesh: Mesh):
    """Set the mesh used by in-model sharding annotations."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with jax.sharding.set_mesh(mesh):
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def maybe_shard(x: jnp.ndarray, *spec) -> jnp.ndarray:
    """Apply a sharding constraint if a mesh is active, else no-op.

    Model code calls e.g. `maybe_shard(bev, 'dp', 'sp', None)` — unit tests
    and single-chip runs pay nothing.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    clean = tuple(s if (s is None or s in names) else None for s in spec)
    try:
        return jax.lax.with_sharding_constraint(x, P(*clean))
    except Exception:
        return x


def shard_batch(mesh: Mesh, tree):
    """Place a host batch onto the mesh, sharded over 'dp' on axis 0.

    Single-process: `tree` holds the GLOBAL batch. Multi-process
    (jax.distributed initialized): `tree` holds this process's LOCAL
    slice — the per-rank sampler shards the dataset — and the global
    jax.Array is assembled from the per-process pieces
    (`make_array_from_process_local_data`), the pjit analogue of DDP's
    per-rank dataloaders.
    """
    multiproc = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        spec = P("dp") if x.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(jnp.asarray(x), sharding)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())),
        tree,
    )
