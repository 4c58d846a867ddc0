"""Data parallelism over the TPU mesh.

The reference is single-process/single-GPU with NO distributed backend
(SURVEY.md §2 rows 9-10).  The TPU-native equivalent specified there:
a 1-D ``jax.sharding.Mesh(('data',))`` over ICI, batch sharded on the
data axis, parameters replicated, gradient allreduce emitted by XLA as
``psum`` collectives.  Two code paths are provided:

  * the pjit path (primary): ``jax.jit`` with NamedShardings — XLA
    inserts the ICI allreduce automatically from the sharding layout,
  * an explicit ``shard_map`` path with a hand-placed ``lax.psum``,
    used by tests to pin the collective semantics (grad parity with
    single-device — SURVEY.md §4 'distributed without a cluster').

v5e-4 is one slice, so every collective here rides ICI; DCN never
enters (no multi-host at target scale).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch with its leading axis split over the data axis.

    Batch size must divide the mesh size (static shapes; the batch
    iterator already pads ragged tails).
    """
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def psum_mean_grads(grads: Any, axis_name: str = DATA_AXIS) -> Any:
    """Explicit ICI gradient allreduce (used inside shard_map bodies)."""
    return jax.tree.map(lambda g: jax.lax.pmean(g, axis_name), grads)
