"""Device mesh + sharding rules.

The reference's entire parallelism surface is single-process
`torch.nn.DataParallel` over 2 GPUs (`train.py:96-98`).  The TPU-native
equivalent: a (data, model) `jax.sharding.Mesh`; batches are sharded over the
``data`` axis, parameters replicated, and XLA inserts the gradient psum over
ICI when the jitted train step averages a sharded loss.  The ``model`` axis is
a stub for tensor-parallel sharding should dims grow (SURVEY.md §2.3 — not
needed for parity at 2048x1024 matmuls).

The test-time sub-graph fan-out (up to ``gpn_max_subg=1000`` decodes per
image, `test.sh:13`) is this workload's long-context analog: the sub-graph
axis shards over ``data`` the same way.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over data; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_leading_axis(mesh: Mesh, tree):
    """Device-put every array leaf with its leading axis on the data axis.

    Multi-host (DCN) runs: each process passes only its local slice of the
    global batch (parallel/distributed.py::local_batch_slice) and the
    global jax.Array is assembled from the per-process shards — no
    cross-host batch broadcast.  Single-host: plain sharded device_put.
    """
    s = batch_sharded(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
