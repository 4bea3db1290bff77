"""Multi-host (DCN) initialization.

The reference has no multi-node support at all (SURVEY.md §2.3: single
process `DataParallel`).  Here multi-host runs use the standard JAX recipe:
`jax.distributed.initialize` connects hosts over DCN, `jax.devices()` then
spans all slices, and the same pjit train step scales — gradient psums ride
ICI within a slice and DCN across slices, inserted by XLA.
"""
from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX when configured; no-op on single host.

    Reads SUBGC_COORDINATOR / SUBGC_NUM_PROCESSES / SUBGC_PROCESS_ID when
    args are None (on Cloud TPU pods, bare `jax.distributed.initialize()`
    auto-discovers and these can stay unset).
    """
    import jax

    coordinator = coordinator or os.environ.get("SUBGC_COORDINATOR")
    num_processes = num_processes or _int_env("SUBGC_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("SUBGC_PROCESS_ID")

    if coordinator is None and num_processes is None:
        if os.environ.get("SUBGC_AUTO_DISTRIBUTED") == "1":
            jax.distributed.initialize()
            return True
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def slice_local_shards(tree, process_index: Optional[int] = None,
                       process_count: Optional[int] = None):
    """Each process's slice of every leading axis of a global host batch.

    TrainBatch leaves carry different leading multipliers (B*obj_num
    features, B*seq_per_img labels, ...) — all divisible by B, so a
    per-leaf proportional slice keeps image boundaries intact.  Feed the
    result to mesh.shard_leading_axis, which reassembles the global
    jax.Array from the per-process shards.
    """
    import jax

    pc = process_count if process_count is not None else jax.process_count()
    if pc <= 1:
        return tree
    pi = process_index if process_index is not None else jax.process_index()

    def cut(x):
        per = x.shape[0] // pc
        return x[pi * per:(pi + 1) * per]

    return jax.tree_util.tree_map(cut, tree)
