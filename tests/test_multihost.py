"""Multi-host input sharding: local slices reassemble the global batch."""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.parallel import mesh as M
from subgc_tpu.parallel.distributed import slice_local_shards


def _fake_batch(B=8):
    rng = np.random.RandomState(0)
    return {
        "feats": rng.rand(B * 37, 16).astype("f"),   # B*obj_num leading
        "labels": rng.randint(0, 9, (B * 5, 18)),    # B*seq_per_img leading
        "img_ix": np.repeat(np.arange(B, dtype=np.int32), 5),
    }


def test_slices_reassemble_global_batch():
    batch = _fake_batch()
    for pc in (1, 2, 4):
        parts = [slice_local_shards(batch, process_index=pi, process_count=pc)
                 for pi in range(pc)]
        for k in batch:
            got = np.concatenate([np.asarray(p[k]) for p in parts])
            np.testing.assert_array_equal(got, batch[k], err_msg=k)
        # per-leaf slices respect image boundaries (multiples of B/pc)
        for p in parts:
            for k in batch:
                assert p[k].shape[0] == batch[k].shape[0] // pc


def test_process_local_data_matches_device_put():
    """jax.make_array_from_process_local_data (the multi-host assembly
    primitive in mesh.shard_leading_axis) produces the same global array as
    a sharded device_put on this single-process 8-device mesh."""
    mesh = M.make_mesh(n_data=8)
    s = M.batch_sharded(mesh)
    x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    a = jax.device_put(x, s)
    b = jax.make_array_from_process_local_data(s, x)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a jitted sum over the data axis agrees
    f = jax.jit(lambda v: v.sum())
    assert float(f(a)) == float(f(b))
