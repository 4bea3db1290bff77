"""Iterative top-k equivalents match lax.top_k selections."""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.decode.beam import _topk_small


def test_topk_small_matches_lax():
    rng = np.random.RandomState(0)
    for trial in range(5):
        x = jnp.asarray(rng.randn(3 * 51).astype("f"))
        want_v, want_i = jax.lax.top_k(x, 4)
        got_v, got_i = _topk_small(x, 4)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v))


def test_topk_small_tie_breaking():
    x = jnp.asarray([1.0, 3.0, 3.0, 2.0, 3.0])
    v, i = _topk_small(x, 3)
    # ties -> lowest index first, like lax.top_k
    np.testing.assert_array_equal(np.asarray(i), [1, 2, 4])


def test_greedy_topk_mask_matches_sort():
    """The shipped _topk_mask keeps exactly the k largest per row (the
    sort-based reference selection) on tie-free rows."""
    from subgc_tpu.decode.greedy import _topk_mask

    rng = np.random.RandomState(1)
    lp2 = jnp.asarray(rng.randn(6, 40).astype("f"))   # ties ~impossible
    k = 3
    masked = np.asarray(_topk_mask(lp2, k))
    kept = np.isfinite(masked)
    want_kept = np.argsort(np.asarray(lp2), axis=-1)[:, -k:]
    for r in range(lp2.shape[0]):
        assert kept[r].sum() == k
        assert set(np.nonzero(kept[r])[0]) == set(want_kept[r])
    # kept entries keep their original values
    np.testing.assert_array_equal(masked[kept], np.asarray(lp2)[kept])


def test_topk_wordmajor_matches_transposed_flat():
    """_topk_small_wordmajor == _topk_small on the transposed flat grid
    (value, beam, word all equal), including engineered exact ties."""
    from subgc_tpu.decode.beam import _topk_small_wordmajor

    rng = np.random.RandomState(5)
    for trial in range(10):
        bdash = int(rng.randint(2, 6))
        V1 = int(rng.randint(20, 80))
        cand = rng.randn(bdash, V1).astype("f")
        if trial % 2:  # quantize -> many exact ties
            cand = np.round(cand * 2) / 2
        cand = jnp.asarray(cand)
        v1, flat = _topk_small(cand.T.reshape(-1), bdash)
        v2, q2, c2 = _topk_small_wordmajor(cand, bdash)
        np.testing.assert_array_equal(np.asarray(flat) % bdash,
                                      np.asarray(q2))
        np.testing.assert_array_equal(np.asarray(flat) // bdash,
                                      np.asarray(c2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
