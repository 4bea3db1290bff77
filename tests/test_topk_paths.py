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


def test_greedy_topk_threshold():
    """The argmax-pass kth-value matches a sort-based threshold."""
    rng = np.random.RandomState(1)
    lp2 = jnp.asarray(rng.randn(6, 40).astype("f"))
    k = 3
    work = lp2
    for _ in range(k - 1):
        idx = jnp.argmax(work, axis=-1, keepdims=True)
        work = jnp.put_along_axis(work, idx, -jnp.inf, axis=-1, inplace=False)
    kth = work.max(-1, keepdims=True)
    want = jnp.sort(lp2, axis=-1)[:, -k][:, None]
    np.testing.assert_allclose(np.asarray(kth), np.asarray(want))


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
