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
