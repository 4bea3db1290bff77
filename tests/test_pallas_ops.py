"""Pallas kernels == XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgc_tpu.ops.pallas_attention import fused_attention


def _xla_attention(h, p_att, att, mask, wh, bh, v, bv):
    ah = h @ wh + bh
    dot = jnp.tanh(p_att + ah[:, None, :])
    e = (dot @ v)[..., 0] + bv[0]
    w = jax.nn.softmax(e, axis=-1)
    w = w * mask
    w = w / w.sum(-1, keepdims=True)
    return jnp.einsum("rn,rnd->rd", w, att), w


def test_fused_attention_matches_xla():
    rng = np.random.RandomState(0)
    R, N, H, Hin, D = 48, 37, 64, 96, 80
    h = jnp.asarray(rng.randn(R, Hin), jnp.float32)
    p_att = jnp.asarray(rng.randn(R, N, H), jnp.float32)
    att = jnp.asarray(rng.randn(R, N, D), jnp.float32)
    mask = jnp.asarray((rng.rand(R, N) > 0.4).astype("f"))
    mask = mask.at[:, 0].set(1.0)
    wh = jnp.asarray(rng.randn(Hin, H) * 0.1, jnp.float32)
    bh = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(H, 1) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)

    want_out, want_w = _xla_attention(h, p_att, att, mask, wh, bh, v, bv)
    got_out, got_w = fused_attention(h, p_att, att, mask, wh, bh, v, bv,
                                     block_r=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(want_w),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
