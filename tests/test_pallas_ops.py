"""Pallas kernels == XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgc_tpu.ops.pallas_attention import (fused_attention,
                                            fused_attention_shared)


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


def test_fused_attention_shared_matches_xla():
    """Beam-shared kernel (round 3): per-sub-graph features reused by B
    beams == the XLA shared path of models/decoder.py::attention."""
    rng = np.random.RandomState(1)
    S, B, N, H, Hin, D = 12, 3, 37, 64, 96, 80
    h = jnp.asarray(rng.randn(S, B, Hin), jnp.float32)
    p_att = jnp.asarray(rng.randn(S, N, H), jnp.float32)
    att = jnp.asarray(rng.randn(S, N, D), jnp.float32)
    mask = jnp.asarray((rng.rand(S, N) > 0.4).astype("f"))
    mask = mask.at[:, 0].set(1.0)
    wh = jnp.asarray(rng.randn(Hin, H) * 0.1, jnp.float32)
    bh = jnp.asarray(rng.randn(H) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(H, 1) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)

    flat_h = h.reshape(S * B, Hin)
    rep = lambda x: jnp.repeat(x, B, axis=0)
    want_out, want_w = _xla_attention(flat_h, rep(p_att), rep(att), rep(mask),
                                      wh, bh, v, bv)
    got_out, got_w = fused_attention_shared(h, p_att, att, mask, wh, bh, v,
                                            bv, block_s=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_w).reshape(S * B, N),
                               np.asarray(want_w), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_out).reshape(S * B, D),
                               np.asarray(want_out), rtol=1e-5, atol=1e-5)


def test_fused_attention_shared_in_beam_token_parity():
    """The kernel wired through decode (use_pallas_attention + share mode)
    produces the same tokens as the XLA path on a tiny beam search."""
    from subgc_tpu.config import EvalConfig, ModelConfig
    from subgc_tpu.decode import beam
    from subgc_tpu.models import decoder as D
    from subgc_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=40, rnn_size=32, input_encoding_size=24,
                      att_hid_size=16, gcn_dim=20, fc_feat_size=24,
                      att_feat_size=40, embed_dim=12, num_obj_classes=30,
                      num_rel_classes=10)
    params, _ = init_params(jax.random.PRNGKey(1), cfg, n_obj_names=30,
                            n_pred_names=10)
    r = np.random.RandomState(3)
    S = 8
    feats = D.PreparedFeatures(
        fc=jnp.asarray(r.randn(S, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(r.randn(S, cfg.obj_num, cfg.rnn_size), jnp.float32),
        p_att=jnp.asarray(r.randn(S, cfg.obj_num, cfg.att_hid_size),
                          jnp.float32),
        mask=jnp.ones((S, cfg.obj_num), jnp.float32),
        fc_ih=jnp.asarray(r.randn(S, 4 * cfg.rnn_size), jnp.float32))
    ecfg = EvalConfig(beam_size=3)
    base = beam.beam_search(params, feats, cfg, ecfg)
    outp = beam.beam_search(params, feats,
                            cfg.replace(use_pallas_attention=True), ecfg)
    assert (np.asarray(outp.seq) == np.asarray(base.seq)).all()
    np.testing.assert_allclose(np.asarray(outp.all_ps),
                               np.asarray(base.all_ps), rtol=1e-4, atol=1e-5)
