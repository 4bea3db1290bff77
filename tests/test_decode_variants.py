"""Decode-step weight-layout variants (fold_embed_ih / merge_lstm_matmuls).

Both are measured-and-rejected-by-default options (docs/PERF.md round 3)
that must stay CORRECT while switched off: the fold table is an exact
reformulation (relu commutes with the row gather), the merged matmul a
float-reassociated one.  Also pins that cast_decoder_weights preserves
derived tables — a re-cast used to silently drop w_cat, making
merge_lstm_matmuls a no-op under bf16 beam search.
"""
import numpy as np
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig
from subgc_tpu.decode import beam
from subgc_tpu.models import decoder as D


def _feats(cfg, rng_np, S=6):
    return D.PreparedFeatures(
        fc=jnp.asarray(rng_np.randn(S, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(rng_np.randn(S, cfg.obj_num, cfg.rnn_size),
                        jnp.float32),
        p_att=jnp.asarray(rng_np.randn(S, cfg.obj_num, cfg.att_hid_size),
                          jnp.float32),
        mask=jnp.asarray((rng_np.rand(S, cfg.obj_num) > 0.3).astype("f")),
        fc_ih=jnp.asarray(rng_np.randn(S, 4 * cfg.rnn_size), jnp.float32))


def test_cast_preserves_derived_tables(tiny_cfg, tiny_params):
    """Re-casting params must keep fold/merge tables (and cast them)."""
    params, _ = tiny_params
    cfg = tiny_cfg.replace(compute_dtype="bfloat16", merge_lstm_matmuls=True)
    p = D.cast_decoder_weights(params, cfg)
    p = D.merge_lstm_weights(p, cfg)
    p = D.fold_embed_ih(p, cfg)
    p2 = D.cast_decoder_weights(p, cfg)
    assert "w_cat" in p2["decoder"]["att_lstm"]
    assert "w_cat" in p2["decoder"]["lang_lstm"]
    assert "embed_ih" in p2["decoder"]
    assert p2["decoder"]["att_lstm"]["w_cat"].dtype == jnp.bfloat16


def test_fold_embed_ih_beam_tokens(tiny_cfg, tiny_params, rng_np):
    """Folded per-vocab gate table == live embed matmul (f32 beam)."""
    params, _ = tiny_params
    feats = _feats(tiny_cfg, rng_np)
    ecfg = EvalConfig(beam_size=3)
    base = beam.beam_search(params, feats, tiny_cfg, ecfg)
    fold = beam.beam_search(params, feats,
                            tiny_cfg.replace(fold_embed_ih=True), ecfg)
    np.testing.assert_array_equal(np.asarray(base.seq), np.asarray(fold.seq))
    np.testing.assert_allclose(np.asarray(base.all_ps),
                               np.asarray(fold.all_ps), rtol=1e-5, atol=1e-6)


def test_merge_lstm_matmuls_step(tiny_cfg, tiny_params, rng_np):
    """Merged [.,3R]@[3R,4R] gate matmul ~= split matmuls, one decode step
    (float-reassociated, so allclose rather than bitwise)."""
    params, _ = tiny_params
    cfg_m = tiny_cfg.replace(merge_lstm_matmuls=True)
    feats = _feats(tiny_cfg, rng_np)
    state = D.init_state(6, tiny_cfg)
    tok = jnp.asarray(rng_np.randint(0, tiny_cfg.vocab_size, (6,)), jnp.int32)
    lp_a, st_a, _ = D.decode_step(params, state, tok, feats, tiny_cfg)
    pm = D.merge_lstm_weights(params, cfg_m)
    lp_b, st_b, _ = D.decode_step(pm, state, tok, feats, cfg_m)
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_b),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st_a.h_lang),
                               np.asarray(st_b.h_lang), rtol=2e-5, atol=2e-6)


def test_merge_lstm_matmuls_bf16_beam_runs_merged(tiny_cfg, tiny_params,
                                                  rng_np):
    """bf16 beam search with merge on actually RUNS the merged program
    (the regression: _beam_search_one's re-cast dropped w_cat, silently
    falling back to split matmuls) — tokens must match the f32 merge path's
    structure and the program must accept merged params end-to-end."""
    params, _ = tiny_params
    cfg = tiny_cfg.replace(compute_dtype="bfloat16", bf16_lstm_gates=True,
                           merge_lstm_matmuls=True)
    feats = _feats(tiny_cfg, rng_np)
    out = beam.beam_search(params, feats, cfg, EvalConfig(beam_size=3))
    assert np.asarray(out.seq).shape == (6, tiny_cfg.seq_length)
    # and the split bf16 program agrees on >=80% of tokens (same contract
    # as tests/test_bf16.py for reassociated bf16 variants)
    base = beam.beam_search(params, feats,
                            tiny_cfg.replace(compute_dtype="bfloat16",
                                             bf16_lstm_gates=True),
                            EvalConfig(beam_size=3))
    a, b = np.asarray(out.seq), np.asarray(base.seq)
    assert (a == b).mean() > 0.8


def test_image_shared_greedy_matches_per_row(tiny_cfg, tiny_params, rng_np):
    """share_att_images (greedy fan-out attending over the image node
    streams) == the per-row gathered layout: same tokens, same logprobs
    (mathematically equal; float-reassociated, so allclose on scores)."""
    from subgc_tpu.graph import SceneGraph, SubgraphSet
    from subgc_tpu.models import subgc

    params, state = tiny_params
    cfg = tiny_cfg
    from subgc_tpu.config import EvalConfig
    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=0.75, gpn_max_subg=4,
                      max_subgraph_bucket=8)
    B, N, K, S = 2, cfg.obj_num, cfg.rel_num, 8
    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng_np.rand(B, N, cfg.att_feat_size), jnp.float32),
        obj_dist=jnp.asarray(rng_np.rand(B, N, cfg.num_obj_classes),
                             jnp.float32),
        rel_ind=jnp.asarray(rng_np.randint(0, N - 1, (B, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng_np.rand(B, K, cfg.num_rel_classes),
                              jnp.float32))
    oi = np.full((B, S, N), N - 1, np.int32)
    am = np.zeros((B, S, N), np.float32)
    for b in range(B):
        for s in range(S):
            n = rng_np.randint(2, 6)
            oi[b, s, :n] = rng_np.choice(N - 1, n, replace=False)
            am[b, s, :n] = 1
    subs = SubgraphSet(jnp.asarray(oi),
                       jnp.asarray(np.full((B, S, K), K - 1, np.int32)),
                       jnp.asarray(am), jnp.asarray(np.ones((B, S), bool)))

    from subgc_tpu.decode import greedy

    def run(shared):
        c = cfg.replace(share_att_images=shared)
        enc = subgc.encode_images_batched(params, state, graph, subs, c, ecfg)
        assert (enc.feats.att_img is not None) == shared
        out = greedy.sample(params, enc.feats, c, ecfg)
        return enc, out

    enc_a, out_a = run(False)
    enc_b, out_b = run(True)
    np.testing.assert_array_equal(np.asarray(enc_a.keep_ind),
                                  np.asarray(enc_b.keep_ind))
    np.testing.assert_array_equal(np.asarray(out_a.seq), np.asarray(out_b.seq))
    np.testing.assert_allclose(np.asarray(out_a.logprobs),
                               np.asarray(out_b.logprobs), rtol=2e-5,
                               atol=2e-6)


def test_image_shared_beam_matches_per_row(tiny_cfg, tiny_params, rng_np):
    """Image-shared attention in BEAM search (streams ride the vmap with
    in_axes=None, per-step dynamic slice) == the per-row layout: exact
    tokens, close scores — incl. through the chunked decode."""
    from subgc_tpu.graph import SceneGraph, SubgraphSet
    from subgc_tpu.models import subgc

    params, state = tiny_params
    cfg = tiny_cfg
    B, N, K, S = 2, cfg.obj_num, cfg.rel_num, 10
    graph = SceneGraph(
        obj_fmap=jnp.asarray(rng_np.rand(B, N, cfg.att_feat_size), jnp.float32),
        obj_dist=jnp.asarray(rng_np.rand(B, N, cfg.num_obj_classes),
                             jnp.float32),
        rel_ind=jnp.asarray(rng_np.randint(0, N - 1, (B, K, 2)), jnp.int32),
        pred_dist=jnp.asarray(rng_np.rand(B, K, cfg.num_rel_classes),
                              jnp.float32))
    oi = np.full((B, S, N), N - 1, np.int32)
    am = np.zeros((B, S, N), np.float32)
    for b in range(B):
        for s in range(S):
            n = rng_np.randint(2, 6)
            oi[b, s, :n] = rng_np.choice(N - 1, n, replace=False)
            am[b, s, :n] = 1
    subs = SubgraphSet(jnp.asarray(oi),
                       jnp.asarray(np.full((B, S, K), K - 1, np.int32)),
                       jnp.asarray(am), jnp.asarray(np.ones((B, S), bool)))

    for group_size, beam_chunk in ((1, 1024), (2, 4)):
        ecfg = EvalConfig(beam_size=4, group_size=group_size,
                          diversity_lambda=0.5, gpn_nms_thres=0.75,
                          gpn_max_subg=5, max_subgraph_bucket=S,
                          beam_chunk=beam_chunk)

        def run(shared):
            c = cfg.replace(share_att_images=shared)
            enc = subgc.encode_images_batched(params, state, graph, subs,
                                              c, ecfg)
            assert (enc.feats.att_img is not None) == shared
            return beam.beam_search(params, enc.feats, c, ecfg)

        out_a = run(False)
        out_b = run(True)
        np.testing.assert_array_equal(np.asarray(out_a.seq),
                                      np.asarray(out_b.seq))
        np.testing.assert_allclose(np.asarray(out_a.all_ps),
                                   np.asarray(out_b.all_ps),
                                   rtol=2e-5, atol=2e-6)
