"""Diverse beam search + decoding-constraint parity vs the reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig
from subgc_tpu.decode import beam
from subgc_tpu.models import subgc

from .test_torch_parity import _jax_graph, _make_test_inputs
from .torch_ref import load_reference_models, make_ref_opt, ref_model_to_params


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refnames_db")
    return load_reference_models(tmp)


@pytest.mark.parametrize("group_size,decoding_constraint,length_penalty",
                         [(2, 0, ""), (1, 1, ""), (2, 1, ""),
                          (1, 0, "wu_0.5"), (1, 0, "avg_1"),
                          # edge: bdash=1 (every group a single beam, max
                          # stagger) and penalty+groups+constraint combined
                          (4, 0, ""), (2, 1, "wu_0.5")])
def test_diverse_beam_parity(ref, tiny_cfg, rng_np, group_size,
                             decoding_constraint, length_penalty):
    import torch
    ref_att, obj_path, pred_path = ref
    cfg = tiny_cfg
    beam_size = 4
    opt = make_ref_opt(cfg, obj_path, pred_path, test_LSTM=1,
                       gpn_nms_thres=0.75, gpn_max_subg=3,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(23)
    model = ref_att.TopDownModel(opt)
    model.eval()
    params, state = ref_model_to_params(model, cfg)

    b = _make_test_inputs(rng_np, cfg)
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
         if isinstance(v, np.ndarray)}
    eval_kwargs = {"beam_size": beam_size, "sample_max": 1,
                   "group_size": group_size, "diversity_lambda": 0.5,
                   "decoding_constraint": decoding_constraint,
                   "length_penalty": length_penalty}
    with torch.no_grad():
        seq_t, _, score_t, keep_t = model(
            torch.zeros(1, cfg.att_feat_size), t["att_feats"],
            t["gpn_att_mask"], None, t["obj_dist"], None, t["rel_ind"],
            None, t["pred_dist"], t["gpn_obj_ind"], t["gpn_pred_ind"],
            None, t["gpn_pool_mtx"], opt=eval_kwargs, mode="sample")

    graph = _jax_graph(b)
    ecfg = EvalConfig(beam_size=beam_size, group_size=group_size,
                      diversity_lambda=0.5,
                      decoding_constraint=decoding_constraint,
                      length_penalty=length_penalty,
                      gpn_nms_thres=0.75, gpn_max_subg=3)
    enc = subgc.encode_image(params, state, graph, b["subs"], cfg, ecfg)
    out = beam.beam_search(params, enc.feats, cfg, ecfg)

    n_keep = int(np.asarray(enc.keep_valid).sum())
    assert n_keep == seq_t.shape[0]
    np.testing.assert_array_equal(np.asarray(out.seq)[:n_keep], seq_t.numpy())


def test_beam_chunking_matches_unchunked(tiny_cfg, tiny_params, rng_np):
    """lax.map-chunked beam decode (beam_chunk < S) == one-shot vmap."""
    import jax.numpy as jnp
    from subgc_tpu.models import decoder as D

    params, _ = tiny_params
    cfg = tiny_cfg
    S = 10
    feats = D.PreparedFeatures(
        fc=jnp.asarray(rng_np.randn(S, cfg.rnn_size), jnp.float32),
        att=jnp.asarray(rng_np.randn(S, cfg.obj_num, cfg.rnn_size),
                        jnp.float32),
        p_att=jnp.asarray(rng_np.randn(S, cfg.obj_num, cfg.att_hid_size),
                          jnp.float32),
        mask=jnp.asarray((rng_np.rand(S, cfg.obj_num) > 0.3).astype("f")),
        fc_ih=jnp.asarray(rng_np.randn(S, 4 * cfg.rnn_size), jnp.float32))
    ecfg_one = EvalConfig(beam_size=3, beam_chunk=0)
    ecfg_chunk = EvalConfig(beam_size=3, beam_chunk=4)   # 10 -> 3 chunks of 4
    a = beam.beam_search(params, feats, cfg, ecfg_one)
    b = beam.beam_search(params, feats, cfg, ecfg_chunk)
    np.testing.assert_array_equal(np.asarray(a.seq), np.asarray(b.seq))
    np.testing.assert_allclose(np.asarray(a.all_ps), np.asarray(b.all_ps),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.all_seqs),
                                  np.asarray(b.all_seqs))
