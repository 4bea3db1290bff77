"""Checkpoint-conversion parity at PRODUCTION dims (VERDICT r1 item 6).

Builds the reference TopDownModel at full Sub_GC_Kar dims (vocab 9487,
rnn 1000, gcn 1024, 1599 object / 21 predicate classes — `train.sh:17-24`),
converts its state_dict through tools/convert_torch_ckpt.py, and asserts
exact greedy tokens + sGPN scores/keep-set on a synthetic image.  This is
the path the shipped pretrained model-60000.pth checkpoints travel
(`models/__init__.py:43-59`, pretrained/README.md); tiny-dim parity cannot
catch naming/shape drift that only appears at real dims.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig, ModelConfig
from subgc_tpu.decode import greedy
from subgc_tpu.models import subgc
from subgc_tpu.graph import SceneGraph

from .test_torch_parity import _make_test_inputs
from .torch_ref import load_reference_models, make_ref_opt, ref_model_to_params

PROD = ModelConfig()   # defaults = Sub_GC_Kar production dims


def test_production_dim_greedy_parity(tmp_path):
    import torch
    ref_att, obj_path, pred_path = load_reference_models(
        tmp_path, n_obj_names=PROD.num_obj_classes,
        n_pred_names=PROD.num_rel_classes)
    nms_thres, max_subg = 0.75, 4
    opt = make_ref_opt(PROD, obj_path, pred_path, test_LSTM=1,
                       gpn_nms_thres=nms_thres, gpn_max_subg=max_subg,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(2019)
    model = ref_att.TopDownModel(opt)
    model.eval()
    params, state = ref_model_to_params(model, PROD)

    rng = np.random.RandomState(4)
    b = _make_test_inputs(rng, PROD, M=4, n_real_obj=12, n_real_rel=16)
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
         if isinstance(v, np.ndarray)}
    with torch.no_grad():
        seq_t, _, score_t, keep_t, _ = model(
            torch.zeros(1, PROD.att_feat_size), t["att_feats"],
            t["gpn_att_mask"], None, t["obj_dist"], None, t["rel_ind"],
            None, t["pred_dist"], t["gpn_obj_ind"], t["gpn_pred_ind"],
            None, t["gpn_pool_mtx"],
            opt={"beam_size": 1, "sample_max": 1, "return_att": 1},
            mode="sample")

    graph = SceneGraph(obj_fmap=jnp.asarray(b["att_feats"]),
                       obj_dist=jnp.asarray(b["obj_dist"]),
                       rel_ind=jnp.asarray(b["rel_ind"], jnp.int32),
                       pred_dist=jnp.asarray(b["pred_dist"]))
    ecfg = EvalConfig(beam_size=1, gpn_nms_thres=nms_thres,
                      gpn_max_subg=max_subg)
    enc = subgc.encode_image(params, state, graph, b["subs"], PROD, ecfg)

    n_keep = int(np.asarray(enc.keep_valid).sum())
    assert n_keep == seq_t.shape[0]
    np.testing.assert_array_equal(np.asarray(enc.keep_ind)[:n_keep],
                                  keep_t.numpy().astype(np.int64))
    np.testing.assert_allclose(np.asarray(enc.scores)[:n_keep],
                               score_t.numpy(), rtol=1e-4, atol=1e-6)
    out_j = greedy.sample(params, enc.feats, PROD, ecfg)
    np.testing.assert_array_equal(np.asarray(out_j.seq)[:n_keep],
                                  seq_t.numpy())
