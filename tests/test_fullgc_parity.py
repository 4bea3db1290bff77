"""Full-GC (full-graph, 4-layer GCN+BN, no sGPN) parity vs the reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig, ModelConfig
from subgc_tpu.decode import beam
from subgc_tpu.graph import SceneGraph
from subgc_tpu.models import subgc

from .torch_ref import load_reference_models, make_ref_opt, ref_model_to_params


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refnames_fg")
    return load_reference_models(tmp)


FULL_GC = ModelConfig(vocab_size=50, seq_length=16, rnn_size=64,
                      input_encoding_size=48, att_hid_size=32, gcn_dim=40,
                      fc_feat_size=64, att_feat_size=80, embed_dim=20,
                      num_obj_classes=30, num_rel_classes=10,
                      noun_fuse=False, pred_emb_type=2, gcn_layers=4,
                      gcn_residual=1, gcn_bn=True, use_gpn=False)


def test_fullgc_beam_parity(ref, rng_np):
    import torch
    ref_att, obj_path, pred_path = ref
    cfg = FULL_GC
    opt = make_ref_opt(cfg, obj_path, pred_path, test_LSTM=1,
                       gpn_nms_thres=0.75, gpn_max_subg=1,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(41)
    model = ref_att.TopDownModel(opt)
    model.eval()
    # give BN non-trivial running stats so the eval path is exercised
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    params, state = ref_model_to_params(model, cfg)

    N, K = cfg.obj_num, cfg.rel_num
    att_feats = rng_np.rand(1, N, cfg.att_feat_size).astype("f")
    obj_dist = rng_np.rand(1, N, cfg.num_obj_classes).astype("f")
    rel_ind = rng_np.randint(0, 10, (1, K, 2)).astype(np.int64)
    pred_dist = rng_np.rand(1, K, cfg.num_rel_classes).astype("f")
    # dummy sub-graph tensors (unused by the full-graph path but required
    # positionally, AttModel.py:196-206)
    M = 2
    gpn_obj_ind = np.full((5, 2, M, N), N - 1, np.int64)
    gpn_att_mask = np.zeros((5, 2, M, N), np.float32)
    gpn_att_mask[..., :3] = 1
    gpn_pred_ind = np.full((5, 2, M, K), K - 1, np.int64)
    gpn_pool_mtx = np.zeros((5, 2, M, N, N), np.float32)

    eval_kwargs = {"beam_size": 3, "sample_max": 1}
    with torch.no_grad():
        seq_t, _, score_t, keep_t = model(
            torch.zeros(1, cfg.att_feat_size),
            torch.from_numpy(att_feats), torch.from_numpy(gpn_att_mask),
            None, torch.from_numpy(obj_dist), None,
            torch.from_numpy(rel_ind), None, torch.from_numpy(pred_dist),
            torch.from_numpy(gpn_obj_ind), torch.from_numpy(gpn_pred_ind),
            None, torch.from_numpy(gpn_pool_mtx),
            opt=eval_kwargs, mode="sample")

    graph = SceneGraph(obj_fmap=jnp.asarray(att_feats),
                       obj_dist=jnp.asarray(obj_dist),
                       rel_ind=jnp.asarray(rel_ind, jnp.int32),
                       pred_dist=jnp.asarray(pred_dist))
    ecfg = EvalConfig(beam_size=3)
    enc = subgc.encode_image(params, state, graph, None, cfg, ecfg)
    out = beam.beam_search(params, enc.feats, cfg, ecfg)
    assert seq_t.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(out.seq), seq_t.numpy())
