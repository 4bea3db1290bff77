"""Numerical parity vs the reference PyTorch model (CPU, float32).

These tests instantiate the actual reference `TopDownModel`, convert its
weights with tools/convert_torch_ckpt.py, run both implementations on
identical synthetic inputs, and assert agreement:

* training forward: token logprobs, gpn loss, sub-graph scores
* test path: sGPN scores, NMS keep set, greedy decode tokens, beam decode
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from subgc_tpu.config import EvalConfig
from subgc_tpu.graph import SceneGraph, SubgraphSet
from subgc_tpu.models import subgc
from subgc_tpu.decode import beam, greedy

from .torch_ref import (load_reference_models, make_ref_opt,
                        make_train_batch, ref_model_to_params)


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refnames")
    return load_reference_models(tmp)


def _jax_graph(batch):
    return SceneGraph(obj_fmap=jnp.asarray(batch["att_feats"]),
                      obj_dist=jnp.asarray(batch["obj_dist"]),
                      rel_ind=jnp.asarray(batch["rel_ind"], jnp.int32),
                      pred_dist=jnp.asarray(batch["pred_dist"]))


def test_train_forward_parity(ref, tiny_cfg, rng_np):
    import torch
    ref_att, obj_path, pred_path = ref
    cfg = tiny_cfg
    opt = make_ref_opt(cfg, obj_path, pred_path)
    torch.manual_seed(7)
    model = ref_att.TopDownModel(opt)
    model.eval()  # deterministic: no dropout, no scheduled sampling

    params, state = ref_model_to_params(model, cfg)
    b = make_train_batch(rng_np, cfg)

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
         if isinstance(v, np.ndarray)}
    with torch.no_grad():
        out_t, gpn_loss_t, score_t = model(
            torch.zeros(b["B"], cfg.att_feat_size), t["att_feats"], t["labels"],
            t["gpn_att_mask"], None, t["obj_dist"], None, t["rel_ind"], None,
            t["pred_dist"], t["gpn_obj_ind"], t["gpn_pred_ind"], None,
            t["gpn_pool_mtx"], mode="forward")

    lp, gpn_loss_j, score_j, _ = subgc.train_forward(
        params, state, _jax_graph(b), jnp.asarray(b["labels"], jnp.int32),
        jnp.asarray(b["gpn_obj_ind"], jnp.int32),
        jnp.asarray(b["gpn_att_mask"]), jnp.asarray(b["img_ix"], jnp.int32),
        cfg, train=False)

    # reference returns [S, T+1, V+1] logprobs with rows past seq-end zeroed
    # by its early break; compare only where the reference computed them
    out_t = out_t.numpy()
    lp = np.asarray(lp)
    computed = np.abs(out_t).sum(-1) > 0
    np.testing.assert_allclose(lp[computed], out_t[computed], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(float(gpn_loss_j), float(gpn_loss_t), rtol=1e-5)
    score_t = score_t.numpy().reshape(2, b["S"], b["half"]).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(score_j), score_t, rtol=1e-4,
                               atol=1e-6)


def _make_test_inputs(rng, cfg, M=6, n_real_obj=10, n_real_rel=12):
    """Build the reference's 5-slot test packing + my flat SubgraphSet."""
    N, K = cfg.obj_num, cfg.rel_num
    att_feats = rng.rand(1, N, cfg.att_feat_size).astype('f')
    obj_dist = rng.rand(1, N, cfg.num_obj_classes).astype('f')
    rel_ind = rng.randint(0, n_real_obj, (1, K, 2)).astype(np.int64)
    pred_dist = rng.rand(1, K, cfg.num_rel_classes).astype('f')

    gpn_obj_ind = np.full((5, 2, M, N), N - 1, np.int64)
    gpn_att_mask = np.zeros((5, 2, M, N), np.float32)
    gpn_pred_ind = np.full((5, 2, M, K), K - 1, np.int64)
    gpn_pool_mtx = np.zeros((5, 2, M, N, N), np.float32)
    for p in range(2):
        for m in range(M):
            n = rng.randint(2, 7)
            nodes = rng.choice(n_real_obj, n, replace=False)
            k = rng.randint(1, 5)
            rels = rng.choice(n_real_rel, k, replace=False)
            gpn_obj_ind[:, p, m, :n] = nodes
            gpn_att_mask[:, p, m, :n] = 1
            gpn_pool_mtx[:, p, m, np.arange(n), np.arange(n)] = 1
            gpn_pred_ind[:, p, m, :k] = rels

    # flat order = pos block then neg block (dataloader_test.py:224-230)
    flat_obj = np.concatenate([gpn_obj_ind[0, 0], gpn_obj_ind[0, 1]], 0)
    flat_mask = np.concatenate([gpn_att_mask[0, 0], gpn_att_mask[0, 1]], 0)
    flat_pred = np.concatenate([gpn_pred_ind[0, 0], gpn_pred_ind[0, 1]], 0)
    subs = SubgraphSet(obj_ind=jnp.asarray(flat_obj, jnp.int32),
                       pred_ind=jnp.asarray(flat_pred, jnp.int32),
                       att_mask=jnp.asarray(flat_mask),
                       valid=jnp.ones((2 * M,), bool))
    return dict(att_feats=att_feats, obj_dist=obj_dist, rel_ind=rel_ind,
                pred_dist=pred_dist, gpn_obj_ind=gpn_obj_ind,
                gpn_att_mask=gpn_att_mask, gpn_pred_ind=gpn_pred_ind,
                gpn_pool_mtx=gpn_pool_mtx, subs=subs, M=M)


@pytest.mark.parametrize("beam_size", [1, 2, 3])
def test_sample_parity(ref, tiny_cfg, rng_np, beam_size):
    import torch
    ref_att, obj_path, pred_path = ref
    cfg = tiny_cfg
    nms_thres, max_subg = 0.75, 4
    opt = make_ref_opt(cfg, obj_path, pred_path, test_LSTM=1,
                       gpn_nms_thres=nms_thres, gpn_max_subg=max_subg,
                       use_topk_sampling=0, topk_temp=0.6, the_k=3, sct=0)
    torch.manual_seed(11)
    model = ref_att.TopDownModel(opt)
    model.eval()
    params, state = ref_model_to_params(model, cfg)

    b = _make_test_inputs(rng_np, cfg)
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()
         if isinstance(v, np.ndarray)}
    eval_kwargs = {"beam_size": beam_size, "sample_max": 1,
                   "return_att": 1 if beam_size == 1 else 0}
    with torch.no_grad():
        out = model(torch.zeros(1, cfg.att_feat_size), t["att_feats"],
                    t["gpn_att_mask"], None, t["obj_dist"], None, t["rel_ind"],
                    None, t["pred_dist"], t["gpn_obj_ind"], t["gpn_pred_ind"],
                    None, t["gpn_pool_mtx"], opt=eval_kwargs, mode="sample")
    if beam_size == 1:
        seq_t, _, score_t, keep_t, attw_t = out
    else:
        seq_t, _, score_t, keep_t = out

    graph = _jax_graph(b)
    # return_att mirrors the torch eval_kwargs above: the greedy path must
    # produce the full [S, T+1, N] attention stack for comparison
    ecfg = EvalConfig(beam_size=beam_size, gpn_nms_thres=nms_thres,
                      gpn_max_subg=max_subg, return_att=beam_size == 1)
    enc = subgc.encode_image(params, state, graph, b["subs"], cfg, ecfg)

    n_keep = int(np.asarray(enc.keep_valid).sum())
    assert n_keep == seq_t.shape[0]
    np.testing.assert_array_equal(np.asarray(enc.keep_ind)[:n_keep],
                                  keep_t.numpy().astype(np.int64))
    np.testing.assert_allclose(np.asarray(enc.scores)[:n_keep],
                               score_t.numpy(), rtol=1e-4, atol=1e-6)

    if beam_size == 1:
        out_j = greedy.sample(params, enc.feats, cfg, ecfg)
        np.testing.assert_array_equal(np.asarray(out_j.seq)[:n_keep],
                                      seq_t.numpy())
        # reference clips the node axis to the max mask length (clip_att,
        # AttModel.py:348-354) and breaks the time loop early; compare the
        # overlap (the clipped-away columns are masked to 0 on both sides)
        attw_t = attw_t.numpy()
        attw_j = np.asarray(out_j.att_weights)[:n_keep, :attw_t.shape[1],
                                               :attw_t.shape[2]]
        np.testing.assert_allclose(attw_j, attw_t, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out_j.att_weights)[:n_keep, :attw_t.shape[1],
                                          attw_t.shape[2]:], 0.0)
    else:
        out_j = beam.beam_search(params, enc.feats, cfg, ecfg)
        np.testing.assert_array_equal(np.asarray(out_j.seq)[:n_keep],
                                      seq_t.numpy())
