"""Harness for numerical-parity tests against the reference PyTorch model.

Imports the reference implementation from /root/reference (read-only) on CPU
torch, with two shims so it can run in this environment:

* `misc.utils.obj_edge_vectors` normally loads a 800MB GloVe file; patched to
  return deterministic random vectors (weights are converted to the JAX model
  afterwards, so parity is unaffected).
* `.cuda()` is patched to a no-op so beam search (CaptionModel.py:129,171)
  runs on CPU.

If the reference tree is unavailable the importing test is skipped.
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


def load_reference_models(tmp_path, n_obj_names=30, n_pred_names=10):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # no-op .cuda() for CPU-only torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import misc.utils as ref_utils

    def fake_vectors(names, wv_type='glove.6B', wv_dir='data/', wv_dim=300):
        g = torch.Generator().manual_seed(1234)
        return torch.randn(len(names), wv_dim, generator=g)

    ref_utils.obj_edge_vectors = fake_vectors

    # models/__init__.py re-exports the AttModel *class*, shadowing the
    # submodule attribute — fetch the real module from sys.modules
    import importlib
    importlib.import_module("models.AttModel")
    ref_att = sys.modules["models.AttModel"]
    ref_att.obj_edge_vectors = fake_vectors

    obj_names = np.array([f"obj{i}" for i in range(n_obj_names)])
    pred_names = np.array([f"rel{i}" for i in range(n_pred_names)])
    obj_path = str(tmp_path / "obj_names.npy")
    pred_path = str(tmp_path / "pred_names.npy")
    np.save(obj_path, obj_names)
    np.save(pred_path, pred_names)
    return ref_att, obj_path, pred_path


def make_ref_opt(cfg, obj_path, pred_path, **kw):
    """Build the argparse-namespace the reference model expects from a
    subgc_tpu ModelConfig."""
    opt = types.SimpleNamespace(
        vocab_size=cfg.vocab_size,
        input_encoding_size=cfg.input_encoding_size,
        rnn_size=cfg.rnn_size,
        num_layers=2,
        drop_prob_lm=cfg.drop_prob_lm,
        max_length=None,
        seq_length=cfg.seq_length,
        fc_feat_size=cfg.fc_feat_size,
        att_feat_size=cfg.att_feat_size,
        att_hid_size=cfg.att_hid_size,
        use_bn=cfg.use_bn,
        sampling_prob=0.0,
        use_gpn=1 if cfg.use_gpn else 0,
        embed_dim=cfg.embed_dim,
        gcn_dim=cfg.gcn_dim,
        noun_fuse=1 if cfg.noun_fuse else 0,
        pred_emb_type=cfg.pred_emb_type,
        gcn_layers=cfg.gcn_layers,
        gcn_residual=cfg.gcn_residual,
        gcn_bn=1 if cfg.gcn_bn else 0,
        obj_name_path=obj_path,
        rel_name_path=pred_path,
        use_gt_subg=1 if cfg.use_gt_subg else 0,
    )
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt


def ref_model_to_params(model, cfg):
    """Reference nn.Module -> (params, state) via the checkpoint converter."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.convert_torch_ckpt import torch_state_dict_to_params
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, state = torch_state_dict_to_params(sd, cfg)
    import jax, jax.numpy as jnp
    return (jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, state))


def make_train_batch(rng, cfg, B=2, half=2, n_real_obj=10, n_real_rel=12,
                     seq_per_img=5):
    """Synthetic fixed-shape batch in BOTH layouts (torch kwargs + jax arrays)."""
    N, K = cfg.obj_num, cfg.rel_num
    S = B * seq_per_img
    att_feats = rng.rand(B, N, cfg.att_feat_size).astype('f')
    obj_dist = rng.rand(B, N, cfg.num_obj_classes).astype('f')
    rel_ind = rng.randint(0, n_real_obj, (B, K, 2)).astype(np.int64)
    pred_dist = rng.rand(B, K, cfg.num_rel_classes).astype('f')

    gpn_obj_ind = np.full((S, 2, half, N), N - 1, np.int64)
    gpn_att_mask = np.zeros((S, 2, half, N), np.float32)
    gpn_pred_ind = np.full((S, 2, half, K), K - 1, np.int64)
    gpn_pool_mtx = np.zeros((S, 2, half, N, N), np.float32)
    for s in range(S):
        for p in range(2):
            for h in range(half):
                n = rng.randint(2, 7)
                gpn_obj_ind[s, p, h, :n] = rng.choice(n_real_obj, n, replace=False)
                gpn_att_mask[s, p, h, :n] = 1
                gpn_pool_mtx[s, p, h, np.arange(n), np.arange(n)] = 1
                k = rng.randint(1, 5)
                gpn_pred_ind[s, p, h, :k] = rng.choice(n_real_rel, k, replace=False)

    labels = np.zeros((S, cfg.seq_length + 2), np.int64)
    for s in range(S):
        ln = rng.randint(4, cfg.seq_length)
        labels[s, 1:1 + ln] = rng.randint(1, cfg.vocab_size, ln)
    masks = np.zeros((S, cfg.seq_length + 2), np.float32)
    for s in range(S):
        nz = (labels[s] != 0).sum() + 2
        masks[s, :nz] = 1

    img_ix = np.repeat(np.arange(B), seq_per_img)
    return dict(att_feats=att_feats, obj_dist=obj_dist, rel_ind=rel_ind,
                pred_dist=pred_dist, gpn_obj_ind=gpn_obj_ind,
                gpn_att_mask=gpn_att_mask, gpn_pred_ind=gpn_pred_ind,
                gpn_pool_mtx=gpn_pool_mtx, labels=labels, masks=masks,
                img_ix=img_ix, B=B, S=S, half=half)
