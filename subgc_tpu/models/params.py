"""Parameter pytree construction + initialization.

The model is written as pure functions over an explicit nested-dict parameter
pytree (idiomatic jit/pjit style) instead of stateful modules.  Initializers
reproduce the distributions the reference relies on:

* torch ``nn.Linear`` default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for W and b
  (matters for from-scratch training parity)
* GCN collection units: N(0, 0.001) weights, zero bias
  (`models/lib/graph_conv_unit.py:5-20`)
* ``gpn_fc`` / ``read_out_proj``: default Linear weights but zero biases
  (`models/lib/gpn.py:30-38`)
* word-class embeddings: GloVe rows (fallback N(0,1)) (`misc/utils.py:348-398`)

Weight layout convention: Linear weights are stored [in, out] so application is
``x @ w + b`` (transpose of the torch [out, in] layout; see
tools/convert_torch_ckpt.py).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def _linear(key, n_in, n_out, init="torch", bias="default"):
    kw, kb = jax.random.split(key)
    if init == "torch":
        bound = 1.0 / math.sqrt(n_in)
        w = jax.random.uniform(kw, (n_in, n_out), jnp.float32, -bound, bound)
    elif init == "gcn":
        w = 0.001 * jax.random.normal(kw, (n_in, n_out), jnp.float32)
    else:
        raise ValueError(init)
    if bias == "default" and init == "torch":
        bound = 1.0 / math.sqrt(n_in)
        b = jax.random.uniform(kb, (n_out,), jnp.float32, -bound, bound)
    else:
        b = jnp.zeros((n_out,), jnp.float32)
    return {"w": w, "b": b}


def _lstm_cell(key, n_in, n_hid):
    """PyTorch LSTMCell layout: stacked (i, f, g, o) gates."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(n_hid)

    def u(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "w_ih": u(ks[0], (n_in, 4 * n_hid)),
        "w_hh": u(ks[1], (n_hid, 4 * n_hid)),
        "b_ih": u(ks[2], (4 * n_hid,)),
        "b_hh": u(ks[3], (4 * n_hid,)),
    }


def _bn(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _bn_state(dim):
    return {"mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32)}


def init_params(key, cfg: ModelConfig,
                obj_glove: Optional[np.ndarray] = None,
                pred_glove: Optional[np.ndarray] = None,
                n_obj_names: Optional[int] = None,
                n_pred_names: Optional[int] = None):
    """Build the full parameter pytree (and mutable state for BN).

    obj_glove/pred_glove: [num_names, embed_dim] GloVe tables built by
    io.glove.class_embeddings; if None, N(0,1) like the reference fallback.
    Returns (params, state).
    """
    n_obj_names = n_obj_names if obj_glove is None else obj_glove.shape[0]
    n_pred_names = n_pred_names if pred_glove is None else pred_glove.shape[0]
    if n_obj_names is None:
        n_obj_names = cfg.num_obj_classes
    if n_pred_names is None:
        n_pred_names = cfg.num_rel_classes

    keys = iter(jax.random.split(key, 64))
    L, E, R, H = cfg.gcn_dim, cfg.embed_dim, cfg.rnn_size, cfg.att_hid_size
    V1 = cfg.vocab_size + 1

    params = {}
    state = {}

    # ---- feature fusion (models/AttModel.py:72-86,370-387)
    fusion = {"obj_v_proj": _linear(next(keys), cfg.att_feat_size, L)}
    if cfg.noun_fuse:
        fusion["obj_emb"] = (jnp.asarray(obj_glove, jnp.float32) if obj_glove is not None
                             else jax.random.normal(next(keys), (n_obj_names, E)))
        fusion["obj_emb_proj"] = _linear(next(keys), E, L)
    fusion["pred_emb"] = (jnp.asarray(pred_glove, jnp.float32) if pred_glove is not None
                          else jax.random.normal(next(keys), (n_pred_names, E)))
    fusion["pred_emb_proj"] = _linear(next(keys), E, L)
    params["fusion"] = fusion

    # ---- GCN backbone: 4 typed collection units per layer
    # (graph_conv.py:10-35, graph_conv_unit.py:12-50)
    gcn_layers = []
    gcn_state = []
    for _ in range(cfg.gcn_layers):
        units = []
        ustate = []
        for _ in range(4):
            u = {"lft": _linear(next(keys), L, 512, init="gcn", bias="zero"),
                 "rgt": _linear(next(keys), 512, L, init="gcn", bias="zero")}
            if cfg.gcn_bn:
                u["bn"] = _bn(L)
                ustate.append(_bn_state(L))
            else:
                ustate.append({})
            units.append(u)
        gcn_layers.append(units)
        gcn_state.append(ustate)
    params["gcn"] = gcn_layers
    state["gcn_bn"] = gcn_state

    # ---- sGPN (gpn.py:24-38) / full-graph readout (AttModel.py:100-102)
    if cfg.use_gpn:
        gpn = {}
        if not cfg.use_gt_subg:
            gpn["fc1"] = _linear(next(keys), 2 * L, cfg.gpn_hid_dim)
            gpn["fc1"]["b"] = jnp.zeros_like(gpn["fc1"]["b"])
            gpn["fc2"] = _linear(next(keys), cfg.gpn_hid_dim, 1)
            gpn["fc2"]["b"] = jnp.zeros_like(gpn["fc2"]["b"])
        gpn["readout1"] = _linear(next(keys), 2 * L, cfg.gpn_hid_dim)
        gpn["readout1"]["b"] = jnp.zeros_like(gpn["readout1"]["b"])
        gpn["readout2"] = _linear(next(keys), cfg.gpn_hid_dim, 2 * L)
        gpn["readout2"]["b"] = jnp.zeros_like(gpn["readout2"]["b"])
        params["gpn"] = gpn
    else:
        ro = {"readout1": _linear(next(keys), L, H),
              "readout2": _linear(next(keys), H, 2 * L)}
        ro["readout1"]["b"] = jnp.zeros_like(ro["readout1"]["b"])
        ro["readout2"]["b"] = jnp.zeros_like(ro["readout2"]["b"])
        params["readout"] = ro

    # ---- attention LSTM decoder (AttModel.py:104-120,392-471)
    dec = {
        "embed": jax.random.normal(next(keys), (V1, cfg.input_encoding_size)),
        # the reference declares Linear(att_feat_size, fc_feat_size)
        # (AttModel.py:109) but feeds it the 2*gcn_dim read-out vector; the
        # dims only coincide at 2048 — declare the true input dim here
        "fc_embed1": _linear(next(keys), 2 * cfg.gcn_dim, cfg.fc_feat_size),
        "fc_embed2": _linear(next(keys), cfg.fc_feat_size, R),
        "att_embed": _linear(next(keys), L, R),
        "ctx2att": _linear(next(keys), R, H),
        "att_lstm": _lstm_cell(next(keys), cfg.input_encoding_size + 2 * R, R),
        "lang_lstm": _lstm_cell(next(keys), 2 * R, R),
        "h2att": _linear(next(keys), R, H),
        "alpha_net": _linear(next(keys), H, 1),
        "logit": _linear(next(keys), R, V1),
    }
    if cfg.use_bn:
        # att_embed BatchNorm (AttModel.py:114-119; opts.py:46-47).  The
        # reference declares BatchNorm1d(att_feat_size) but feeds it the GCN
        # output of dim gcn_dim (AttModel.py:364) — the torch module only runs
        # when the dims coincide; the BN here is over the true input dim.
        dec["att_bn0"] = _bn(L)
        att_bn = {"bn0": _bn_state(L)}
        if cfg.use_bn == 2:
            dec["att_bn1"] = _bn(R)
            att_bn["bn1"] = _bn_state(R)
        state["att_bn"] = att_bn
    params["decoder"] = dec

    return params, state


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
