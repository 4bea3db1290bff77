"""Scene-graph encoder: feature fusion + GCN backbone.

TPU-first redesign of the reference encoder:

* The reference builds the node<->relation adjacency with a per-image Python
  ``scatter_`` loop (`models/lib/gcn_backbone.py:55-67`).  Here it is a single
  one-hot construction, so the whole adjacency build is one fused XLA op.
* Message passing is two batched matmuls per collection unit that map straight
  onto the MXU (`models/lib/graph_conv_unit.py:28-36` semantics preserved:
  low-rank Linear(dim->512->dim), optional BN, adjacency bmm, degree
  normalization, ReLU).
* The reference expands features x5 for seq_per_img before the sGPN gather
  (`gcn_backbone.py:49-52`); that copy is dropped — downstream gathers index
  the per-image features directly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def batch_norm_1d(x, p, s, train: bool, momentum: float = 0.1, eps: float = 1e-5,
                  mask=None):
    """torch.nn.BatchNorm1d over a flattened [M, C] view.

    Returns (y, new_state).  Uses batch statistics in training (and updates the
    running stats with torch's unbiased-variance convention), running
    statistics at eval.

    mask [M] (optional): statistics cover only rows with mask=1 — the
    pack_wrapper semantics of the reference (`models/AttModel.py:28-37,364`),
    where BatchNorm1d only ever sees the packed (real) rows.
    """
    if train:
        if mask is None:
            mean = x.mean(0)
            var = x.var(0)
            m = x.shape[0]
            unbiased = var * (m / max(m - 1, 1))
        else:
            m = mask.sum()
            mean = (x * mask[:, None]).sum(0) / m
            d = (x - mean) * mask[:, None]
            var = (d * d).sum(0) / m
            unbiased = var * (m / jnp.maximum(m - 1.0, 1.0))
        new_state = {"mean": (1 - momentum) * s["mean"] + momentum * mean,
                     "var": (1 - momentum) * s["var"] + momentum * unbiased}
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_state


def _dense(x, p):
    return x @ p["w"] + p["b"]


def fuse_features(params, graph_obj_dist, obj_fmap, pred_dist, cfg: ModelConfig):
    """Fuse visual features with class word embeddings (AttModel.py:370-387).

    Returns (x_obj [B,N,L], x_pred [B,K,L]).
    """
    f = params["fusion"]
    x_obj = _dense(obj_fmap, f["obj_v_proj"])
    if cfg.noun_fuse:
        # hard argmax over non-background classes, shifted past background
        cls = jnp.argmax(graph_obj_dist[..., 1:], axis=-1) + 1
        emb = _dense(f["obj_emb"][cls], f["obj_emb_proj"])
        x_obj = jax.nn.relu(x_obj + emb)

    if cfg.pred_emb_type == 1:       # argmax excluding background
        pcls = jnp.argmax(pred_dist[..., 1:], axis=-1) + 1
    elif cfg.pred_emb_type == 2:     # argmax including background
        pcls = jnp.argmax(pred_dist, axis=-1)
    else:
        raise ValueError(f"pred_emb_type {cfg.pred_emb_type}")
    x_pred = _dense(f["pred_emb"][pcls], f["pred_emb_proj"])
    return x_obj, x_pred


def make_adjacency(rel_ind, n_obj: int):
    """Dense subject/object adjacency from relation endpoints.

    rel_ind [B,K,2] -> (adj_s, adj_o) each [B,N,K] with adj[b,n,k]=1 iff
    relation k has node n as its subject/object.  Replaces the reference's
    per-image scatter loop (gcn_backbone.py:60-64).

    Note the reference scatters along dim 0 with *last-write-wins* semantics,
    so each value is exactly 1 even if duplicated; one_hot reproduces that.
    """
    adj_s = jax.nn.one_hot(rel_ind[..., 0], n_obj, axis=-1, dtype=jnp.float32)
    adj_o = jax.nn.one_hot(rel_ind[..., 1], n_obj, axis=-1, dtype=jnp.float32)
    # one_hot gives [B,K,N]; transpose to [B,N,K] (rows=target, cols=source)
    return adj_s.transpose(0, 2, 1), adj_o.transpose(0, 2, 1)


def _collect(target_unused, source, adj, unit, ustate, cfg: ModelConfig, train: bool):
    """One collection unit: low-rank transform of source, adjacency-average.

    graph_conv_unit.py:28-36.  adj is [B,T,S], source [B,S,L].
    """
    dt = cfg.cdtype
    h = _dense(source.astype(dt), jax.tree_util.tree_map(lambda x: x.astype(dt), unit["lft"]))
    h = _dense(h, jax.tree_util.tree_map(lambda x: x.astype(dt), unit["rgt"]))
    h = h.astype(jnp.float32)
    new_ustate = ustate
    if "bn" in unit:
        b, s, l = h.shape
        h2, new_ustate = batch_norm_1d(h.reshape(-1, l), unit["bn"], ustate, train)
        h = h2.reshape(b, s, l)
    collect = jnp.einsum("bts,bsl->btl", adj.astype(dt), h.astype(dt),
                         preferred_element_type=jnp.float32)
    degree = adj.sum(2)[..., None]
    return jax.nn.relu(collect / (degree + 1e-7)), new_ustate


def gcn_forward(params, state, x_obj, x_pred, rel_ind, cfg: ModelConfig,
                train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Stacked graph convolutions with periodic residuals (gcn_backbone.py:29-53).

    Returns (x_obj [B,N,L], x_pred [B,K,L], new_state).
    """
    if cfg.gcn_layers == 0:
        return x_obj, x_pred, state

    n_obj = x_obj.shape[1]
    adj_s, adj_o = make_adjacency(rel_ind, n_obj)
    adj_s_t = adj_s.transpose(0, 2, 1)
    adj_o_t = adj_o.transpose(0, 2, 1)

    res_obj, res_pred = x_obj, x_pred
    new_state = []
    for i, units in enumerate(params["gcn"]):
        ustates = state["gcn_bn"][i]
        # both node and edge updates read the *input* features of this layer
        o_from_s, us0 = _collect(x_obj, x_pred, adj_s, units[0], ustates[0], cfg, train)
        o_from_o, us1 = _collect(x_obj, x_pred, adj_o, units[1], ustates[1], cfg, train)
        p_from_s, us2 = _collect(x_pred, x_obj, adj_s_t, units[2], ustates[2], cfg, train)
        p_from_o, us3 = _collect(x_pred, x_obj, adj_o_t, units[3], ustates[3], cfg, train)
        x_obj = (o_from_s + o_from_o) / 2
        x_pred = (p_from_s + p_from_o) / 2
        new_state.append([us0, us1, us2, us3])
        if (i + 1) % cfg.gcn_residual == 0:
            x_obj = x_obj + res_obj
            res_obj = x_obj
            x_pred = x_pred + res_pred
            res_pred = x_pred

    return x_obj, x_pred, {**state, "gcn_bn": new_state}


def encode_graph(params, state, graph, cfg: ModelConfig, train: bool = False):
    """fusion -> GCN.  Returns (x_obj, x_pred, new_state)."""
    x_obj, x_pred = fuse_features(params, graph.obj_dist, graph.obj_fmap,
                                  graph.pred_dist, cfg)
    return gcn_forward(params, state, x_obj, x_pred, graph.rel_ind, cfg, train)
