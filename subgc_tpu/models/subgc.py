"""Full Sub-GC / Full-GC model: encoder + sGPN + decoder orchestration.

Pure-function equivalents of the reference's `TopDownModel` call paths:

* ``train_forward``  — `models/AttModel.py:122-177` (`_forward`)
* ``encode_image``   — the shared encoder+sGPN+NMS prefix of `_sample` /
  `_sample_sentences` (`AttModel.py:179-276`), producing prepared features
  for the batched decoders in ``subgc_tpu.decode``.

The reference runs the test path with 5 redundant sentence-slot copies and
asserts b == 5 (`models/lib/gpn.py:84`); here the encoder runs once per image
and the sub-graph axis is a first-class (padded, static) batch dimension.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import EvalConfig, ModelConfig
from ..graph import SceneGraph, SubgraphSet
from . import decoder as D
from . import encoder as E
from . import gpn as G


class EncodedImage(NamedTuple):
    """Per-image decode-ready features over a static kept-sub-graph axis."""
    feats: D.PreparedFeatures     # [Smax, ...]
    scores: jnp.ndarray           # [Smax] sGPN scores of kept sub-graphs
    keep_ind: jnp.ndarray         # [Smax] original sub-graph indices
    keep_valid: jnp.ndarray       # [Smax] bool


def train_forward(params, state, graph: SceneGraph, labels, sub_obj_ind,
                  sub_att_mask, img_ix, cfg: ModelConfig, train: bool = True,
                  rng=None, ss_prob=None):
    """Teacher-forced training forward.

    labels [S, T+2] (S = B * seq_per_img); sub_* [S, 2, half, N]; img_ix [S].
    Returns (logprobs [S, T+1, V+1], gpn_loss | None, scores, new_state).
    """
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    x_obj, x_pred, new_state = E.encode_graph(params, state, graph, cfg, train)

    chosen_ind = None
    if cfg.use_gpn:
        gpn_loss, scores, att_feats, fc_feats, att_masks, chosen_ind = \
            G.gpn_train_forward(params, x_obj, sub_obj_ind, sub_att_mask,
                                img_ix, cfg, train, rngs[0],
                                return_chosen=True)
    else:
        # Full-GC: full graph per sentence, detached mean-pool read-out
        # (AttModel.py:140-149)
        gpn_loss, scores = None, None
        att_feats = x_obj[img_ix]                       # [S, N, L]
        read_out = jax.lax.stop_gradient(att_feats.mean(1))
        fc_feats = _full_graph_readout(params, read_out)
        att_masks = jnp.zeros((att_feats.shape[0], cfg.obj_num),
                              jnp.float32).at[:, :cfg.obj_num - 1].set(1.0)

    if cfg.share_att_train:
        # image-shared teacher-forced attention (cfg docstring / PERF.md):
        # per-row membership over the image node axis replaces the per-row
        # gathered copies.  XLA prunes the unused att_feats gather.
        # use_gpn rows attend over the chosen sub-graph's node set;
        # Full-GC rows are already in image-node order (mask == att_masks).
        if cfg.use_gpn:
            mem = G.node_membership(chosen_ind, att_masks, cfg.obj_num)
        else:
            mem = att_masks
        feats = D.prepare_features_shared_train(params, fc_feats, x_obj,
                                                mem, cfg, train, rngs[1])
        att_bn = state.get("att_bn")
    else:
        feats, att_bn = D.prepare_features_bn(params, fc_feats, att_feats,
                                              att_masks, cfg, train, rngs[1],
                                              state.get("att_bn"))
    if cfg.use_bn:
        new_state = {**new_state, "att_bn": att_bn}
    logprobs = D.forward_teacher(params, feats, labels, cfg, train, rngs[2],
                                 ss_prob)
    return logprobs, gpn_loss, scores, new_state


def _full_graph_readout(params, read_out):
    ro = params["readout"]
    return (read_out @ ro["readout1"]["w"] + ro["readout1"]["b"]) \
        @ ro["readout2"]["w"] + ro["readout2"]["b"]


def encode_image(params, state, graph: SceneGraph, subs: Optional[SubgraphSet],
                 cfg: ModelConfig, ecfg: EvalConfig) -> EncodedImage:
    """Encoder + sGPN + (optional) NMS for ONE image's test decode.

    graph: batch-of-1 SceneGraph.  subs: the enumerated sub-graph set padded
    to a static bucket ([S, N]/[S, K] arrays) or None for Full-GC.
    """
    x_obj, x_pred, _ = E.encode_graph(params, state, graph, cfg, train=False)

    if not cfg.use_gpn:
        # Full-GC (AttModel.py:196-206): one pseudo sub-graph = full graph
        att_feats = x_obj[0:1]
        read_out = att_feats.mean(1)
        fc_feats = _full_graph_readout(params, read_out)
        att_masks = jnp.zeros((1, cfg.obj_num), jnp.float32).at[:, :cfg.obj_num - 1].set(1.0)
        feats = D.prepare_features(params, fc_feats, att_feats, att_masks, cfg,
                                   bn_state=state.get("att_bn"))
        ones = jnp.ones((1,), jnp.float32)
        return EncodedImage(feats=feats, scores=ones,
                            keep_ind=jnp.zeros((1,), jnp.int32),
                            keep_valid=jnp.ones((1,), bool))

    return _encode_one(params, x_obj[0], subs, cfg, ecfg,
                       state.get("att_bn"))


def _encode_one(params, x_obj_img, subs: SubgraphSet, cfg: ModelConfig,
                ecfg: EvalConfig, bn_state=None) -> EncodedImage:
    """sGPN + NMS + feature prep for one image's node features [N, L]."""
    out = G.gpn_test_forward(params, x_obj_img, subs.obj_ind, subs.att_mask, cfg)
    use_nms = not ecfg.sct    # reference: use_nms = False if sct else True (AttModel.py:95)

    if use_nms:
        keep_ind, keep_valid = G.subgraph_nms(
            out.scores, subs.obj_ind, subs.att_mask, subs.valid, cfg,
            ecfg.gpn_nms_thres, ecfg.gpn_max_subg)
    else:
        smax = subs.obj_ind.shape[0]
        keep_ind = jnp.arange(smax, dtype=jnp.int32)
        keep_valid = subs.valid

    # the fc read-out projects only for the kept sub-graphs (the bucket can
    # be 12.8x the keep set), and the node features project ONCE per image
    # before the per-sub-graph gather (prepare_features_nodes — row-exact
    # at eval, and it never materializes the [keep, N, feat_dim] copy).
    # Greedy and beam decodes additionally skip the projected-row gather
    # and attend over the image streams directly (image-shared attention) —
    # attention-capture (grounding) keeps the per-row layout whose packed
    # att-weight axis the grounding contract expects.
    image_shared = cfg.share_att_images and not ecfg.return_att
    fc_feats = G.readout_project(params, out.read_out[keep_ind])
    att_masks = out.att_masks[keep_ind]
    scores = out.scores[keep_ind]
    feats = D.prepare_features_nodes(params, fc_feats, x_obj_img,
                                     subs.obj_ind[keep_ind], att_masks, cfg,
                                     bn_state=bn_state,
                                     image_shared=image_shared)
    if image_shared:
        # row -> image map (all zeros for this single image; the batched
        # encoder overrides it with the global image indices)
        feats = feats._replace(img_ix=jnp.zeros((keep_ind.shape[0],),
                                                jnp.int32))
    return EncodedImage(feats=feats, scores=scores, keep_ind=keep_ind,
                        keep_valid=keep_valid)


def encode_images_batched(params, state, graph: SceneGraph,
                          subs: SubgraphSet, cfg: ModelConfig,
                          ecfg: EvalConfig) -> EncodedImage:
    """Batched-image encoder: graph [B, ...], subs arrays [B, S, ...].

    The encoder runs batched; sGPN scoring + NMS are vmapped per image; the
    kept sub-graphs of all images flatten into one [B*Smax] decode axis so a
    whole image batch decodes in a single dispatch (host<->device round trips
    amortize over the batch — the reference pays a python loop + sync per
    sub-graph, AttModel.py:216-231).
    """
    x_obj, _, _ = E.encode_graph(params, state, graph, cfg, train=False)
    one = lambda xo, su: _encode_one(params, xo, su, cfg, ecfg,
                                     state.get("att_bn"))
    enc = jax.vmap(one)(x_obj, subs)
    # flatten [B, K, ...] -> [B*K, ...] — EXCEPT the image-shared node
    # streams, which stay per-image [B, n_obj, *] (attention regroups the
    # flat rows by image; see PreparedFeatures.att_img)
    f = enc.feats
    flat2 = lambda x: None if x is None \
        else x.reshape((-1,) + x.shape[2:])
    img_ix = None
    if f.att_img is not None:
        B, K = f.fc.shape[0], f.fc.shape[1]
        img_ix = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
    feats = D.PreparedFeatures(
        fc=flat2(f.fc), att=flat2(f.att), p_att=flat2(f.p_att),
        mask=flat2(f.mask), fc_ih=flat2(f.fc_ih),
        att_img=f.att_img, p_att_img=f.p_att_img, img_ix=img_ix)
    return EncodedImage(feats=feats, scores=flat2(enc.scores),
                        keep_ind=flat2(enc.keep_ind),
                        keep_valid=flat2(enc.keep_valid))
