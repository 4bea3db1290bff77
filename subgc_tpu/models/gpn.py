"""Sub-graph proposal network (sGPN) + sub-graph NMS.

Reimplements `models/lib/gpn.py` TPU-first:

* Sub-graph feature extraction is a direct gather from per-image node
  features (no x5 expansion copy; the reference gathers from pre-expanded
  tensors, `gpn.py:152-172`).
* Pooling uses the node mask directly instead of the diagonal pool matrix
  bmm (`gpn.py:174-185`) — identical numerics because the pool matrix is
  exactly diag(mask-left-packed).
* Sub-graph NMS runs **on device** as a ``lax.fori_loop`` over a precomputed
  pairwise node-IoU matrix instead of the reference's host round-trip
  (`gpn.py:108-138`), returning a fixed-size keep list (static shapes).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def _dense(x, p):
    return x @ p["w"] + p["b"]


def graph_pooling(gpn_att, att_mask):
    """Masked max+mean pooling over sub-graph nodes (gpn.py:174-185).

    gpn_att [..., N, L], att_mask [..., N] -> [..., 2L].

    Matches the reference exactly: features are zeroed outside the mask and
    the max is taken over *all* rows (post-GCN features are ReLU outputs,
    >= 0, so zero rows never win spuriously vs. the reference's bmm).
    """
    clean = gpn_att * att_mask[..., None]
    max_feat = clean.max(-2)
    mean_feat = clean.sum(-2) / att_mask.sum(-1, keepdims=True)
    return jnp.concatenate([max_feat, mean_feat], axis=-1)


def gpn_score(params, read_out, cfg: ModelConfig, train: bool = False,
              rng=None, return_logits: bool = False):
    """MLP + sigmoid sub-graph score (gpn.py:50-55).

    return_logits=True additionally returns the pre-sigmoid logits so the
    training loss can use the softplus BCE form (finite gradients when the
    sigmoid saturates to exactly 0/1 in f32 — see bce_loss)."""
    g = params["gpn"]
    h = jax.nn.relu(_dense(read_out, g["fc1"]))
    if train and rng is not None:
        keep = jax.random.bernoulli(rng, 0.5, h.shape)
        h = jnp.where(keep, h * 2.0, 0.0)
    logits = _dense(h, g["fc2"])[..., 0]
    scores = jax.nn.sigmoid(logits)
    return (scores, logits) if return_logits else scores


def readout_project(params, read_out):
    """read_out_proj: 2L -> hid -> 2L, two Linears, no activation (gpn.py:35-38)."""
    g = params["gpn"]
    return _dense(_dense(read_out, g["readout1"]), g["readout2"])


def bce_loss(scores, targets, eps_clamp: float = 100.0, logits=None):
    """torch.nn.BCELoss with its log clamp at -100 (gpn.py:33,57).

    When ``logits`` are available the loss is computed in the softplus form
    (log sigmoid(x) = -softplus(-x)): identical clamped values, but the
    gradient stays finite when the sigmoid saturates to exactly 0/1 in f32.
    The score-space form's ``clip(log(s))`` chain multiplies the clip's zero
    gradient by log's infinite one — 0 * inf = NaN — which killed long
    synthetic training runs at the point the sGPN became confident
    (observed: loss -> nan at step ~248, tests/test_learning.py shapes).
    """
    if logits is not None:
        log_s = jnp.clip(-jax.nn.softplus(-logits), -eps_clamp)
        log_1s = jnp.clip(-jax.nn.softplus(logits), -eps_clamp)
    else:
        # torch clamps the log OUTPUT at -100 (log(0) = -inf -> -100);
        # log1p keeps precision for scores near 0 on the negative class.
        # The saturated endpoints route around log's infinite vjp: at
        # scores==0 clip(log(0)) forwards -eps_clamp but its grad is
        # clip-zero * log-inf = NaN, so the where picks the constant branch
        # there (same forward value, zero gradient — matching the clamp's
        # true derivative); symmetrically at scores==1 for log1p.
        log_s = jnp.where(scores > 0.0,
                          jnp.clip(jnp.log(jnp.where(scores > 0.0, scores,
                                                     1.0)), -eps_clamp),
                          -eps_clamp)
        log_1s = jnp.where(scores < 1.0,
                           jnp.clip(jnp.log1p(-jnp.where(scores < 1.0,
                                                         scores, 0.0)),
                                    -eps_clamp),
                           -eps_clamp)
    return -(targets * log_s + (1.0 - targets) * log_1s).mean()


def gpn_train_forward(params, x_obj, sub_obj_ind, sub_att_mask, img_ix,
                      cfg: ModelConfig, train: bool = True, rng=None,
                      return_chosen: bool = False):
    """Training branch (gpn.py:41-81).

    x_obj        [B, N, L]         per-image GCN node features
    sub_obj_ind  [S, 2, half, N]   pos/neg sub-graph node indices per sentence
    sub_att_mask [S, 2, half, N]
    img_ix       [S]               image row for each sentence

    Returns (gpn_loss, scores [S,2,half], att_feats [S,N,L], fc_feats [S,2L],
    att_masks [S,N]) where the selected sub-graph per sentence is the
    highest-scoring positive.  With return_chosen=True the chosen sub-graph's
    node indices [S,N] are appended (share_att_train builds its node-set
    membership over the image node axis from them).
    """
    S, two, half, N = sub_obj_ind.shape
    gathered = x_obj[img_ix[:, None, None, None], sub_obj_ind]   # [S,2,half,N,L]
    read_out = graph_pooling(gathered, sub_att_mask)             # [S,2,half,2L]

    use_score = not cfg.use_gt_subg
    if use_score:
        scores, logits = gpn_score(params, read_out, cfg, train, rng,
                                   return_logits=True)           # [S,2,half]
        targets = jnp.stack([jnp.ones((S, half)), jnp.zeros((S, half))], axis=1)
        gpn_loss = bce_loss(scores, targets, logits=logits)
    else:
        scores = jnp.ones((S, two, half), jnp.float32)
        gpn_loss = None

    best = jnp.argmax(scores[:, 0, :], axis=-1)                  # [S]
    ar = jnp.arange(S)
    chosen_ind = sub_obj_ind[ar, 0, best]                        # [S,N]
    att_feats = x_obj[img_ix[:, None], chosen_ind]               # [S,N,L]
    att_masks = sub_att_mask[ar, 0, best]
    ro = jax.lax.stop_gradient(read_out[ar, 0, best])
    fc_feats = readout_project(params, ro)
    if return_chosen:
        return gpn_loss, scores, att_feats, fc_feats, att_masks, chosen_ind
    return gpn_loss, scores, att_feats, fc_feats, att_masks


class GPNTestOut(NamedTuple):
    scores: jnp.ndarray      # [S]
    read_out: jnp.ndarray    # [S, 2L] pooled read-out (pre-projection)
    att_masks: jnp.ndarray   # [S, N]


def gpn_test_forward(params, x_obj_img, sub_obj_ind, sub_att_mask,
                     cfg: ModelConfig) -> GPNTestOut:
    """Test branch before NMS (gpn.py:83-97): score ALL sub-graphs of one image.

    x_obj_img [N, L]; sub_obj_ind/sub_att_mask [S, N] (padded sub-graph axis).

    TPU formulation: the read-out pools via the node-set membership matrix —
    mean as one MXU matmul, max as a reduce over an unmaterialized broadcast
    — instead of gathering an [S, N, L] copy of the node features per
    sub-graph (that gather dominated the encoder at large buckets).  Node
    sets are duplicate-free (left-packed mask nonzeros) and post-GCN node
    features are >= 0 (ReLU outputs + their sums), so both pools match the
    reference's gather/bmm numerics (gpn.py:174-185).
    """
    n_obj = x_obj_img.shape[0]
    mem = node_membership(sub_obj_ind, sub_att_mask, n_obj)      # [S, n_obj]
    mean_feat = (mem @ x_obj_img) / sub_att_mask.sum(-1, keepdims=True)
    # masked max over nodes; XLA fuses the broadcast into the reduce
    masked = x_obj_img[None, :, :] + (mem[:, :, None] - 1.0) * 1e30
    max_feat = masked.max(axis=1)
    read_out = jnp.concatenate([max_feat, mean_feat], axis=-1)
    if not cfg.use_gt_subg:
        scores = gpn_score(params, read_out, cfg, train=False)
    else:
        scores = jnp.ones((sub_obj_ind.shape[0],), jnp.float32)
    # the fc projection (read_out_proj) is NOT applied here: callers gather
    # the NMS keep set first and project only the survivors
    # (subgc._encode_one) — row-exact, and 1/keep_ratio of the matmul work
    return GPNTestOut(scores=scores, read_out=read_out,
                      att_masks=sub_att_mask)


def node_membership(sub_obj_ind, sub_att_mask, n_obj: int):
    """[S, N] indices+mask -> [S, n_obj] {0,1} node-set membership matrix."""
    oh = jax.nn.one_hot(sub_obj_ind, n_obj, dtype=jnp.float32)   # [S,N,n_obj]
    mem = (oh * sub_att_mask[..., None]).sum(-2)
    return jnp.minimum(mem, 1.0)


def pairwise_node_iou(mem):
    """Pairwise node-set IoU from membership rows (gpn.py:140-150)."""
    sizes = mem.sum(-1)
    inter = mem @ mem.T
    union = sizes[:, None] + sizes[None, :] - inter
    return inter / jnp.maximum(union, 1.0)


def subgraph_nms(scores, sub_obj_ind, sub_att_mask, valid, cfg: ModelConfig,
                 iou_thres: float, max_keep: int,
                 parallel: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy score-descending sub-graph NMS, fully on device (gpn.py:108-138).

    Returns (keep_ind [max_keep] int32 in ascending *original* order — the
    reference keeps original score order via `orig_keep.nonzero()` — and
    keep_valid [max_keep] bool).

    Two exact-equivalent implementations (fuzz-pinned against each other in
    tests/test_nms_parallel.py):

    * default: **parallel fixpoint**.  In score order, the full-NMS keep
      set is the unique fixpoint of ``k[i] = valid[i] & ~any(j<i: k[j] &
      iou[j,i] > thres)`` (unique by induction over i — the suppression
      relation is strictly upper-triangular).  Jacobi iteration from
      ``k0 = valid`` makes every item of decision depth d (longest
      suppression chain ending at it) correct and stable after d rounds,
      so a while_loop with an equality stop and an S-round cap returns
      exactly the greedy keep set in chain-depth rounds of one [S,S]
      masked matvec each.  Measured on v5e with chained-dispatch fetched
      timing (the only reliable method through the axon tunnel — see
      docs/PERF.md): **0.16 vs 2.39 ms** per batch-4 NMS at the M-RNN
      shape (S=1024, keep 1000), 0.31 vs 0.44 ms per batch-96 NMS at the
      Karpathy shape (S=128, keep 10).
    * ``parallel=False``: confirm-one-keep-per-iteration fori_loop
      (max_keep dependent iterations — argmax, row gather, mask per keep).
      The greedy-prefix property makes this exactly the reference's full
      suppression sweep (gpn.py:121-130) truncated to max_keep
      (gpn.py:133-135).  Kept as the directly-reference-shaped
      cross-check the fuzz tests pin the fixpoint against.
    """
    S = scores.shape[0]
    max_keep = min(max_keep, S)   # keep list can't exceed the bucket
    neg_inf = jnp.float32(-jnp.inf)
    s = jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s)                      # descending, stable on ties
    mem = node_membership(sub_obj_ind, sub_att_mask, cfg.obj_num)
    valid_sorted = valid[order]

    if not parallel:
        iou = pairwise_node_iou(mem)
        iou_sorted = iou[order][:, order]
        # keep XLA from refusing the [S,S] double-gather into the loop body
        iou_sorted = jax.lax.optimization_barrier(iou_sorted)

        def body(t, carry):
            alive, keep = carry
            any_alive = alive.any()
            i = jnp.argmax(alive)                # first alive = best score
            keep = keep.at[i].set(keep[i] | any_alive)
            suppress = iou_sorted[i] > iou_thres
            alive = alive & ~suppress
            alive = alive.at[i].set(False)
            return alive, keep

        _, keep_sorted = jax.lax.fori_loop(
            0, max_keep, body, (valid_sorted, jnp.zeros((S,), bool)))
    else:
        iou_sorted = pairwise_node_iou(mem[order])
        # suppress[j, i]: valid j earlier in score order, IoU above threshold
        sup = ((iou_sorted > iou_thres)
               & (jnp.arange(S)[:, None] < jnp.arange(S)[None, :])
               & valid_sorted[:, None]).astype(jnp.float32)

        def cond(c):
            k, prev, it = c
            return jnp.logical_and(it < S, jnp.any(k != prev))

        def body(c):
            k, _, it = c
            hit = (k.astype(jnp.float32) @ sup) > 0.0
            return valid_sorted & ~hit, k, it + 1

        keep_sorted, _, _ = jax.lax.while_loop(
            cond, body, (valid_sorted, ~valid_sorted, jnp.int32(0)))
        # full-NMS keep truncated to the max_keep best (greedy-prefix
        # property, as above): clear everything past the max_keep-th keep
        rank = jnp.cumsum(keep_sorted) - 1       # keep's 0-based score rank
        keep_sorted = keep_sorted & (rank < max_keep)

    # back to original indices, ascending original order
    idx = jnp.arange(S)
    keep_orig = jnp.zeros((S,), bool).at[order].set(keep_sorted)
    sort_key = jnp.where(keep_orig, idx, idx + S)
    packed = jnp.argsort(sort_key)[:max_keep]
    n_kept = jnp.minimum(keep_orig.sum(), max_keep)
    keep_valid = jnp.arange(max_keep) < n_kept
    keep_ind = jnp.where(keep_valid, packed, 0)
    return keep_ind.astype(jnp.int32), keep_valid
