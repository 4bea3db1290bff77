"""TopDown attention-LSTM decoder as pure functions.

Reimplements the reference's two-layer attention LSTM (`models/AttModel.py:
392-471`) and its teacher-forced training loop (`AttModel.py:157-175`) the
TPU way: one fused step function used both under ``lax.scan`` (training /
greedy decode) and inside the vectorized beam search.

Semantics preserved exactly:
* att-LSTM input = [prev lang-LSTM h, embedded fc feature, word embedding]
* additive attention: tanh(p_att + W h) -> scalar -> softmax over nodes,
  multiplied by the node mask and renormalized (AttModel.py:445-471)
* lang-LSTM input = [attended feature, att-LSTM h]
* logits -> log_softmax over vocab_size+1
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig


class DecoderState(NamedTuple):
    h_att: jnp.ndarray   # [S, R]
    c_att: jnp.ndarray
    h_lang: jnp.ndarray
    c_lang: jnp.ndarray


class PreparedFeatures(NamedTuple):
    fc: jnp.ndarray       # [S, R]    embedded global (read-out) feature
    att: jnp.ndarray      # [S, N, R] embedded node features
    p_att: jnp.ndarray    # [S, N, H] pre-projected for attention
    mask: jnp.ndarray     # [S, N]
    fc_ih: jnp.ndarray    # [S, 4R]   fc's att-LSTM input-gate contribution,
    #                      precomputed once — fc is constant across decode
    #                      steps, so its w_ih slice never belongs in the scan
    # image-shared attention (the greedy fan-out's HBM saver): when att_img /
    # p_att_img are set, att/p_att are None, mask is the [S, n_obj] node-set
    # MEMBERSHIP over the image node axis, rows group per image ([B, S/B]
    # flattened), and attention() reads the [B, n_obj, *] projected node
    # streams instead of [S, N, *] per-row gathers (docs/PERF.md round 3)
    att_img: jnp.ndarray = None    # [B, n_obj, R]
    p_att_img: jnp.ndarray = None  # [B, n_obj, H]
    img_ix: jnp.ndarray = None     # [S] row -> image (scalar per sub-graph
    #                      inside the beam vmap, where the image streams ride
    #                      with in_axes=None and attention slices them)


def init_state(batch: int, cfg: ModelConfig) -> DecoderState:
    # mixed-precision LSTM state: h rides in the compute dtype (it's
    # re-read by three matmuls per step), c stays f32 (the accumulator)
    h = jnp.zeros((batch, cfg.rnn_size), cfg.cdtype)
    c = jnp.zeros((batch, cfg.rnn_size), jnp.float32)
    return DecoderState(h, c, h, c)


def _dense(x, p, dt):
    if dt == jnp.float32:
        return x @ p["w"] + p["b"]
    w = p["w"] if p["w"].dtype == dt else p["w"].astype(dt)
    return (x.astype(dt) @ w).astype(jnp.float32) + p["b"]


def _matmul(x, w, dt, keep=False):
    """x @ w in compute dtype dt.  keep=True leaves the product in dt
    (bf16 gate streams); default casts back to the f32 accumulator."""
    if dt == jnp.float32:
        return x @ w
    w = w if w.dtype == dt else w.astype(dt)
    y = x.astype(dt) @ w
    return y if keep else y.astype(jnp.float32)


def cast_decoder_weights(params, cfg: ModelConfig):
    """Pre-cast decoder matmul weights to the compute dtype ONCE, so the
    per-step casts can't end up inside the decode scan (biases stay f32 —
    they add to the f32-accumulated matmul output).  Idempotent."""
    dt = cfg.cdtype
    if dt == jnp.float32:
        return params
    dec = dict(params["decoder"])
    dec["embed"] = dec["embed"].astype(dt)   # halves the per-step gather
    for k in ["fc_embed1", "fc_embed2", "att_embed", "ctx2att", "h2att",
              "alpha_net", "logit"]:
        dec[k] = {"w": dec[k]["w"].astype(dt), "b": dec[k]["b"]}
    for k in ["att_lstm", "lang_lstm"]:
        # cast every weight key, preserving derived tables (e.g. the
        # merge_lstm_weights w_cat) so a re-cast never drops them
        dec[k] = {kk: v.astype(dt) if kk.startswith("w") else v
                  for kk, v in dec[k].items()}
    return {**params, "decoder": dec}


def fold_embed_ih(params, cfg: ModelConfig):
    """Fold ``relu(embed) @ att_lstm.w_ih[2R:]`` into a per-vocab gate table.

    relu commutes with the row gather, so ``table[tok] ==
    relu(embed[tok]) @ W`` exactly — the per-step [S, E] @ [E, 4R] matmul
    (12.3 GFLOP/step at the bench decode shape, ~12% of the step's FLOPs)
    becomes a row gather.  Inference-only: training applies dropout between
    relu and the matmul (decode_step ignores the table when train=True).
    Idempotent; call after :func:`cast_decoder_weights` so the table matches
    the live path's dtype chain (bf16 gates keep the product in bf16, which
    is bitwise what storing the f32-accumulated product as bf16 yields).
    """
    dec = params["decoder"]
    if "embed_ih" in dec:
        return params
    dt = cfg.cdtype
    R1 = cfg.rnn_size
    keep = cfg.bf16_lstm_gates and dt != jnp.float32
    table = _matmul(jax.nn.relu(dec["embed"].astype(dt)),
                    dec["att_lstm"]["w_ih"][2 * R1:], dt, keep=keep)
    return {**params, "decoder": {**dec, "embed_ih": table}}


def merge_lstm_weights(params, cfg: ModelConfig):
    """Build merged gate weights for cfg.merge_lstm_matmuls.

    att-LSTM: w_cat = [w_ih[:R]; w_ih[2R:]; w_hh]  (input [h_lang|xt|h_att])
    lang-LSTM: w_cat = [w_ih; w_hh]                (input [att_res|h_att|h_lang])
    fc's rows stay out (fc_ih precompute).  Idempotent; call after
    cast_decoder_weights.  Incompatible with fold_embed_ih (the xt rows are
    part of the concat) — decode_step prefers the fold table when both exist.
    """
    dec = params["decoder"]
    if "w_cat" in dec["att_lstm"]:
        return params
    R1 = cfg.rnn_size
    att = dict(dec["att_lstm"])
    att["w_cat"] = jnp.concatenate(
        [att["w_ih"][:R1], att["w_ih"][2 * R1:], att["w_hh"]], axis=0)
    lang = dict(dec["lang_lstm"])
    lang["w_cat"] = jnp.concatenate([lang["w_ih"], lang["w_hh"]], axis=0)
    return {**params, "decoder": {**dec, "att_lstm": att, "lang_lstm": lang}}


def _lstm_nonlin(g, c, dt, bf16_gates=False):
    """LSTM cell nonlinearity on fully-formed gates g = gx + gh + biases."""
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    gg = jnp.tanh(gg)
    if bf16_gates and dt != jnp.float32:
        c2 = f.astype(jnp.float32) * c + (i * gg).astype(jnp.float32)
        h2 = (o.astype(jnp.float32) * jnp.tanh(c2)).astype(dt)
        return h2, c2
    c2 = f * c + i * gg
    h2 = o * jnp.tanh(c2)
    if dt != jnp.float32:
        h2 = h2.astype(dt)
    return h2, c2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lstm_nonlin_b16r(g, c, dt, bf16_gates=False):
    """:func:`_lstm_nonlin` with bf16 BACKWARD residuals (cfg.bf16_residuals).

    Forward is bit-identical to ``_lstm_nonlin`` (it IS that function); only
    what the backward pass saves changes: instead of autodiff's five f32
    activation streams per cell (i, f, o, tanh(g), tanh(c2) ~= 24R bytes/row)
    it stores (g, c, c2) rounded to bf16 (12R bytes/row) and recomputes the
    cheap elementwise derivatives from them.  This halves exactly the
    batch-proportional [S, 4R] saved-for-backward traffic the train-step
    roofline identified as the limiter (docs/PERF.md), without touching
    forward numerics — the accuracy cost is bf16 rounding of the *gradient*
    only, bounded in tests/test_bf16_residuals.py.  Reference hot loop:
    AttModel.py:157-175."""
    return _lstm_nonlin(g, c, dt, bf16_gates)


def _lstm_nonlin_b16r_fwd(g, c, dt, bf16_gates):
    h2, c2 = _lstm_nonlin(g, c, dt, bf16_gates)
    res = (g.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
           c2.astype(jnp.bfloat16))
    return (h2, c2), res


def _lstm_nonlin_b16r_bwd(dt, bf16_gates, res, ct):
    g16, c16, c216 = res
    dh2, dc2 = ct
    g = g16.astype(jnp.float32)
    c = c16.astype(jnp.float32)
    c2 = c216.astype(jnp.float32)
    dh2 = dh2.astype(jnp.float32)
    dc2 = dc2.astype(jnp.float32)
    gi, gf, gg_, go = jnp.split(g, 4, axis=-1)
    i = jax.nn.sigmoid(gi)
    f = jax.nn.sigmoid(gf)
    o = jax.nn.sigmoid(go)
    gg = jnp.tanh(gg_)
    tc2 = jnp.tanh(c2)
    do = dh2 * tc2
    dc = dc2 + dh2 * o * (1.0 - tc2 * tc2)
    dg = jnp.concatenate([
        dc * gg * (i * (1.0 - i)),          # d/d gi
        dc * c * (f * (1.0 - f)),           # d/d gf
        dc * i * (1.0 - gg * gg),           # d/d gg
        do * (o * (1.0 - o)),               # d/d go
    ], axis=-1)
    g_dt = dt if (bf16_gates and dt != jnp.float32) else jnp.float32
    return dg.astype(g_dt), dc * f


_lstm_nonlin_b16r.defvjp(_lstm_nonlin_b16r_fwd, _lstm_nonlin_b16r_bwd)


def _dropout(x, rate, rng, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _lstm_cell(p, x, h, c, dt):
    gx = _dense(x, {"w": p["w_ih"], "b": p["b_ih"]}, dt)
    return _lstm_cell_gx(p, gx, h, c, dt)


def _lstm_cell_gx(p, gx, h, c, dt, bf16_gates=False, bf16_resid=False):
    """LSTM cell with the input-side gates (x @ w_ih + b_ih) precomputed.

    Default: gate math and c stay f32; the returned h is cast to the compute
    dtype (hardware bisection: the decode LSTMs are bound by the f32
    state/gate streams, not MXU throughput — docs/PERF.md).

    bf16_gates=True (cfg.bf16_lstm_gates): the [S, 4R] gate streams and the
    sigmoid/tanh run in bf16 — halves the dominant LSTM bytes — while c and
    its update stay f32.  gx must already be in dt.

    bf16_resid=True (cfg.bf16_residuals, training): identical forward, but
    the backward pass reads bf16-rounded (g, c, c2) residuals instead of the
    f32 activation streams (see :func:`_lstm_nonlin_b16r`)."""
    if bf16_gates and dt != jnp.float32:
        g = gx + _matmul(h, p["w_hh"], dt, keep=True) + p["b_hh"].astype(dt)
    else:
        g = gx + _dense(h, {"w": p["w_hh"], "b": p["b_hh"]}, dt)
    nonlin = _lstm_nonlin_b16r if bf16_resid else _lstm_nonlin
    return nonlin(g, c, dt, bf16_gates)


def att_embed(params, att_feats, att_mask, cfg: ModelConfig,
              train: bool = False, rng=None, bn_state=None):
    """The att_embed Sequential (AttModel.py:114-119) with pack_wrapper
    semantics (AttModel.py:28-37,364): BatchNorm statistics cover only real
    nodes and padded positions output exactly zero.

    Reference-dim note: AttModel.py:115 declares ``BatchNorm1d(att_feat_size)``
    but feeds it the GCN output of dim gcn_dim — the torch module only runs
    when those dims coincide (no shipped config enables use_bn).  BN0 here is
    over the true input dim.

    Returns (att [., N, R], new_bn_state).
    """
    from . import encoder as E

    dec = params["decoder"]
    dt = cfg.cdtype
    x = att_feats
    new_bn = bn_state
    if cfg.use_bn:
        if bn_state is None:
            raise ValueError("use_bn != 0 requires bn_state "
                             "(state['att_bn'] from init_params)")
        lead = x.shape[:-1]
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        y, s0 = E.batch_norm_1d(flat, dec["att_bn0"], bn_state["bn0"], train,
                                mask=att_mask.reshape(-1))
        x = y.reshape(lead + (x.shape[-1],))
        new_bn = {**bn_state, "bn0": s0}
    att = jax.nn.relu(_dense(x, dec["att_embed"], dt))
    att = _dropout(att, cfg.drop_prob_lm, rng, train)
    if cfg.use_bn == 2:
        lead = att.shape[:-1]
        flat = att.reshape(-1, att.shape[-1]).astype(jnp.float32)
        y, s1 = E.batch_norm_1d(flat, dec["att_bn1"], new_bn["bn1"], train,
                                mask=att_mask.reshape(-1))
        att = y.reshape(lead + (att.shape[-1],))
        new_bn = {**new_bn, "bn1": s1}
    if cfg.use_bn:
        # pad_packed_sequence zero-fills the padded rows
        att = att * att_mask[..., None]
    return att, new_bn


def prepare_features(params, fc_feats, att_feats, att_mask, cfg: ModelConfig,
                     train: bool = False, rng=None,
                     bn_state=None) -> PreparedFeatures:
    """fc_embed / att_embed / ctx2att projections (AttModel.py:356-368).

    The reference packs variable-length node lists before att_embed
    (pack_wrapper); with static shapes we apply the projection everywhere and
    rely on the attention mask, which is numerically identical for the
    shipped configs (use_bn=0).  With use_bn != 0 the BN running-stat updates
    are dropped here — training paths use :func:`prepare_features_bn`.
    """
    feats, _ = prepare_features_bn(params, fc_feats, att_feats, att_mask, cfg,
                                   train, rng, bn_state)
    return feats


def prepare_features_bn(params, fc_feats, att_feats, att_mask,
                        cfg: ModelConfig, train: bool = False, rng=None,
                        bn_state=None):
    """prepare_features returning (feats, new_bn_state) for BN-stat updates."""
    dec = params["decoder"]
    dt = cfg.cdtype
    r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)
    fc, fc_ih = _project_fc(params, fc_feats, cfg, r1, train)
    att, new_bn = att_embed(params, att_feats, att_mask, cfg, train, r2,
                            bn_state)
    p_att = _dense(att, dec["ctx2att"], dt)
    if dt != jnp.float32:
        # store the per-node streams in the compute dtype: attention is
        # HBM-bound on these [S,N,R]/[S,N,H] reads every decode step
        # (hardware: 14 ms of the 32 ms step at S=1920 fp32), so halving
        # the bytes here is the decode's main bf16 win
        att = att.astype(dt)
        p_att = p_att.astype(dt)
    return PreparedFeatures(fc=fc, att=att, p_att=p_att, mask=att_mask,
                            fc_ih=fc_ih), new_bn


def _project_fc(params, fc_feats, cfg: ModelConfig, rng=None,
                train: bool = False):
    """The fc chain shared by every prepare_features variant: fc_embed1/2
    (+ optional train dropout) and the precomputed att-LSTM w_ih slice
    (fc is constant across decode steps, so its gate contribution never
    belongs in the scan)."""
    dec = params["decoder"]
    dt = cfg.cdtype
    fc = jax.nn.relu(_dense(fc_feats, dec["fc_embed1"], dt))
    fc = jax.nn.relu(_dense(fc, dec["fc_embed2"], dt))
    fc = _dropout(fc, cfg.drop_prob_lm, rng, train)
    R1 = cfg.rnn_size
    fc_ih = _matmul(fc, dec["att_lstm"]["w_ih"][R1:2 * R1], dt,
                    keep=cfg.bf16_lstm_gates)
    return fc, fc_ih


def prepare_features_nodes(params, fc_feats, x_obj_img, obj_ind, att_mask,
                           cfg: ModelConfig, bn_state=None,
                           image_shared: bool = False) -> PreparedFeatures:
    """Eval-path prepare_features that projects the image's node features
    ONCE and gathers the projected rows per sub-graph.

    The test decode gathers ``x_obj_img[obj_ind]`` into a [keep, N, L]
    tensor whose rows are duplicates of the image's <= obj_num unique
    nodes; att_embed/ctx2att are row-wise maps at eval (running-stat BN,
    no dropout), so projecting [n_obj, L] first and gathering afterwards
    is row-exact while skipping keep·N/n_obj of the matmul work AND the
    [keep, N, feat_dim] f32 intermediate entirely (~300 MB/image at the
    M-RNN keep-1000 shape).  Inference-only: training dropout samples per
    gathered row, so the train path keeps gather-then-project
    (prepare_features_bn).

    fc_feats: [keep, 2L] per-sub-graph read-outs (distinct rows — the fc
    path is unchanged).  obj_ind: [keep, N] node indices; att_mask:
    [keep, N].
    """
    dec = params["decoder"]
    dt = cfg.cdtype
    fc, fc_ih = _project_fc(params, fc_feats, cfg)
    # node-level projection: att_embed over [n_obj, L] (eval semantics —
    # BN running stats are row-wise; the pack_wrapper zero-fill happens
    # after the gather, where the per-sub-graph mask lives)
    node_mask = jnp.ones((x_obj_img.shape[0],), att_mask.dtype)
    att_img, _ = att_embed(params, x_obj_img, node_mask, cfg, train=False,
                           rng=None, bn_state=bn_state)
    p_att_img = _dense(att_img, dec["ctx2att"], dt)
    if image_shared:
        # keep the IMAGE-level streams: attention() broadcasts over the
        # kept-sub-graph axis and masks by node-set membership (which also
        # subsumes the use_bn pad_packed zero-fill: non-member nodes get
        # weight zero, and the masked-renormalized softmax cancels their
        # logits' contribution exactly) — the decode scan never re-reads
        # per-row [keep, N, *] copies (see PreparedFeatures.att_img)
        from .gpn import node_membership
        mem = node_membership(obj_ind, att_mask, x_obj_img.shape[0])
        if dt != jnp.float32:
            att_img = att_img.astype(dt)
            p_att_img = p_att_img.astype(dt)
        return PreparedFeatures(fc=fc, att=None, p_att=None, mask=mem,
                                fc_ih=fc_ih, att_img=att_img,
                                p_att_img=p_att_img)
    att = att_img[obj_ind]                       # [keep, N, R]
    if cfg.use_bn:
        # pad_packed zero-fill BEFORE ctx2att, exactly like the gathered
        # layout prepare_features_bn computes (padded slots' attention
        # logits become the ctx2att bias, not a dummy node's projection) —
        # per-row matmul cost returns, but no shipped config enables use_bn
        att = att * att_mask[..., None]
        p_att = _dense(att, dec["ctx2att"], dt)
    else:
        p_att = p_att_img[obj_ind]               # [keep, N, H]
    if dt != jnp.float32:
        att = att.astype(dt)
        p_att = p_att.astype(dt)
    return PreparedFeatures(fc=fc, att=att, p_att=p_att, mask=att_mask,
                            fc_ih=fc_ih)


def prepare_features_shared_train(params, fc_feats, x_obj, mem,
                                  cfg: ModelConfig, train: bool = False,
                                  rng=None) -> PreparedFeatures:
    """Train-path prepare_features in the image-shared attention layout
    (cfg.share_att_train).

    Projects the image node features x_obj [B, N, L] ONCE per image and
    hands attention() the [B, N, R]/[B, N, H] streams plus a per-row
    node-set membership mask mem [S, N] — the teacher-forced scan (and its
    backward gradient accumulators) then reads/writes image-level streams
    instead of per-row [S, N, *] gathered copies (seq_per_img x smaller;
    the batch-proportional limiter of the train-step roofline,
    docs/PERF.md).  Masked-renormalized softmax over the member subset ==
    the packed layout's (subset-stable), weighted sum hits the same rows —
    mathematically equal, float-reassociated.  Training-noise change:
    att_embed dropout samples per image node, shared by the image's
    seq_per_img rows (reference samples per gathered row,
    AttModel.py:114-119 applied post-gather).  Requires rows grouped per
    image (labels are [B*seq_per_img] image-major — data/dataset.py).

    The rng split mirrors prepare_features_bn (r1 fc-dropout, r2
    att-dropout), so the fc path draws identical masks to the packed
    layout.
    """
    dec = params["decoder"]
    dt = cfg.cdtype
    if cfg.use_bn:
        raise ValueError(
            "share_att_train is incompatible with use_bn: train-time BN "
            "statistics cover the packed per-row layout")
    r1, r2, _ = (jax.random.split(rng, 3) if rng is not None else (None,) * 3)
    fc, fc_ih = _project_fc(params, fc_feats, cfg, r1, train)
    node_mask = jnp.ones(x_obj.shape[:-1], mem.dtype)   # use_bn=0: unused
    att_img, _ = att_embed(params, x_obj, node_mask, cfg, train, r2, None)
    p_att_img = _dense(att_img, dec["ctx2att"], dt)
    if dt != jnp.float32:
        att_img = att_img.astype(dt)
        p_att_img = p_att_img.astype(dt)
    return PreparedFeatures(fc=fc, att=None, p_att=None, mask=mem,
                            fc_ih=fc_ih, att_img=att_img,
                            p_att_img=p_att_img)


def embed_token(params, token, cfg: ModelConfig, train: bool = False, rng=None):
    dec = params["decoder"]
    xt = jax.nn.relu(dec["embed"][token])
    return _dropout(xt, cfg.drop_prob_lm, rng, train)


def attention(params, h, feats: PreparedFeatures, cfg: ModelConfig):
    """Additive attention with post-softmax masking (AttModel.py:445-471).

    Accepts either per-row features (att [S, N, R], h [S, R]) or features
    SHARED across a leading beam axis (att [N, R], h [B, R]) — the beam
    search's bdash beams of one sub-graph attend over the same node set, so
    sharing reads the [N, R]/[N, H] streams once per sub-graph instead of
    per beam (they dominate the decode step's HBM traffic, docs/PERF.md).
    The math is identical: broadcasting in the add and a matmul instead of
    a per-row einsum, same contraction order.
    """
    dec = params["decoder"]
    dt = cfg.cdtype
    if feats.att_img is not None and feats.img_ix is not None \
            and feats.img_ix.ndim == 0:
        # beam variant of image-shared attention (inside the per-sub-graph
        # vmap): the image streams ride the vmap with in_axes=None and each
        # sub-graph dynamic-slices its image's [n_obj, *] rows per step —
        # the slice fuses into the attention chain, so the per-step HBM
        # reads are the [B, n_obj, *] streams, not [S, N, *] copies.
        a = feats.att_img[feats.img_ix]                       # [n, R]
        p = feats.p_att_img[feats.img_ix]                     # [n, H]
        att_h = _dense(h, dec["h2att"], dt)                   # [bdash, H]
        dot = jnp.tanh(p[None] + att_h[:, None, :].astype(p.dtype))
        e = _dense(dot, dec["alpha_net"], dt)[..., 0]         # [bdash, n]
        w = jax.nn.softmax(e, axis=-1)
        w = w * feats.mask[None]
        w = w / w.sum(-1, keepdims=True)
        att_res = jnp.einsum("bn,nr->br", w.astype(dt), a.astype(dt),
                             preferred_element_type=jnp.float32)
        return att_res, w
    if feats.att_img is not None:
        # image-shared fan-out attention: all kept sub-graphs of one image
        # attend over the SAME <= n_obj projected nodes, so the per-step
        # reads are the [B, n_obj, R]/[B, n_obj, H] image streams (~KB)
        # instead of per-row [S, N, *] gathers (~hundreds of MB at the
        # M-RNN keep-1000 shape).  feats.mask is the node-set membership
        # over the image node axis; masked-renormalized softmax over the
        # member subset == the packed layout's (softmax is subset-stable),
        # and the weighted sum hits the same rows — mathematically equal,
        # float-reassociated.  Rows group per image: [B, K] flattened.
        # [n_obj, *] (single-image path) -> [1, n_obj, *]
        att_i = feats.att_img if feats.att_img.ndim == 3 \
            else feats.att_img[None]
        p_att_i = feats.p_att_img if feats.p_att_img.ndim == 3 \
            else feats.p_att_img[None]
        B, n = att_i.shape[0], att_i.shape[1]
        S = h.shape[0]
        # the grouping below is POSITIONAL (contiguous reshape), ignoring
        # feats.img_ix: rows must be the images' kept sub-graphs in order,
        # S = B*K exactly — every current caller (encode_images_batched,
        # greedy, beam per-lane) satisfies this; a sliced/reordered/padded
        # caller would silently attend over the wrong image's nodes, so the
        # divisibility half of the invariant is asserted at trace time
        if S % B != 0:
            raise ValueError(
                f"image-shared attention needs rows grouped per image: "
                f"S={S} not divisible by B={B}")
        K = S // B
        att_h = _dense(h, dec["h2att"], dt)                   # [S, H]
        att_h = att_h.reshape(B, K, 1, -1).astype(p_att_i.dtype)
        dot = jnp.tanh(p_att_i[:, None, :, :] + att_h)        # [B,K,n,H]
        e = _dense(dot, dec["alpha_net"], dt)[..., 0]         # [B, K, n]
        w = jax.nn.softmax(e, axis=-1)
        w = w * feats.mask.reshape(B, K, n)
        w = w / w.sum(-1, keepdims=True)
        att_res = jnp.einsum("bkn,bnr->bkr", w.astype(dt),
                             att_i.astype(dt),
                             preferred_element_type=jnp.float32)
        return att_res.reshape(S, -1), w.reshape(S, n)
    if cfg.use_pallas_attention and feats.att.ndim == 3:
        from ..ops.pallas_attention import fused_attention
        return fused_attention(h, feats.p_att.astype(jnp.float32),
                               feats.att.astype(jnp.float32), feats.mask,
                               dec["h2att"]["w"], dec["h2att"]["b"],
                               dec["alpha_net"]["w"], dec["alpha_net"]["b"])
    if cfg.use_pallas_attention and feats.att.ndim == 2 and h.ndim == 2:
        from ..ops.pallas_attention import shared_attention_op
        return shared_attention_op(h, feats.p_att, feats.att, feats.mask,
                                   dec["h2att"]["w"], dec["h2att"]["b"],
                                   dec["alpha_net"]["w"],
                                   dec["alpha_net"]["b"])
    att_h = _dense(h, dec["h2att"], dt)                       # [S, H]
    # the broadcast add + tanh runs in p_att's storage dtype so the [S,N,H]
    # stream stays narrow in bf16 mode (softmax below is f32 regardless);
    # shared mode: p_att [N,H] + att_h [B,1,H] broadcasts to [B,N,H]
    dot = jnp.tanh(feats.p_att
                   + att_h[:, None, :].astype(feats.p_att.dtype))
    e = _dense(dot, dec["alpha_net"], dt)[..., 0]             # [S, N]
    w = jax.nn.softmax(e, axis=-1)
    w = w * feats.mask
    w = w / w.sum(-1, keepdims=True)
    if feats.att.ndim == 2:
        att_res = jnp.einsum("bn,nr->br", w.astype(dt), feats.att.astype(dt),
                             preferred_element_type=jnp.float32)
    else:
        att_res = jnp.einsum("sn,snr->sr", w.astype(dt), feats.att.astype(dt),
                             preferred_element_type=jnp.float32)
    return att_res, w


def decode_step(params, state: DecoderState, token, feats: PreparedFeatures,
                cfg: ModelConfig, train: bool = False, rng=None,
                xt_ih=None) -> Tuple[jnp.ndarray, DecoderState, jnp.ndarray]:
    """One decoder step.  token [S] int32 -> (logprobs [S,V+1], state, att_w).

    xt_ih: optional precomputed word-embedding gate contribution
    (embed_token(token) @ w_ih[2R:], [S, 4R]) — forward_teacher hoists all
    T of these out of the scan as one batched matmul when the input tokens
    are known upfront (ss inactive); the rng split below stays identical so
    the output-dropout draws match the unhoisted path."""
    dec = params["decoder"]
    dt = cfg.cdtype
    b16r = cfg.bf16_residuals and train
    nonlin = _lstm_nonlin_b16r if b16r else _lstm_nonlin
    r_emb, r_out = (jax.random.split(rng) if rng is not None else (None, None))

    # att-LSTM input [h_lang, fc, xt] as split matmuls: fc's contribution is
    # precomputed (feats.fc_ih), only the step-varying terms run in the scan
    w_ih = dec["att_lstm"]["w_ih"]
    R1 = cfg.rnn_size
    bf16g = cfg.bf16_lstm_gates and dt != jnp.float32
    b_ih_a = dec["att_lstm"]["b_ih"]
    fc_ih = feats.fc_ih
    if bf16g:
        b_ih_a = b_ih_a.astype(dt)
        fc_ih = fc_ih if fc_ih.dtype == dt else fc_ih.astype(dt)
    use_fold = (not train) and ("embed_ih" in dec)
    use_merge = (cfg.merge_lstm_matmuls and "w_cat" in dec["att_lstm"]
                 and not use_fold)
    if use_merge:
        # one [., 3R] @ [3R, 4R] matmul forms ALL step-varying att gates
        xt = embed_token(params, token, cfg, train, r_emb)
        x_cat = jnp.concatenate(
            [state.h_lang, xt.astype(state.h_lang.dtype), state.h_att], -1)
        b_att = dec["att_lstm"]["b_ih"] + dec["att_lstm"]["b_hh"]
        if bf16g:
            b_att = b_att.astype(dt)
        g_att = (_matmul(x_cat, dec["att_lstm"]["w_cat"], dt, keep=bf16g)
                 + fc_ih + b_att)
        h_att, c_att = nonlin(g_att, state.c_att, dt, bf16g)
    else:
        if xt_ih is not None:
            pass                      # hoisted by forward_teacher
        elif use_fold:
            # folded per-vocab gate table (fold_embed_ih): the word
            # embedding's whole contribution to the att gates is a row gather
            xt_ih = dec["embed_ih"][token]
        else:
            xt = embed_token(params, token, cfg, train, r_emb)
            xt_ih = _matmul(xt, w_ih[2 * R1:], dt, keep=bf16g)
        gx_att = (_matmul(state.h_lang, w_ih[:R1], dt, keep=bf16g) + fc_ih
                  + xt_ih + b_ih_a)
        h_att, c_att = _lstm_cell_gx(dec["att_lstm"], gx_att, state.h_att,
                                     state.c_att, dt, bf16g, b16r)

    att_res, att_w = attention(params, h_att, feats, cfg)

    if use_merge:
        x_cat_l = jnp.concatenate(
            [att_res.astype(h_att.dtype), h_att, state.h_lang], -1)
        b_lang = dec["lang_lstm"]["b_ih"] + dec["lang_lstm"]["b_hh"]
        if bf16g:
            b_lang = b_lang.astype(dt)
        g_lang = (_matmul(x_cat_l, dec["lang_lstm"]["w_cat"], dt, keep=bf16g)
                  + b_lang)
        h_lang, c_lang = nonlin(g_lang, state.c_lang, dt, bf16g)
    else:
        # lang-LSTM input [att_res, h_att] as split matmuls (no concat
        # materialization; h_att stays in its storage dtype)
        w_ih_l = dec["lang_lstm"]["w_ih"]
        b_ih_l = dec["lang_lstm"]["b_ih"]
        if bf16g:
            b_ih_l = b_ih_l.astype(dt)
        gx_lang = (_matmul(att_res, w_ih_l[:cfg.rnn_size], dt, keep=bf16g)
                   + _matmul(h_att, w_ih_l[cfg.rnn_size:], dt, keep=bf16g)
                   + b_ih_l)
        h_lang, c_lang = _lstm_cell_gx(dec["lang_lstm"], gx_lang, state.h_lang,
                                       state.c_lang, dt, bf16g, b16r)
    out = _dropout(h_lang, cfg.drop_prob_lm, r_out, train)
    logits = _dense(out, dec["logit"], dt)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return logprobs, DecoderState(h_att, c_att, h_lang, c_lang), att_w


def forward_teacher(params, feats: PreparedFeatures, seq, cfg: ModelConfig,
                    train: bool = False, rng=None, ss_prob=None):
    """Teacher-forced forward over a [S, T+2] label tensor (AttModel.py:157-175).

    Returns logprobs [S, T+1, V+1] for predicting seq[:, 1:].  Scheduled
    sampling: for steps i>=1, with prob ss_prob per sample the input token is
    drawn from the previous step's distribution instead of the ground truth.
    The per-token python loop of the reference becomes one ``lax.scan``.

    When scheduled sampling is statically off (``ss_prob is None`` — the
    first scheduled_sampling_start epochs and every val pass) all T input
    tokens are known upfront, so the word-embedding stream's gate
    projection (xt @ w_ih[2R:], the reference's per-step input matmul in
    AttModel.py:157-175) is hoisted out of the scan as ONE [T*S, E] x
    [E, 4R] matmul — its forward AND backward leave the serial chain.
    The per-step embed-dropout draws replicate the scan's rng chain, so
    hoisted and unhoisted paths see identical dropout masks.
    """
    params = cast_decoder_weights(params, cfg)
    S, T2 = seq.shape
    n_steps = T2 - 1
    V1 = cfg.vocab_size + 1
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)
    dec = params["decoder"]

    use_fold = (not train) and ("embed_ih" in dec)
    use_merge = (cfg.merge_lstm_matmuls and "w_cat" in dec["att_lstm"]
                 and not use_fold)
    hoist = ss_prob is None and not use_fold and not use_merge

    xt_ih_all = None
    if hoist:
        R1 = cfg.rnn_size
        dt = cfg.cdtype
        bf16g = cfg.bf16_lstm_gates and dt != jnp.float32
        tokens = seq[:, :n_steps].T                     # [T, S]
        xt = jax.nn.relu(dec["embed"][tokens])          # [T, S, E]
        if train and cfg.drop_prob_lm > 0:
            # same r_emb keys the scan's decode_step would draw
            sr = base_rng
            r_drops = []
            for _ in range(n_steps):
                sr, _, _, r_drop = jax.random.split(sr, 4)
                r_drops.append(r_drop)
            r_embs = jax.vmap(lambda k: jax.random.split(k)[0])(
                jnp.stack(r_drops))
            xt = jax.vmap(
                lambda k, x: _dropout(x, cfg.drop_prob_lm, k, True))(
                    r_embs, xt)
        xt_ih_all = _matmul(xt.reshape(n_steps * S, -1),
                            dec["att_lstm"]["w_ih"][2 * R1:], dt,
                            keep=bf16g).reshape(n_steps, S, 4 * R1)

    def step(carry, inp):
        if ss_prob is None:
            state, step_rng = carry
            i, token_gt, xt_ih = inp
            token = token_gt
        else:
            state, prev_lp, step_rng = carry
            i, token_gt = inp
            xt_ih = None
            token = token_gt    # eval-mode fallback when ss_prob is passed
        step_rng, r_ss, r_pick, r_drop = jax.random.split(step_rng, 4)
        if train and ss_prob is not None:
            # ss_prob may be a traced scalar (0.0 disables sampling at runtime
            # without recompiling)
            use_sample = jax.random.uniform(r_ss, (S,)) < ss_prob
            sampled = jax.random.categorical(r_pick, prev_lp, axis=-1)
            token = jnp.where((i >= 1) & use_sample, sampled, token_gt)
        lp, state, _ = decode_step(params, state, token, feats, cfg, train,
                                   r_drop if train else None, xt_ih=xt_ih)
        if ss_prob is None:
            return (state, step_rng), lp
        return (state, lp, step_rng), lp

    if ss_prob is None:
        if xt_ih_all is None:       # fold/merge: step computes its own
            xs = (jnp.arange(n_steps), seq[:, :n_steps].T)

            def step_nox(carry, inp):
                return step(carry, inp + (None,))

            _, lps = jax.lax.scan(step_nox, (init_state(S, cfg), base_rng),
                                  xs)
        else:
            xs = (jnp.arange(n_steps), seq[:, :n_steps].T, xt_ih_all)
            _, lps = jax.lax.scan(step, (init_state(S, cfg), base_rng), xs)
    else:
        init = (init_state(S, cfg), jnp.zeros((S, V1), jnp.float32),
                base_rng)
        xs = (jnp.arange(n_steps), seq[:, :n_steps].T)
        _, lps = jax.lax.scan(step, init, xs)
    return lps.transpose(1, 0, 2)   # [S, T+1, V+1]
