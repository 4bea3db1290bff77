"""Vectorized (diverse) beam search, vmapped over the sub-graph axis.

The reference decodes each sub-graph with a Python-object beam search inside a
per-sub-graph loop (`models/AttModel.py:216-231`, `models/CaptionModel.py:
28-176`).  Here one image's every kept sub-graph runs beam search
simultaneously: the per-beam candidate expansion is a single top-k over
``beam_sum + logprobs`` and the time loop is a ``lax.scan`` (group_size=1) or
a trace-time-unrolled staggered loop (diverse groups), vmapped over
sub-graphs — hundreds of beam decodes per TPU dispatch.

Reference semantics preserved:
* UNK suppression: -1000 on the last vocab column before expansion
  (CaptionModel.py:131)
* optional decoding constraint: previous word set to -inf
  (CaptionModel.py:128-129)
* diverse groups: ``diversity_lambda`` subtracted at tokens earlier groups
  chose at the same local time (CaptionModel.py:31-39); stored per-token
  logprobs are the *unaugmented* (pre-diversity, post-UNK) values
* t=0 expands only beam 0 (CaptionModel.py:60-61)
* a beam finishes when it emits token 0 or at its last local step; finished
  beams are recorded with the length penalty applied and their running sum
  knocked to -1000 (CaptionModel.py:152-166)
* final: each group's done beams sorted by penalized score (stable in append
  order), top-bdash per group, groups concatenated (CaptionModel.py:173-175)

Tie-break parity: on *exactly* equal candidate scores the reference's
candidate list orders (better per-row sorted position, then lower beam) via
a stable python sort (CaptionModel.py:56-69).  The expansion here flattens
the candidate grid column-major so argmax ties resolve (lower word, then
lower beam) — exactly the reference's order under a *stable* row sort.  The
reference's actual ``torch.sort`` is unstable at vocab size (stable only on
the ≤16-element insertion-sort path — measured, tests/test_tie_breaks.py),
so its raw tie order is an unspecified backend artifact; this module
implements the stable idealization, and the engineered-tie fuzz matches the
reference bit-for-bit once its sort is forced stable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EvalConfig, ModelConfig
from ..models import decoder as D
from ..utils.penalty import penalty_fn


class BeamOut(NamedTuple):
    seq: jnp.ndarray        # [S, T] best beam tokens
    logprobs: jnp.ndarray   # [S, T] best beam per-token logprobs
    all_seqs: jnp.ndarray   # [S, group_size*bdash, T] top done beams
    all_ps: jnp.ndarray     # [S, group_size*bdash] their penalized scores


def _topk_small(x, k: int):
    """Exact top-k for tiny k via k argmax passes.

    Identical selection and tie handling to ``lax.top_k`` (ties -> lowest
    index) but O(k*V) VPU reductions instead of an O(V log V) sort.  The
    beam expansion itself uses _topk_small_wordmajor (reference tie order);
    this form is kept as the flat-selection semantics baseline the tests
    compare against (tests/test_topk_paths.py).
    """
    vals = []
    idxs = []
    for _ in range(k):
        i = jnp.argmax(x)
        v = x[i]
        vals.append(v)
        idxs.append(i)
        x = x.at[i].set(-jnp.inf)
    return jnp.stack(vals), jnp.stack(idxs)


def _topk_small_wordmajor(cand, k: int):
    """Top-k over a [bdash, V1] grid with ties resolved (lower WORD, then
    lower beam) — the reference's candidate order under a stable row sort.

    Selection-equivalent to ``_topk_small(cand.T.reshape(-1), k)`` but never
    materializes the transpose: a [V1, bdash] array has minor dim 2-5, which
    pads to 128 TPU lanes (~40x) and was measured 15% slower end-to-end at
    the kar bench shape (20.2k -> 17.2k caps/s, docs/PERF.md round 4).
    Each pass is ONE variadic lax.reduce carrying (value, column-major rank)
    with a lexicographic max comparator — the same reduction shape argmax
    itself lowers to, so the pass costs what a plain argmax pass does; the
    winner's removal is a broadcasted compare+select, not a scatter.  (A
    two-reduction formulation — global max, then argmax over a hit mask,
    then a dynamic column slice and 2D scatter — measured 4x slower
    end-to-end: 4.2k caps/s.)
    """
    bdash, V1 = cand.shape
    # column-major rank: lower word, then lower beam
    rank = (jnp.arange(V1, dtype=jnp.int32)[None, :] * bdash
            + jnp.arange(bdash, dtype=jnp.int32)[:, None])

    def comp(acc, x):
        av, ak = acc
        xv, xk = x
        better = (xv > av) | ((xv == av) & (xk < ak))
        return (jnp.where(better, xv, av), jnp.where(better, xk, ak))

    vals, qs, cs = [], [], []
    for _ in range(k):
        v, r = jax.lax.reduce(
            (cand, rank),
            (jnp.asarray(-jnp.inf, cand.dtype),
             jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)),
            comp, (0, 1))
        vals.append(v)
        qs.append(r % bdash)
        cs.append(r // bdash)
        cand = jnp.where(rank == r, -jnp.inf, cand)
    return jnp.stack(vals), jnp.stack(qs), jnp.stack(cs)


class _GroupState(NamedTuple):
    state: D.DecoderState       # [bdash, ...]
    token: jnp.ndarray          # [bdash] last chosen tokens (decode input)
    beam_seq: jnp.ndarray       # [T, bdash]
    beam_lps: jnp.ndarray       # [T, bdash]
    beam_sum: jnp.ndarray       # [bdash]
    done_seq: jnp.ndarray       # [cap, T]
    done_lps: jnp.ndarray       # [cap, T]
    done_p: jnp.ndarray         # [cap]


def _expand_group(params, feats, gs: _GroupState, local_t, cfg: ModelConfig,
                  ecfg: EvalConfig, pen, diversity_tokens=None):
    """One beam_step for one group at its local time: decode from the carried
    tokens, then expand.  Decode-first keeps the [bdash, V1] logprobs internal
    to the iteration (they never enter the scan carry) and runs exactly T
    decode steps per group — the previous expand-then-decode formulation
    carried the logprobs and spent an extra trailing decode whose output was
    discarded (~1/(T+1) of decode time, docs/PERF.md round 3).

    diversity_tokens: optional [n_prev*bdash] token ids chosen by earlier
    groups at this local time; each occurrence subtracts diversity_lambda.
    """
    bdash = gs.beam_sum.shape[0]
    T = gs.beam_seq.shape[0]

    lp, state, _ = D.decode_step(params, gs.state, gs.token, feats, cfg)
    V1 = lp.shape[-1]

    logprobsf = lp
    if ecfg.decoding_constraint:
        prev_tok = gs.beam_seq[jnp.maximum(local_t - 1, 0)]       # [bdash]
        constrain = (local_t > 0)
        onehot = jax.nn.one_hot(prev_tok, V1, dtype=bool)
        logprobsf = jnp.where(constrain & onehot, -jnp.inf, logprobsf)
    logprobsf = logprobsf.at[:, V1 - 1].add(-1000.0)
    unaug = logprobsf
    if diversity_tokens is not None:
        # subtract lambda per occurrence (the reference loops per beam pair,
        # accumulating for duplicate choices; CaptionModel.py:34-38)
        counts = jax.nn.one_hot(diversity_tokens, V1).sum(0)      # [V1]
        logprobsf = logprobsf - ecfg.diversity_lambda * counts[None, :]

    # flat top-k via bdash variadic-reduce passes (_topk_small_wordmajor):
    # ties resolve word-major — (lower word, then lower beam), the
    # reference's candidate order under a stable row sort (module
    # docstring; fuzzed in tests/test_tie_breaks.py against the
    # stable-sort-forced reference).  Alternatives measured and rejected:
    # two-stage per-beam lax.top_k 10x slower (sorts under this vmap, r3);
    # transposed flat argmax passes -15%; two-reduction masked passes -79%
    # (docs/PERF.md round 4).
    cand = gs.beam_sum[:, None] + logprobsf
    row_ok = (jnp.arange(bdash) < 1) | (local_t > 0)
    cand = jnp.where(row_ok[:, None], cand, -jnp.inf)
    vp, q, c = _topk_small_wordmajor(cand, bdash)

    new_seq = gs.beam_seq[:, q].at[local_t].set(c)
    new_lps = gs.beam_lps[:, q].at[local_t].set(unaug[q, c])
    state = jax.tree_util.tree_map(lambda x: x[q], state)
    beam_sum = vp

    is_done = (c == 0) | (local_t == T - 1)
    p_done = pen(local_t + 1, beam_sum)
    slot = local_t * bdash + jnp.arange(bdash)
    done_seq = gs.done_seq.at[slot].set(
        jnp.where(is_done[:, None], new_seq.T, gs.done_seq[slot]))
    done_lps = gs.done_lps.at[slot].set(
        jnp.where(is_done[:, None], new_lps.T, gs.done_lps[slot]))
    done_p = gs.done_p.at[slot].set(jnp.where(is_done, p_done, -jnp.inf))
    beam_sum = jnp.where(is_done, -1000.0, beam_sum)

    return _GroupState(state=state, token=c, beam_seq=new_seq,
                       beam_lps=new_lps, beam_sum=beam_sum, done_seq=done_seq,
                       done_lps=done_lps, done_p=done_p)


def _init_group(params, feats_one, bdash, cfg):
    T = cfg.seq_length
    cap = bdash * T
    if cfg.share_att_beams or feats_one.att_img is not None:
        # unbatched features: decode_step/attention broadcast over the beam
        # axis, so the [N, R]/[N, H] streams are read once per sub-graph per
        # step instead of once per beam (docs/PERF.md round 3); the
        # image-shared layout is inherently per-sub-graph-unbatched
        feats = feats_one
    else:
        feats = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (bdash,) + x.shape), feats_one)
    return feats, _GroupState(
        state=D.init_state(bdash, cfg),
        token=jnp.zeros((bdash,), jnp.int32),    # BOS
        beam_seq=jnp.zeros((T, bdash), jnp.int32),
        beam_lps=jnp.zeros((T, bdash), jnp.float32),
        beam_sum=jnp.zeros((bdash,), jnp.float32),
        done_seq=jnp.zeros((cap, T), jnp.int32),
        done_lps=jnp.zeros((cap, T), jnp.float32),
        done_p=jnp.full((cap,), -jnp.inf, jnp.float32))


def _beam_search_one(params, feats_one: D.PreparedFeatures, cfg: ModelConfig,
                     ecfg: EvalConfig) -> BeamOut:
    """(Diverse) beam search for one sub-graph (unbatched features).

    Expects params already through cast_decoder_weights (+ optional
    fold/merge tables) — beam_search does that once per dispatch."""
    G = ecfg.group_size
    bdash = ecfg.beam_size // G
    T = cfg.seq_length
    pen = penalty_fn(ecfg.length_penalty)

    if G == 1:
        feats, gs0 = _init_group(params, feats_one, bdash, cfg)

        def step(gs, t):
            return _expand_group(params, feats, gs, t, cfg, ecfg, pen), None

        gs, _ = jax.lax.scan(step, gs0, jnp.arange(T))
        top_p, top_i = jax.lax.top_k(gs.done_p, bdash)
        return BeamOut(seq=gs.done_seq[top_i[0]], logprobs=gs.done_lps[top_i[0]],
                       all_seqs=gs.done_seq[top_i], all_ps=top_p)

    # diverse beam search: staggered groups (CaptionModel.py:122-171).
    # One lax.scan over the T+G-1 outer steps replaces the round-1/2
    # trace-time-unrolled loop — the body traces G expand+decode calls once
    # instead of (T+G-1)*G times, bounding compile time in T.  Data flow is
    # identical to the unrolled form: within an outer step groups update in
    # ascending order, and group g reads the CURRENT (post-update, re-
    # permuted) beam rows of groups < g at its own local time — exactly the
    # reference's read.  Inactive (out-of-stagger) groups run a masked
    # expand whose result is discarded, costing (G-1)*G extra decode steps
    # per search (~12% for G=3) in exchange for the bounded trace.
    feats, gs0 = _init_group(params, feats_one, bdash, cfg)
    stacked0 = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([gs0] * G))

    def outer_step(stacked, t):
        new_groups = []
        for g in range(G):
            gs = jax.tree_util.tree_map(lambda x, g=g: x[g], stacked)
            lt = jnp.clip(t - g, 0, T - 1)
            if g > 0:
                div_toks = jnp.concatenate(
                    [new_groups[pg].beam_seq[lt] for pg in range(g)])
            else:
                div_toks = None
            upd = _expand_group(params, feats, gs, lt, cfg, ecfg, pen,
                                diversity_tokens=div_toks)
            active = (t >= g) & (t <= T + g - 1)
            gs2 = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), upd, gs)
            new_groups.append(gs2)
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *new_groups), None

    stacked, _ = jax.lax.scan(outer_step, stacked0, jnp.arange(T + G - 1))
    groups = [jax.tree_util.tree_map(lambda x, g=g: x[g], stacked)
              for g in range(G)]

    tops = [jax.lax.top_k(gs.done_p, bdash) for gs in groups]
    all_seqs = jnp.concatenate([gs.done_seq[ti]
                                for gs, (_, ti) in zip(groups, tops)])
    all_lps = jnp.concatenate([gs.done_lps[ti]
                               for gs, (_, ti) in zip(groups, tops)])
    all_ps = jnp.concatenate([tp for tp, _ in tops])
    return BeamOut(seq=all_seqs[0], logprobs=all_lps[0],
                   all_seqs=all_seqs, all_ps=all_ps)


def beam_search(params, feats: D.PreparedFeatures, cfg: ModelConfig,
                ecfg: EvalConfig) -> BeamOut:
    """Beam search over a batch of sub-graphs: vmap of the single case.

    Two measured v5e tiling effects are handled here (docs/PERF.md):
    * fp32: the fused decode program degrades ~1.7x past 1024 sub-graphs in
      one vmap (S=1024 -> 75 ms, S=1056 -> 122 ms) — batches beyond
      ``ecfg.beam_chunk`` decode in sequential ``lax.map`` chunks
      (even ceil-split: S=1120 -> 2 chunks of 560, not 1024 + padding);
    * bf16: the program is ~18% slower whenever S is not a multiple of 128
      (640/768/896 fast, 704/832/960 slow) — the axis pads up to 128.
    ``beam_chunk=0`` disables both (used by the equivalence test).
    """
    params = D.cast_decoder_weights(params, cfg)
    if cfg.fold_embed_ih:
        # outside the chunk loop: the fold matmul runs once per dispatch
        params = D.fold_embed_ih(params, cfg)
    if cfg.merge_lstm_matmuls:
        params = D.merge_lstm_weights(params, cfg)
    if feats.att_img is not None:
        # image-shared attention: the [B, n_obj, *] image streams ride the
        # per-sub-graph vmap with in_axes=None (each lane dynamic-slices its
        # image's rows per step — see attention()); normalize the
        # single-image layout and default the row->image map
        ai = feats.att_img if feats.att_img.ndim == 3 else feats.att_img[None]
        pi = feats.p_att_img if feats.p_att_img.ndim == 3 \
            else feats.p_att_img[None]
        ii = feats.img_ix if feats.img_ix is not None \
            else jnp.zeros((feats.fc.shape[0],), jnp.int32)
        feats = feats._replace(att_img=ai, p_att_img=pi, img_ix=ii)
        axes = D.PreparedFeatures(fc=0, att=None, p_att=None, mask=0,
                                  fc_ih=0, att_img=None, p_att_img=None,
                                  img_ix=0)
        fn = lambda p, f: jax.vmap(
            lambda ff: _beam_search_one(p, ff, cfg, ecfg),
            in_axes=(axes,))(f)
    else:
        fn = lambda p, f: jax.vmap(
            lambda ff: _beam_search_one(p, ff, cfg, ecfg))(f)
    S = feats.fc.shape[0]
    limit = ecfg.beam_chunk
    # bf16 alignment only pays off at scale: padding S=8 up to 128 would
    # multiply the decode work to dodge an ~18% tiling penalty that was
    # measured at S in the hundreds — skip alignment for small batches
    align = 128 if (cfg.cdtype != jnp.float32 and S >= 256) else 1
    if align != 1 and limit > 0:
        # bf16's slow tiling starts by S=1024 already (960-pad-to-1024 was
        # measured slower than unpadded 960); 512-row chunks measured fastest
        # end-to-end (19.7-19.8k caps/s vs 16.5k at 640-chunks, bench kar)
        limit = min(limit, 512)
    if limit <= 0 or (S <= limit and S % align == 0):
        return fn(params, feats)
    n_chunks = max(1, -(-S // limit))
    chunk = -(-S // n_chunks)
    chunk = -(-chunk // align) * align
    pad = n_chunks * chunk - S
    if pad:
        # padded rows: zero features but an all-ones mask so the attention
        # renormalization stays finite (outputs are sliced off below)
        def _pad(x, ones=False):
            if x is None:
                return None
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=1.0 if ones else 0)
        feats = D.PreparedFeatures(
            fc=_pad(feats.fc), att=_pad(feats.att), p_att=_pad(feats.p_att),
            mask=_pad(feats.mask, ones=True), fc_ih=_pad(feats.fc_ih),
            att_img=feats.att_img, p_att_img=feats.p_att_img,
            img_ix=_pad(feats.img_ix))
    if n_chunks == 1:
        out = fn(params, feats)
    else:
        # chunk the per-row leaves; the image streams (no row axis) pass
        # whole to every chunk
        def _chunked(x):
            return None if x is None \
                else x.reshape((n_chunks, chunk) + x.shape[1:])
        rows = D.PreparedFeatures(
            fc=_chunked(feats.fc), att=_chunked(feats.att),
            p_att=_chunked(feats.p_att), mask=_chunked(feats.mask),
            fc_ih=_chunked(feats.fc_ih), img_ix=_chunked(feats.img_ix))
        ai, pi = feats.att_img, feats.p_att_img
        out = jax.lax.map(
            lambda f: fn(params, f._replace(att_img=ai, p_att_img=pi)),
            rows)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:]), out)
    return jax.tree_util.tree_map(lambda x: x[:S], out)
