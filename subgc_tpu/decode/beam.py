"""Vectorized beam search, vmapped over the sub-graph axis.

The reference decodes each sub-graph with a Python-object beam search inside a
per-sub-graph loop (`models/AttModel.py:216-231`, `models/CaptionModel.py:
28-176`).  Here one image's every kept sub-graph runs beam search
simultaneously: the per-beam candidate expansion is a single top-k over
``beam_sum + logprobs`` and the whole time loop is a ``lax.scan``, vmapped
over sub-graphs — hundreds of beam decodes per TPU dispatch.

Reference semantics preserved:
* UNK suppression: -1000 on the last vocab column before expansion
  (CaptionModel.py:131)
* t=0 expands only beam 0 (CaptionModel.py:60-61)
* stored per-token logprobs are the UNK-suppressed ("unaugmented") values
* a beam finishes when it emits token 0 or at t == seq_length-1; finished
  beams are recorded with the length penalty applied and their running sum
  is knocked to -1000 (CaptionModel.py:152-166)
* finished beams keep stepping (as in the reference), but can no longer win
  candidate slots against live beams
* final: done beams sorted by penalized score, stable in append order

Known tie-break divergence (documented): on *exactly* equal candidate scores
the reference prefers lower word index then lower beam; ``lax.top_k`` on the
row-major flattened [beam, vocab] grid prefers lower beam then lower word.

Diverse beam search (group_size > 1, CaptionModel.py:31-39) subtracts
``diversity_lambda`` from tokens chosen by earlier groups at the same local
time; groups are a static python loop at trace time.
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
    all_seqs: jnp.ndarray   # [S, bdash, T] top-bdash done beams
    all_ps: jnp.ndarray     # [S, bdash] their penalized scores


def _beam_search_one(params, feats_one: D.PreparedFeatures, cfg: ModelConfig,
                     ecfg: EvalConfig) -> BeamOut:
    """Beam search for one sub-graph (unbatched PreparedFeatures)."""
    bdash = ecfg.beam_size // ecfg.group_size
    if ecfg.group_size != 1:
        raise NotImplementedError(
            "group_size > 1 (diverse beam search) lands with the diversity "
            "module; all shipped reference configs use group_size=1")
    T = cfg.seq_length
    V1 = cfg.vocab_size + 1
    pen = penalty_fn(ecfg.length_penalty)
    cap = bdash * T

    feats = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (bdash,) + x.shape), feats_one)

    state0 = D.init_state(bdash, cfg)
    lp0, state0, _ = D.decode_step(params, state0, jnp.zeros((bdash,), jnp.int32),
                                   feats, cfg)

    def step(carry, t):
        state, lp, beam_seq, beam_lps, beam_sum, done_seq, done_lps, done_p = carry

        logprobsf = lp.at[:, V1 - 1].add(-1000.0)
        cand = beam_sum[:, None] + logprobsf                    # [bdash, V1]
        row_ok = (jnp.arange(bdash) < 1) | (t > 0)
        cand = jnp.where(row_ok[:, None], cand, -jnp.inf)
        vp, flat = jax.lax.top_k(cand.reshape(-1), bdash)
        q = flat // V1
        c = flat % V1

        new_seq = beam_seq[:, q].at[t].set(c)                   # [T, bdash]
        new_lps = beam_lps[:, q].at[t].set(logprobsf[q, c])
        state = jax.tree_util.tree_map(lambda x: x[q], state)
        beam_sum = vp

        is_done = (c == 0) | (t == T - 1)
        p_done = pen(t + 1, beam_sum)
        slot = t * bdash + jnp.arange(bdash)
        done_seq = done_seq.at[slot].set(jnp.where(is_done[:, None], new_seq.T,
                                                   done_seq[slot]))
        done_lps = done_lps.at[slot].set(jnp.where(is_done[:, None], new_lps.T,
                                                   done_lps[slot]))
        done_p = done_p.at[slot].set(jnp.where(is_done, p_done, -jnp.inf))
        beam_sum = jnp.where(is_done, -1000.0, beam_sum)

        lp, state, _ = D.decode_step(params, state, c, feats, cfg)
        return (state, lp, new_seq, new_lps, beam_sum, done_seq, done_lps,
                done_p), None

    init = (state0, lp0,
            jnp.zeros((T, bdash), jnp.int32),
            jnp.zeros((T, bdash), jnp.float32),
            jnp.zeros((bdash,), jnp.float32),
            jnp.zeros((cap, T), jnp.int32),
            jnp.zeros((cap, T), jnp.float32),
            jnp.full((cap,), -jnp.inf, jnp.float32))
    carry, _ = jax.lax.scan(step, init, jnp.arange(T))
    done_seq, done_lps, done_p = carry[5], carry[6], carry[7]

    # stable sort by penalized score desc (append order = slot order)
    top_p, top_i = jax.lax.top_k(done_p, bdash)
    return BeamOut(seq=done_seq[top_i[0]], logprobs=done_lps[top_i[0]],
                   all_seqs=done_seq[top_i], all_ps=top_p)


def beam_search(params, feats: D.PreparedFeatures, cfg: ModelConfig,
                ecfg: EvalConfig) -> BeamOut:
    """Beam search over a batch of sub-graphs: vmap of the single case."""
    fn = lambda p, f: _beam_search_one(p, f, cfg, ecfg)
    return jax.vmap(fn, in_axes=(None, 0))(params, feats)
