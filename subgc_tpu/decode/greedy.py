"""Batched greedy / top-k sampling decode.

Reimplements `models/AttModel.py:236-326` (`_sample`) as one ``lax.scan`` over
time with the sub-graph axis batched — the reference already batches this path
over sub-graphs; here it additionally runs fully inside jit with static
shapes (no early-exit break; finished sequences are masked, which is
numerically identical because outputs past EOS are zeroed in both).

Semantics preserved:
* greedy: argmax over log-softmax vocab distribution
* top-k sampling (AttModel.py:295-303): re-softmax at temperature
  ``topk_temp``, keep top ``the_k`` logits, sample; the recorded logprob is
  the *un-renormalized* tempered log-softmax value, as in the reference
* "unfinished" latching: first EOS (token 0) zeroes the rest of the sequence
* optional attention-weight capture [S, T+1, N] for grounding
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import EvalConfig, ModelConfig
from ..models import decoder as D


def _topk_mask(lp2: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep EXACTLY the k largest entries per row (others -> -inf) via k
    argmax+mask passes — cheaper than a vocab-wide sort at k of 2-5.

    torch.topk also keeps exactly k on threshold ties (AttModel.py:298); a
    >=kth-value mask would keep every tied entry and thin the sampling mass.
    Which tied member survives differs: the argmax passes take the lowest
    index, while torch.topk's pick is an unspecified quickselect artifact
    that itself differs between CPU and CUDA builds, so index-exact tie
    parity is ill-defined (tests/test_tie_breaks.py pins the cardinality +
    lowest-index rule)."""
    work = lp2
    keep = jnp.zeros(lp2.shape, bool)
    for _ in range(k):
        idx = jnp.argmax(work, axis=-1, keepdims=True)
        keep = jnp.put_along_axis(keep, idx, True, axis=-1, inplace=False)
        work = jnp.put_along_axis(work, idx, -jnp.inf, axis=-1,
                                  inplace=False)
    return jnp.where(keep, lp2, -jnp.inf)


class SampleOut(NamedTuple):
    seq: jnp.ndarray           # [S, T] int32
    logprobs: jnp.ndarray      # [S, T] per-token logprob of chosen token
    # attention weights: [S, T+1, N] with return_att (the grounding
    # contract, grd_utils.py:13-61), else only the [S, T, N] rows the
    # decode actually computed — never fabricated rows
    att_weights: jnp.ndarray


def sample(params, feats: D.PreparedFeatures, cfg: ModelConfig,
           ecfg: EvalConfig, rng: Optional[jax.Array] = None) -> SampleOut:
    params = D.cast_decoder_weights(params, cfg)
    if cfg.fold_embed_ih:
        params = D.fold_embed_ih(params, cfg)
    if cfg.merge_lstm_matmuls:
        params = D.merge_lstm_weights(params, cfg)
    S = feats.fc.shape[0]
    T = cfg.seq_length
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def step(carry, t):
        state, it, unfinished, step_rng = carry
        lp, state, att_w = D.decode_step(params, state, it, feats, cfg)

        if ecfg.use_topk_sampling:
            step_rng, r = jax.random.split(step_rng)
            lp2 = jax.nn.log_softmax(lp / ecfg.topk_temp, axis=-1)
            masked = _topk_mask(lp2, ecfg.the_k)
            nxt = jax.random.categorical(r, masked, axis=-1)
            chosen_lp = jnp.take_along_axis(lp2, nxt[:, None], axis=-1)[:, 0]
        else:
            nxt = jnp.argmax(lp, axis=-1)
            chosen_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]

        new_unfinished = jnp.where(t == 0, nxt > 0, unfinished & (nxt > 0))
        nxt = (nxt * new_unfinished).astype(jnp.int32)
        out = (nxt, chosen_lp, att_w)
        return (state, nxt, new_unfinished, step_rng), out

    init = (D.init_state(S, cfg), jnp.zeros((S,), jnp.int32),
            jnp.ones((S,), bool), base_rng)
    # the final (T-th) step only contributes its attention weights — it runs
    # only when the caller captures them (return_att), saving one full decode
    # step (1/(T+1) of decode time) on the plain greedy/top-k path
    n_steps = T + 1 if ecfg.return_att else T
    _, (seqs, lps, att_ws) = jax.lax.scan(step, init, jnp.arange(n_steps))

    att = att_ws.transpose(1, 0, 2)
    return SampleOut(seq=seqs[:T].T, logprobs=lps[:T].T, att_weights=att)
