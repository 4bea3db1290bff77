"""Self-critical sequence training (SCST).

The reference ships `RewardCriterion` (misc/utils.py:89-109) and a
`self_critical_after` flag (opts.py:66) but never enables them in the
shipped configs; this module provides the working TPU pipeline:

1. one jitted dispatch samples captions (multinomial) and decodes the greedy
   baseline from the same per-sentence sub-graph features,
2. the host scores both against the GT captions with the framework's CIDEr
   (the standard SCST reward: reward = CIDEr(sample) - CIDEr(greedy)),
3. a second jitted dispatch recomputes the sample's logprobs under the
   current params and applies the policy-gradient RewardCriterion.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..eval.cider import compute_cider
from ..models import decoder as D
from ..models import encoder as E
from ..models import gpn as G
from ..models import subgc
from ..train.loss import reward_loss
from ..utils.text import decode_sequence
from . import optim
from .step import TrainBatch, TrainState


def _prepare_sentence_feats(params, state, batch: TrainBatch,
                            cfg: ModelConfig, rng=None):
    """Encoder + gpn train branch -> PreparedFeatures per sentence."""
    x_obj, _, _ = E.encode_graph(params, state, batch.graph, cfg, train=False)
    if cfg.use_gpn:
        _, _, att_feats, fc_feats, att_masks = G.gpn_train_forward(
            params, x_obj, batch.sub_obj_ind, batch.sub_att_mask,
            batch.img_ix, cfg, train=False)
    else:
        att_feats = x_obj[batch.img_ix]
        read_out = att_feats.mean(1)
        fc_feats = subgc._full_graph_readout(params, read_out)
        att_masks = jnp.zeros((att_feats.shape[0], cfg.obj_num),
                              jnp.float32).at[:, :cfg.obj_num - 1].set(1.0)
    return D.prepare_features(params, fc_feats, att_feats, att_masks, cfg,
                              bn_state=state.get("att_bn"))


def make_sample_fn(cfg: ModelConfig):
    """One dispatch: greedy baseline + multinomial sample per sentence."""

    @jax.jit
    def sample(params, state, batch: TrainBatch, rng):
        feats = _prepare_sentence_feats(params, state, batch, cfg)
        S = feats.fc.shape[0]
        T = cfg.seq_length

        def rollout(greedy, key):
            def step(carry, t):
                st, it, unfinished, k = carry
                lp, st, _ = D.decode_step(params, st, it, feats, cfg)
                if greedy:
                    nxt = jnp.argmax(lp, axis=-1)
                else:
                    k, kk = jax.random.split(k)
                    nxt = jax.random.categorical(kk, lp, axis=-1)
                chosen = jnp.take_along_axis(lp, nxt[:, None], -1)[:, 0]
                unfinished = jnp.where(t == 0, nxt > 0, unfinished & (nxt > 0))
                nxt = (nxt * unfinished).astype(jnp.int32)
                return (st, nxt, unfinished, k), (nxt, chosen)

            init = (D.init_state(S, cfg), jnp.zeros((S,), jnp.int32),
                    jnp.ones((S,), bool), key)
            _, (seq, lps) = jax.lax.scan(step, init, jnp.arange(T))
            return seq.T, lps.T

        greedy_seq, _ = rollout(True, rng)
        sample_seq, sample_lps = rollout(False, rng)
        return greedy_seq, sample_seq, sample_lps

    return sample


def compute_rewards(greedy_seq: np.ndarray, sample_seq: np.ndarray,
                    gts_tokens: List[np.ndarray], vocab) -> np.ndarray:
    """reward[s] = CIDEr(sample_s) - CIDEr(greedy_s) vs its image's GTs."""
    S = sample_seq.shape[0]
    greedy_sents = decode_sequence(vocab, greedy_seq, remove_bad_endings=False)
    sample_sents = decode_sequence(vocab, sample_seq, remove_bad_endings=False)
    refs = [decode_sequence(vocab, gts_tokens[s], remove_bad_endings=False)
            for s in range(S)]
    gts = {s: refs[s] for s in range(S)}
    gts.update({S + s: refs[s] for s in range(S)})
    res = {s: [sample_sents[s] or "a"] for s in range(S)}
    res.update({S + s: [greedy_sents[s] or "a"] for s in range(S)})
    _, scores = compute_cider(gts, res)
    return (scores[:S] - scores[S:]).astype(np.float32)


def make_scst_update_fn(cfg: ModelConfig, tcfg: TrainConfig, optimizer):
    """Second dispatch: grad of RewardCriterion at the sampled sequences."""

    def loss_fn(params, state, batch: TrainBatch, sample_seq, rewards):
        feats = _prepare_sentence_feats(params, state, batch, cfg)
        S, T = sample_seq.shape

        def step(carry, t):
            st, it = carry
            lp, st, _ = D.decode_step(params, st, it, feats, cfg)
            tok = sample_seq[:, t]
            chosen = jnp.take_along_axis(lp, tok[:, None], -1)[:, 0]
            return (st, tok), chosen

        init = (D.init_state(S, cfg), jnp.zeros((S,), jnp.int32))
        _, lps = jax.lax.scan(step, init, jnp.arange(T))
        lps = lps.T                                   # [S, T]
        rew = jnp.broadcast_to(rewards[:, None], lps.shape)
        return reward_loss(lps, sample_seq, rew)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(ts: TrainState, batch: TrainBatch, sample_seq, rewards, epoch):
        loss, grads = jax.value_and_grad(loss_fn)(
            ts.params, ts.model_state, batch, sample_seq, rewards)
        lr = optim.learning_rate(ts.step, epoch, tcfg)
        opt_state = optim.set_step_lr(ts.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, ts.model_state, opt_state, ts.step + 1), loss

    return update


def scst_train_step(ts: TrainState, batch: TrainBatch, gts_tokens, vocab,
                    sample_fn, update_fn, rng, epoch):
    """Full SCST iteration (two dispatches + host reward)."""
    greedy_seq, sample_seq, _ = jax.device_get(
        sample_fn(ts.params, ts.model_state, batch, rng))
    rewards = compute_rewards(greedy_seq, sample_seq, gts_tokens, vocab)
    ts, loss = update_fn(ts, batch, jnp.asarray(sample_seq),
                         jnp.asarray(rewards), epoch)
    return ts, float(loss), float(rewards.mean())
