"""Training criteria (misc/utils.py:89-156)."""
from __future__ import annotations

import jax.numpy as jnp


def language_model_loss(logprobs, targets, masks):
    """Masked NLL averaged over valid tokens (LanguageModelCriterion,
    misc/utils.py:111-124).

    logprobs [S, T, V+1]; targets/masks [S, >=T] (truncated to T like the
    reference).
    """
    T = logprobs.shape[1]
    tgt = targets[:, :T]
    m = masks[:, :T]
    nll = -jnp.take_along_axis(logprobs, tgt[..., None], axis=-1)[..., 0]
    return (nll * m).sum() / m.sum()


def label_smoothing_loss(logprobs, targets, masks, smoothing: float = 0.0):
    """KL-div label smoothing (misc/utils.py:126-156)."""
    T = logprobs.shape[1]
    V = logprobs.shape[-1]
    tgt = targets[:, :T]
    m = masks[:, :T]
    conf = 1.0 - smoothing
    true_dist = jnp.full(logprobs.shape, smoothing / (V - 1))
    true_dist = jnp.put_along_axis(true_dist, tgt[..., None], conf, axis=-1,
                                   inplace=False)
    # torch KLDivLoss(input=logprobs, target=dist) = dist*(log dist - input)
    log_td = jnp.where(true_dist > 0, jnp.log(true_dist), 0.0)
    kl = (true_dist * (log_td - logprobs)).sum(-1)
    return (kl * m).sum() / m.sum()


def reward_loss(sample_logprobs, seq, reward, gpn_loss=None):
    """SCST-style policy-gradient loss (RewardCriterion, misc/utils.py:89-109).

    Unused by the shipped reference configs but part of the capability
    surface (self-critical finetuning).
    """
    lp = sample_logprobs.reshape(-1)
    r = reward.reshape(-1)
    mask = (seq > 0).astype(jnp.float32)
    mask = jnp.concatenate([jnp.ones((mask.shape[0], 1)), mask[:, :-1]],
                           axis=1).reshape(-1)
    if gpn_loss is None:
        out = -lp * r * mask
    else:
        g = jnp.broadcast_to(gpn_loss[:, None],
                             (gpn_loss.shape[0], seq.shape[1])).reshape(-1)
        out = (-lp * r + g * jnp.exp(r)) * mask
    return out.sum() / mask.sum()
