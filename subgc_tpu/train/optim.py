"""Optimizer + schedules (reference train.py:100-132, misc/utils.py:223-239).

The reference mutates the optimizer LR imperatively each iteration; here the
schedule is a pure function of (iteration, epoch) fed to optax via
inject_hyperparams, so the whole update is one jitted step.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import optax

from ..config import TrainConfig


def learning_rate(it, epoch, tcfg: TrainConfig):
    """LR as a function of iteration + epoch (train.py:107-124).

    * linear warmup: lr = it * base / warmup_n for it <= warmup_n
    * afterwards: base * rate^((epoch - start) // every) once epoch > start
    """
    base = tcfg.learning_rate
    warm = it * base / tcfg.warmup_n
    if tcfg.learning_rate_decay_start >= 0:
        frac = jnp.maximum(epoch - tcfg.learning_rate_decay_start, 0) \
            // tcfg.learning_rate_decay_every
        decayed = base * tcfg.learning_rate_decay_rate ** frac
        decayed = jnp.where(epoch > tcfg.learning_rate_decay_start, decayed, base)
    else:
        decayed = jnp.asarray(base)
    return jnp.where(it <= tcfg.warmup_n, warm, decayed)


def ss_prob(epoch, tcfg: TrainConfig) -> float:
    """Scheduled-sampling probability (train.py:126-132); host-side python."""
    if tcfg.scheduled_sampling_start < 0 or epoch <= tcfg.scheduled_sampling_start:
        return 0.0
    frac = (epoch - tcfg.scheduled_sampling_start) \
        // tcfg.scheduled_sampling_increase_every
    return min(tcfg.scheduled_sampling_increase_prob * frac,
               tcfg.scheduled_sampling_max_prob)


def build_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    """Global-norm clip at 10 (misc/utils.py:174-200) + the reference's
    optimizer family (misc/utils.py:223-239), LR injected per step."""
    if tcfg.optim == "adam":
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=tcfg.learning_rate, b1=tcfg.optim_alpha,
            b2=tcfg.optim_beta, eps=tcfg.optim_epsilon)
    elif tcfg.optim == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=tcfg.learning_rate, weight_decay=0.01)
    elif tcfg.optim == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=tcfg.learning_rate, momentum=0.9)
    elif tcfg.optim == "rmsprop":
        opt = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=tcfg.learning_rate, decay=tcfg.optim_alpha,
            eps=tcfg.optim_epsilon)
    elif tcfg.optim == "adagrad":
        opt = optax.inject_hyperparams(optax.adagrad)(
            learning_rate=tcfg.learning_rate)
    else:
        raise ValueError(f"unknown optim {tcfg.optim!r}")
    if tcfg.weight_decay and tcfg.optim == "adam":
        opt = optax.chain(optax.add_decayed_weights(tcfg.weight_decay), opt)
    # optax.flatten was tried for the update (the adam phase measures 13.5ms
    # when timed STANDALONE — per-leaf kernel fragmentation) and measured
    # SLOWER in the real step: 41.4 vs 37.6 ms/step on v5e (docs/PERF.md
    # round 3).  In the shipped step the TrainState is donated, so per-leaf
    # updates run in-place; flatten's ravel/unravel breaks that aliasing and
    # costs more than the fragmentation it removes.  SUBGC_FLAT_OPT=1 keeps
    # the variant available for re-measurement.
    chain = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip_norm), opt)
    if os.environ.get("SUBGC_FLAT_OPT", "0") == "1":
        return optax.flatten(chain)
    return chain


def noam_schedule(model_size: int, factor: float = 1.0, warmup: int = 2000):
    """Noam LR schedule (misc/utils.py:269-297) as an optax schedule."""
    def schedule(step):
        s = jnp.maximum(step, 1).astype(jnp.float32)
        return factor * model_size ** -0.5 * jnp.minimum(
            s ** -0.5, s * warmup ** -1.5)
    return schedule


class ReduceLROnPlateau:
    """Host-side plateau LR controller (misc/utils.py:299-341): multiply the
    scheduled LR by `factor` when the monitored value stops improving."""

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, value: float) -> float:
        """Feed the monitored metric; returns the current LR scale."""
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.scale


def set_step_lr(opt_state, lr):
    """Functionally set the scheduled LR in the inject_hyperparams state
    (jit-safe: returns a new state tuple)."""
    clip_state, inner = opt_state
    inner = inner._replace(hyperparams={**inner.hyperparams,
                                        "learning_rate": lr})
    return (clip_state, inner)
