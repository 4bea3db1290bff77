"""Jitted training step: forward + loss + clip + adam, data-parallel ready.

Mirrors the reference's hot loop body (`train.py:134-164`): forward, summed
lang+gpn loss, global-norm clip at 10, Adam with the warmup/decay schedule —
all fused into one XLA program.  Under a mesh, the batch arrives sharded over
the ``data`` axis and the mean-reduced loss makes XLA emit the gradient
all-reduce over ICI (no hand-written collectives, per SURVEY.md §2.3).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..graph import SceneGraph
from ..models import subgc
from . import optim
from .loss import language_model_loss


class TrainBatch(NamedTuple):
    """Device-side training batch (the pinned tensors of dataloader.py:189-206)."""
    graph: SceneGraph          # [B, ...]
    labels: jnp.ndarray        # [S, T+2] int32 (S = B*seq_per_img)
    masks: jnp.ndarray         # [S, T+2] float32
    sub_obj_ind: jnp.ndarray   # [S, 2, half, N] int32
    sub_att_mask: jnp.ndarray  # [S, 2, half, N] float32
    img_ix: jnp.ndarray        # [S] int32


class TrainState(NamedTuple):
    params: dict
    model_state: dict
    opt_state: tuple
    step: jnp.ndarray          # scalar int32 — reference `iteration`


def init_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(params=params, model_state=model_state,
                      opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: ModelConfig, tcfg: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    ss_active: bool = True):
    """Returns step(ts, batch, rng, epoch, ss_prob) -> (ts, metrics), jitted.

    ss_active is STATIC: with False, scheduled sampling is compiled out and
    forward_teacher hoists the word-embedding gate projections out of the
    decode scan (all tokens known upfront — one batched matmul instead of
    T serial ones, forward and backward).  The train driver uses the
    ss_active=False program for the epochs where ss_prob would be 0 anyway
    (before scheduled_sampling_start) and switches at the epoch boundary —
    one extra compile per run for a measured step-time win (docs/PERF.md
    round 4)."""
    use_ss = tcfg.scheduled_sampling_start >= 0 and ss_active

    def loss_fn(params, model_state, batch: TrainBatch, rng, ss_prob):
        logprobs, gpn_loss, _, new_state = subgc.train_forward(
            params, model_state, batch.graph, batch.labels, batch.sub_obj_ind,
            batch.sub_att_mask, batch.img_ix, cfg, train=True, rng=rng,
            ss_prob=ss_prob if use_ss else None)
        lang_loss = language_model_loss(logprobs, batch.labels[:, 1:],
                                        batch.masks[:, 1:])
        total = lang_loss + gpn_loss if gpn_loss is not None else lang_loss
        gl = gpn_loss if gpn_loss is not None else jnp.zeros(())
        return total, (lang_loss, gl, new_state)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(ts: TrainState, batch: TrainBatch, rng, epoch, ss_prob):
        (total, (lang_loss, gpn_loss, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.model_state, batch, rng,
                                   ss_prob)
        lr = optim.learning_rate(ts.step, epoch, tcfg)
        opt_state = optim.set_step_lr(ts.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {"loss": total, "lang_loss": lang_loss,
                   "gpn_loss": gpn_loss, "lr": lr,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(params=params, model_state=new_state,
                          opt_state=opt_state, step=ts.step + 1), metrics

    return step


def make_val_step(cfg: ModelConfig):
    """Validation loss only (misc/eval_utils.py:73-86)."""
    @jax.jit
    def val_step(params, model_state, batch: TrainBatch):
        logprobs, _, _, _ = subgc.train_forward(
            params, model_state, batch.graph, batch.labels, batch.sub_obj_ind,
            batch.sub_att_mask, batch.img_ix, cfg, train=False)
        return language_model_loss(logprobs, batch.labels[:, 1:],
                                   batch.masks[:, 1:])
    return val_step
