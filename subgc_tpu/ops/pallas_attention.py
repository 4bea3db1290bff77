"""Pallas TPU kernel: fused additive attention for the TopDown decoder.

Fuses the attention chain of `models/AttModel.py:445-471` —

    ah   = h @ Wh + bh                  [R, H]
    dot  = tanh(p_att + ah[:, None, :]) [R, N, H]
    e    = dot @ v + bv                 [R, N]
    w    = renorm(softmax(e) * mask)    [R, N]
    out  = w @ att                      [R, N] x [R, N, D] -> [R, D]

— into one kernel so the [R, N, H] tanh intermediate never round-trips
through HBM.  The decoder calls this every timestep for every (sub-graph x
beam) row; at production dims (N=37 nodes, H=512, D=1000) the intermediate
is the largest tensor in the step.

Row-blocked grid; each block computes its rows' attention entirely in VMEM.
Numerics match the XLA path (float32 accumulation) — see
tests/test_pallas_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attention_kernel(h_ref, patt_ref, att_ref, mask_ref, wh_ref, bh_ref,
                      v_ref, bv_ref, out_ref, w_ref):
    h = h_ref[...]                                    # [r, H_in]
    ah = jnp.dot(h, wh_ref[...],
                 preferred_element_type=jnp.float32) + bh_ref[...]
    dot = jnp.tanh(patt_ref[...] + ah[:, None, :])    # [r, N, H]
    e = jax.lax.dot_general(
        dot, v_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0] + bv_ref[0]   # [r, N]
    m = jnp.max(e, axis=-1, keepdims=True)
    ex = jnp.exp(e - m)
    w = ex / jnp.sum(ex, axis=-1, keepdims=True)
    w = w * mask_ref[...]
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    out_ref[...] = jax.lax.dot_general(
        w[:, None, :], att_ref[...],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    w_ref[...] = w


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def fused_attention(h, p_att, att, mask, wh, bh, v, bv, block_r: int = 32,
                    interpret: bool = False):
    """h [R,Hin], p_att [R,N,H], att [R,N,D], mask [R,N], wh [Hin,H], bh [H],
    v [H,1], bv [1] -> (att_res [R,D], weights [R,N])."""
    R, N, H = p_att.shape
    D = att.shape[-1]
    r = min(block_r, R)
    grid = (pl.cdiv(R, r),)
    kernel = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, h.shape[-1]), lambda i: (i, 0)),
            pl.BlockSpec((r, N, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, N), lambda i: (i, 0)),
            pl.BlockSpec((h.shape[-1], H), lambda i: (0, 0)),
            pl.BlockSpec((H,), lambda i: (0,)),
            pl.BlockSpec((H, 1), lambda i: (0, 0)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((r, D), lambda i: (i, 0)),
            pl.BlockSpec((r, N), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, D), jnp.float32),
            jax.ShapeDtypeStruct((R, N), jnp.float32),
        ],
        interpret=interpret,
    )
    return tuple(kernel(h, p_att, att, mask, wh, bh, v, bv))
