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


@jax.custom_batching.custom_vmap
def shared_attention_op(h, p_att, att, mask, wh, bh, v, bv):
    """Single-sub-graph shared attention (h [B,R], p_att [N,H], att [N,D],
    mask [N]) with a custom vmap rule: under the beam search's per-sub-graph
    vmap this dispatches ONE batched Pallas kernel over the whole sub-graph
    axis instead of one tiny kernel per sub-graph."""
    out, w = fused_attention_shared(h[None], p_att[None], att[None],
                                    mask[None], wh, bh, v, bv,
                                    interpret=jax.default_backend() == "cpu")
    return out[0], w[0]


@shared_attention_op.def_vmap
def _shared_attention_vmap(axis_size, in_batched, h, p_att, att, mask,
                           wh, bh, v, bv):
    if not all(in_batched[:4]) or any(in_batched[4:]):
        raise NotImplementedError(
            "shared_attention_op expects batched activations and unbatched "
            "weights under vmap")
    out, w = fused_attention_shared(h, p_att, att, mask, wh, bh, v, bv,
                                    interpret=jax.default_backend() == "cpu")
    return (out, w), (True, True)


def _attention_shared_kernel(h_ref, patt_ref, att_ref, mask_ref, wh_ref,
                             bh_ref, v_ref, bv_ref, out_ref, w_ref):
    """Beam-shared variant: one sub-graph block's [N, H]/[N, D] feature
    streams are read once and reused by all B beams (unrolled — B is a
    small static beam width).  Numerics mirror models/decoder.py::attention
    in bf16 mode: f32-accumulated projections, tanh in the feature storage
    dtype, f32 softmax/renorm."""
    h = h_ref[...]                                        # [s, B, R]
    B = h.shape[1]
    wh = wh_ref[...]
    p = patt_ref[...]                                     # [s, N, H]
    att = att_ref[...]                                    # [s, N, D]
    mask = mask_ref[...]                                  # [s, N]
    for b in range(B):
        # per-beam 2D projection (Mosaic rejects the 3D dot's shape cast)
        ah = jnp.dot(h[:, b, :], wh,
                     preferred_element_type=jnp.float32) + bh_ref[...]
        dot = jnp.tanh(p + ah.astype(p.dtype)[:, None, :])
        e = jax.lax.dot_general(
            dot, v_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0] + bv_ref[0]
        m = jnp.max(e, axis=-1, keepdims=True)
        ex = jnp.exp(e - m)
        w = ex / jnp.sum(ex, axis=-1, keepdims=True)
        w = w * mask
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        out_ref[:, b, :] = jax.lax.dot_general(
            w.astype(att.dtype)[:, None, :], att,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :].astype(out_ref.dtype)
        w_ref[:, b, :] = w


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def fused_attention_shared(h, p_att, att, mask, wh, bh, v, bv,
                           block_s: int = 16, interpret: bool = False):
    """h [S,B,R], p_att [S,N,H], att [S,N,D], mask [S,N], wh [R,H], bh [H],
    v [H,1], bv [1] -> (att_res [S,B,D] in att's storage dtype — its
    consumer casts the f32 accumulation there anyway — and weights [S,B,N]
    f32).  Emitting att_res narrow keeps the custom call's scoped-VMEM
    output stack under the 16 MB limit inside the decode scan."""
    S, B, R = h.shape
    N, H = p_att.shape[1:]
    D = att.shape[-1]
    s = next(b for b in (block_s, 16, 8, 4, 2, 1) if b <= S and S % b == 0)
    kernel = pl.pallas_call(
        _attention_shared_kernel,
        grid=(S // s,),
        in_specs=[
            pl.BlockSpec((s, B, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, N, H), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, N, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, N), lambda i: (i, 0)),
            pl.BlockSpec((R, H), lambda i: (0, 0)),
            pl.BlockSpec((H,), lambda i: (0,)),
            pl.BlockSpec((H, 1), lambda i: (0, 0)),
            pl.BlockSpec((1,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((s, B, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, B, N), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, B, D), att.dtype),
            jax.ShapeDtypeStruct((S, B, N), jnp.float32),
        ],
        interpret=interpret,
    )
    return tuple(kernel(h, p_att, att, mask, wh, bh, v, bv))


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
