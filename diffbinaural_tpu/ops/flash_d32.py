"""Single-pass flash-attention forward specialised for small head dims.

The stage-1 UNet's full self-attention runs at n = 80·80 = 6400 tokens with
d_head = 32 (reference modules/attention.py:204-237).  At d=32 the whole
K/V panel for one (batch, head) is ~420 KB — it fits VMEM outright, so the
online-softmax machinery of the generic flash kernel (running max/sum
rescale per k-block, segment-id masking, pad-to-block-multiple) is pure
overhead.  This kernel:

  * keeps K/V resident and computes each q-block's full score strip in one
    MXU call per chunk — no per-block rescale of the accumulator;
  * normalises the OUTPUT (block_q × d) instead of the score matrix
    (block_q × n): ~n/d fewer VPU divides than the generic single-step
    kernel;
  * needs no padding or masking at the UNet's grids (6400 = 50·128);
    non-multiples of 128 get one additive bias row instead of segment-id
    tiling/compare/select over the whole score strip;
  * splits the k-range into chunks with per-chunk max and an O(block_q·d)
    merge, giving the Mosaic scheduler independent MXU/VPU chains to
    overlap (chunk i's exp can run while chunk i+1's matmul streams).

Why the remaining gap to the ≈3.4 ms MXU floor (measured 4.40 ms at
n=6400 with the base-2 primal) cannot be closed by packing the QKᵀ
contraction: the r3-review idea of "batch-2 K/V in the depth dimension"
is algebraically invalid — depth-concatenating two (batch, head) pairs,
[q_A|q_B]·[K_A|K_B]ᵀ, computes q_A·K_Aᵀ + q_B·K_Bᵀ, the SUM of the two
score matrices, not both; recovering the individual scores requires
zero-padding ([q_A|0]·[K_A|K_B]ᵀ), which occupies the same MXU passes as
the unpacked form.  Nor can the two attention layers per UNet block be
merged: they are sequential (layer 2 consumes layer 1's output).  The
residual ~1 ms over the pass floor is the online-merge VPU work (5-chunk
max/exp2/rescale) that already overlaps the MXU chain; the exp2 primal
(2026-08-20: 4.8 → 4.40 ms) recovered the share that was serial.

The backward reuses the stock flash kernels
(jax.experimental.pallas.ops.tpu.flash_attention._flash_attention_bwd_dkv /
_bwd_dq): the forward emits their exact (l, m) residual convention
(m = rowmax of scaled scores, l = rowsum of exp(s − m)), so training takes
the fast forward at zero extra cost.  sm_scale is folded into q OUTSIDE the
custom-vjp core, so both directions run with sm_scale = 1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas.ops.tpu.flash_attention import (
    DEFAULT_MASK_VALUE,
    SegmentIds,
    _flash_attention_bwd_dkv,
    _flash_attention_bwd_dq,
)

LANE = 128

from ._interpret import pallas_interpret

# Inference-path softmax base: with LOG2_E folded into the q scale the
# kernel's transcendental becomes exp2 — mathematically the SAME softmax
# (softmax_e(s) == 2^(s·log2e − m2)/Σ…), one VPU multiply cheaper per
# element wherever the hardware lowers exp(x) as exp2(x·log2e).  Applied
# ONLY to the residual-free primal: the training forward must emit (l, m)
# in the stock flash kernels' e-base convention, and the stock backward
# recomputes scores from the q it was given.
_EXP2 = os.environ.get("DIFFBINAURAL_FLASH_EXP2", "1") != "0"
_LOG2_E = float(np.log2(np.e))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref,
                *, n_valid, n_pad, chunks, exp2=False):
    """l_ref/m_ref are None for the inference variant — softmax residuals
    are only materialised when the VJP needs them (they are ~100 MB of HBM
    writes per UNet-sized call).  In that variant the wrapper appends a
    ones-column to v, so the rowsum l rides the PV matmul (the MXU output
    tile is ≤128 lanes either way — the column is free) instead of costing
    a full VPU reduction pass over the score strip."""
    q = q_ref[0, 0]  # (bq, d)
    d = q.shape[-1]
    fold_l = l_ref is None and v_ref.shape[-1] == d + 1
    expfn = jnp.exp2 if exp2 else jnp.exp
    cw = n_pad // chunks
    outs, maxes, sums = [], [], []
    for ci in range(chunks):
        k = k_ref[0, 0, ci * cw:(ci + 1) * cw, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, cw)
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1) + ci * cw
            s = s + jnp.where(col < n_valid, 0.0, DEFAULT_MASK_VALUE)
        m_c = jnp.max(s, axis=1, keepdims=True)
        p = expfn(s - m_c)
        if not fold_l:
            sums.append(jnp.sum(p, axis=1, keepdims=True))
        v_c = v_ref[0, 0, ci * cw:(ci + 1) * cw, :]
        o_c = jax.lax.dot(
            p.astype(v_c.dtype), v_c, preferred_element_type=jnp.float32
        )  # (bq, d) — or (bq, d+1) with l in the last column
        outs.append(o_c)
        maxes.append(m_c)

    if chunks == 1:
        m_all, o = maxes[0], outs[0]
        l_all = o[:, d:] if fold_l else sums[0]
    else:
        m_all = functools.reduce(jnp.maximum, maxes)
        scales = [expfn(m_c - m_all) for m_c in maxes]
        o = sum(o_c * s_ for o_c, s_ in zip(outs, scales))
        if fold_l:
            l_all = o[:, d:]
        else:
            l_all = sum(s_ * l_c for s_, l_c in zip(scales, sums))

    o = o[:, :d] * (1.0 / l_all) if fold_l else o * (1.0 / l_all)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    if l_ref is not None:
        bq = q.shape[0]
        l_ref[0, 0] = jax.lax.broadcast_in_dim(l_all, (bq, LANE), (0, 1))
        m_ref[0, 0] = jax.lax.broadcast_in_dim(m_all, (bq, LANE), (0, 1))


def _fwd(q, k, v, bq: int | None = None, chunks: int | None = None,
         save_residuals: bool = True, exp2: bool = False):
    """(B, H, N, D) × 3 → (o, l, m) [or just o]; l/m in the stock-flash
    residual convention, shape (B, H, N)."""
    b, h, n, d = q.shape
    interpret = pallas_interpret()
    n_pad = _round_up(n, LANE)
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    if bq is None:
        # bq=320/chunks=5 won the (bq, chunks) sweep at the UNet's n=6400
        # both with and without residuals (micro.py flashsweep 2026-08-19:
        # 4.44/4.40 ms vs 4.66/4.84 for the old 256/2; flashcheck passed
        # on the new geometry).  bq=640 was marginally faster at resid=0
        # but sporadically kills the remote compile helper — not worth it.
        bq = 320 if n_pad % 320 == 0 else (256 if n_pad % 256 == 0 else LANE)
    if chunks is None:
        if n_pad >= 2048 and n_pad % (5 * LANE) == 0:
            chunks = 5
        elif n_pad >= 2048 and (n_pad // 2) % LANE == 0:
            chunks = 2
        else:
            chunks = 1

    qb_spec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi: (bi, hi, qi, 0))
    kv_spec = pl.BlockSpec(
        (1, 1, n_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0)
    )
    lm_spec = pl.BlockSpec(
        (1, 1, bq, LANE), lambda bi, hi, qi: (bi, hi, qi, 0)
    )
    grid = (b, h, n_pad // bq)
    body = functools.partial(_fwd_kernel, n_valid=n, n_pad=n_pad,
                             chunks=chunks, exp2=exp2 and not save_residuals)
    if not save_residuals:
        # ones-column v: the rowsum l rides the PV matmul (see _fwd_kernel)
        v_aug = jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
        )
        va_spec = pl.BlockSpec(
            (1, 1, n_pad, d + 1), lambda bi, hi, qi: (bi, hi, 0, 0)
        )
        kern = lambda q_, k_, v_, o_: body(q_, k_, v_, o_, None, None)
        o = pl.pallas_call(
            kern,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
            in_specs=[qb_spec, kv_spec, va_spec],
            out_specs=qb_spec,
            interpret=interpret,
        )(q, k, v_aug)
        return o[:, :, :n, :], None, None
    o, l, m = pl.pallas_call(
        body,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((b, h, n_pad, LANE), jnp.float32),
        ),
        in_specs=[qb_spec, kv_spec, kv_spec],
        out_specs=(qb_spec, lm_spec, lm_spec),
        interpret=interpret,
    )(q, k, v)
    return o[:, :, :n, :], l[:, :, :n, 0], m[:, :, :n, 0]


@jax.custom_vjp
def _attn_core(q, k, v):
    """softmax(q·kᵀ)·v on (B, H, N, D); q is PRE-SCALED by the caller.

    The primal (inference) path skips the l/m residual writes entirely;
    with _EXP2 it additionally folds log2(e) into q and runs the softmax
    in base 2 — the identical function, cheaper transcendental."""
    if _EXP2:
        o, _, _ = _fwd(q * jnp.asarray(_LOG2_E, q.dtype), k, v,
                       save_residuals=False, exp2=True)
    else:
        o, _, _ = _fwd(q, k, v, save_residuals=False)
    return o


def _attn_core_fwd(q, k, v):
    o, l, m = _fwd(q, k, v)
    return o, (q, k, v, o, l, m)


def _bwd_geometry(n: int):
    """(n_pad, blk): big blocks keep the stock bwd kernels efficient —
    640 divides the UNet's 6400 exactly (no padding, no masking);
    otherwise pad to a 512 multiple and mask with segment ids."""
    for blk in (640, 512):
        if n % blk == 0:
            return n, blk
    return _round_up(n, 512), 512


def _attn_core_bwd(res, do):
    q, k, v, o, l, m = res
    b, h, n, d = q.shape
    n_pad, blk = _bwd_geometry(n)
    seg = None
    if n_pad != n:
        pad4 = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        pad3 = ((0, 0), (0, 0), (0, n_pad - n))
        q, k, v, do, o = (jnp.pad(a, pad4) for a in (q, k, v, do, o))
        l = jnp.pad(l, pad3, constant_values=1.0)
        m = jnp.pad(m, pad3)
        ids = (jnp.arange(n_pad) >= n).astype(jnp.int32)[None, :]
        ids = jnp.broadcast_to(ids, (b, n_pad))
        seg = SegmentIds(q=ids, kv=ids)

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    dk, dv = _flash_attention_bwd_dkv(
        q, k, v, None, seg, l, m, do, di,
        block_q_major=blk, block_q=blk, block_k_major=blk, block_k=blk,
        sm_scale=1.0, causal=False, mask_value=DEFAULT_MASK_VALUE,
        debug=False,
    )
    dq, _ = _flash_attention_bwd_dq(
        q, k, v, None, seg, l, m, do, di,
        block_q_major=blk, block_k_major=blk, block_k=blk,
        sm_scale=1.0, causal=False, mask_value=DEFAULT_MASK_VALUE,
        debug=False,
    )
    sl = (slice(None), slice(None), slice(0, n), slice(None))
    return dq[sl], dk[sl], dv[sl]


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def flash_sdpa(q, k, v, sm_scale: float):
    """Scaled dot-product attention via the d≤128-specialised single-pass
    kernel.  (B, H, N, D) inputs, bf16 or f32; softmax statistics in f32."""
    qs = q * jnp.asarray(sm_scale, q.dtype)
    return _attn_core(qs, k, v)
