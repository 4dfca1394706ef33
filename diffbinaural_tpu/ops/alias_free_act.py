"""Fused anti-aliased snake activation — the Pallas TPU kernel.

This is the TPU-native equivalent of the reference's (unshipped) fused CUDA
``alias_free_activation.cuda.activation1d`` (lazy-loaded at
/root/reference/BigVGAN/bigvgan.py:95-102; torch fallback act.py:8-30):

    2× kaiser-sinc upsample → snakeβ → 2× kaiser-sinc downsample

The XLA composition (models.bigvgan.Activation1d) materialises the 2×-rate
intermediate in HBM between three ops; this kernel keeps everything in VMEM
— one HBM read of x, one HBM write of z, with the polyphase up-FIR, the
transcendental snake, and the down-FIR fused into 24 shifted multiply-adds
on the VPU.  Tiles need an 8-row halo, so the input stays in HBM (ANY) and
each program DMAs its overlapping window into a VMEM scratch.

Index algebra (derived from filter.py:30-101 + resample.py:10-58 with
ratio=2, kernel_size=12, replicate padding; h = kaiser_sinc taps):

  up (crop arithmetic folded in, ×2 gain):
    y[2t]   = 2·Σ_{s=-3..2} x[t+s]·h[5-2s]     (odd taps, reversed)
    y[2t+1] = 2·Σ_{s=-2..3} x[t+s]·h[6-2s]     (even taps, reversed)
  mid = snakeβ(y) = y + sin²(α·y)/β
  down (pad_left 5, pad_right 6, stride 2):
    z[t] = Σ_{r=0..5} mid[2(t+r)-4]·h[2r+1] + mid[2(t+r)-5]·h[2r]
         = Σ_r mid_even[t+r-2]·h[2r+1] + mid_odd[t+r-3]·h[2r]

so z[t] touches x[t-5 .. t+5]; the input is edge-padded by 8 once in HBM,
which supplies both the tile halos and the reference's replicate-pad
boundary semantics.

The op carries a custom VJP whose backward runs the XLA composition's vjp —
training gets the fused forward and a correct gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..signal.filters import kaiser_sinc_filter1d

HALO = 8
RATIO = 2
KSIZE = 12
LANE = 128


@functools.lru_cache(maxsize=1)
def _phase_taps():
    h = kaiser_sinc_filter1d(0.5 / RATIO, 0.6 / RATIO, KSIZE).astype(np.float32)
    w_even = np.array([h[5 - 2 * s] for s in range(-3, 3)], np.float32)
    w_odd = np.array([h[6 - 2 * s] for s in range(-2, 4)], np.float32)
    return w_even, w_odd, h


@functools.lru_cache(maxsize=8)
def _banded_mats(t_tile: int):
    """The three FIR stages as banded matrices — misaligned sublane shifts
    are slow on the VPU, but a banded (rows × rows) matmul rides the MXU:

      y_even = A_e · xb,  y_odd = A_o · xb     A: (U, t_tile + 2·HALO)
      z      = D_e · mid_even + D_o · mid_odd  D: (t_tile, U)
    """
    w_even, w_odd, h = _phase_taps()
    rows_in = t_tile + 2 * HALO
    U = t_tile + 6
    A_e = np.zeros((U, rows_in), np.float32)
    A_o = np.zeros((U, rows_in), np.float32)
    for u in range(U):
        for s in range(-3, 3):
            A_e[u, 5 + s + u] = RATIO * w_even[s + 3]
        for s in range(-2, 4):
            A_o[u, 5 + s + u] = RATIO * w_odd[s + 2]
    D_e = np.zeros((t_tile, U), np.float32)
    D_o = np.zeros((t_tile, U), np.float32)
    for t in range(t_tile):
        for r in range(6):
            D_e[t, r + 1 + t] = h[2 * r + 1]
            D_o[t, r + t] = h[2 * r]
    return A_e, A_o, D_e, D_o


def _kernel(x_hbm, alpha_ref, beta_ref, a_e_ref, a_o_ref, d_e_ref, d_o_ref,
            out_ref, scratch, sem, *, t_tile, cb, logscale):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    ci = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 2 * HALO),
                 pl.ds(ci * cb, cb)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    xb = scratch[:]  # (t_tile + 2·HALO, cb) fp32

    # ---- polyphase 2× up-FIR as two banded matmuls (MXU) ----------------
    y_even = jnp.dot(a_e_ref[:], xb, preferred_element_type=jnp.float32)
    y_odd = jnp.dot(a_o_ref[:], xb, preferred_element_type=jnp.float32)

    # ---- snakeβ (VPU) ---------------------------------------------------
    alpha = alpha_ref[0]  # (1, cb) row broadcast
    beta = beta_ref[0]
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    inv_beta = 1.0 / (beta + 1e-9)
    mid_even = y_even + inv_beta * jnp.sin(y_even * alpha) ** 2
    mid_odd = y_odd + inv_beta * jnp.sin(y_odd * alpha) ** 2

    # ---- strided 2× down-FIR as two banded matmuls ----------------------
    z = jnp.dot(d_e_ref[:], mid_even, preferred_element_type=jnp.float32)
    z = z + jnp.dot(d_o_ref[:], mid_odd, preferred_element_type=jnp.float32)
    out_ref[:] = z[None]


def _fused_forward(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                   logscale: bool, t_tile: int = 512) -> jnp.ndarray:
    """x: (B, T, C) → (B, T, C); C must be a multiple of 128 (small-C tail
    stages use the XLA composition — see Activation1d).

    Boundary note: clip edges (outer ≤3 samples) evaluate the continued FIR
    on the replicated input rather than the reference's clamped
    intermediate — interior samples are bit-matched to the XLA composition.
    """
    b, t, c = x.shape
    c_orig = c
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    t_tile = min(t_tile, -(-t // 8) * 8)
    t_pad = -(-t // t_tile) * t_tile

    c_pad = -(-c // LANE) * LANE
    if c_pad != c:  # narrow tail stages (C=96/48/24): pad lanes — still
        # several× faster than the VPU depthwise-conv composition
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c)))
        alpha = jnp.pad(alpha, (0, c_pad - c))
        beta = jnp.pad(beta, (0, c_pad - c), constant_values=1.0)
        c = c_pad

    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (HALO, HALO + (t_pad - t)), (0, 0)),
        mode="edge",
    )
    grid = (b, t_pad // t_tile, c // LANE)
    A_e, A_o, D_e, D_o = _banded_mats(t_tile)
    U = t_tile + 6
    rows_in = t_tile + 2 * HALO
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, ti, ci: (0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_kernel, t_tile=t_tile, cb=LANE, logscale=logscale),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            const_spec((U, rows_in)),
            const_spec((U, rows_in)),
            const_spec((t_tile, U)),
            const_spec((t_tile, U)),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, LANE), lambda bi, ti, ci: (bi, ti, ci),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((t_tile + 2 * HALO, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        xp,
        alpha.reshape(1, 1, c),
        beta.reshape(1, 1, c),
        jnp.asarray(A_e),
        jnp.asarray(A_o),
        jnp.asarray(D_e),
        jnp.asarray(D_o),
    )
    return out[:, :t, :c_orig].astype(x.dtype)


def _packed_forward(x, alpha, beta, logscale: bool, t_tile: int = 512):
    """Narrow-channel path: pack S contiguous time-slabs into the lane dim
    so a C=24 stage occupies 120 of 128 lanes instead of 24.

    Each slab carries an H-row true halo from its neighbours; the kernel's
    own edge-replication only corrupts rows inside the discarded margin
    (z[t] touches x[t−5..t+5], margin is H=8)."""
    b, t, c = x.shape
    s = max(1, LANE // c)
    if s == 1:
        return _fused_forward(x, alpha, beta, logscale, t_tile)

    ts = -(-t // s)
    ts = -(-ts // 8) * 8
    t_tot = s * ts
    xp = jnp.pad(
        x, ((0, 0), (HALO, HALO + (t_tot - t)), (0, 0)), mode="edge"
    )  # (B, t_tot + 2H, C)
    idx = np.arange(ts + 2 * HALO)[None, :] + ts * np.arange(s)[:, None]
    slabs = xp[:, idx, :]                      # (B, S, ts+2H, C)
    slabs = slabs.transpose(0, 2, 1, 3).reshape(b, ts + 2 * HALO, s * c)

    out = _fused_forward(
        slabs, jnp.tile(alpha, s), jnp.tile(beta, s), logscale, t_tile
    )                                          # (B, ts+2H, S·C)
    out = out.reshape(b, ts + 2 * HALO, s, c).transpose(0, 2, 1, 3)
    out = out[:, :, HALO : HALO + ts, :].reshape(b, t_tot, c)
    return out[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_alias_free_snake(x, alpha, beta, logscale: bool = True):
    """Fused up-FIR → snakeβ → down-FIR on (B, T, C).

    alpha/beta: (C,) raw parameters (log-space when ``logscale``).
    C < 128 runs the slab-packed variant (time tiles share the lane dim)."""
    if x.shape[-1] < LANE:
        return _packed_forward(x, alpha, beta, logscale)
    return _fused_forward(x, alpha, beta, logscale)


def _reference_composition(x, alpha, beta, logscale):
    """The XLA composition (the numerical target)."""
    from ..models.bigvgan import downsample2_nhc, snake, upsample2_nhc

    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    up = upsample2_nhc(x.astype(jnp.float32))
    mid = snake(up, a, b)
    return downsample2_nhc(mid).astype(x.dtype)


def _fwd(x, alpha, beta, logscale):
    return _fused_forward(x, alpha, beta, logscale), (x, alpha, beta)


def _bwd(logscale, res, g):
    x, alpha, beta = res
    _, vjp = jax.vjp(
        lambda x_, a_, b_: _reference_composition(x_, a_, b_, logscale),
        x, alpha, beta,
    )
    return vjp(g)


fused_alias_free_snake.defvjp(_fwd, _bwd)
