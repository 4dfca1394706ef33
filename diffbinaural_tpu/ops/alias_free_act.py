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

Both directions are fused kernels: the backward has the same stencil
structure (adjoint banded FIRs + the snake local derivatives + per-channel
α/β partial reductions), so training pays one kernel each way instead of
the XLA depthwise-conv composition's vjp.
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
def _banded_mats_bwd(t_tile: int):
    """Adjoint FIRs as banded matrices (same stencil structure as forward):

      d_mid_e = B_e · dz,  d_mid_o = B_o · dz     B: (U, t_tile + 2·HALO)
      dx      = C_e · dy_e + C_o · dy_o           C: (t_tile, U)

    Derivation: z[t] = Σ_r mid_e[t+r−2]·h[2r+1] + mid_o[t+r−3]·h[2r] gives
    d_mid_e[u] = Σ_r dz[u−r+2]·h[2r+1], d_mid_o[u] = Σ_r dz[u−r+3]·h[2r];
    y_e[u] = Σ_s x[u+s]·we[s+3] gives dx[t] = Σ_s dy_e[t−s]·we[s+3] (+odd).
    """
    w_even, w_odd, h = _phase_taps()
    rows_in = t_tile + 2 * HALO
    U = t_tile + 6
    B_e = np.zeros((U, rows_in), np.float32)
    B_o = np.zeros((U, rows_in), np.float32)
    for u_idx in range(U):
        for r in range(6):
            B_e[u_idx, u_idx - r + 7] = h[2 * r + 1]   # dz[(u−r+2)+H]
            B_o[u_idx, u_idx - r + 8] = h[2 * r]       # dz[(u−r+3)+H]
    C_e = np.zeros((t_tile, U), np.float32)
    C_o = np.zeros((t_tile, U), np.float32)
    for t in range(t_tile):
        for s in range(-3, 3):   # u_idx = t − s + 3
            C_e[t, t - s + 3] = RATIO * w_even[s + 3]
        for s in range(-2, 4):
            C_o[t, t - s + 3] = RATIO * w_odd[s + 2]
    return B_e, B_o, C_e, C_o


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
            out_ref, scratch, sem, *, t_tile, cb):
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
    xb = scratch[:]  # (t_tile + 2·HALO, cb) fp32 or bf16

    # ---- polyphase 2× up-FIR as two banded matmuls (MXU) ----------------
    # bf16 inputs run the matmuls at 4× MXU rate (fp32 matmuls are the
    # kernel's bottleneck: the banded matrices do ~2k MACs/element);
    # accumulation is always fp32.
    y_even = jnp.dot(a_e_ref[:], xb, preferred_element_type=jnp.float32)
    y_odd = jnp.dot(a_o_ref[:], xb, preferred_element_type=jnp.float32)

    # ---- snakeβ (VPU, fp32) — alpha/beta are EFFECTIVE (post-logscale) --
    alpha = alpha_ref[0]  # (1, cb) row broadcast
    beta = beta_ref[0]
    inv_beta = 1.0 / (beta + 1e-9)
    mid_even = y_even + inv_beta * jnp.sin(y_even * alpha) ** 2
    mid_odd = y_odd + inv_beta * jnp.sin(y_odd * alpha) ** 2

    # ---- strided 2× down-FIR as two banded matmuls ----------------------
    cdt = xb.dtype
    z = jnp.dot(d_e_ref[:], mid_even.astype(cdt),
                preferred_element_type=jnp.float32)
    z = z + jnp.dot(d_o_ref[:], mid_odd.astype(cdt),
                    preferred_element_type=jnp.float32)
    out_ref[:] = z[None].astype(out_ref.dtype)


def _bwd_kernel(x_hbm, dz_hbm, alpha_ref, beta_ref, a_e_ref, a_o_ref,
                b_e_ref, b_o_ref, c_e_ref, c_o_ref,
                dx_ref, dalpha_ref, dbeta_ref, x_scr, dz_scr, sem, *,
                t_tile, cb):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    ci = pl.program_id(2)

    dma_x = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 2 * HALO),
                 pl.ds(ci * cb, cb)], x_scr, sem)
    dma_x.start()
    dma_x.wait()
    dma_z = pltpu.make_async_copy(
        dz_hbm.at[bi, pl.ds(ti * t_tile, t_tile + 2 * HALO),
                  pl.ds(ci * cb, cb)], dz_scr, sem)
    dma_z.start()
    dma_z.wait()
    xb = x_scr[:]
    dzb = dz_scr[:]

    # recompute the mid-lattice pre-activations (same as forward)
    y_even = jnp.dot(a_e_ref[:], xb, preferred_element_type=jnp.float32)
    y_odd = jnp.dot(a_o_ref[:], xb, preferred_element_type=jnp.float32)

    alpha = alpha_ref[0]  # effective (post-logscale) values
    beta = beta_ref[0]
    inv_beta = 1.0 / (beta + 1e-9)

    # adjoint of the down-FIR
    dmid_e = jnp.dot(b_e_ref[:], dzb, preferred_element_type=jnp.float32)
    dmid_o = jnp.dot(b_o_ref[:], dzb, preferred_element_type=jnp.float32)

    # snakeβ local derivatives: mid = y + sin²(αy)/β
    def parts(y, dmid):
        s2 = jnp.sin(2.0 * alpha * y)
        dy = dmid * (1.0 + alpha * s2 * inv_beta)
        da = dmid * (y * s2 * inv_beta)
        db = dmid * (-(jnp.sin(alpha * y) ** 2) * inv_beta * inv_beta)
        return dy, da, db

    dy_e, da_e, db_e = parts(y_even, dmid_e)
    dy_o, da_o, db_o = parts(y_odd, dmid_o)

    cdt = xb.dtype
    dx = jnp.dot(c_e_ref[:], dy_e.astype(cdt),
                 preferred_element_type=jnp.float32)
    dx = dx + jnp.dot(c_o_ref[:], dy_o.astype(cdt),
                      preferred_element_type=jnp.float32)
    dx_ref[:] = dx[None].astype(dx_ref.dtype)
    dalpha_ref[:] = (da_e + da_o).sum(axis=0)[None, None, None]
    dbeta_ref[:] = (db_e + db_o).sum(axis=0)[None, None, None]


def _fused_backward(x, dz, alpha_eff, beta_eff, t_tile: int = 512):
    """Adjoint of the fused op wrt (x, effective α, effective β).

    x, dz: (B, T, C) with C % 128 == 0.  The edge-replication adjoint's
    scatter back into the clip's first/last samples is dropped (matches the
    forward's documented boundary convention; ≤8 outer samples).
    """
    b, t, c = x.shape
    c_orig = c
    interpret = jax.default_backend() != "tpu"
    t_tile = min(t_tile, -(-t // 8) * 8)
    t_pad = -(-t // t_tile) * t_tile

    c_pad = -(-c // LANE) * LANE
    if c_pad != c:  # lane padding, mirroring the forward
        x = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c)))
        dz = jnp.pad(dz, ((0, 0), (0, 0), (0, c_pad - c)))
        alpha_eff = jnp.pad(alpha_eff, (0, c_pad - c))
        beta_eff = jnp.pad(beta_eff, (0, c_pad - c), constant_values=1.0)
        c = c_pad

    pad_spec = ((0, 0), (HALO, HALO + (t_pad - t)), (0, 0))
    # bf16 inputs keep the adjoint banded matmuls at bf16 MXU rate (fp32
    # accumulation; snake derivatives and the α/β reductions stay fp32)
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.pad(x.astype(cdt), pad_spec, mode="edge")
    # pad grads with ZEROS: grads beyond the clip do not exist
    dzp = jnp.pad(dz.astype(cdt), pad_spec, mode="constant")

    grid = (b, t_pad // t_tile, c // LANE)
    n_t = t_pad // t_tile
    A_e, A_o, _, _ = _banded_mats(t_tile)
    B_e, B_o, C_e, C_o = _banded_mats_bwd(t_tile)
    U = t_tile + 6
    rows_in = t_tile + 2 * HALO
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda bi, ti, ci: (0, 0), memory_space=pltpu.VMEM
    )

    dx, dalpha_p, dbeta_p = pl.pallas_call(
        functools.partial(_bwd_kernel, t_tile=t_tile, cb=LANE),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), cdt),
            # partial α/β sums: 4-D with a unit axis so the (1, 1, 1, LANE)
            # block satisfies the TPU (8, 128)-tile rule ("equal to the
            # array dimension" case on the unit axis)
            jax.ShapeDtypeStruct((b, n_t, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, n_t, 1, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE), lambda bi, ti, ci: (0, 0, ci),
                         memory_space=pltpu.VMEM),
            const_spec((U, rows_in)),
            const_spec((U, rows_in)),
            const_spec((U, rows_in)),
            const_spec((U, rows_in)),
            const_spec((t_tile, U)),
            const_spec((t_tile, U)),
        ],
        out_specs=(
            pl.BlockSpec((1, t_tile, LANE), lambda bi, ti, ci: (bi, ti, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, LANE), lambda bi, ti, ci: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, LANE), lambda bi, ti, ci: (bi, ti, 0, ci),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_in, LANE), cdt),
            pltpu.VMEM((rows_in, LANE), cdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        xp, dzp,
        alpha_eff.reshape(1, 1, c), beta_eff.reshape(1, 1, c),
        jnp.asarray(A_e, cdt), jnp.asarray(A_o, cdt),
        jnp.asarray(B_e, cdt), jnp.asarray(B_o, cdt),
        jnp.asarray(C_e, cdt), jnp.asarray(C_o, cdt),
    )
    dx = dx[:, :t, :c_orig].astype(x.dtype)
    dalpha = dalpha_p.sum(axis=(0, 1, 2))[:c_orig]
    dbeta = dbeta_p.sum(axis=(0, 1, 2))[:c_orig]
    return dx, dalpha, dbeta


def _fused_forward(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray,
                   t_tile: int = 512) -> jnp.ndarray:
    """x: (B, T, C) → (B, T, C); alpha/beta are EFFECTIVE per-channel
    values (log-scaling is applied by the public wrapper).

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

    # bf16 inputs stay bf16 through the banded matmuls (4× MXU rate, fp32
    # accumulation; the snake itself is fp32 either way) — part of the
    # documented bf16-on-TPU policy divergence.  fp32 inputs are exact.
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    xp = jnp.pad(
        x.astype(cdt),
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
        functools.partial(_kernel, t_tile=t_tile, cb=LANE),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), cdt),
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
            pltpu.VMEM((t_tile + 2 * HALO, LANE), cdt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        xp,
        alpha.reshape(1, 1, c),
        beta.reshape(1, 1, c),
        jnp.asarray(A_e, cdt),
        jnp.asarray(A_o, cdt),
        jnp.asarray(D_e, cdt),
        jnp.asarray(D_o, cdt),
    )
    return out[:, :t, :c_orig].astype(x.dtype)


@jax.custom_vjp
def _core(x, alpha_eff, beta_eff):
    """C % 128 == 0 core with the fused Pallas forward AND backward."""
    return _fused_forward(x, alpha_eff, beta_eff)


def _core_fwd(x, alpha_eff, beta_eff):
    return _fused_forward(x, alpha_eff, beta_eff), (x, alpha_eff, beta_eff)


def _core_bwd(res, g):
    x, alpha_eff, beta_eff = res
    return _fused_backward(x, g, alpha_eff, beta_eff)


_core.defvjp(_core_fwd, _core_bwd)


def fused_alias_free_snake(x, alpha, beta, logscale: bool = True):
    """Fused up-FIR → snakeβ → down-FIR on (B, T, C).

    alpha/beta: (C,) raw parameters (log-space when ``logscale``; the exp
    is applied here so autodiff chains it through the core's custom VJP).
    C < 128 runs the slab-packed variant (time tiles share the lane dim,
    pure-XLA pack/unpack around the core, also differentiable)."""
    alpha_eff = jnp.exp(alpha) if logscale else alpha
    beta_eff = jnp.exp(beta) if logscale else beta
    c = x.shape[-1]
    s = max(1, LANE // c) if c < LANE else 1
    if s > 1:
        return _packed_core(x, alpha_eff, beta_eff, s)
    return _core(x, alpha_eff, beta_eff)


def _packed_core(x, alpha_eff, beta_eff, s: int):
    """Slab packing expressed in differentiable XLA around _core."""
    b, t, c = x.shape
    ts = -(-(-(-t // s)) // 8) * 8
    t_tot = s * ts
    xp = jnp.pad(
        x, ((0, 0), (HALO, HALO + (t_tot - t)), (0, 0)), mode="edge"
    )
    idx = np.arange(ts + 2 * HALO)[None, :] + ts * np.arange(s)[:, None]
    slabs = xp[:, idx, :]
    slabs = slabs.transpose(0, 2, 1, 3).reshape(b, ts + 2 * HALO, s * c)
    out = _core(slabs, jnp.tile(alpha_eff, s), jnp.tile(beta_eff, s))
    out = out.reshape(b, ts + 2 * HALO, s, c).transpose(0, 2, 1, 3)
    out = out[:, :, HALO : HALO + ts, :].reshape(b, t_tot, c)
    return out[:, :t, :]
