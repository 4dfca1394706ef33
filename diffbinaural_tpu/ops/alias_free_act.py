"""Fused anti-aliased snake activation — the Pallas TPU kernel.

This is the TPU-native equivalent of the reference's (unshipped) fused CUDA
``alias_free_activation.cuda.activation1d`` (lazy-loaded at
/root/reference/BigVGAN/bigvgan.py:95-102; torch fallback act.py:8-30):

    2× kaiser-sinc upsample → snakeβ → 2× kaiser-sinc downsample

The XLA composition (models.bigvgan.Activation1d) materialises the 2×-rate
intermediate in HBM between three ops; this kernel keeps everything on-chip:
one HBM read of x, one write of z.

Index algebra (derived from filter.py:30-101 + resample.py:10-58 with
ratio=2, kernel_size=12, replicate padding; h = kaiser_sinc taps):

  up (crop arithmetic folded in, ×2 gain):
    y_even[t] = 2·Σ_{s=-3..2} x[t+s]·h[5-2s]     (odd taps, reversed)
    y_odd[t]  = 2·Σ_{s=-2..3} x[t+s]·h[6-2s]     (even taps, reversed)
  mid = snakeβ(y) = y + sin²(α·y)/β
  down (pad_left 5, pad_right 6, stride 2):
    z[t] = Σ_{r=0..5} mid_e[t+r-2]·h[2r+1] + mid_o[t+r-3]·h[2r]

so z[t] touches x[t-5 .. t+5]; the input is edge-padded once in HBM, which
supplies both the tile halos and the reference's replicate-pad boundary
semantics.

Kernel structure (v3):

  * Two execution modes, chosen by channel count:
    - **MXU mode** (C ≥ 48): the four FIR stages run as banded matmuls
      (A_e/A_o: up, D_e/D_o: down) on the otherwise-idle MXU, with the D
      stage split into two row-halves so the fp32 snake of one half (VPU)
      overlaps the down-matmul of the other — dependency-driven
      MXU/VPU pipelining inside each tile.  Channels lane-pad to 128.
    - **VPU mode** (C = 24 tail stage, where 128-lane padding would waste
      5.3×): 6-tap shifted fused-multiply-adds with the channel axis
      TIME-FOLDED into lanes — (B, T, C) → (B, T/R, R·C) is a free
      row-major reinterpretation, and a time shift τ becomes a
      (row-shift, lane-rotation) pair, so the stage runs with 384 active
      lanes.
  * Tiles stream straight from the padded input: window i = rows
    [i·tt, (i+1)·tt) read in place by the BlockSpec pipeline (automatic
    double buffering) ⊕ a 2·HR-row tail-halo strip from a tiny side tensor
    (2·HR/tt ≈ 3% of the array).  Earlier versions materialised full
    overlapping windows in HBM first; that copy (plus an extra spare-tile
    pad) was measured to cost as much XLA glue time as the kernels
    themselves on the narrow stages.

Both directions are fused: the backward runs the adjoint FIRs (transposed
banded matrices / reversed taps), the snake local derivatives, and the
per-channel α/β partial reductions in one kernel.  α/β partials are
accumulated only over each tile's OWN lattice rows (an earlier kernel also
summed halo rows, which double-counted tile-seam contributions).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..signal.filters import kaiser_sinc_filter1d
from ._interpret import pallas_interpret

RATIO = 2
KSIZE = 12
LANE = 128
MAX_LANES = 512  # widest folded tile (VMEM budget for f32 intermediates)

# Forward-path sin² implementation (measurement knob; the backward always
# uses the exact sine).  'exact' (default) = hardware/XLA sine.  'fast' =
# range-reduced even cosine polynomial via sin²x = (1 − cos 2x)/2 — max
# abs err 1.1e-8 over a full period, ~11 VPU FMAs, no transcendental.
# 'none' = cheap algebraic stand-in with the same dataflow — WRONG MATH,
# exists only so benchmarks/micro.py can attribute VPU time between the
# transcendental and the FIR shift/FMA lattice.
# Default "fast": the cosine-polynomial sin² measured ~30% faster than the
# hardware-exact transcendental across every production stage (v5e,
# micro.py actsin 2026-08-19: 0.725→0.505 ms @ C=768, 1.021→0.633 @ 384,
# 1.294→0.865 @ 96, 1.788→1.353 @ 24) and within ≈0 of 'none' (sin is
# free once polynomialised; the remaining VPU time is the FIR lattice).
# bf16 outputs were bit-identical to "exact" on the same sweep.
_SIN_IMPL = os.environ.get("DIFFBINAURAL_AFA_SIN", "fast")

# cos(r) on [−π, π] as an even polynomial in r² (lstsq on Chebyshev nodes;
# max abs err 1.1e-8)
_COS_POLY = (
    0.99999998908466015, -0.49999989100466885, 0.041666489215201247,
    -0.001388780359767686, 2.4769883572074907e-05,
    -2.7079030890855105e-07, 1.724509135371723e-09,
)


def _sin_sq(x):
    """sin²(x) under the _SIN_IMPL mode (see module constant above)."""
    if _SIN_IMPL == "none":
        return 0.25 * x * x
    if _SIN_IMPL == "fast":
        u = 2.0 * x
        k = jnp.round(u * (0.5 / np.pi))
        r = u - k * (2.0 * np.pi)
        r2 = r * r
        cos = _COS_POLY[-1]
        for coef in _COS_POLY[-2::-1]:
            cos = cos * r2 + coef
        return 0.5 - 0.5 * cos
    s = jnp.sin(x)
    return s * s


@functools.lru_cache(maxsize=1)
def _taps():
    """(we2, wo2, he, ho): up-FIR phase taps (×2 gain folded in) and
    down-FIR phase taps, as plain python floats (baked into kernels)."""
    h = kaiser_sinc_filter1d(0.5 / RATIO, 0.6 / RATIO, KSIZE).astype(np.float64)
    we2 = [2.0 * float(h[5 - 2 * s]) for s in range(-3, 3)]   # y_even, s=-3..2
    wo2 = [2.0 * float(h[6 - 2 * s]) for s in range(-2, 4)]   # y_odd,  s=-2..3
    he = [float(h[2 * r + 1]) for r in range(6)]
    ho = [float(h[2 * r]) for r in range(6)]
    return we2, wo2, he, ho


def _fold_factor(c: int) -> int:
    """Largest R with (R·C) % 128 == 0 and R·C ≤ MAX_LANES (else 1)."""
    best = 1 if c % LANE == 0 else 0
    for r in range(2, MAX_LANES + 1):
        if r * c > MAX_LANES:
            break
        if (r * c) % LANE == 0:
            best = r
    return max(best, 1) if best else 0


def _geometry(c: int):
    """(R, L, HY, HR): fold factor, folded lane count, y-lattice halo rows,
    x-window halo rows.  HY covers the ±3-tap up/down reach (+1 row for the
    lane-rotation carry).  HR is pinned to 8 rows — always enough for the
    full ±8-sample stencil, and sublane-aligned so the head/main/tail
    window pieces concatenate on 8-row boundaries inside the kernel."""
    r = _fold_factor(c)
    if r == 0:  # C not foldable to a 128 multiple → caller lane-pads
        return 0, 0, 0, 0
    hy = -(-4 // r)  # ceil(4/R)
    return r, r * c, hy, 8


@functools.lru_cache(maxsize=8)
def _banded_fwd_mats(t_tile: int, HY: int, HR: int):
    """Banded FIR matrices for the MXU mode (R=1 coordinates):

      y_e = A_e·xw, y_o = A_o·xw   A: (RY, W),  y row u ↔ xw row HR−HY+u+s
      z   = D_e·mid_e + D_o·mid_o  D: (t_tile, RY), z row t ↔ mid HY+t+δ
    """
    we2, wo2, he, ho = _taps()
    RY = t_tile + 2 * HY
    W = t_tile + 2 * HR
    A_e = np.zeros((RY, W), np.float32)
    A_o = np.zeros((RY, W), np.float32)
    for u in range(RY):
        for s in range(-3, 3):
            A_e[u, HR - HY + u + s] = we2[s + 3]
        for s in range(-2, 4):
            A_o[u, HR - HY + u + s] = wo2[s + 2]
    D_e = np.zeros((t_tile, RY), np.float32)
    D_o = np.zeros((t_tile, RY), np.float32)
    for t in range(t_tile):
        for r in range(6):
            D_e[t, HY + t + r - 2] = he[r]
            D_o[t, HY + t + r - 3] = ho[r]
    return A_e, A_o, D_e, D_o


@functools.lru_cache(maxsize=8)
def _banded_bwd_mats(t_tile: int, HY: int, HR: int):
    """Adjoint banded matrices:

      dmid_e = B_e·dzw, dmid_o = B_o·dzw   B: (RY, W)
      dx     = C_e·dy_e + C_o·dy_o         C: (t_tile, RY)
    """
    we2, wo2, he, ho = _taps()
    RY = t_tile + 2 * HY
    W = t_tile + 2 * HR
    B_e = np.zeros((RY, W), np.float32)
    B_o = np.zeros((RY, W), np.float32)
    for m in range(RY):
        for r in range(6):
            B_e[m, HR - HY + m - r + 2] = he[r]
            B_o[m, HR - HY + m - r + 3] = ho[r]
    C_e = np.zeros((t_tile, RY), np.float32)
    C_o = np.zeros((t_tile, RY), np.float32)
    for t in range(t_tile):
        for s in range(-3, 3):
            C_e[t, HY + t - s] = we2[s + 3]
        for s in range(-2, 4):
            C_o[t, HY + t - s] = wo2[s + 2]
    return B_e, B_o, C_e, C_o


def _assemble(refs):
    """Window pieces → (W, chunk).  Padded plan: (main, tail-2HR).
    Padless plan: (head-HR, main, tail-HR)."""
    if len(refs) == 3:
        return jnp.concatenate([refs[0][0, 0], refs[1][0], refs[2][0, 0]],
                               axis=0)
    return jnp.concatenate([refs[0][0], refs[1][0, 0]], axis=0)


def _fwd_kernel_mxu(*refs, t_tile, HY, split_at, pieces):
    """Banded-matmul forward: up-FIR (MXU) → snakeβ per half (VPU) →
    down-FIR half (MXU), halves forming independent chains so the
    scheduler overlaps one half's snake with the other's matmul."""
    alpha_ref, invb_ref = refs[pieces], refs[pieces + 1]
    ae_ref, ao_ref, det_ref, dot_ref, deb_ref, dob_ref = refs[
        pieces + 2: pieces + 8
    ]
    out_ref = refs[-1]
    xw = _assemble(refs[:pieces])  # (W, chunk) cdt
    cdt = xw.dtype
    alpha = alpha_ref[0]
    inv_beta = invb_ref[0]
    y_e = jnp.dot(ae_ref[:], xw, preferred_element_type=jnp.float32)
    y_o = jnp.dot(ao_ref[:], xw, preferred_element_type=jnp.float32)

    def snk(y):
        return y + inv_beta * _sin_sq(y * alpha)

    t2 = split_at
    h1 = t2 + HY + 3        # mid rows needed by the top D half
    h1b = HY + t2 - 3       # first mid row needed by the bottom half (D_o)
    me_t = snk(y_e[:h1]).astype(cdt)
    mo_t = snk(y_o[:h1]).astype(cdt)
    z_top = jnp.dot(det_ref[:], me_t, preferred_element_type=jnp.float32)
    z_top = z_top + jnp.dot(dot_ref[:], mo_t,
                            preferred_element_type=jnp.float32)
    me_b = snk(y_e[h1b:]).astype(cdt)
    mo_b = snk(y_o[h1b:]).astype(cdt)
    z_bot = jnp.dot(deb_ref[:], me_b, preferred_element_type=jnp.float32)
    z_bot = z_bot + jnp.dot(dob_ref[:], mo_b,
                            preferred_element_type=jnp.float32)
    out_ref[0, 0] = jnp.concatenate([z_top, z_bot], axis=0).astype(
        out_ref.dtype
    )


def _bwd_kernel_mxu(*refs, t_tile, HY, pieces):
    alpha_ref, invb_ref = refs[2 * pieces], refs[2 * pieces + 1]
    ae_ref, ao_ref, be_ref, bo_ref, ce_ref, co_ref = refs[
        2 * pieces + 2: 2 * pieces + 8
    ]
    dx_ref, da_ref, db_ref = refs[-3:]
    xw = _assemble(refs[:pieces])
    dzw = _assemble(refs[pieces: 2 * pieces])
    cdt = xw.dtype
    alpha = alpha_ref[0]
    inv_beta = invb_ref[0]

    y_e = jnp.dot(ae_ref[:], xw, preferred_element_type=jnp.float32)
    y_o = jnp.dot(ao_ref[:], xw, preferred_element_type=jnp.float32)
    dmid_e = jnp.dot(be_ref[:], dzw, preferred_element_type=jnp.float32)
    dmid_o = jnp.dot(bo_ref[:], dzw, preferred_element_type=jnp.float32)

    def parts(y, dmid):
        s2 = jnp.sin(2.0 * alpha * y)
        dy = dmid * (1.0 + alpha * s2 * inv_beta)
        da = dmid * (y * s2 * inv_beta)
        db = dmid * (-(jnp.sin(alpha * y) ** 2) * inv_beta * inv_beta)
        return dy, da, db

    dy_e, da_e, db_e = parts(y_e, dmid_e)
    dy_o, da_o, db_o = parts(y_o, dmid_o)

    dx = jnp.dot(ce_ref[:], dy_e.astype(cdt),
                 preferred_element_type=jnp.float32)
    dx = dx + jnp.dot(co_ref[:], dy_o.astype(cdt),
                      preferred_element_type=jnp.float32)
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    RY = t_tile + 2 * HY
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (RY, 1), 0)
    own_lo = jnp.where(ti == 0, 0, HY)
    own_hi = jnp.where(ti == n_t - 1, RY, HY + t_tile)
    own = jnp.logical_and(rows >= own_lo, rows < own_hi)
    da_ref[0, 0] = jnp.where(own, da_e + da_o, 0.0).sum(axis=0)[None]
    db_ref[0, 0] = jnp.where(own, db_e + db_o, 0.0).sum(axis=0)[None]


def _tshift(arr, tau: int, base: int, rows: int, R: int, C: int):
    """Time-shift by τ on a time-folded (rows_in, R·C) array: static
    row-shifted slice + (for τ % R ≠ 0) a lane rotation with row carry.

    The rotation is expressed as select-then-roll (result[l] =
    l < L-cut ? a[l+cut] : b[l+cut-L]) because Mosaic lowers lane
    ``tpu.rotate`` but not misaligned lane concatenation."""
    delta, rho = divmod(tau, R)
    lo = base + delta
    a = jax.lax.slice_in_dim(arr, lo, lo + rows, axis=0)
    if rho == 0:
        return a
    b = jax.lax.slice_in_dim(arr, lo + 1, lo + 1 + rows, axis=0)
    cut = rho * C
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, arr.shape[1]), 1)
    merged = jnp.where(lane < cut, b, a)
    return pltpu.roll(merged, arr.shape[1] - cut, axis=1)


def _up_snake(xw, alpha, inv_beta, t_tile, HY, HR, R, C):
    """Shared by fwd/bwd: x window → (y_e, y_o, mid_e, mid_o) on the
    RY = t_tile + 2·HY row lattice."""
    we2, wo2, _, _ = _taps()
    RY = t_tile + 2 * HY
    base = HR - HY
    sh = {t: _tshift(xw, t, base, RY, R, C) for t in range(-3, 4)}
    y_e = we2[0] * sh[-3]
    y_o = wo2[0] * sh[-2]
    for i in range(1, 6):
        y_e = y_e + we2[i] * sh[i - 3]
        y_o = y_o + wo2[i] * sh[i - 2]
    mid_e = y_e + inv_beta * _sin_sq(y_e * alpha)
    mid_o = y_o + inv_beta * _sin_sq(y_o * alpha)
    return y_e, y_o, mid_e, mid_o


def _fwd_kernel(*refs, t_tile, HY, HR, R, C, pieces):
    _, _, he, ho = _taps()
    alpha_ref, invb_ref = refs[pieces], refs[pieces + 1]
    out_ref = refs[-1]
    xw = _assemble(refs[:pieces]).astype(jnp.float32)
    alpha = alpha_ref[0]
    inv_beta = invb_ref[0]
    _, _, mid_e, mid_o = _up_snake(xw, alpha, inv_beta, t_tile, HY, HR, R, C)
    z = he[0] * _tshift(mid_e, -2, HY, t_tile, R, C)
    z = z + ho[0] * _tshift(mid_o, -3, HY, t_tile, R, C)
    for r in range(1, 6):
        z = z + he[r] * _tshift(mid_e, r - 2, HY, t_tile, R, C)
        z = z + ho[r] * _tshift(mid_o, r - 3, HY, t_tile, R, C)
    out_ref[0, 0] = z.astype(out_ref.dtype)


def _bwd_kernel(*refs, t_tile, HY, HR, R, C, pieces):
    we2, wo2, he, ho = _taps()
    alpha_ref, invb_ref = refs[2 * pieces], refs[2 * pieces + 1]
    dx_ref, da_ref, db_ref = refs[-3:]
    xw = _assemble(refs[:pieces]).astype(jnp.float32)
    dzw = _assemble(refs[pieces: 2 * pieces]).astype(jnp.float32)
    alpha = alpha_ref[0]
    inv_beta = invb_ref[0]

    y_e, y_o, _, _ = _up_snake(xw, alpha, inv_beta, t_tile, HY, HR, R, C)

    # adjoint of the down-FIR: dmid_e[u] = Σ_r dz[u-r+2]·he[r],
    #                          dmid_o[u] = Σ_r dz[u-r+3]·ho[r]
    RY = t_tile + 2 * HY
    base = HR - HY
    dsh = {t: _tshift(dzw, t, base, RY, R, C) for t in range(-3, 4)}
    dmid_e = he[0] * dsh[2]
    dmid_o = ho[0] * dsh[3]
    for r in range(1, 6):
        dmid_e = dmid_e + he[r] * dsh[2 - r]
        dmid_o = dmid_o + ho[r] * dsh[3 - r]

    # snakeβ local derivatives: mid = y + sin²(αy)/β
    def parts(y, dmid):
        s2 = jnp.sin(2.0 * alpha * y)
        dy = dmid * (1.0 + alpha * s2 * inv_beta)
        da = dmid * (y * s2 * inv_beta)
        db = dmid * (-(jnp.sin(alpha * y) ** 2) * inv_beta * inv_beta)
        return dy, da, db

    dy_e, da_e, db_e = parts(y_e, dmid_e)
    dy_o, da_o, db_o = parts(y_o, dmid_o)

    # adjoint of the up-FIR: dx[t] = Σ_s dy_e[t-s]·we2[s+3] + dy_o[t-s]·wo2[s+2]
    dx = we2[0] * _tshift(dy_e, 3, HY, t_tile, R, C)
    dx = dx + wo2[0] * _tshift(dy_o, 2, HY, t_tile, R, C)
    for i in range(1, 6):
        dx = dx + we2[i] * _tshift(dy_e, 3 - i, HY, t_tile, R, C)
        dx = dx + wo2[i] * _tshift(dy_o, 2 - i, HY, t_tile, R, C)
    dx_ref[0, 0] = dx.astype(dx_ref.dtype)

    # α/β partials over THIS tile's own lattice rows only (interior halo
    # rows belong to the neighbouring tile — summing them double-counts
    # seams).  The first/last tiles DO own their outer halo rows: the
    # clip-edge lattice (replicated input, real dz within FIR reach)
    # contributes to dα/dβ exactly as in the unfused composition.
    RY = t_tile + 2 * HY
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (RY, 1), 0)
    own_lo = jnp.where(ti == 0, 0, HY)
    own_hi = jnp.where(ti == n_t - 1, RY, HY + t_tile)
    own = jnp.logical_and(rows >= own_lo, rows < own_hi)
    da_ref[0, 0] = jnp.where(own, da_e + da_o, 0.0).sum(axis=0)[None]
    db_ref[0, 0] = jnp.where(own, db_e + db_o, 0.0).sum(axis=0)[None]


def _divisor_tile(rows: int, cap: int) -> int:
    """Largest divisor of ``rows`` that is a multiple of 8, ≤ cap and ≥ 64
    (bounding the halo fraction), or 0 if none exists."""
    best = 0
    for tt in range(64, min(cap, rows) + 1, 8):
        if rows % tt == 0:
            best = tt
    return best


def _plan(x, bwd: bool = False):
    """Common layout planning: mode choice, lane padding/fold, window
    geometry.  MXU mode lane-pads to 128 and runs banded matmuls; VPU mode
    (narrow C, or tiny T) time-folds channels into lanes.  The VPU
    backward keeps ~2× the live f32 intermediates, so it runs half the
    forward's row tile to stay inside VMEM.

    When the fold is free (t % R == 0, no lane pad) and the folded row
    count has a usable divisor tile, the plan goes **padless**: the main
    tiles read the raw reshaped input in place and the clip-edge
    replication lives only in tiny XLA-built halo strips — no whole-array
    pad copy at all."""
    b, t, c = x.shape
    # measured on v5e: banded-MXU wins only at full lane occupancy; any
    # lane padding (C=192/96/48) loses to the time-folded VPU path
    mode = "mxu" if c % LANE == 0 else "vpu"
    if mode == "mxu" and -(-t // 8) * 8 < 16:
        mode = "vpu"  # too few rows to split the down-FIR halves
    if mode == "mxu":
        c_pad = c
        R, L, HY, HR = 1, c, 4, 8
        chunk = LANE
        cap = 512
    else:
        c_pad = c if _fold_factor(c) else -(-c // LANE) * LANE
        R, L, HY, HR = _geometry(c_pad)
        chunk = L
        cap = (512 if L <= 384 else 256) // (2 if bwd else 1)
    P = HR * R
    rows_valid = -(-t // R)
    padless = False
    t_tile = 0
    if c_pad == c and t % R == 0:
        t_tile = _divisor_tile(rows_valid, cap)
        padless = t_tile > 0
    if not padless:
        t_tile = min(cap, -(-rows_valid // 8) * 8)
    n_t = rows_valid // t_tile if padless else -(-rows_valid // t_tile)
    # padded path: exactly the rows the main tiles + the last tail halo touch
    total_t = t if padless else (n_t * t_tile + 2 * HR) * R
    W = t_tile + 2 * HR
    split_at = (t_tile // 16) * 8 if t_tile >= 16 else t_tile
    return dict(b=b, t=t, c=c, c_pad=c_pad, R=R, L=L, HY=HY, HR=HR, P=P,
                t_tile=t_tile, n_t=n_t, total_t=total_t, W=W, mode=mode,
                chunk=chunk, split_at=split_at, padless=padless)


def _fold_rows(xp, g):
    """(B, total_t, c_pad) padded input → the free row-major
    reinterpretation (B, total_t/R, R·c_pad) the tile pipeline reads in
    place: window i's first t_tile rows are exactly row-block i."""
    return xp.reshape(g["b"], g["total_t"] // g["R"], g["L"])


def _halo_strips(xf, g):
    """(B, total_rows, L) → (B, n_t, 2·HR, L): window i's tail halo, rows
    [(i+1)·tt, (i+1)·tt + 2·HR).  A stack of n_t tiny 2·HR-row slices
    (XLA fuses them into one copy of ≈ 2·HR/tt ≈ 3% of the array) — the
    main t_tile rows are NOT copied; the kernel reads them straight from
    the padded input via its own BlockSpec."""
    nt, tt, hr = g["n_t"], g["t_tile"], g["HR"]
    return jnp.stack(
        [
            jax.lax.slice_in_dim(xf, (i + 1) * tt, (i + 1) * tt + 2 * hr, axis=1)
            for i in range(nt)
        ],
        axis=1,
    )


def _edge_halos(xf, x, g, edge: bool):
    """Padless-plan halo strips, 2 × (B, n_t, HR, L).

    head[i] = folded rows [i·tt − HR, i·tt); head[0] = the clip-edge rows
    (each the first sample tiled R× across lanes when ``edge``, zeros for
    gradients).  tail[i] = rows [(i+1)·tt, (i+1)·tt + HR); tail[n_t−1] =
    last-sample replica rows (or zeros).  Strip bytes ≈ 2·HR/tt of the
    array — the edge semantics live HERE, so the bulk input needs no pad
    copy at all."""
    b, nt, tt = g["b"], g["n_t"], g["t_tile"]
    hr, L, R = g["HR"], g["L"], g["R"]
    if edge:
        first = jnp.tile(x[:, :1, :], (1, 1, R))  # (B, 1, L): [x₀]·R folded
        last = jnp.tile(x[:, -1:, :], (1, 1, R))
    else:
        first = jnp.zeros((b, 1, L), xf.dtype)
        last = first
    head0 = jnp.broadcast_to(first[:, :, None], (b, 1, hr, L))
    tail_n = jnp.broadcast_to(last[:, :, None], (b, 1, hr, L))
    heads = [head0] + [
        xf[:, i * tt - hr: i * tt][:, None] for i in range(1, nt)
    ]
    tails = [
        xf[:, (i + 1) * tt: (i + 1) * tt + hr][:, None] for i in range(nt - 1)
    ] + [tail_n]
    return jnp.concatenate(heads, axis=1), jnp.concatenate(tails, axis=1)


def _window_pieces(x, g, edge: bool, cdt):
    """The window read plan → (operands, in_specs).

    Padless: [head-HR strip, raw reshaped input read in place, tail-HR
    strip].  Padded: [padded input read in place, tail-2HR strip]."""
    ck = g["chunk"]
    main_spec = pl.BlockSpec((1, g["t_tile"], ck),
                             lambda bi, ti, ci: (bi, ti, ci))
    xc = x.astype(cdt)
    if g["padless"]:
        xf = _fold_rows(xc, g)
        head, tail = _edge_halos(xf, xc, g, edge)
        strip = pl.BlockSpec((1, 1, g["HR"], ck),
                             lambda bi, ti, ci: (bi, ti, 0, ci))
        return [head, xf, tail], [strip, main_spec, strip]
    xf = _fold_rows(_pad_fold(xc, g, "edge" if edge else "constant"), g)
    strip2 = pl.BlockSpec((1, 1, 2 * g["HR"], ck),
                          lambda bi, ti, ci: (bi, ti, 0, ci))
    return [xf, _halo_strips(xf, g)], [main_spec, strip2]


def _pad_fold(x, g, mode):
    """Lane-pad to c_pad, edge/zero-pad time to total_t (P leading).

    The time pad is built as broadcast(edge-row) ⊕ x ⊕ broadcast(edge-row)
    concatenation: ``jnp.pad(mode='edge')`` lowers to a clamped-gather
    fusion that re-streams the whole array at ~19 GB/s and was measured to
    cost as much as the fused kernel itself (profiled: pad_maximum_fusion
    0.56 ms vs kernel 0.78 ms per stage-1 act call); plain concat copies
    run at full HBM bandwidth."""
    if g["c_pad"] != g["c"]:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, g["c_pad"] - g["c"])))
    b, _, c = x.shape
    tail = g["total_t"] - g["P"] - g["t"]
    if mode == "edge":
        head = jnp.broadcast_to(x[:, :1], (b, g["P"], c))
        back = jnp.broadcast_to(x[:, -1:], (b, tail, c))
    else:
        head = jnp.zeros((b, g["P"], c), x.dtype)
        back = jnp.zeros((b, tail, c), x.dtype)
    return jnp.concatenate([head, x, back], axis=1)


def _lane_params(alpha_eff, beta_eff, g):
    """(C,) effective α/β → (1, L) folded rows (α tiled; 1/(β+ε) precomputed)."""
    if g["c_pad"] != g["c"]:
        alpha_eff = jnp.pad(alpha_eff, (0, g["c_pad"] - g["c"]))
        beta_eff = jnp.pad(beta_eff, (0, g["c_pad"] - g["c"]),
                           constant_values=1.0)
    alpha = jnp.tile(alpha_eff, g["R"]).reshape(1, g["L"])
    inv_beta = jnp.tile(1.0 / (beta_eff + 1e-9), g["R"]).reshape(1, g["L"])
    return alpha.astype(jnp.float32), inv_beta.astype(jnp.float32)


def _unfold(out, g, dtype):
    """(B, n_t, t_tile, L) → (B, T, C)."""
    out = out.reshape(g["b"], g["n_t"] * g["t_tile"] * g["R"], g["c_pad"])
    return out[:, : g["t"], : g["c"]].astype(dtype)


def _fused_forward(x: jnp.ndarray, alpha_eff, beta_eff) -> jnp.ndarray:
    """x: (B, T, C) → (B, T, C); α/β are EFFECTIVE per-channel values
    (log-scaling applied by the public wrapper).

    Boundary note: clip edges (outer ≤3 samples) evaluate the continued FIR
    on the replicated input rather than the reference's clamped
    intermediate — interior samples match the XLA composition."""
    g = _plan(x)
    interpret = pallas_interpret()  # CPU tests run interpreted
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    x_ops, x_specs = _window_pieces(x, g, True, cdt)
    alpha, inv_beta = _lane_params(alpha_eff, beta_eff, g)

    ck = g["chunk"]
    par_spec = pl.BlockSpec((1, ck), lambda bi, ti, ci: (0, ci))
    out_spec = pl.BlockSpec((1, 1, g["t_tile"], ck),
                            lambda bi, ti, ci: (bi, ti, 0, ci))
    grid = (g["b"], g["n_t"], g["L"] // ck)
    out_shape = jax.ShapeDtypeStruct(
        (g["b"], g["n_t"], g["t_tile"], g["L"]), cdt
    )
    const = lambda a: pl.BlockSpec(a.shape, lambda bi, ti, ci: (0, 0))

    if g["mode"] == "mxu":
        A_e, A_o, D_e, D_o = _banded_fwd_mats(g["t_tile"], g["HY"], g["HR"])
        t2 = g["split_at"]
        h1 = t2 + g["HY"] + 3
        h1b = g["HY"] + t2 - 3
        mats = [A_e, A_o, D_e[:t2, :h1], D_o[:t2, :h1],
                D_e[t2:, h1b:], D_o[t2:, h1b:]]
        mats = [jnp.asarray(m_, cdt) for m_ in mats]
        kern = functools.partial(
            _fwd_kernel_mxu, t_tile=g["t_tile"], HY=g["HY"],
            split_at=t2, pieces=len(x_ops),
        )
        out = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=grid,
            in_specs=x_specs + [par_spec, par_spec]
            + [const(m_) for m_ in mats],
            out_specs=out_spec,
            interpret=interpret,
        )(*x_ops, alpha, inv_beta, *mats)
    else:
        kern = functools.partial(
            _fwd_kernel, t_tile=g["t_tile"], HY=g["HY"], HR=g["HR"],
            R=g["R"], C=g["c_pad"], pieces=len(x_ops),
        )
        out = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=grid,
            in_specs=x_specs + [par_spec, par_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(*x_ops, alpha, inv_beta)
    return _unfold(out, g, x.dtype)


def _fused_backward(x, dz, alpha_eff, beta_eff):
    """Adjoint of the fused op wrt (x, effective α, effective β).

    The edge-replication adjoint's scatter back into the clip's first/last
    samples is dropped (matches the forward's documented boundary
    convention; ≤8 outer samples)."""
    g = _plan(x, bwd=True)
    interpret = pallas_interpret()
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    x_ops, x_specs = _window_pieces(x, g, True, cdt)
    # grad boundary fill is ZEROS: grads beyond the clip do not exist
    dz_ops, dz_specs = _window_pieces(dz, g, False, cdt)
    alpha, inv_beta = _lane_params(alpha_eff, beta_eff, g)

    ck = g["chunk"]
    par_spec = pl.BlockSpec((1, ck), lambda bi, ti, ci: (0, ci))
    grid = (g["b"], g["n_t"], g["L"] // ck)
    out_shapes = (
        jax.ShapeDtypeStruct((g["b"], g["n_t"], g["t_tile"], g["L"]), cdt),
        # per-tile α/β partial sums; the unit sublane axis satisfies the
        # TPU tile rule ("equal to the array dimension" case)
        jax.ShapeDtypeStruct((g["b"], g["n_t"], 1, g["L"]), jnp.float32),
        jax.ShapeDtypeStruct((g["b"], g["n_t"], 1, g["L"]), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, 1, g["t_tile"], ck),
                     lambda bi, ti, ci: (bi, ti, 0, ci)),
        pl.BlockSpec((1, 1, 1, ck), lambda bi, ti, ci: (bi, ti, 0, ci)),
        pl.BlockSpec((1, 1, 1, ck), lambda bi, ti, ci: (bi, ti, 0, ci)),
    )
    const = lambda a: pl.BlockSpec(a.shape, lambda bi, ti, ci: (0, 0))

    if g["mode"] == "mxu":
        A_e, A_o, _, _ = _banded_fwd_mats(g["t_tile"], g["HY"], g["HR"])
        B_e, B_o, C_e, C_o = _banded_bwd_mats(g["t_tile"], g["HY"], g["HR"])
        mats = [jnp.asarray(m_, cdt) for m_ in (A_e, A_o, B_e, B_o, C_e, C_o)]
        kern = functools.partial(
            _bwd_kernel_mxu, t_tile=g["t_tile"], HY=g["HY"],
            pieces=len(x_ops),
        )
        dx, da_p, db_p = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            grid=grid,
            in_specs=x_specs + dz_specs + [par_spec, par_spec]
            + [const(m_) for m_ in mats],
            out_specs=out_specs,
            interpret=interpret,
        )(*x_ops, *dz_ops, alpha, inv_beta, *mats)
    else:
        kern = functools.partial(
            _bwd_kernel, t_tile=g["t_tile"], HY=g["HY"], HR=g["HR"],
            R=g["R"], C=g["c_pad"], pieces=len(x_ops),
        )
        dx, da_p, db_p = pl.pallas_call(
            kern,
            out_shape=out_shapes,
            grid=grid,
            in_specs=x_specs + dz_specs + [par_spec, par_spec],
            out_specs=out_specs,
            interpret=interpret,
        )(*x_ops, *dz_ops, alpha, inv_beta)

    dx = _unfold(dx, g, x.dtype)
    # fold the R phase copies and the lane padding back to (C,)
    da = da_p.sum(axis=(0, 1, 2)).reshape(g["R"], g["c_pad"]).sum(axis=0)
    db = db_p.sum(axis=(0, 1, 2)).reshape(g["R"], g["c_pad"]).sum(axis=0)
    return dx, da[: g["c"]], db[: g["c"]]


@jax.custom_vjp
def _core(x, alpha_eff, beta_eff):
    """Fused Pallas forward AND backward on (B, T, C), any C."""
    return _fused_forward(x, alpha_eff, beta_eff)


def _core_fwd(x, alpha_eff, beta_eff):
    return _fused_forward(x, alpha_eff, beta_eff), (x, alpha_eff, beta_eff)


def _core_bwd(res, grad):
    x, alpha_eff, beta_eff = res
    return _fused_backward(x, grad, alpha_eff, beta_eff)


_core.defvjp(_core_fwd, _core_bwd)


def fused_alias_free_snake(x, alpha, beta, logscale: bool = True):
    """Fused up-FIR → snakeβ → down-FIR on (B, T, C).

    alpha/beta: (C,) raw parameters (log-space when ``logscale``; the exp
    is applied here so autodiff chains it through the core's custom VJP).
    Narrow C runs time-folded into lanes inside the core."""
    alpha_eff = jnp.exp(alpha) if logscale else alpha
    beta_eff = jnp.exp(beta) if logscale else beta
    return _core(x, alpha_eff, beta_eff)
