"""Fused anti-aliased snake → Conv1d — Pallas TPU kernel (MXU stages).

Fuses the two hottest ops of every AMP-block branch
(/root/reference/BigVGAN/bigvgan.py:31-147: ``xt = activation(x);
xt = conv(xt)``) into one kernel for the full-lane stages (C % 128 == 0,
i.e. the 768- and 384-channel stages that hold ~3/4 of the AMP conv
FLOPs):

    2× kaiser-sinc up-FIR → snakeβ → 2× down-FIR → k-tap dilated Conv1d

The XLA composition writes the activation output to HBM and reads it back
for the convolution; profiling also showed the conv itself running ~5× off
the MXU matmul floor.  Here the activation lattice ``z`` stays in a VMEM
scratch and the convolution runs as k shifted (t_tile, C)·(C, co_chunk)
matmuls — contraction depth C ≥ 384 keeps the MXU at full occupancy.

Grid: ``(batch, row-tiles, output-channel chunks)`` with the chunk axis
innermost; the activation is computed ONCE per row tile (at co == 0) into
the scratch and reused by every output chunk, and the conv weights stream
in (k·C, co_chunk) blocks so VMEM stays bounded for any kernel size.

Boundary semantics: the activation follows ops.alias_free_act's documented
clip-edge convention (continued FIR on the replicated input, ≤3 outer
samples); the convolution's zero padding is EXACT — lattice rows outside
the clip are zeroed in-kernel before the tap matmuls, matching
``lax.conv_general_dilated``'s SAME zero padding.

Backward: the custom VJP recomputes through the unfused pair — the fused
alias-free activation core (which has its own fused backward kernel) and
the XLA convolution — trading one cheap forward recompute for not keeping
``z`` as a residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import alias_free_act as afa
from ._interpret import pallas_interpret

LANE = 128
CO_CHUNK = 128
T_TILE_CAP = 256  # full-C rows per tile; bounded by ~16 MB VMEM


def snake_conv_eligible(c_in: int, c_out: int, kernel_size: int,
                        stride: int = 1) -> bool:
    """The fused kernel handles square full-lane channels, odd taps,
    unit stride (the AMP-block configuration)."""
    return (
        c_in == c_out
        and c_in % LANE == 0
        and kernel_size % 2 == 1
        and stride == 1
    )


def _plan(x, kernel_size: int, dilation: int):
    """Row-tile geometry for the conv-extended halo.

    HZ extra lattice rows feed the conv taps; the x window needs the
    activation's own ±8-row reach on top, rounded to sublanes."""
    b, t, c = x.shape
    HZ = (kernel_size - 1) // 2 * dilation
    HR = -(-(HZ + 8) // 8) * 8
    HY = 4
    rows = t  # R = 1 at full lanes
    padless = False
    t_tile = afa._divisor_tile(rows, T_TILE_CAP)
    if t_tile:
        padless = True
    else:
        t_tile = min(T_TILE_CAP, -(-rows // 8) * 8)
    n_t = rows // t_tile if padless else -(-rows // t_tile)
    total_t = t if padless else n_t * t_tile + 2 * HR
    return dict(b=b, t=t, c=c, c_pad=c, R=1, L=c, HY=HY, HR=HR, HZ=HZ,
                P=HR, t_tile=t_tile, n_t=n_t, total_t=total_t,
                mode="mxu", chunk=c, padless=padless)


def _kernel(*refs, t_tile, HY, HZ, k, dilation, t_rows, c, pieces):
    alpha_ref, invb_ref = refs[pieces], refs[pieces + 1]
    ae_ref, ao_ref, de_ref, do_ref = refs[pieces + 2: pieces + 6]
    w_ref, b_ref = refs[pieces + 6], refs[pieces + 7]
    out_ref, z_scr = refs[-2], refs[-1]

    ti = pl.program_id(1)
    co = pl.program_id(2)

    @pl.when(co == 0)
    def _compute_lattice():
        xw = afa._assemble(refs[:pieces])  # (W, C) cdt
        alpha = alpha_ref[0]
        inv_beta = invb_ref[0]
        y_e = jnp.dot(ae_ref[:], xw, preferred_element_type=jnp.float32)
        y_o = jnp.dot(ao_ref[:], xw, preferred_element_type=jnp.float32)
        mid_e = (y_e + inv_beta * afa._sin_sq(y_e * alpha)).astype(xw.dtype)
        mid_o = (y_o + inv_beta * afa._sin_sq(y_o * alpha)).astype(xw.dtype)
        z = jnp.dot(de_ref[:], mid_e, preferred_element_type=jnp.float32)
        z = z + jnp.dot(do_ref[:], mid_o, preferred_element_type=jnp.float32)
        # conv zero-pad semantics: lattice rows outside the clip are zero
        tz = t_tile + 2 * HZ
        grow = ti * t_tile - HZ + jax.lax.broadcasted_iota(
            jnp.int32, (tz, 1), 0
        )
        inside = jnp.logical_and(grow >= 0, grow < t_rows)
        z_scr[...] = jnp.where(inside, z, 0.0).astype(z_scr.dtype)

    acc = jnp.broadcast_to(
        b_ref[0].astype(jnp.float32)[None, :], (t_tile, b_ref.shape[1])
    )
    ctr = (k - 1) // 2
    for j in range(k):
        off = HZ + (j - ctr) * dilation
        acc = acc + jnp.dot(
            z_scr[off: off + t_tile],
            w_ref[j * c: (j + 1) * c],
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _fused_forward(x, alpha_eff, beta_eff, kernel, bias, dilation):
    """x (B, T, C) → conv(act(x)) (B, T, C); kernel (k, C, C), bias (C,)."""
    g = _plan(x, kernel.shape[0], dilation)
    interpret = pallas_interpret()
    cdt = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    k, c = kernel.shape[0], g["c"]
    tt, HY, HZ, HR = g["t_tile"], g["HY"], g["HZ"], g["HR"]

    x_ops, x_specs = afa._window_pieces(x, g, True, cdt)
    alpha, inv_beta = afa._lane_params(alpha_eff, beta_eff, g)

    A_e, A_o, D_e, D_o = afa._banded_fwd_mats(tt + 2 * HZ, HY, HR - HZ)
    mats = [jnp.asarray(m, cdt) for m in (A_e, A_o, D_e, D_o)]
    wmat = kernel.reshape(k * c, c).astype(cdt)
    brow = bias.reshape(1, c).astype(jnp.float32)

    full_spec = pl.BlockSpec((1, c), lambda bi, ti, co: (0, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda bi, ti, co: (0, 0))
    w_spec = pl.BlockSpec((k * c, CO_CHUNK), lambda bi, ti, co: (0, co))
    b_spec = pl.BlockSpec((1, CO_CHUNK), lambda bi, ti, co: (0, co))
    out_spec = pl.BlockSpec((1, 1, tt, CO_CHUNK),
                            lambda bi, ti, co: (bi, ti, 0, co))
    # input pieces must ignore the innermost (output-chunk) grid axis so the
    # pipeline keeps them resident across co steps (their lane axis is one
    # full-C block, so the pinned lane index 0 is exact)
    x_specs = [
        pl.BlockSpec(s.block_shape,
                     functools.partial(
                         lambda im, bi, ti, co: im(bi, ti, 0), s.index_map))
        for s in x_specs
    ]

    grid = (g["b"], g["n_t"], c // CO_CHUNK)
    out_shape = jax.ShapeDtypeStruct((g["b"], g["n_t"], tt, c), cdt)
    kern = functools.partial(
        _kernel, t_tile=tt, HY=HY, HZ=HZ, k=k, dilation=dilation,
        t_rows=g["t"], c=c, pieces=len(x_ops),
    )
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=grid,
        in_specs=x_specs + [full_spec, full_spec] + [const(m) for m in mats]
        + [w_spec, b_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((tt + 2 * HZ, c), cdt)],
        interpret=interpret,
    )(*x_ops, alpha, inv_beta, *mats, wmat, brow)
    out = out.reshape(g["b"], g["n_t"] * tt, c)[:, : g["t"]]
    return out.astype(x.dtype)


def _unfused(x, alpha_eff, beta_eff, kernel, bias, dilation):
    """Reference composition used by the backward pass: the fused
    alias-free activation core (own fused VJP) + XLA convolution."""
    z = afa._core(x, alpha_eff, beta_eff)
    pad = (kernel.shape[0] - 1) // 2 * dilation
    y = jax.lax.conv_general_dilated(
        z.astype(kernel.dtype), kernel,
        window_strides=(1,), padding=((pad, pad),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return (y + bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _core(x, alpha_eff, beta_eff, kernel, bias, dilation):
    return _fused_forward(x, alpha_eff, beta_eff, kernel, bias, dilation)


def _core_fwd(x, alpha_eff, beta_eff, kernel, bias, dilation):
    y = _fused_forward(x, alpha_eff, beta_eff, kernel, bias, dilation)
    return y, (x, alpha_eff, beta_eff, kernel, bias)


def _core_bwd(dilation, res, grad):
    x, alpha_eff, beta_eff, kernel, bias = res
    _, vjp = jax.vjp(
        lambda *a: _unfused(*a, dilation), x, alpha_eff, beta_eff,
        kernel, bias,
    )
    return vjp(grad)


_core.defvjp(_core_fwd, _core_bwd)


def fused_snake_conv(x, alpha, beta, kernel, bias, *, dilation: int = 1,
                     logscale: bool = True):
    """Fused (2× up-FIR → snakeβ → 2× down-FIR) → k-tap dilated Conv1d.

    x: (B, T, C); alpha/beta: (C,) raw snake parameters (log-space when
    ``logscale``); kernel: (k, C, C) already weight-normed; bias: (C,).
    Callers must check :func:`snake_conv_eligible` first."""
    k, c_in, c_out = kernel.shape
    if not snake_conv_eligible(c_in, c_out, k) or x.shape[-1] != c_in:
        # an ineligible shape would silently compute the wrong conv
        # (the kernel assumes square full-lane channels, odd taps, stride 1)
        raise ValueError(
            f"fused_snake_conv: ineligible shapes x={x.shape} "
            f"kernel={kernel.shape}; check snake_conv_eligible() first"
        )
    alpha_eff = jnp.exp(alpha) if logscale else alpha
    beta_eff = jnp.exp(beta) if logscale else beta
    return _core(x, alpha_eff, beta_eff, kernel, bias, dilation)
