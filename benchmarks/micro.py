"""Microbenchmarks for the two hot paths: stage-1 UNet denoise step and the
BigVGAN vocoder forward, on the real TPU chip.

Timing protocol (see CLAUDE.md): completion is forced by a host fetch of a
scalar; per-call measurements are amortised with a lax.scan loop inside one
jit to defeat the ~36 ms tunnel sync floor and dispatch overhead.

Usage:  python -u benchmarks/micro.py [unet|vocoder|attn] ...
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x) -> float:
    return float(jnp.sum(x))


def timed(fn, *args, iters=3):
    fetch(fn(*args))  # warmup/compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    return (time.time() - t0) / iters


V5E_PEAK_FLOPS = 197e12  # nominal bf16; measured matmul ceiling ≈160e12


def hlo_flops(fn, *args):
    """FLOPs of fn via XLA's HLO cost analysis (utils.profiling.
    hlo_cost_flops: avals-based, CPU-client + interpret-Pallas fallback
    for the tunnel backend).  CAVEAT: scan/while bodies are counted ONCE
    — only pass scan-free programs (e.g. a single train step, not the
    reps-scanned wrapper), and pass a FRESH lambda (never the executed fn
    object — the interpret trace is cached by (fn, avals)).  Returns 0.0
    on failure."""
    from diffbinaural_tpu.utils.profiling import hlo_cost_flops

    try:
        return hlo_cost_flops(lambda *a: fn(*a), *args)
    except Exception:  # noqa: BLE001
        return 0.0


def mfu_str(flops, dt):
    if flops <= 0:
        return ""
    return (f"  [{flops / 1e12:.2f} TFLOP, "
            f"{flops / dt / 1e12:.1f} TFLOP/s achieved, "
            f"MFU {flops / dt / V5E_PEAK_FLOPS * 100:.1f}%]")


def bench_unet(batch=8, reps=10):
    """One denoise step (production UNet), amortised over `reps` scanned
    calls inside a single jit."""
    from diffbinaural_tpu.models import AudioVisualModel

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    model = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    # jitted batch-1 init ON the TPU: CPU-side init runs the dense n=6400
    # attention eagerly and takes minutes on a 1-CPU host
    with jax.default_device(tpu):
        x1 = jnp.zeros((1, 2, 80, 80))
        t1 = jnp.zeros((1,), jnp.int32)
        cond1 = (jnp.zeros((1, 1, 80, 80)), jnp.zeros((1, 512)),
                 jnp.zeros((1, 2, 80, 80)))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x1, t1, cond1)
        x = jnp.zeros((batch, 2, 80, 80))
        t = jnp.zeros((batch,), jnp.int32)
        cond = (
            jnp.zeros((batch, 1, 80, 80)),
            jnp.zeros((batch, 512)),
            jnp.zeros((batch, 2, 80, 80)),
        )

    @jax.jit
    def loop(params, x, t, cond):
        def body(carry, i):
            y = model.apply(params, carry, t + i, cond)
            return y.astype(carry.dtype), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(reps))
        return out

    dt = timed(loop, params, x, t, cond)
    print(f"unet step  batch={batch}: {1e3 * dt / reps:.2f} ms/step "
          f"({reps} scanned steps, {dt * 1e3:.0f} ms/loop)")


def bench_vocoder(seconds=10.0, reps=3):
    """Full-clip stereo vocode (2×T mel frames through the generator)."""
    from diffbinaural_tpu.core.config import VocoderConfig
    from diffbinaural_tpu.models.bigvgan import BigVGAN

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    frames = int(seconds * 22050) // 256
    voc = BigVGAN(VocoderConfig(), dtype=jnp.bfloat16)
    with jax.default_device(cpu):
        params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 16)))
    params = jax.device_put(params, tpu)
    mel = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 80, frames)),
            jnp.float32,
        ) - 6.0,
        tpu,
    )

    @jax.jit
    def loop(params, mel):
        def body(carry, i):
            y = voc.apply(params, mel + 1e-3 * i)
            return carry + jnp.sum(y), ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    dt = timed(loop, params, mel)
    print(f"vocoder 2x{frames}f ({seconds:.0f}s stereo): "
          f"{1e3 * dt / reps:.1f} ms/call")


def bench_attn(n=6400, heads=4, d=32, batch=8, reps=20):
    """Self-attention via models.attention._sdpa at UNet shapes."""
    from diffbinaural_tpu.models.attention import _sdpa

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    mk = lambda: jax.device_put(
        jnp.asarray(rng.standard_normal((batch, heads, n, d)), jnp.bfloat16),
        tpu,
    )
    q, k, v = mk(), mk(), mk()

    @jax.jit
    def loop(q, k, v):
        def body(carry, i):
            o = _sdpa(q + carry.astype(q.dtype), k, v, d**-0.5)
            return jnp.float32(jnp.sum(o)) * 1e-9, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    dt = timed(loop, q, k, v)
    print(f"sdpa n={n} b={batch} h={heads} d={d}: {1e3 * dt / reps:.2f} ms")


def bench_flash_sweep(n=6400, heads=4, d=32, batch=8, reps=20):
    """Sweep the d=32 single-pass kernel's (bq, chunks) geometry — more
    chunks give the Mosaic scheduler finer MXU/VPU interleave (exp of
    chunk i hides under the matmul of chunk i+1); bigger bq amortises the
    K/V panel re-reads.  Run on the real chip to pick the default in
    ops/flash_d32._fwd."""
    from diffbinaural_tpu.ops import flash_d32

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    mk = lambda: jax.device_put(
        jnp.asarray(rng.standard_normal((batch, heads, n, d)), jnp.bfloat16),
        tpu,
    )
    q, k, v = mk(), mk(), mk()

    def run(bq, chunks, residuals):
        @jax.jit
        def loop(q, k, v):
            def body(carry, i):
                o, _, _ = flash_d32._fwd(
                    q + carry.astype(q.dtype), k, v, bq=bq, chunks=chunks,
                    save_residuals=residuals,
                )
                return jnp.float32(jnp.sum(o)) * 1e-9, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        tag = f"bq={bq:4d} chunks={chunks} resid={int(residuals)}"
        try:
            dt = timed(loop, q, k, v)
            print(f"  {tag}: {1e3 * dt / reps:.2f} ms")
        except Exception as e:
            print(f"  {tag}: FAILED {type(e).__name__} {str(e)[:80]}")

    print(f"flash_d32 sweep  n={n} b={batch} h={heads} d={d}")
    for residuals in (False, True):
        for bq in (128, 256, 320, 640):
            if n % bq != 0:  # floor-div grid would drop query rows
                continue
            for chunks in (1, 2, 4, 5, 8, 10):
                if n % chunks == 0 and (n // chunks) % 8 == 0:
                    run(bq, chunks, residuals)


def bench_attn_blocks(n=6400, heads=4, d=32, batch=8, reps=20):
    """Sweep flash BlockSizes / padding for the N=6400 UNet grids."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    mk = lambda: jax.device_put(
        jnp.asarray(rng.standard_normal((batch, heads, n, d)), jnp.bfloat16),
        tpu,
    )
    q, k, v = mk(), mk(), mk()

    def run(tag, n_pad, bq, bk):
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = (jnp.pad(a, pad) for a in (q, k, v))
        if n_pad == n:
            seg = None  # divisible blocks: no mask work at all
        else:
            ids = (jnp.arange(n_pad) >= n).astype(jnp.int32)[None, :]
            ids = jnp.broadcast_to(ids, (batch, n_pad))
            seg = SegmentIds(q=ids, kv=ids)
        bs = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq,
        )

        @jax.jit
        def loop(qf, kf, vf):
            def body(carry, i):
                o = flash_attention(
                    qf + carry.astype(qf.dtype), kf, vf, segment_ids=seg,
                    sm_scale=d**-0.5, block_sizes=bs,
                )
                return jnp.float32(jnp.sum(o)) * 1e-9, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        try:
            dt = timed(loop, qf, kf, vf)
            print(f"  {tag:34s}: {1e3 * dt / reps:.2f} ms")
        except Exception as e:
            print(f"  {tag:34s}: FAILED {type(e).__name__} {str(e)[:80]}")

    print(f"flash block sweep  n={n} b={batch} h={heads} d={d}")
    run("pad7168 bq1024 bk1024 (current)", 7168, 1024, 1024)
    run("nopad   bq1280 bk1280", 6400, 1280, 1280)
    run("nopad   bq640  bk1280", 6400, 640, 1280)
    run("nopad   bq1280 bk3200", 6400, 1280, 3200)
    run("nopad   bq256  bk6400 (1 k-iter)", 6400, 256, 6400)
    run("nopad   bq640  bk3200", 6400, 640, 3200)


def bench_unet_ablate(batch=8, reps=10):
    """Component ablation: re-time the UNet step with attention pieces
    replaced by identity (monkeypatched) to attribute the step time."""
    from diffbinaural_tpu.models import attention as attn_mod

    orig_self = attn_mod.Attention.__call__
    orig_lin = attn_mod.LinearAttentionBlock.__call__
    orig_cross = attn_mod.CrossAttention.__call__
    orig_ff = attn_mod.FeedForward.__call__

    def run(tag):
        bench_unet(batch=batch, reps=reps)
        print(f"  ^ {tag}")

    try:
        run("full step")
        attn_mod.Attention.__call__ = lambda self, x, time_emb=None: x * 1.0001
        run("self-attn -> identity")
        attn_mod.LinearAttentionBlock.__call__ = lambda self, x: x * 1.0001
        run("self+linear-attn -> identity")
        attn_mod.CrossAttention.__call__ = (
            lambda self, x, context=None, mask=None: x * 1.0001
        )
        attn_mod.FeedForward.__call__ = (
            lambda self, x, deterministic=True: x * 1.0001
        )
        run("all attn+ff -> identity (convs/norms only)")
    finally:
        attn_mod.Attention.__call__ = orig_self
        attn_mod.LinearAttentionBlock.__call__ = orig_lin
        attn_mod.CrossAttention.__call__ = orig_cross
        attn_mod.FeedForward.__call__ = orig_ff


def bench_unet_residue(batch=8, reps=10):
    """Attribute the NON-attention residue of the serving UNet step
    (VERDICT r4 next-round #3: 14.25 ms step vs ~12.5 ms floor, with the
    ResNet/FiLM convs unprofiled).  All rows run with attention+FF
    patched to identity (the `ablate` mode's last row is the baseline);
    successive rows then cheapen one conv-path component at a time by
    swapping the module CLASS (subclasses keep flax's compact machinery
    intact, unlike lambda patches, so param-creating variants work):

      row 1  conv-path baseline (attn+ff identity)
      row 2  + FiLM (time-emb scale/shift) skipped
      row 3  + GroupNorms skipped
      row 4  + weight standardisation skipped (plain 3x3 conv)
      row 5  + 3x3 -> 1x1 convs (conv FLOPs ÷9; what remains is
               bandwidth + small matmuls + glue)
    """
    import flax.linen as nn_

    from diffbinaural_tpu.models import attention as attn_mod
    from diffbinaural_tpu.models import unet as unet_mod

    class NoFilmResnetBlock(unet_mod.ResnetBlock):
        @nn_.compact
        def __call__(self, x, time_emb=None, deterministic=True):
            h = nn_.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                              dtype=self.dtype, name="norm_in")(x)
            h = nn_.silu(h)
            h = unet_mod.WeightStandardizedConv(
                self.dim_out, dtype=self.dtype, name="conv1")(h)
            h = nn_.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                              dtype=self.dtype, name="norm_mid")(h)
            h = nn_.silu(h)
            h = unet_mod.WeightStandardizedConv(
                self.dim_out, dtype=self.dtype, name="conv2")(h)
            if x.shape[-1] != self.dim_out:
                x = nn_.Dense(self.dim_out, dtype=self.dtype,
                              name="res_conv")(x)
            return h + x

    class NoNormResnetBlock(unet_mod.ResnetBlock):
        @nn_.compact
        def __call__(self, x, time_emb=None, deterministic=True):
            h = nn_.silu(x)
            h = unet_mod.WeightStandardizedConv(
                self.dim_out, dtype=self.dtype, name="conv1")(h)
            h = nn_.silu(h)
            h = unet_mod.WeightStandardizedConv(
                self.dim_out, dtype=self.dtype, name="conv2")(h)
            if x.shape[-1] != self.dim_out:
                x = nn_.Dense(self.dim_out, dtype=self.dtype,
                              name="res_conv")(x)
            return h + x

    class PlainConv(unet_mod.WeightStandardizedConv):
        @nn_.compact
        def __call__(self, x):
            kh, kw = self.kernel_size
            return nn_.Conv(self.features, (kh, kw), padding="SAME",
                            dtype=self.dtype, name="plain")(x)

    class PlainConv1x1(unet_mod.WeightStandardizedConv):
        @nn_.compact
        def __call__(self, x):
            return nn_.Dense(self.features, dtype=self.dtype,
                             name="plain1x1")(x)

    saved_attn = (attn_mod.Attention.__call__,
                  attn_mod.LinearAttentionBlock.__call__,
                  attn_mod.CrossAttention.__call__,
                  attn_mod.FeedForward.__call__)
    saved_unet = (unet_mod.ResnetBlock, unet_mod.WeightStandardizedConv)

    def run(tag):
        bench_unet(batch=batch, reps=reps)
        print(f"  ^ {tag}")

    try:
        attn_mod.Attention.__call__ = lambda self, x, time_emb=None: x * 1.0001
        attn_mod.LinearAttentionBlock.__call__ = lambda self, x: x * 1.0001
        attn_mod.CrossAttention.__call__ = (
            lambda self, x, context=None, mask=None: x * 1.0001)
        attn_mod.FeedForward.__call__ = (
            lambda self, x, deterministic=True: x * 1.0001)
        run("conv-path baseline (attn+ff identity)")
        unet_mod.ResnetBlock = NoFilmResnetBlock
        run("+ FiLM skipped")
        unet_mod.ResnetBlock = NoNormResnetBlock
        run("+ GroupNorms skipped")
        unet_mod.WeightStandardizedConv = PlainConv
        run("+ weight standardisation skipped")
        unet_mod.WeightStandardizedConv = PlainConv1x1
        run("+ 3x3 -> 1x1 convs")
    finally:
        (attn_mod.Attention.__call__, attn_mod.LinearAttentionBlock.__call__,
         attn_mod.CrossAttention.__call__,
         attn_mod.FeedForward.__call__) = saved_attn
        unet_mod.ResnetBlock, unet_mod.WeightStandardizedConv = saved_unet


def check_flash_correctness(n=6400, heads=4, d=32, batch=2):
    """_sdpa flash path vs dense einsum reference (fwd + grads), on the
    live backend."""
    from diffbinaural_tpu.models.attention import _sdpa

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.standard_normal((batch, heads, n, d)), jnp.float32
    )
    q, k, v = mk(), mk(), mk()
    got = np.asarray(_sdpa(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                           v.astype(jnp.bfloat16), d**-0.5), np.float32)
    sim = jnp.einsum("bhid,bhjd->bhij", q * (d**-0.5), k,
                     preferred_element_type=jnp.float32)
    want = np.asarray(
        jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim, axis=-1), v)
    )
    err = np.abs(got - want).max()
    print(f"flash vs dense n={n} fwd: max abs err {err:.4f} "
          f"({'OK' if err < 0.03 else 'FAIL'})")

    def loss_fast(q_, k_, v_):
        return jnp.sum(
            _sdpa(q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
                  v_.astype(jnp.bfloat16), d**-0.5).astype(jnp.float32) ** 2
        )

    def loss_dense(q_, k_, v_):
        s = jnp.einsum("bhid,bhjd->bhij", q_ * (d**-0.5), k_,
                       preferred_element_type=jnp.float32)
        o = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(s, axis=-1), v_)
        return jnp.sum(o**2)

    gf = jax.jit(jax.grad(loss_fast, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gd):
        a, b = np.asarray(a, np.float32), np.asarray(b)
        scale_ = np.abs(b).max() + 1e-6
        rel = np.abs(a - b).max() / scale_
        print(f"  d{name}: max rel-to-peak err {rel:.4f} "
              f"({'OK' if rel < 0.05 else 'FAIL'})")


def bench_vocoder_ablate(seconds=10.0, reps=3):
    """Attribute vocoder time: full vs acts-as-snake-only vs resblocks-as-
    identity (monkeypatched)."""
    from diffbinaural_tpu.models import bigvgan as bv

    orig_act = bv.Activation1d.__call__
    orig_amp = bv.AMPBlock1.__call__

    def run(tag):
        bench_vocoder(seconds=seconds, reps=reps)
        print(f"  ^ {tag}")

    def act_snake_only(self, x):
        # param-free stand-in: same VPU work as snakeβ, no FIRs, no params
        x32 = x.astype(jnp.float32)
        return bv.snake(x32, 1.0, 1.0).astype(x.dtype)

    try:
        run("full vocoder")
        bv.Activation1d.__call__ = act_snake_only
        run("acts -> bare snake (no FIRs)")
        bv.Activation1d.__call__ = orig_act
        bv.AMPBlock1.__call__ = lambda self, x: x * 1.0001
        run("AMP resblocks -> identity (ups+pre/post only)")
    finally:
        bv.Activation1d.__call__ = orig_act
        bv.AMPBlock1.__call__ = orig_amp


def bench_act(t=16384, c=768, batch=1, reps=20, dtype=jnp.float32):
    """Fused alias-free snake op in isolation (forward only)."""
    from diffbinaural_tpu.ops.alias_free_act import fused_alias_free_snake

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, t, c)), dtype), tpu
    )
    alpha = jax.device_put(jnp.zeros((c,)), tpu)
    beta = jax.device_put(jnp.zeros((c,)), tpu)

    @jax.jit
    def loop(x, alpha, beta):
        def body(carry, i):
            y = fused_alias_free_snake(
                x + carry.astype(x.dtype), alpha, beta, True
            )
            return jnp.float32(jnp.sum(y)) * 1e-12, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    dt = timed(loop, x, alpha, beta)
    gbps = 2 * batch * t * c * x.dtype.itemsize * 1e-9 / (dt / reps)
    print(f"fused act b={batch} t={t} c={c} {x.dtype.name}: "
          f"{1e3 * dt / reps:.3f} ms ({gbps:.0f} GB/s effective)")


def bench_act_narrow(t=220416, c=24, batch=2, reps=50):
    """Narrow tail stage through the time-folded kernel."""
    from diffbinaural_tpu.ops import alias_free_act as afa

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, t, c)), jnp.bfloat16), tpu
    )
    a = jax.device_put(jnp.zeros((c,)), tpu)
    b = jax.device_put(jnp.zeros((c,)), tpu)

    @jax.jit
    def loop(x, a_, b_):
        def body(carry, i):
            y = afa.fused_alias_free_snake(
                x + carry.astype(x.dtype), a_, b_, True
            )
            return jnp.float32(jnp.sum(y)) * 1e-12, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return acc

    dt = timed(loop, x, a, b)
    print(f"act narrow c={c} t={t} (folded): {1e3 * dt / reps:.3f} ms")


def bench_act_sin(reps=30):
    """Attribute the act kernel's VPU time to the snake transcendental vs
    the FIR shift/FMA lattice: run representative production stages under
    _SIN_IMPL ∈ {exact, fast, none} (see ops/alias_free_act._sin_sq;
    'none' is wrong math, diagnostic only), then report 'fast' accuracy
    vs 'exact'.  If 'none' ≈ 'exact', sin is free and the lattice is the
    whole cost; if 'none' ≪ 'exact' and 'fast' ≈ 'none', flipping
    DIFFBINAURAL_AFA_SIN=fast is a near-free act speedup."""
    from diffbinaural_tpu.ops import alias_free_act as afa

    stages = [  # (t, c): two MXU-mode stages, two folded-VPU stages
        (3444, 768), (13776, 384), (55104, 96), (220416, 24),
    ]
    orig = afa._SIN_IMPL
    try:
        for mode in ("exact", "fast", "none"):
            afa._SIN_IMPL = mode
            print(f"--- sin mode: {mode}")
            for t, c in stages:
                bench_act(t=t, c=c, batch=2, reps=reps, dtype=jnp.bfloat16)
    finally:
        afa._SIN_IMPL = orig

    # accuracy of 'fast' vs 'exact' on one wide + one narrow stage
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    for t, c in ((3444, 768), (220416, 24)):
        x = jax.device_put(
            jnp.asarray(3.0 * rng.standard_normal((1, t, c)), jnp.float32),
            tpu,
        )
        a = jax.device_put(jnp.asarray(rng.standard_normal((c,)) * 0.5), tpu)
        b = jax.device_put(jnp.asarray(rng.standard_normal((c,)) * 0.5), tpu)
        outs = {}
        for mode in ("exact", "fast"):
            afa._SIN_IMPL = mode
            try:
                outs[mode] = np.asarray(
                    jax.jit(afa.fused_alias_free_snake, static_argnums=3)(
                        x, a, b, True
                    )
                )
            finally:
                afa._SIN_IMPL = orig
        d = np.abs(outs["fast"] - outs["exact"]).max()
        print(f"fast-vs-exact max abs diff (t={t}, c={c}): {d:.3e}")


def bench_train1(batch=16, reps=5):
    """Production stage-1 diffusion train step (precomputed visual feats)."""
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.train import make_stage1_train_step

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    unet = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    with jax.default_device(tpu):  # jitted init on-device (see bench_unet)
        x = jnp.zeros((1, 2, 80, 80))
        t = jnp.zeros((1,), jnp.int32)
        cond = (
            jnp.zeros((1, 1, 80, 80)),
            jnp.zeros((1, 512)),
            jnp.zeros((1, 2, 80, 80)),
        )
        params = {"unet": jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, cond)}

    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x_, t_, c: unet.apply(p, x_, t_, c),
        donate=False,  # scanned below; donation handled by the scan carry
    )
    state = init_fn(params)
    rng_np = np.random.default_rng(0)
    batch_data = jax.device_put(
        {
            "mono_mel": jnp.asarray(
                rng_np.standard_normal((batch, 1, 80, 80)), jnp.float32
            ) - 6.0,
            "binaural_mel": jnp.asarray(
                rng_np.standard_normal((batch, 2, 80, 80)), jnp.float32
            ) - 6.0,
            "feat": jnp.asarray(
                rng_np.standard_normal((batch, 512)), jnp.float32
            ),
        },
        tpu,
    )
    rng = jax.random.PRNGKey(0)

    # NOTE: returning the ~1100-leaf train state through the tunneled
    # backend costs ~2 s of per-array handle overhead PER CALL — scan the
    # steps inside one jit and return scalars only.  (A real TPU host pays
    # microseconds here; step_fn itself is unchanged for production.)
    @jax.jit
    def run(state, batch_data, rng):
        def body(st, i):
            st, m = step_fn(st, batch_data, jax.random.fold_in(rng, i))
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(reps))
        # touch every final-state leaf so the last update isn't DCE'd
        probe = sum(
            jnp.sum(l) for l in jax.tree_util.tree_leaves(st.params)
        )
        return losses.sum() + 0.0 * probe.astype(losses.dtype)

    fetch(run(state, batch_data, rng))  # compile
    t0 = time.time()
    fetch(run(state, batch_data, jax.random.fold_in(rng, 999)))
    dt = (time.time() - t0) / reps
    # per-step FLOPs from the scan-free single step (hlo_flops caveat)
    flops = hlo_flops(step_fn, state, batch_data, rng)
    print(f"stage1 train step B={batch}: {1e3 * dt:.1f} ms "
          f"({batch / dt:.1f} samples/s)" + mfu_str(flops, dt))


def bench_train2(batch=16, reps=5):
    """Production stage-2 GAN step (CQTD+MPD, 7-scale mel loss, seg 16384)."""
    import json

    from diffbinaural_tpu.cli.gan_common import build_discriminators
    from diffbinaural_tpu.core.config import AttrDict, VocoderConfig
    from diffbinaural_tpu.losses import MultiScaleMelSpectrogramLoss
    from diffbinaural_tpu.models.bigvgan import BigVGAN
    from diffbinaural_tpu.signal import mel_spectrogram
    from diffbinaural_tpu.train import make_stage2_train_step

    with open("configs/bigvgan_binaural_22khz_80band_256x.json") as f:
        h = AttrDict(json.load(f))
    cfg = VocoderConfig.from_attrdict(h)
    seg = h["segment_size"]
    mel_frames = seg // h["hop_size"]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    gen = BigVGAN(cfg, dtype=jnp.bfloat16)
    # DISC_BF16=1 measures the opt-in bf16 discriminator-conv mode
    # ("0"/""/unset = fp32 default — any other value would silently flip it)
    disc_bf16 = os.environ.get("DISC_BF16", "0").strip().lower() in (
        "1", "true", "yes",
    )
    mpd, mrd = build_discriminators(
        h, dtype=jnp.bfloat16 if disc_bf16 else jnp.float32,
    )
    msl = MultiScaleMelSpectrogramLoss(h["sampling_rate"])

    def mel_fn(wav):
        return mel_spectrogram(
            wav, h["n_fft"], h["num_mels"], h["sampling_rate"],
            h["hop_size"], h["win_size"], h["fmin"], h.get("fmax_for_loss"),
        )

    rng = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        mel0 = jnp.zeros((1, h["num_mels"], 16))
        audio0 = jnp.zeros((1, 1, 16 * h["hop_size"]))
        gen_params = gen.init(rng, mel0)
        disc_params = {
            "mpd": mpd.init(rng, audio0, audio0),
            "mrd": mrd.init(rng, audio0, audio0),
        }
    gen_params = jax.device_put(gen_params, tpu)
    disc_params = jax.device_put(disc_params, tpu)

    init_fn, step_fn = make_stage2_train_step(
        gen_apply=lambda p, m: gen.apply(p, m),
        mpd_apply=lambda p, y, yh: mpd.apply(p, y, yh),
        mrd_apply=lambda p, y, yh: mrd.apply(p, y, yh),
        mel_fn=mel_fn,
        multiscale_mel_loss=msl,
        learning_rate=h["learning_rate"],
        adam_b1=h["adam_b1"], adam_b2=h["adam_b2"], lr_decay=h["lr_decay"],
        clip_grad_norm=h.get("clip_grad_norm", 1000.0),
        lambda_melloss=h.get("lambda_melloss", 45.0),
        use_multiscale_melloss=h.get("use_multiscale_melloss", False),
        remat=batch * seg > 16 * 16384,
        donate=False,  # scanned below
    )
    state = init_fn(gen_params, disc_params)
    rng_np = np.random.default_rng(0)
    batch_data = jax.device_put(
        {
            "mel": jnp.asarray(
                rng_np.standard_normal((batch, h["num_mels"], mel_frames)),
                jnp.float32,
            ) - 6.0,
            "audio": 0.1 * jnp.asarray(
                rng_np.standard_normal((batch, seg)), jnp.float32
            ),
            "mel_loss": jnp.zeros((batch, h["num_mels"], mel_frames)),
        },
        tpu,
    )

    @jax.jit
    def run(state, batch_data):
        def body(st, i):
            st, m = step_fn(st, batch_data)
            return st, m["loss_gen_all"]

        st, losses = jax.lax.scan(body, state, jnp.arange(reps))
        probe = sum(
            jnp.sum(l)
            for l in jax.tree_util.tree_leaves((st.gen_params, st.disc_params))
        )
        return losses.sum() + 0.0 * probe.astype(losses.dtype)

    fetch(run(state, batch_data))  # compile
    t0 = time.time()
    fetch(run(state, batch_data))
    dt = (time.time() - t0) / reps
    flops = hlo_flops(step_fn, state, batch_data)
    print(f"stage2 GAN step B={batch}: {1e3 * dt:.0f} ms "
          f"({batch / dt:.1f} samples/s)" + mfu_str(flops, dt))


def bench_voc_stages(reps=10):
    """Per-stage shapes of the production vocoder on a 10 s stereo clip:
    time ONE fused act and ONE k=3 WN-conv at each stage's (B=2, T, C)."""
    from diffbinaural_tpu.models import bigvgan as bv
    from diffbinaural_tpu.ops.alias_free_act import fused_alias_free_snake

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    stages = [  # (T, C) after each upsample stage, B=2 (stereo)
        (3444, 768), (13776, 384), (27552, 192),
        (55104, 96), (110208, 48), (220416, 24),
    ]
    for t, c in stages:
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((2, t, c)), jnp.bfloat16), tpu
        )
        a = jax.device_put(jnp.zeros((c,)), tpu)
        b = jax.device_put(jnp.zeros((c,)), tpu)

        @jax.jit
        def act_loop(x, a_, b_):
            def body(carry, i):
                y = fused_alias_free_snake(
                    x + carry.astype(x.dtype), a_, b_, True
                )
                return jnp.float32(jnp.sum(y)) * 1e-12, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        conv = bv.WNConv1d(c, 3, dilation=3, init_std=0.01, dtype=jnp.bfloat16)
        cparams = jax.device_put(
            jax.jit(conv.init, backend="cpu")(jax.random.PRNGKey(0), x), tpu
        )

        @jax.jit
        def conv_loop(p, x):
            def body(carry, i):
                y = conv.apply(p, x + carry.astype(x.dtype))
                return jnp.float32(jnp.sum(y)) * 1e-12, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        dt_a = timed(act_loop, x, a, b)
        dt_c = timed(conv_loop, cparams, x)
        print(f"stage T={t:6d} C={c:4d}: act {1e3 * dt_a / reps:7.3f} ms   "
              f"conv(k3,d3) {1e3 * dt_c / reps:7.3f} ms")


def bench_snakeconv(reps=10):
    """Fused snake→conv kernel vs the (fused act, XLA conv) pair at the
    production MXU-stage shapes, per kernel size."""
    from diffbinaural_tpu.models import bigvgan as bv
    from diffbinaural_tpu.ops.alias_free_act import fused_alias_free_snake
    from diffbinaural_tpu.ops.snake_conv import fused_snake_conv

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    for t, c in ((3444, 768), (13776, 384)):
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((2, t, c)), jnp.bfloat16), tpu
        )
        a = jax.device_put(jnp.zeros((c,)), tpu)
        b = jax.device_put(jnp.zeros((c,)), tpu)
        for k in (3, 7, 11):
            kern = jax.device_put(
                jnp.asarray(rng.standard_normal((k, c, c)) * 0.02,
                            jnp.bfloat16), tpu
            )
            bias = jax.device_put(jnp.zeros((c,)), tpu)

            @jax.jit
            def fused_loop(x, a_, b_, w_, bb_):
                def body(carry, i):
                    y = fused_snake_conv(
                        x + carry.astype(x.dtype), a_, b_, w_, bb_,
                        dilation=3,
                    )
                    return jnp.float32(jnp.sum(y)) * 1e-12, ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
                return acc

            @jax.jit
            def pair_loop(x, a_, b_, w_, bb_):
                def body(carry, i):
                    z = fused_alias_free_snake(
                        x + carry.astype(x.dtype), a_, b_, True
                    )
                    pad = (k - 1) // 2 * 3
                    y = jax.lax.conv_general_dilated(
                        z, w_, window_strides=(1,), padding=((pad, pad),),
                        rhs_dilation=(3,),
                        dimension_numbers=("NHC", "HIO", "NHC"),
                    ) + bb_
                    return jnp.float32(jnp.sum(y)) * 1e-12, ()

                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
                return acc

            dt_f = timed(fused_loop, x, a, b, kern, bias)
            dt_p = timed(pair_loop, x, a, b, kern, bias)
            print(f"T={t:6d} C={c:4d} k={k:2d}: fused "
                  f"{1e3 * dt_f / reps:7.3f} ms   act+xla-conv "
                  f"{1e3 * dt_p / reps:7.3f} ms")


def bench_conv_narrow(reps=20):
    """Narrow-stage AMP conv lowering shootout: XLA direct conv vs im2col
    (k time-shifted views concatenated on lanes → one (T, k·C)·(k·C, C)
    matmul — contraction k·C ≥ 264 keeps the MXU busy where the direct
    form's C ≤ 192 contraction can't).  The AMP convs measured ~5× off the
    matmul floor in-graph (~0.6 ms each, ~65 ms/clip total); the wide
    stages are covered by fused_snake_conv, these are the rest.  Each
    variant is checked against the direct conv on device first."""
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)

    def im2col_conv(z, w, dilation):
        k, c, co = w.shape
        pad = (k - 1) // 2 * dilation
        zp = jnp.pad(z, ((0, 0), (pad, pad), (0, 0)))
        t = z.shape[1]
        cols = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(zp, j * dilation, t, axis=1)
             for j in range(k)],
            axis=-1,
        )  # (B, T, k·C), tap-major lanes == w.reshape(k·C, co) row order
        return jax.lax.dot_general(
            cols, w.reshape(k * c, co),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(z.dtype)

    def direct_conv(z, w, dilation):
        k = w.shape[0]
        pad = (k - 1) // 2 * dilation
        return jax.lax.conv_general_dilated(
            z, w, window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    for t, c in ((27552, 192), (55104, 96), (110208, 48), (220416, 24)):
        z = jax.device_put(
            jnp.asarray(rng.standard_normal((2, t, c)), jnp.bfloat16), tpu
        )
        for k, d in ((3, 1), (7, 3), (11, 5)):
            w = jax.device_put(
                jnp.asarray(rng.standard_normal((k, c, c)) * 0.05,
                            jnp.bfloat16), tpu
            )
            want = np.asarray(jax.jit(direct_conv, static_argnums=2)(
                z, w, d), np.float32)
            got = np.asarray(jax.jit(im2col_conv, static_argnums=2)(
                z, w, d), np.float32)
            err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
            assert err < 2e-2, (t, c, k, d, err)

            def mk(fn):
                @jax.jit
                def loop(z, w):
                    def body(carry, i):
                        y = fn(z + carry.astype(z.dtype), w, d)
                        return jnp.float32(jnp.sum(y)) * 1e-12, ()
                    acc, _ = jax.lax.scan(body, jnp.float32(0),
                                          jnp.arange(reps))
                    return acc
                return loop

            dt_x = timed(mk(direct_conv), z, w)
            dt_i = timed(mk(im2col_conv), z, w)
            flops = 2 * 2 * t * c * c * k
            print(f"T={t:6d} C={c:4d} k={k:2d} d={d}: xla "
                  f"{1e3 * dt_x / reps:6.3f} ms "
                  f"({flops / (dt_x / reps) / 1e12:5.1f} TF/s)   im2col "
                  f"{1e3 * dt_i / reps:6.3f} ms "
                  f"({flops / (dt_i / reps) / 1e12:5.1f} TF/s)")


def verify_gates(reps=20):
    """Re-certify the hard-coded measured-winner tables in ONE command
    (VERDICT r2 weak #6): the tables were measured on one compiler/chip
    snapshot and silently rot when either changes.

    Checks, printing a JSON verdict line:
      * models.bigvgan._im2col_wins vs a live im2col/direct shootout on
        every production AMP narrow-conv shape (ties within 7% pass —
        the tables only claim perf, both lowerings are exact);
      * shapes OUTSIDE the measured set are listed as extrapolations
        (they take a correct path either way — this is visibility, not
        a failure);
      * the flash d=32 kernel's numerics (check_flash_correctness) so the
        bq=320/chunks=5 gate can't certify a broken kernel.
    """
    from diffbinaural_tpu.models.bigvgan import _im2col_wins

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)

    def im2col_conv(z, w, dilation):
        k, c, co = w.shape
        pad = (k - 1) // 2 * dilation
        zp = jnp.pad(z, ((0, 0), (pad, pad), (0, 0)))
        t = z.shape[1]
        cols = jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(zp, j * dilation, t, axis=1)
             for j in range(k)], axis=-1)
        return jax.lax.dot_general(
            cols, w.reshape(k * c, co), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(z.dtype)

    def direct_conv(z, w, dilation):
        k = w.shape[0]
        pad = (k - 1) // 2 * dilation
        return jax.lax.conv_general_dilated(
            z, w, window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"))

    # the production AMP narrow-stage shape set the table was measured on
    measured = [(27552, 192), (55104, 96), (110208, 48), (220416, 24)]
    mismatches, rows = [], []
    for t, c in measured:
        z = jax.device_put(
            jnp.asarray(rng.standard_normal((2, t, c)), jnp.bfloat16), tpu)
        for k, d in ((3, 1), (7, 3), (11, 5)):
            w = jax.device_put(
                jnp.asarray(rng.standard_normal((k, c, c)) * 0.05,
                            jnp.bfloat16), tpu)

            def mk(fn):
                @jax.jit
                def loop(z, w):
                    def body(carry, i):
                        y = fn(z + carry.astype(z.dtype), w, d)
                        return jnp.float32(jnp.sum(y)) * 1e-12, ()
                    acc, _ = jax.lax.scan(body, jnp.float32(0),
                                          jnp.arange(reps))
                    return acc
                return loop

            dt_x = timed(mk(direct_conv), z, w) / reps
            dt_i = timed(mk(im2col_conv), z, w) / reps
            table_says = _im2col_wins(c, k)
            measured_winner_im2col = dt_i < dt_x
            tie = abs(dt_i - dt_x) / min(dt_i, dt_x) < 0.07
            ok = tie or (table_says == measured_winner_im2col)
            rows.append({"c": c, "k": k, "xla_ms": round(1e3 * dt_x, 3),
                         "im2col_ms": round(1e3 * dt_i, 3),
                         "table_im2col": table_says, "ok": bool(ok)})
            if not ok:
                mismatches.append((c, k))
            print(f"C={c:4d} k={k:2d}: xla {1e3 * dt_x:6.3f} ms  im2col "
                  f"{1e3 * dt_i:6.3f} ms  table={'im2col' if table_says else 'xla'}"
                  f"  {'OK' if ok else 'MISMATCH'}")

    check_flash_correctness()
    print(json.dumps({
        "run": "verifygates", "conv_gate_ok": not mismatches,
        "mismatches": mismatches, "rows": rows,
        "note": "shapes outside the measured set extrapolate the heuristic "
                "but always take a correct lowering",
    }))


def bench_convt(reps=20):
    """Polyphase vs lhs-dilated ConvTranspose1d lowering at the production
    upsample-stage shapes (rates 4,4,2,2,2,2 / kernels 8,8,4,4,4,4 /
    1536→24 channels, 10 s clip, B=2 bf16).  The polyphase form does u×
    fewer MACs — this bench confirms XLA doesn't already recover that."""
    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    stages = [  # (t_in, c_in, c_out, k, u)
        (861, 1536, 768, 8, 4),
        (3444, 768, 384, 8, 4),
        (13776, 384, 192, 4, 2),
        (27552, 192, 96, 4, 2),
        (55104, 96, 48, 4, 2),
        (110208, 48, 24, 4, 2),
    ]
    for t, ci, co, k, u in stages:
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((2, t, ci)), jnp.bfloat16), tpu
        )
        w = jax.device_put(
            jnp.asarray(rng.standard_normal((k, co, ci)) * 0.02,
                        jnp.bfloat16), tpu
        )  # (k, out, in), the WNConvTranspose1d layout
        p = (k - u) // 2

        from diffbinaural_tpu.models.bigvgan import polyphase_conv_transpose

        @jax.jit
        def poly_loop(x, w):
            def body(carry, i):
                y = polyphase_conv_transpose(x + carry.astype(x.dtype), w, u)
                return jnp.float32(jnp.sum(y)) * 1e-12, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        @jax.jit
        def dilated_loop(x, w):
            kern = jnp.flip(w, axis=0).transpose(0, 2, 1)

            def body(carry, i):
                y = jax.lax.conv_general_dilated(
                    x + carry.astype(x.dtype), kern, window_strides=(1,),
                    padding=((k - 1 - p, k - 1 - p),), lhs_dilation=(u,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                )
                return jnp.float32(jnp.sum(y)) * 1e-12, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        dt_p = timed(poly_loop, x, w)
        dt_d = timed(dilated_loop, x, w)
        flops = 2 * 2 * t * k * ci * co  # B=2, math-minimum MACs×2
        print(f"t={t:6d} {ci:4d}->{co:4d} k={k} u={u}: poly "
              f"{1e3 * dt_p / reps:7.3f} ms ({flops / (dt_p / reps) / 1e12:5.1f}"
              f" TF/s eff)   lhs-dilated {1e3 * dt_d / reps:7.3f} ms")


def bench_visual(batch=16, t_frames=1, n_src=4, reps=5):
    """Live visual-encoder path on TPU (VERDICT r2 missing #3 / item 4).

    In the reference, frozen-CLIP ``encode_image`` per (B·T·N) frame is the
    per-step compute heavyweight alongside the UNet (SURVEY §3.1;
    /root/reference/DiffBinaural/modules/networks.py:389-439).  Times:

      (a) the frozen CLIP ViT-B/32 image tower alone at the per-step frame
          volume (B·T·N 224×224 crops);
      (b) the full ClipPos2D encoder forward (FiLM + source attention +
          temporal transformer on top of the tower);
      (c) one jitted stage-1 train step with the encoder LIVE inside the
          step (trainable 'frame' head, stop_gradient'd trunk) — compare
          against train1's precomputed-feat step.

    Geometry defaults to the reference's: num_frames=1
    (DiffBinaural/utils/arguments.py:19), max_sources=4, 224×224 crops.
    """
    from diffbinaural_tpu.models import AudioVisualModel
    from diffbinaural_tpu.models.visual import ClipPos2D, CLIPVisionTransformer
    from diffbinaural_tpu.train import make_stage1_train_step

    tpu = jax.devices()[0]
    n_imgs = batch * t_frames * n_src
    enc = ClipPos2D(dtype=jnp.bfloat16)
    tower = CLIPVisionTransformer(dtype=jnp.bfloat16)
    with jax.default_device(tpu):
        f1 = jnp.zeros((1, 3, 1, 1, 224, 224))
        p1 = jnp.zeros((1, 1, 1, 2))
        m1 = jnp.zeros((1, 1, 1), bool)
        eparams = jax.jit(enc.init)(jax.random.PRNGKey(0), f1, p1, m1)
        tparams = jax.jit(tower.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 224, 224)))
        rng = jax.random.PRNGKey(1)
        frames = 0.5 * jax.random.normal(
            rng, (batch, 3, t_frames, n_src, 224, 224), jnp.float32)
        pos = jax.random.uniform(rng, (batch, t_frames, n_src, 2))
        mask = jnp.zeros((batch, t_frames, n_src), bool)
    flat = frames.transpose(0, 2, 3, 1, 4, 5).reshape(n_imgs, 3, 224, 224)

    def scanned(apply_fn, *args):
        # input perturbed per iteration: defeats CSE and tunnel memoization
        @jax.jit
        def loop(*a):
            def body(acc, i):
                out = apply_fn(a[0], a[1] * (1.0 + 1e-6 * i), *a[2:])
                return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        return timed(loop, *args) / reps

    dt = scanned(tower.apply, tparams, flat)
    # ViT-B/32: ~8.73 GFLOP per 224×224 image (2·50 tok · 12 lyr · 12·768²)
    print(f"clip tower  {n_imgs} frames: {1e3 * dt:.2f} ms "
          f"({1e3 * dt / n_imgs:.3f} ms/frame, "
          f"{8.73e9 * n_imgs / dt / 1e12:.1f} TF/s eff)")

    dt = scanned(lambda p, f: enc.apply(p, f, pos, mask), eparams, frames)
    print(f"clip_pos2d  B={batch} T={t_frames} N={n_src}: {1e3 * dt:.2f} ms "
          f"({1e3 * dt / batch:.3f} ms/sample)")

    # (c) live train step — reference trains 'frame' head + UNet jointly
    unet = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    with jax.default_device(tpu):
        x1 = jnp.zeros((1, 2, 80, 80))
        t1 = jnp.zeros((1,), jnp.int32)
        c1 = (jnp.zeros((1, 1, 80, 80)), jnp.zeros((1, 512)),
              jnp.zeros((1, 2, 80, 80)))
        params = {
            "unet": jax.jit(unet.init)(jax.random.PRNGKey(0), x1, t1, c1),
            "frame": eparams,
        }
    init_fn, step_fn = make_stage1_train_step(
        unet_apply=lambda p, x_, t_, c: unet.apply(p, x_, t_, c),
        visual_apply=lambda p, f, po, ma: enc.apply(p, f, po, ma),
        donate=False,
    )
    state = init_fn(params)
    rng_np = np.random.default_rng(0)
    batch_data = jax.device_put({
        "mono_mel": jnp.asarray(
            rng_np.standard_normal((batch, 1, 80, 80)), jnp.float32) - 6.0,
        "binaural_mel": jnp.asarray(
            rng_np.standard_normal((batch, 2, 80, 80)), jnp.float32) - 6.0,
        "frames": frames, "pos": pos, "mask": mask,
    }, tpu)

    @jax.jit
    def run(state, batch_data, rng):
        def body(st, i):
            st, m = step_fn(st, batch_data, jax.random.fold_in(rng, i))
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(reps))
        probe = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(st.params))
        return losses.sum() + 0.0 * probe.astype(losses.dtype)

    rng = jax.random.PRNGKey(0)
    fetch(run(state, batch_data, rng))
    t0 = time.time()
    fetch(run(state, batch_data, jax.random.fold_in(rng, 999)))
    dt = (time.time() - t0) / reps
    print(f"stage1 train step LIVE visual B={batch}: {1e3 * dt:.1f} ms "
          f"({batch / dt:.1f} samples/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("unet", "all"):
        bench_unet()
    if which in ("vocoder", "all"):
        bench_vocoder()
    if which in ("attn",):
        for n in (6400, 1600, 400):
            bench_attn(n=n)
    if which in ("act",):
        bench_act(dtype=jnp.float32)
        bench_act(dtype=jnp.bfloat16)
        bench_act(t=220416, c=24, batch=2, dtype=jnp.bfloat16)
    if which in ("ablate",):
        bench_unet_ablate()
    if which in ("unetresidue",):
        bench_unet_residue()
    if which in ("attnblocks",):
        bench_attn_blocks()
    if which in ("flashsweep",):
        bench_flash_sweep()
    if which in ("flashcheck",):
        check_flash_correctness()
    if which in ("vocablate",):
        bench_vocoder_ablate()
    if which in ("vocstages",):
        bench_voc_stages()
    if which in ("train1",):
        bench_train1()
    if which in ("train2",):
        bench_train2()
    if which in ("snakeconv",):
        bench_snakeconv()
    if which in ("convt",):
        bench_convt()
    if which in ("convnarrow",):
        bench_conv_narrow()
    if which in ("verifygates",):
        verify_gates()
    if which in ("unetbatch",):
        # root-cause the "one batch of 24 windows slower than 3x8" anomaly
        # (VERDICT r1 next-steps #2b): sweep the window batch and report
        # per-window throughput — linear scaling means stage-1 should run
        # all 21 windows of a 10 s clip in ONE batched DDIM scan.
        for b in (4, 8, 12, 16, 21, 24, 32):
            bench_unet(batch=b)
    if which in ("visual",):
        bench_visual()
    if which in ("actsin",):
        bench_act_sin()
    if which in ("actnarrow",):
        bench_act_narrow(t=220416, c=24)
        bench_act_narrow(t=110208, c=48)
        bench_act_narrow(t=55104, c=96)
