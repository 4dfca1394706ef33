"""Microbenchmarks for the two hot paths: stage-1 UNet denoise step and the
BigVGAN vocoder forward, on the real TPU chip.

Timing protocol (see CLAUDE.md): completion is forced by a host fetch of a
scalar; per-call measurements are amortised with a lax.scan loop inside one
jit to defeat the ~36 ms tunnel sync floor and dispatch overhead.

Usage:  python -u benchmarks/micro.py [unet|vocoder|attn] ...
"""

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


def bench_unet(batch=8, reps=10):
    """One denoise step (production UNet), amortised over `reps` scanned
    calls inside a single jit."""
    from diffbinaural_tpu.models import AudioVisualModel

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    model = AudioVisualModel(dim=64, dtype=jnp.bfloat16)
    with jax.default_device(cpu):
        x = jnp.zeros((batch, 2, 80, 80))
        t = jnp.zeros((batch,), jnp.int32)
        cond = (
            jnp.zeros((batch, 1, 80, 80)),
            jnp.zeros((batch, 512)),
            jnp.zeros((batch, 2, 80, 80)),
        )
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
    params = jax.device_put(params, tpu)
    x, t = jax.device_put((x, t), tpu)
    cond = jax.device_put(cond, tpu)

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


def check_flash_correctness(n=6400, heads=4, d=32, batch=2):
    """_sdpa flash path vs dense einsum reference, on the live backend."""
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
    print(f"flash vs dense n={n}: max abs err {err:.4f} "
          f"({'OK' if err < 0.03 else 'FAIL'})")


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


def bench_act_narrow(t=220416, c=24, batch=2, reps=10):
    """Narrow tail stage: slab-packed wrapper vs plain lane-padded core."""
    from diffbinaural_tpu.ops import alias_free_act as afa

    tpu = jax.devices()[0]
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, t, c)), jnp.bfloat16), tpu
    )
    a = jax.device_put(jnp.zeros((c,)), tpu)
    b = jax.device_put(jnp.zeros((c,)), tpu)

    def mk_loop(fn):
        @jax.jit
        def loop(x, a_, b_):
            def body(carry, i):
                y = fn(x + carry.astype(x.dtype), a_, b_)
                return jnp.float32(jnp.sum(y)) * 1e-12, ()

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        return loop

    packed = mk_loop(lambda x_, a_, b_: afa.fused_alias_free_snake(
        x_, a_, b_, True))
    plain = mk_loop(lambda x_, a_, b_: afa._core(
        x_, jnp.exp(a_), jnp.exp(b_)))

    for tag, loop in (("slab-packed", packed), ("lane-padded core", plain)):
        dt = timed(loop, x, a, b)
        print(f"act narrow c={c} t={t} {tag}: {1e3 * dt / reps:.3f} ms")


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
    if which in ("attnblocks",):
        bench_attn_blocks()
    if which in ("flashcheck",):
        check_flash_correctness()
    if which in ("vocablate",):
        bench_vocoder_ablate()
    if which in ("actnarrow",):
        bench_act_narrow(t=220416, c=24)
        bench_act_narrow(t=110208, c=48)
        bench_act_narrow(t=55104, c=96)
