"""Visual encoder tests: shapes, masking semantics, frozen-trunk grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffbinaural_tpu.core.config import CLIPConfig
from diffbinaural_tpu.models.visual import (
    CLIPVisionTransformer,
    ClipPos2D,
    ClipPos2DEnhanced,
    ResnetEncoder,
    SetTransformerAggregation,
    TransformerEncoderLayer,
    build_visual,
    sinusoidal_position_encoding,
)

TINY_CLIP = CLIPConfig(image_size=32, patch_size=16, width=64, layers=2, heads=2)


def _frames(B=2, T=2, N=3, hw=32):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 3, T, N, hw, hw)).astype(np.float32)
    pos = rng.uniform(-1, 1, (B, T, N, 2)).astype(np.float32)
    mask = np.zeros((B, T, N), dtype=bool)
    mask[:, :, -1] = True  # last source padded everywhere
    return jnp.asarray(x), jnp.asarray(pos), jnp.asarray(mask)


def test_clip_tower_shape():
    model = CLIPVisionTransformer(TINY_CLIP)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (3, 512)


def test_clip_pos2d_shape_and_mask_invariance():
    """Features of PADDED sources must not change the output (masked attn +
    max-pool... note: reference max-pools over ALL N including padded ones —
    we must reproduce that, so padded-source CONTENT does leak through
    max-pool exactly as in the reference.  What must hold: valid outputs stay
    finite and mask=all-invalid frames don't NaN."""
    x, pos, mask = _frames()
    model = ClipPos2D(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)
    out = model.apply(params, x, pos, mask)
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())


def test_clip_pos2d_enhanced_all_invalid_returns_null():
    x, pos, mask = _frames()
    all_invalid = jnp.ones_like(mask)
    model = ClipPos2DEnhanced(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)
    out = model.apply(params, x, pos, all_invalid)
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())
    # both batch rows all-invalid → identical (null-derived) outputs
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)


def test_clip_trunk_is_frozen():
    """stop_gradient on the CLIP trunk (reference freezes it,
    networks.py:341-342)."""
    x, pos, mask = _frames(B=1, T=1, N=2)
    model = ClipPos2D(clip=TINY_CLIP)
    params = model.init(jax.random.PRNGKey(0), x, pos, mask)

    def loss(p):
        return jnp.sum(model.apply(p, x, pos, mask) ** 2)

    g = jax.grad(loss)(params)
    clip_grads = jax.tree_util.tree_leaves(g["params"]["clip"])
    assert all(np.allclose(np.asarray(v), 0.0) for v in clip_grads)
    head_grads = jax.tree_util.tree_leaves(
        {k: v for k, v in g["params"].items() if k != "clip"}
    )
    assert any(not np.allclose(np.asarray(v), 0.0) for v in head_grads)


def test_set_aggregation_order_invariance():
    model = SetTransformerAggregation(emb_dim=32, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32))
    mask = jnp.zeros((2, 4), dtype=bool)
    params = model.init(jax.random.PRNGKey(1), x, mask)
    out1 = model.apply(params, x, mask)
    perm = x[:, [2, 0, 3, 1], :]
    out2 = model.apply(params, perm, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_transformer_encoder_layer_post_norm():
    """Output must be LayerNorm-ed (post-norm): per-token mean ≈ bias-dominated,
    variance ≈ 1 at init."""
    layer = TransformerEncoderLayer(dim=32, num_heads=4, ffn_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    var = np.asarray(out).var(axis=-1)
    np.testing.assert_allclose(var, np.ones_like(var), atol=0.2)


def test_time_pe_interleaving():
    pe = sinusoidal_position_encoding(8, 16)
    assert pe.shape == (8, 16)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)


def test_resnet_encoder_shape():
    model = ResnetEncoder()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, 64, 64))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (1, 512)


def test_registry_covers_reference_archs():
    """All arch_frame values from reference ModelBuilder (models.py:10-35)."""
    for arch in ["resnet18", "clip", "clip_pos", "clip_pos2d",
                 "clip_pos2d_concat", "clip_pos2d_enhanced"]:
        assert build_visual(arch) is not None
    with pytest.raises(ValueError):
        build_visual("nope")


# ---------------------------------------------------------------------------
# CLIP text tower (the reference encoders' forward_text path)
# ---------------------------------------------------------------------------

from diffbinaural_tpu.core.config import CLIPTextConfig
from diffbinaural_tpu.models.visual import CLIPModel, CLIPTextTransformer

TINY_TEXT = CLIPTextConfig(
    vocab_size=64, context_length=16, width=32, layers=2, heads=2,
    output_dim=512,
)


def _tokens(rows):
    t = np.zeros((len(rows), TINY_TEXT.context_length), np.int32)
    for i, row in enumerate(rows):
        t[i, : len(row)] = row
    return jnp.asarray(t)


def test_clip_text_shape_and_eot_readout():
    model = CLIPTextTransformer(TINY_TEXT)
    toks = _tokens([[5, 7, 9, 63], [5, 63]])  # 63 = largest id = EOT
    params = model.init(jax.random.PRNGKey(0), toks)
    out = model.apply(params, toks)
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())


def test_clip_text_causal_mask():
    """Tokens after the EOT position must not influence the feature (causal
    mask + EOT-argmax readout)."""
    model = CLIPTextTransformer(TINY_TEXT)
    a = _tokens([[5, 7, 63, 0, 0, 0]])
    b = _tokens([[5, 7, 63, 11, 2, 4]])  # junk strictly after EOT
    params = model.init(jax.random.PRNGKey(0), a)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, a)),
        np.asarray(model.apply(params, b)),
        atol=1e-6,
    )
    c = _tokens([[5, 8, 63, 0, 0, 0]])  # change BEFORE EOT → must differ
    assert np.abs(
        np.asarray(model.apply(params, a)) - np.asarray(model.apply(params, c))
    ).max() > 1e-4


def test_clip_model_both_towers():
    model = CLIPModel(vision=TINY_CLIP, text=TINY_TEXT)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    toks = _tokens([[5, 63], [9, 12, 63]])
    params = model.init(jax.random.PRNGKey(1), imgs, toks)
    li, lt = model.apply(params, imgs, toks)
    assert li.shape == (2, 2) and lt.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-5)
    im = model.apply(params, imgs, method=CLIPModel.encode_image)
    tx = model.apply(params, toks, method=CLIPModel.encode_text)
    assert im.shape == (2, 512) and tx.shape == (2, 512)


def test_clip_text_torch_import_matches_torch():
    """Import a synthetic torch-layout text tower and match a torch oracle
    built on torch.nn.MultiheadAttention (independent attention impl)."""
    import torch

    from diffbinaural_tpu.core.checkpoint import import_torch_clip_text

    c = TINY_TEXT
    rng = np.random.default_rng(0)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    sd = {
        "token_embedding.weight": r(c.vocab_size, c.width),
        "positional_embedding": r(c.context_length, c.width),
        "ln_final.weight": 1 + r(c.width),
        "ln_final.bias": r(c.width),
        "text_projection": r(c.width, c.output_dim),
    }
    for i in range(c.layers):
        b = f"transformer.resblocks.{i}"
        sd.update({
            f"{b}.attn.in_proj_weight": r(3 * c.width, c.width),
            f"{b}.attn.in_proj_bias": r(3 * c.width),
            f"{b}.attn.out_proj.weight": r(c.width, c.width),
            f"{b}.attn.out_proj.bias": r(c.width),
            f"{b}.ln_1.weight": 1 + r(c.width),
            f"{b}.ln_1.bias": r(c.width),
            f"{b}.ln_2.weight": 1 + r(c.width),
            f"{b}.ln_2.bias": r(c.width),
            f"{b}.mlp.c_fc.weight": r(4 * c.width, c.width),
            f"{b}.mlp.c_fc.bias": r(4 * c.width),
            f"{b}.mlp.c_proj.weight": r(c.width, 4 * c.width),
            f"{b}.mlp.c_proj.bias": r(c.width),
        })

    toks_np = np.zeros((2, c.context_length), np.int64)
    toks_np[0, :4] = [5, 7, 9, 63]
    toks_np[1, :2] = [5, 63]

    # --- torch oracle ---------------------------------------------------
    with torch.no_grad():
        t = torch.from_numpy
        x = t(sd["token_embedding.weight"])[t(toks_np)] + t(
            sd["positional_embedding"]
        )
        n = x.shape[1]
        causal = torch.full((n, n), float("-inf")).triu(1)
        x = x.transpose(0, 1)  # (L, B, D)
        for i in range(c.layers):
            b = f"transformer.resblocks.{i}"
            mha = torch.nn.MultiheadAttention(c.width, c.heads)
            mha.in_proj_weight.copy_(t(sd[f"{b}.attn.in_proj_weight"]))
            mha.in_proj_bias.copy_(t(sd[f"{b}.attn.in_proj_bias"]))
            mha.out_proj.weight.copy_(t(sd[f"{b}.attn.out_proj.weight"]))
            mha.out_proj.bias.copy_(t(sd[f"{b}.attn.out_proj.bias"]))
            h = torch.nn.functional.layer_norm(
                x, (c.width,), t(sd[f"{b}.ln_1.weight"]), t(sd[f"{b}.ln_1.bias"])
            )
            x = x + mha(h, h, h, attn_mask=causal, need_weights=False)[0]
            h = torch.nn.functional.layer_norm(
                x, (c.width,), t(sd[f"{b}.ln_2.weight"]), t(sd[f"{b}.ln_2.bias"])
            )
            h = h @ t(sd[f"{b}.mlp.c_fc.weight"]).T + t(sd[f"{b}.mlp.c_fc.bias"])
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            h = h @ t(sd[f"{b}.mlp.c_proj.weight"]).T + t(
                sd[f"{b}.mlp.c_proj.bias"]
            )
            x = x + h
        x = x.transpose(0, 1)
        x = torch.nn.functional.layer_norm(
            x, (c.width,), t(sd["ln_final.weight"]), t(sd["ln_final.bias"])
        )
        eot = t(toks_np).argmax(dim=-1)
        expected = (
            x[torch.arange(2), eot] @ t(sd["text_projection"])
        ).numpy()

    params = import_torch_clip_text(sd)
    model = CLIPTextTransformer(TINY_TEXT)
    got = np.asarray(model.apply(params, jnp.asarray(toks_np.astype(np.int32))))
    np.testing.assert_allclose(got, expected, atol=2e-5)


# ---------------------------------------------------------------------------
# ResNet18 torchvision import
# ---------------------------------------------------------------------------


def _synthetic_resnet18_sd(rng):
    """Random weights in torchvision resnet18's exact state-dict layout."""
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05

    def bn(c):
        return {
            "weight": 1 + r(c),
            "bias": r(c),
            "running_mean": r(c),
            "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
        }

    sd = {"conv1.weight": r(64, 3, 7, 7), "fc.weight": r(1000, 512),
          "fc.bias": r(1000)}
    for k, v in bn(64).items():
        sd[f"bn1.{k}"] = v
    cins = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for layer in range(1, 5):
        cin, cout = cins[layer]
        for b in range(2):
            src = f"layer{layer}.{b}"
            ci = cin if b == 0 else cout
            sd[f"{src}.conv1.weight"] = r(cout, ci, 3, 3)
            sd[f"{src}.conv2.weight"] = r(cout, cout, 3, 3)
            for k, v in bn(cout).items():
                sd[f"{src}.bn1.{k}"] = v
            for k, v in bn(cout).items():
                sd[f"{src}.bn2.{k}"] = v
            if b == 0 and layer > 1:
                sd[f"{src}.downsample.0.weight"] = r(cout, ci, 1, 1)
                for k, v in bn(cout).items():
                    sd[f"{src}.downsample.1.{k}"] = v
    return sd


def _torch_resnet18_forward(sd, x_np):
    """Eval-mode torchvision resnet18 trunk, written functionally from the
    state dict (independent oracle; fc head dropped, global avg pool)."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy
    conv = lambda x, k, s=1, p=0: F.conv2d(
        x, t(sd[k + ".weight"]), stride=s, padding=p
    )
    bn = lambda x, k: F.batch_norm(
        x, t(sd[k + ".running_mean"]), t(sd[k + ".running_var"]),
        t(sd[k + ".weight"]), t(sd[k + ".bias"]), training=False, eps=1e-5,
    )
    with torch.no_grad():
        x = F.relu(bn(conv(t(x_np), "conv1", 2, 3), "bn1"))
        x = F.max_pool2d(x, 3, 2, 1)
        for layer in range(1, 5):
            for b in range(2):
                src = f"layer{layer}.{b}"
                stride = 2 if (layer > 1 and b == 0) else 1
                idn = x
                h = F.relu(bn(conv(x, f"{src}.conv1", stride, 1), f"{src}.bn1"))
                h = bn(conv(h, f"{src}.conv2", 1, 1), f"{src}.bn2")
                if f"{src}.downsample.0.weight" in sd:
                    idn = bn(
                        conv(x, f"{src}.downsample.0", stride, 0),
                        f"{src}.downsample.1",
                    )
                x = F.relu(h + idn)
        return x.mean((2, 3)).numpy()


def test_resnet18_torch_import_matches_torch():
    """import_torch_resnet18 + ResNet18Trunk reproduce eval-mode torchvision
    resnet18 (the reference's pretrained frozen trunk, networks.py:30-43)."""
    from diffbinaural_tpu.core.checkpoint import (
        import_torch_resnet18,
        is_torchvision_resnet18_sd,
    )
    from diffbinaural_tpu.models.visual import ResNet18Trunk

    rng = np.random.default_rng(7)
    sd = _synthetic_resnet18_sd(rng)
    assert is_torchvision_resnet18_sd(sd)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    expected = _torch_resnet18_forward(sd, x)

    params = import_torch_resnet18(sd)
    got = np.asarray(ResNet18Trunk().apply(params, jnp.asarray(x)))
    assert got.shape == (2, 512)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_resnet18_graft_into_encoder():
    """graft_resnet18_trunk swaps only the trunk; the encoder still runs and
    its output depends on the grafted weights."""
    from diffbinaural_tpu.core.checkpoint import graft_resnet18_trunk
    from diffbinaural_tpu.models.visual import ResnetEncoder

    rng = np.random.default_rng(1)
    enc = ResnetEncoder()
    x = jnp.asarray(rng.standard_normal((1, 3, 2, 32, 32)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    out0 = enc.apply(variables, x)

    grafted = graft_resnet18_trunk(variables, _synthetic_resnet18_sd(rng))
    out1 = enc.apply(grafted, x)
    assert out1.shape == (1, 512)
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # mixer params untouched
    a = variables["params"]["encoder"]
    b = grafted["params"]["encoder"]
    assert all(
        np.array_equal(x1, x2)
        for x1, x2 in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        )
    )
