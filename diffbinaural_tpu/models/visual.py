"""Visual conditioning encoders, TPU-native (flax, frozen trunks).

Capability-parity re-design of /root/reference/DiffBinaural/modules/networks.py:
every encoder consumes per-frame (and per-source) images plus optional
positional data and emits a (B, 512) conditioning vector for the UNet's
cross-attention.

  * ``CLIPVisionTransformer`` — ViT-B/32 image tower (reference uses
    ``clip.load("ViT-B/32")``, models.py:17-30).  Parameter names mirror the
    OpenAI checkpoint layout so torch weights import 1:1 (see
    core.torch_import); the trunk is frozen (stop_gradient) exactly like the
    reference (networks.py:341-342).
  * ``ClipEncoder``       — per-frame CLIP + TransformerEncoderLayer + mean
    pool (networks.py:137-183, the surviving second definition)
  * ``ClipPos``           — 3D (dist, elev, azim) sinusoidal FiLM variant
    (networks.py:188-270)
  * ``ClipPos2D``         — THE default encoder (networks.py:331-439):
    separate elevation/azimuth sinusoidal embeds → mlp_scale/mlp_shift FiLM,
    masked source attention + FF, max over sources, temporal encoder, mean
    over time
  * ``ClipPos2DConcat``   — concat (elev, azim) → 514→512 projection
    (networks.py:567-667)
  * ``ClipPos2DEnhanced`` — 514-token projection + source transformer +
    ``SetTransformerAggregation`` + temporal transformer with sinusoidal
    time PE + masked mean/attentive pool + final projection/normalise
    (networks.py:670-902).  The reference's boolean-indexed NaN guards
    become mask-parameterised `jnp.where` — same results, one static graph.
  * ``ResnetEncoder``     — frozen ResNet18 trunk + torch-style Transformer
    (networks.py:30-82); BatchNorm runs folded (frozen eval mode).

Masks follow the reference convention: True = INVALID/padded source.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..core.config import CLIPConfig, CLIPTextConfig
from .unet import SinusoidalPosEmb


# ---------------------------------------------------------------------------
# torch-style transformer encoder layer
# ---------------------------------------------------------------------------


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention semantics: packed qkv biases, out_proj,
    optional key-padding mask (True = PAD)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True,
                 attn_mask=None):
        d = self.dim // self.num_heads
        proj = lambda name: nn.Dense(self.dim, dtype=self.dtype, name=name)
        qh, kh, vh = proj("q_proj")(q), proj("k_proj")(k), proj("v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qh), split(kh), split(vh)
        sim = jnp.einsum(
            "bhid,bhjd->bhij", qh * (d**-0.5), kh,
            preferred_element_type=jnp.float32,
        )
        if attn_mask is not None:
            # additive (N_q, N_k) float mask, torch MultiheadAttention-style
            # (the CLIP text tower's causal mask)
            sim = sim + attn_mask[None, None].astype(sim.dtype)
        if key_padding_mask is not None:
            # True = PAD → -inf; rows with ALL keys padded would softmax to
            # NaN — give them uniform weights instead (callers override the
            # output for those rows).
            pad = key_padding_mask[:, None, None, :]
            sim = jnp.where(pad, jnp.finfo(jnp.float32).min, sim)
            all_pad = jnp.all(key_padding_mask, axis=-1)[:, None, None, None]
            sim = jnp.where(all_pad, 0.0, sim)
        attn = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        attn = nn.Dropout(self.dropout, name="attn_drop")(
            attn, deterministic=deterministic
        )
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        b, h, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer: MHA + ReLU-MLP, post-norm by default,
    pre-norm when ``norm_first`` (used by the Enhanced encoder)."""

    dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    norm_first: bool = False
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        act = nn.relu if self.activation == "relu" else nn.gelu
        attn = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, dtype=self.dtype, name="self_attn"
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        drop = lambda name: nn.Dropout(self.dropout, name=name)

        def ff(h):
            h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(h)
            h = drop("ff_drop")(act(h), deterministic=deterministic)
            return nn.Dense(self.dim, dtype=self.dtype, name="linear2")(h)

        if self.norm_first:
            h = norm1(x)
            x = x + drop("drop1")(
                attn(h, h, h, key_padding_mask, deterministic), deterministic
            )
            x = x + drop("drop2")(ff(norm2(x)), deterministic)
        else:
            x = norm1(
                x
                + drop("drop1")(
                    attn(x, x, x, key_padding_mask, deterministic), deterministic
                )
            )
            x = norm2(x + drop("drop2")(ff(x), deterministic))
        return x


class TransformerEncoder(nn.Module):
    num_layers: int
    dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                self.norm_first, dtype=self.dtype, name=f"layer_{i}",
            )(x, key_padding_mask, deterministic)
        return x


# ---------------------------------------------------------------------------
# CLIP ViT-B/32 image tower
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPResidualBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        h = MultiHeadAttention(
            self.width, self.heads, dtype=self.dtype, name="attn"
        )(h, h, h, attn_mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x + h


class CLIPVisionTransformer(nn.Module):
    """ViT-B/32 ``encode_image``: 224×224×3 → (B, 512), QuickGELU MLPs,
    class token + learned position embedding, pre/post LayerNorm, linear
    projection to the shared embedding space."""

    config: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, 3, H, W) CLIP-preprocessed → (B, output_dim)."""
        c = self.config
        b = images.shape[0]
        x = jnp.moveaxis(images, 1, -1).astype(self.dtype)  # NHWC
        x = nn.Conv(
            c.width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            padding="VALID",
            dtype=self.dtype,
            name="conv1",
        )(x)
        grid = x.shape[1] * x.shape[2]
        x = x.reshape(b, grid, c.width)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(c.width**-0.5),
            (c.width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.width)).astype(self.dtype), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c.width**-0.5),
            (grid + 1, c.width),
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(c.layers):
            x = CLIPResidualBlock(
                c.width, c.heads, dtype=self.dtype, name=f"resblock_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj",
            nn.initializers.normal(c.width**-0.5),
            (c.width, c.output_dim),
        )
        return x @ proj.astype(self.dtype)


class CLIPTextTransformer(nn.Module):
    """CLIP ``encode_text``: BPE token ids (B, 77) → (B, 512).

    The reference encoders each expose ``forward_text`` delegating to the
    CLIP model's text tower (DiffBinaural/modules/networks.py:108-109,
    :164-165, :230-231, :385-386, :614-615, :766-768) — unused by the
    shipped training scripts but part of the encoder API surface.  Causally
    masked transformer; the feature is read at each sequence's
    end-of-text token (the argmax of the token ids, EOT being the largest
    id) and projected to the shared embedding space.
    """

    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        n = tokens.shape[1]
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[:n].astype(self.dtype)
        causal = jnp.triu(
            jnp.full((n, n), jnp.finfo(jnp.float32).min, jnp.float32), k=1
        )
        for i in range(c.layers):
            x = CLIPResidualBlock(
                c.width, c.heads, dtype=self.dtype, name=f"resblock_{i}"
            )(x, attn_mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the largest token id
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(c.width**-0.5),
            (c.width, c.output_dim),
        )
        return x @ proj.astype(self.dtype)


class CLIPModel(nn.Module):
    """Both CLIP towers under one param tree — the ``clip.load()`` surface
    the reference encoders hold (encode_image / encode_text / similarity
    logits).  setup()-based so every method works through ``apply``."""

    vision: CLIPConfig = CLIPConfig()
    text: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTransformer(
            self.vision, dtype=self.dtype, name="visual"
        )
        self.transformer = CLIPTextTransformer(
            self.text, dtype=self.dtype, name="text"
        )
        self.logit_scale = self.param(
            "logit_scale", lambda _key: jnp.asarray(np.log(1.0 / 0.07), jnp.float32)
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.transformer(tokens)

    def __call__(self, images, tokens):
        """→ (logits_per_image, logits_per_text), L2-normalised + scaled."""
        im = self.encode_image(images)
        tx = self.encode_text(tokens)
        im = im / jnp.linalg.norm(im, axis=-1, keepdims=True)
        tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
        logits = jnp.exp(self.logit_scale) * im @ tx.T
        return logits, logits.T


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


class PositionwiseFeedForward(nn.Module):
    """Linear→ReLU→Dropout→Linear (reference networks.py:273-295)."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.relu(nn.Dense(self.d_ff, dtype=self.dtype, name="w_1")(x))
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="w_2")(h)


def sinusoidal_position_encoding(length: int, dim: int) -> np.ndarray:
    """Interleaved sin/cos time PE (reference networks.py:455-464)."""
    pe = np.zeros((length, dim), dtype=np.float32)
    position = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class SetTransformerAggregation(nn.Module):
    """Order-invariant N→1 aggregation: learnable seed cross-attends to the
    valid sources; frames with zero valid sources return a learnable null
    embedding (reference networks.py:471-536).  mask: True = INVALID."""

    emb_dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        b, n, e = x.shape
        seed = self.param(
            "seed", nn.initializers.normal(1.0), (1, 1, self.emb_dim)
        )
        null = self.param(
            "null_embed", nn.initializers.normal(0.02), (1, self.emb_dim)
        )
        seeds = jnp.broadcast_to(seed, (b, 1, self.emb_dim)).astype(self.dtype)
        attn_out = MultiHeadAttention(
            self.emb_dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="cross_attention",
        )(seeds, x, x, key_padding_mask=mask, deterministic=deterministic)
        drop = nn.Dropout(self.dropout, name="drop")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(
            seeds + drop(attn_out, deterministic=deterministic)
        )
        ffn = nn.Dense(self.emb_dim * 2, dtype=self.dtype, name="ffn_1")(h)
        ffn = nn.Dropout(self.dropout, name="ffn_drop")(
            nn.gelu(ffn), deterministic=deterministic
        )
        ffn = nn.Dense(self.emb_dim, dtype=self.dtype, name="ffn_2")(ffn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(
            h + drop(ffn, deterministic=deterministic)
        )
        out = h[:, 0]
        all_invalid = jnp.all(mask, axis=1, keepdims=True)
        return jnp.where(all_invalid, null.astype(self.dtype), out)


class AttentiveTemporalPool(nn.Module):
    """Masked learned attention pooling over time (reference :543-560)."""

    emb_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seq, mask_invalid):
        q = self.param("query", nn.initializers.normal(1.0), (1, 1, self.emb_dim))
        scores = jnp.einsum("bte,ote->bt", seq, q.astype(seq.dtype))
        scores = jnp.where(mask_invalid, -jnp.inf, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(jnp.isnan(attn), 0.0, attn)
        return (seq * attn[..., None]).sum(axis=1)


# ---------------------------------------------------------------------------
# the encoder family
# ---------------------------------------------------------------------------


def _encode_frames(clip_tower, x):
    """(B, C, T, N, H, W) → (B, T, N, 512) through the frozen CLIP tower."""
    B, C, T, N, H, W = x.shape
    flat = x.transpose(0, 2, 3, 1, 4, 5).reshape(B * T * N, C, H, W)
    feats = clip_tower(flat)
    feats = jax.lax.stop_gradient(feats)  # frozen trunk
    return feats.reshape(B, T, N, -1)


class ClipEncoder(nn.Module):
    """CLIP per frame + encoder layer + mean over T
    (reference networks.py:137-183; frames have no source axis here)."""

    clip: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, C, T, H, W) → (B, 512)"""
        B, C, T, H, W = x.shape
        clip_tower = CLIPVisionTransformer(self.clip, dtype=self.dtype, name="clip")
        flat = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        feats = jax.lax.stop_gradient(clip_tower(flat)).reshape(B, T, -1)
        feats = TransformerEncoderLayer(
            512, 8, 2048, dtype=self.dtype, name="temporal_transformer_encoder"
        )(feats, deterministic=deterministic)
        return feats.mean(axis=1)

    # NOTE: the reference ClipEncoder also exposes forward_text /
    # encode_image on the underlying CLIP model (networks.py:160-183);
    # standalone tower access lives in CLIPModel (encode_image/encode_text)
    # — an inline submodule in a plain method would be invalid flax.


class _PosAttnStack(nn.Module):
    """MaskedAttention + FF residual refinement shared by the Pos encoders
    (reference networks.py:254-259 / :422-428)."""

    emb_dim: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask, deterministic=True):
        from .attention import MaskedAttention

        drop = nn.Dropout(self.dropout, name="pos_dropout")
        attn = MaskedAttention(
            self.emb_dim, heads=8, dim_head=64, dtype=self.dtype,
            name="pos_attention",
        )(x, mask=valid_mask, deterministic=deterministic)
        x = x + drop(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pos_layer1")(x)
        ff = PositionwiseFeedForward(
            self.emb_dim, self.emb_dim * 4, self.dropout, dtype=self.dtype,
            name="pos_ff",
        )(x, deterministic=deterministic)
        x = x + drop(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pos_layer2")(x)


class ClipPos(nn.Module):
    """3D-position FiLM variant (reference networks.py:188-270)."""

    max_sources: int = 4
    clip: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, mask, deterministic=True):
        """x: (B,C,T,N,H,W); pos: (B,T,N,3); mask: (B,T,N) True=invalid."""
        B, C, T, N, H, W = x.shape
        clip_tower = CLIPVisionTransformer(self.clip, dtype=self.dtype, name="clip")
        feats = _encode_frames(clip_tower, x).reshape(B * T, N, 512)

        emb = SinusoidalPosEmb(64, name="pos_emb")(pos.reshape(-1))
        emb = emb.reshape(B * T * N, 192)
        emb = nn.gelu(
            nn.Dense(1024, dtype=self.dtype, name="pos_emb_mlp")(
                emb.astype(self.dtype)
            )
        )
        scale, shift = jnp.split(emb.reshape(B * T, N, 1024), 2, axis=-1)
        feats = feats * (scale + 1.0) + shift

        valid = ~mask.reshape(B * T, N)
        feats = _PosAttnStack(dtype=self.dtype, name="pos_stack")(
            feats, valid, deterministic
        )
        feats = feats.max(axis=1).reshape(B, T, 512)
        feats = TransformerEncoderLayer(
            512, 8, 2048, dtype=self.dtype, name="temporal_transformer_encoder"
        )(feats, deterministic=deterministic)
        return feats.mean(axis=1)


class ClipPos2D(nn.Module):
    """THE default visual encoder (reference networks.py:331-439).

    forward_multiframe(x (B,C,T,N,H,W), pos (B,T,N,2) [elev, azim],
    mask (B,T,N) True=invalid) → (B, 512)
    """

    max_sources: int = 4
    pos_emb_dim: int = 64
    clip: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, mask, deterministic=True):
        B, C, T, N, H, W = x.shape
        clip_tower = CLIPVisionTransformer(self.clip, dtype=self.dtype, name="clip")
        feats = _encode_frames(clip_tower, x).reshape(B * T, N, 512)

        emb_ele = SinusoidalPosEmb(self.pos_emb_dim, name="pos_emb_ele")(
            pos[..., 0].reshape(-1)
        ).astype(self.dtype)
        emb_azi = SinusoidalPosEmb(self.pos_emb_dim, name="pos_emb_azi")(
            pos[..., 1].reshape(-1)
        ).astype(self.dtype)

        def mlp(name, h):
            h = nn.Dense(512, dtype=self.dtype, name=f"{name}_1")(h)
            h = nn.gelu(h)
            return nn.Dense(512, dtype=self.dtype, name=f"{name}_2")(h)

        scale = mlp("mlp_scale", emb_ele).reshape(B * T, N, 512)
        shift = mlp("mlp_shift", emb_azi).reshape(B * T, N, 512)
        feats = feats * (scale + 1.0) + shift

        valid = ~mask.reshape(B * T, N)
        feats = _PosAttnStack(dtype=self.dtype, name="pos_stack")(
            feats, valid, deterministic
        )
        feats = feats.max(axis=1).reshape(B, T, 512)
        feats = TransformerEncoderLayer(
            512, 8, 2048, dtype=self.dtype, name="temporal_transformer_encoder"
        )(feats, deterministic=deterministic)
        return feats.mean(axis=1)


class ClipPos2DConcat(nn.Module):
    """Concat (elev, azim) → 514→512 projection variant
    (reference networks.py:567-667)."""

    clip: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, mask, deterministic=True):
        B, C, T, N, H, W = x.shape
        clip_tower = CLIPVisionTransformer(self.clip, dtype=self.dtype, name="clip")
        feats = _encode_frames(clip_tower, x)  # (B, T, N, 512)
        feats = jnp.concatenate([feats, pos.astype(feats.dtype)], axis=-1)
        feats = nn.Dense(512, dtype=self.dtype, name="pos_projection")(feats)
        feats = nn.Dropout(0.1, name="proj_drop")(
            nn.gelu(feats), deterministic=deterministic
        )
        feats = feats.reshape(B * T, N, 512)

        valid = ~mask.reshape(B * T, N)
        feats = _PosAttnStack(dtype=self.dtype, name="pos_stack")(
            feats, valid, deterministic
        )
        feats = feats.max(axis=1).reshape(B, T, 512)
        feats = TransformerEncoderLayer(
            512, 8, 2048, dtype=self.dtype, name="temporal_transformer_encoder"
        )(feats, deterministic=deterministic)
        return feats.mean(axis=1)


class ClipPos2DEnhanced(nn.Module):
    """Pixel-coordinate token variant with set aggregation
    (reference networks.py:670-902).  pos_xy ∈ [-1, 1]."""

    num_heads: int = 8
    num_source_layers: int = 2
    num_temporal_layers: int = 2
    temporal_pool: str = "mean"  # 'mean' | 'attn'
    use_time_pe: bool = True
    normalize_clip: bool = True
    dropout: float = 0.1
    clip: CLIPConfig = CLIPConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_xy, mask, deterministic=True):
        B, C, T, N, H, W = x.shape
        mask = mask.astype(bool)
        clip_tower = CLIPVisionTransformer(self.clip, dtype=self.dtype, name="clip")
        clip_feats = _encode_frames(clip_tower, x)  # (B, T, N, 512)
        if self.normalize_clip:
            clip_feats = clip_feats / jnp.maximum(
                jnp.linalg.norm(clip_feats, axis=-1, keepdims=True), 1e-12
            )

        tokens = jnp.concatenate([clip_feats, pos_xy.astype(clip_feats.dtype)], -1)
        tokens = nn.Dense(512, dtype=self.dtype, name="token_proj_1")(tokens)
        tokens = nn.Dropout(self.dropout, name="token_drop")(
            nn.gelu(tokens), deterministic=deterministic
        )
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="token_proj_ln")(
            tokens
        )

        src = tokens.reshape(B * T, N, 512)
        src_kpm = mask.reshape(B * T, N)  # True = PAD
        src = TransformerEncoder(
            self.num_source_layers, 512, self.num_heads, 2048, self.dropout,
            norm_first=True, dtype=self.dtype, name="source_encoder",
        )(src, key_padding_mask=src_kpm, deterministic=deterministic)
        # frames whose sources are ALL invalid contribute zeros
        # (reference :831-843 zero-fills those rows)
        src = jnp.where(jnp.all(src_kpm, axis=1)[:, None, None], 0.0, src)

        agg = SetTransformerAggregation(
            512, self.num_heads, self.dropout, dtype=self.dtype,
            name="set_aggregator",
        )(src, src_kpm, deterministic=deterministic)
        agg = agg.reshape(B, T, 512)

        frame_valid = jnp.any(~mask, axis=2)  # (B, T)
        frame_kpm = ~frame_valid
        time_in = agg
        if self.use_time_pe:
            time_in = time_in + jnp.asarray(
                sinusoidal_position_encoding(T, 512)
            ).astype(time_in.dtype)

        enc = TransformerEncoder(
            self.num_temporal_layers, 512, self.num_heads, 2048, self.dropout,
            norm_first=True, dtype=self.dtype, name="temporal_encoder",
        )(time_in, key_padding_mask=frame_kpm, deterministic=deterministic)

        if self.temporal_pool == "attn":
            pooled = AttentiveTemporalPool(512, dtype=self.dtype, name="pooler")(
                enc, frame_kpm
            )
        else:
            w = frame_valid.astype(enc.dtype)[..., None]
            pooled = (enc * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)

        null = self.param(
            "null_temporal", nn.initializers.normal(0.02), (1, 512)
        )
        batch_valid = jnp.any(frame_valid, axis=1, keepdims=True)
        out = jnp.where(batch_valid, pooled, null.astype(pooled.dtype))

        out = nn.Dense(512, dtype=self.dtype, name="final_projection_1")(out)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_projection_ln")(
            nn.gelu(out)
        )
        if self.normalize_clip:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out


# ---------------------------------------------------------------------------
# ResNet18 trunk variant
# ---------------------------------------------------------------------------


class FrozenBN(nn.Module):
    """BatchNorm in frozen eval mode: an affine transform with imported
    running stats (the reference trunk is frozen, networks.py:37-38)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return (x - mean) * inv + bias


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        # torch padding=1 explicitly: for stride 2, "SAME" would pad (0,1)
        # and shift every window center off torchvision's by one pixel
        h = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        h = nn.relu(FrozenBN(self.features, name="bn1")(h))
        h = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = FrozenBN(self.features, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(x)
            identity = FrozenBN(self.features, name="down_bn")(identity)
        return nn.relu(h + identity)


class ResNet18Trunk(nn.Module):
    """torchvision resnet18 minus the fc head → (B, 512) after global pool."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, 3, H, W) → (B, 512)"""
        x = jnp.moveaxis(x, 1, -1).astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(FrozenBN(64, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        plan = [(64, 1), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                (512, 2), (512, 1)]
        for i, (f, s) in enumerate(plan):
            x = BasicBlock(f, s, dtype=self.dtype, name=f"block_{i}")(x)
        return x.mean(axis=(1, 2))


class ResnetEncoder(nn.Module):
    """Frozen ResNet18 + torch-style Transformer temporal mixer
    (reference networks.py:30-82: encoder 3 layers, decoder 1 layer,
    d_model 512, ff 512; first frame's spatial map is discarded in favour of
    per-frame pooled features)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, 3, T, H, W) → (B, 512)"""
        B, C, T, H, W = x.shape
        trunk = ResNet18Trunk(dtype=self.dtype, name="features")
        flat = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        feats = jax.lax.stop_gradient(trunk(flat)).reshape(B, T, 512)

        enc = TransformerEncoder(
            3, 512, 8, 512, dropout=0.1, dtype=self.dtype, name="encoder"
        )(feats, deterministic=deterministic)
        # decoder layer: self-attn on tgt + cross-attn to memory + FF
        tgt = feats
        attn = lambda name: MultiHeadAttention(
            512, 8, dtype=self.dtype, name=name
        )
        norm = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        h = norm("dec_norm1")(tgt + attn("dec_self_attn")(tgt, tgt, tgt))
        h = norm("dec_norm2")(h + attn("dec_cross_attn")(h, enc, enc))
        ff = nn.Dense(512, dtype=self.dtype, name="dec_linear2")(
            nn.relu(nn.Dense(512, dtype=self.dtype, name="dec_linear1")(h))
        )
        h = norm("dec_norm3")(h + ff)
        return h.mean(axis=1)


ENCODER_REGISTRY = {
    "clip": ClipEncoder,
    "clip_pos": ClipPos,
    "clip_pos2d": ClipPos2D,
    "clip_pos2d_concat": ClipPos2DConcat,
    "clip_pos2d_enhanced": ClipPos2DEnhanced,
    "resnet18": ResnetEncoder,
}


def build_visual(arch_frame: str = "clip_pos2d", **kwargs) -> nn.Module:
    """Factory matching reference ModelBuilder.build_visual
    (/root/reference/DiffBinaural/modules/models.py:10-35)."""
    if arch_frame not in ENCODER_REGISTRY:
        raise ValueError(f"unknown arch_frame {arch_frame!r}")
    return ENCODER_REGISTRY[arch_frame](**kwargs)
