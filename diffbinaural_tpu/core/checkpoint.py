"""Checkpointing: reference-compatible on-disk naming + torch import shims.

Capability parity with the reference checkpoint layer (SURVEY §5.4):

  * stage 1: ``frame_{latest,best}``/``unet_{latest,best}`` + numbered
    ``frame_%06d``/``unet_%06d``/``history_%06d``
    (/root/reference/DiffBinaural/train_realBinaural.py:295-325)
  * stage 2: ``g_%08d`` = {"generator": params} and ``do_%08d`` =
    {"mpd", "mrd", "optim_g", "optim_d", "steps", "epoch"}
    (/root/reference/BigVGAN/train_binaural_both.py:1122-1143)
  * ``scan_checkpoint`` prefix-glob resume (utils.py:97-114,
    helpers.py:308-327), atomic tmp+rename writes
    (training_stabilizer.py:250-259)
  * torch → flax weight import for the BigVGAN generator and the CLIP
    ViT-B/32 tower, so reference ``.pth`` checkpoints load directly.

Storage format: flax msgpack (`flax.serialization`) — single files, so the
reference's glob patterns work unchanged.  An Orbax backend is available as
an alternative (``backend="orbax"`` — directory checkpoints with async-safe
atomic finalisation, the idiomatic large-scale JAX path); ``load_checkpoint``
and ``scan_checkpoint`` handle both transparently (Orbax checkpoints are
directories, msgpack ones are files).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# save / load / scan
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, pytree: Any, backend: str = "msgpack"):
    """Atomic checkpoint write (reference training_stabilizer.py:250-259).

    ``backend="msgpack"`` (default): single flax-msgpack file, tmp+rename.
    ``backend="orbax"``: Orbax PyTree checkpoint directory at ``path`` —
    sharded-array-aware and multi-host-safe; Orbax finalises atomically.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if backend == "orbax":
        _orbax_save(path, pytree)
        return
    if backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    data = serialization.to_bytes(
        __np(pytree)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _orbax_save(path: str, pytree: Any):
    """Crash-safe overwrite: save to a sibling temp dir, then atomically
    swap it over the old checkpoint — the previous checkpoint survives any
    crash before the rename (matching the msgpack tmp+os.replace path)."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = path + ".ocp-tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    with ocp.PyTreeCheckpointer() as ckptr:
        # store the *state dict* (nested string-keyed dicts) so restore can
        # conform by name to any target, incl. flax dataclasses
        ckptr.save(tmp, serialization.to_state_dict(__np(pytree)))
    old = path + ".ocp-old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _orbax_recover(path: str):
    """Close _orbax_save's one non-atomic window: a crash between its two
    renames leaves no directory at ``path`` but a COMPLETE new checkpoint
    at ``.ocp-tmp`` (the save finalised before any rename ran) and the
    previous one at ``.ocp-old``.  Restore the newest complete candidate."""
    if os.path.isdir(path):
        return
    tmp, old = path + ".ocp-tmp", path + ".ocp-old"
    if os.path.isdir(tmp) and os.path.isdir(old):
        # only the rename window produces this pair with ``path`` missing;
        # tmp is the finalised newer save
        os.rename(tmp, path)
    elif os.path.isdir(old):
        os.rename(old, path)


def _orbax_load(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    _orbax_recover(os.path.abspath(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    if target is not None:
        # name-based conformation (handles dataclasses / key order), same
        # semantics as the msgpack path's from_bytes — an order-based
        # tree_unflatten would silently misassign leaves whenever the
        # target's flatten order differs from the restored dict's
        return serialization.from_state_dict(target, restored)
    return restored


def __np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    if not os.path.exists(path):
        _orbax_recover(os.path.abspath(path))  # interrupted orbax swap?
    if os.path.isdir(path):  # Orbax checkpoints are directories
        return _orbax_load(path, target)
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def scan_checkpoint(cp_dir: str, prefix: str,
                    renamed_file: Optional[str] = None) -> Optional[str]:
    """Latest checkpoint matching prefix, with the HF-renamed-file fallback
    (reference utils.py:97-114: e.g. ``bigvgan_generator.pt`` /
    ``bigvgan_discriminator_optimizer.pt``)."""
    pattern = os.path.join(cp_dir, prefix + "*")
    cps = [
        p for p in glob.glob(pattern)
        if not p.endswith((".tmp", ".ocp-tmp", ".ocp-old"))
    ]
    if cps:
        return sorted(cps)[-1]
    if renamed_file:
        renamed = os.path.join(cp_dir, renamed_file)
        if os.path.isfile(renamed):
            return renamed
    return None


def save_history(path: str, history: Dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(history, f)
    os.replace(tmp, path)


def load_history(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# torch → flax import shims
# ---------------------------------------------------------------------------


def _load_torch_state_dict(path_or_sd):
    if isinstance(path_or_sd, (str, os.PathLike)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "generator" in sd:
            sd = sd["generator"]
        return {k: v.numpy() for k, v in sd.items()}
    return {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in path_or_sd.items()
    }


def import_torch_bigvgan(path_or_sd, config) -> Dict:
    """Reference BigVGAN generator state dict → our flax param tree.

    torch weight-norm stores weight_v/weight_g; layouts:
      Conv1d        (out, in, k)   g: (out, 1, 1)
      ConvTranspose (in, out, k)   g: (in, 1, 1)
    ours: WNConv1d v (k, in, out), g (out,);
          WNConvTranspose1d v (k, out, in), g (in,).
    """
    sd = _load_torch_state_dict(path_or_sd)
    params: Dict[str, Any] = {}

    def conv(dst, src, bias=True):
        params[dst] = {
            "v": sd[f"{src}.weight_v"].transpose(2, 1, 0),
            "g": sd[f"{src}.weight_g"].reshape(-1),
        }
        if bias and f"{src}.bias" in sd:
            params[dst]["b"] = sd[f"{src}.bias"]

    def tconv(dst, src):
        params[dst] = {
            "v": sd[f"{src}.weight_v"].transpose(2, 1, 0),
            "g": sd[f"{src}.weight_g"].reshape(-1),
            "b": sd[f"{src}.bias"],
        }

    conv("conv_pre", "conv_pre")
    num_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        tconv(f"up_{i}", f"ups.{i}.0")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            blk: Dict[str, Any] = {}
            n_dil = len(config.resblock_dilation_sizes[j])
            for m in range(n_dil):
                for tname, oname in (
                    (f"convs1.{m}", f"conv1_{m}"),
                    (f"convs2.{m}", f"conv2_{m}"),
                ):
                    src = f"resblocks.{flat}.{tname}"
                    blk[oname] = {
                        "v": sd[f"{src}.weight_v"].transpose(2, 1, 0),
                        "g": sd[f"{src}.weight_g"].reshape(-1),
                        "b": sd[f"{src}.bias"],
                    }
            for a in range(2 * n_dil):
                act = {"alpha": sd[f"resblocks.{flat}.activations.{a}.act.alpha"]}
                beta = f"resblocks.{flat}.activations.{a}.act.beta"
                if beta in sd:
                    act["beta"] = sd[beta]
                blk[f"act{a}"] = {"act": act}
            params[f"resblock_{i}_{j}"] = blk

    post_act = {"alpha": sd["activation_post.act.alpha"]}
    if "activation_post.act.beta" in sd:
        post_act["beta"] = sd["activation_post.act.beta"]
    params["activation_post"] = {"act": post_act}
    conv("conv_post", "conv_post", bias=config.use_bias_at_final)
    return {"params": params}


def import_torch_clip_vision(path_or_sd) -> Dict:
    """OpenAI CLIP ``visual.*`` weights → CLIPVisionTransformer params."""
    sd = _load_torch_state_dict(path_or_sd)
    pfx = "visual." if any(k.startswith("visual.") for k in sd) else ""
    g = lambda k: sd[pfx + k].astype(np.float32)

    def dense(w, b=None):
        out = {"kernel": w.T.astype(np.float32)}
        if b is not None:
            out["bias"] = b.astype(np.float32)
        return out

    def ln(k):
        return {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params: Dict[str, Any] = {
        "conv1": {"kernel": g("conv1.weight").transpose(2, 3, 1, 0)},
        "class_embedding": g("class_embedding"),
        "positional_embedding": g("positional_embedding"),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": g("proj"),
    }
    n_layers = max(
        int(k[len(pfx):].split(".")[2]) for k in sd
        if k.startswith(pfx + "transformer.resblocks.")
    ) + 1
    for i in range(n_layers):
        b = f"transformer.resblocks.{i}"
        in_w = g(f"{b}.attn.in_proj_weight")
        in_b = g(f"{b}.attn.in_proj_bias")
        d = in_w.shape[0] // 3
        params[f"resblock_{i}"] = {
            "ln_1": ln(f"{b}.ln_1"),
            "ln_2": ln(f"{b}.ln_2"),
            "attn": {
                "q_proj": dense(in_w[:d], in_b[:d]),
                "k_proj": dense(in_w[d : 2 * d], in_b[d : 2 * d]),
                "v_proj": dense(in_w[2 * d :], in_b[2 * d :]),
                "out_proj": dense(
                    g(f"{b}.attn.out_proj.weight"), g(f"{b}.attn.out_proj.bias")
                ),
            },
            "mlp_c_fc": dense(g(f"{b}.mlp.c_fc.weight"), g(f"{b}.mlp.c_fc.bias")),
            "mlp_c_proj": dense(
                g(f"{b}.mlp.c_proj.weight"), g(f"{b}.mlp.c_proj.bias")
            ),
        }
    return {"params": params}


def import_torch_clip_text(path_or_sd) -> Dict:
    """OpenAI CLIP text-tower weights → CLIPTextTransformer params.

    Accepts the full CLIP state dict (token_embedding / positional_embedding
    / transformer.resblocks.* / ln_final / text_projection keys)."""
    sd = _load_torch_state_dict(path_or_sd)
    g = lambda k: sd[k].astype(np.float32)

    def dense(w, b=None):
        out = {"kernel": w.T.astype(np.float32)}
        if b is not None:
            out["bias"] = b.astype(np.float32)
        return out

    def ln(k):
        return {"scale": g(f"{k}.weight"), "bias": g(f"{k}.bias")}

    params: Dict[str, Any] = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "ln_final": ln("ln_final"),
        "text_projection": g("text_projection"),
    }
    n_layers = max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("transformer.resblocks.")
    ) + 1
    for i in range(n_layers):
        b = f"transformer.resblocks.{i}"
        in_w = g(f"{b}.attn.in_proj_weight")
        in_b = g(f"{b}.attn.in_proj_bias")
        d = in_w.shape[0] // 3
        params[f"resblock_{i}"] = {
            "ln_1": ln(f"{b}.ln_1"),
            "ln_2": ln(f"{b}.ln_2"),
            "attn": {
                "q_proj": dense(in_w[:d], in_b[:d]),
                "k_proj": dense(in_w[d : 2 * d], in_b[d : 2 * d]),
                "v_proj": dense(in_w[2 * d :], in_b[2 * d :]),
                "out_proj": dense(
                    g(f"{b}.attn.out_proj.weight"), g(f"{b}.attn.out_proj.bias")
                ),
            },
            "mlp_c_fc": dense(g(f"{b}.mlp.c_fc.weight"), g(f"{b}.mlp.c_fc.bias")),
            "mlp_c_proj": dense(
                g(f"{b}.mlp.c_proj.weight"), g(f"{b}.mlp.c_proj.bias")
            ),
        }
    return {"params": params}


def import_torch_clip(path_or_sd) -> Dict:
    """Full OpenAI CLIP checkpoint → CLIPModel params (both towers +
    logit_scale) — the ``clip.load()`` surface the reference encoders hold."""
    sd = _load_torch_state_dict(path_or_sd)
    vision = import_torch_clip_vision(sd)["params"]
    text_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    text = import_torch_clip_text(text_sd)["params"]
    return {
        "params": {
            "visual": vision,
            "text": text,
            "logit_scale": sd["logit_scale"].astype(np.float32),
        }
    }


def import_torch_resnet18(path_or_sd) -> Dict:
    """torchvision resnet18 state dict → ResNet18Trunk params.

    The reference's default encoder wraps a *pretrained* frozen torchvision
    ResNet18 (/root/reference/DiffBinaural/modules/networks.py:30-43,
    ``pretrained=True`` at :33); this shim lets the same weights drive our
    flax trunk.  Layout: torch Conv2d (out, in, kh, kw) → flax (kh, kw, in,
    out); BatchNorm running stats land in FrozenBN's (scale, bias, mean,
    var).  The ``fc`` head is dropped (the trunk global-pools to 512).
    """
    sd = _load_torch_state_dict(path_or_sd)

    def conv(k):
        return {"kernel": sd[f"{k}.weight"].transpose(2, 3, 1, 0).astype(
            np.float32
        )}

    def bn(k):
        return {
            "scale": sd[f"{k}.weight"].astype(np.float32),
            "bias": sd[f"{k}.bias"].astype(np.float32),
            "mean": sd[f"{k}.running_mean"].astype(np.float32),
            "var": sd[f"{k}.running_var"].astype(np.float32),
        }

    params: Dict[str, Any] = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    # torchvision layer{1..4} × block{0,1} → our flat block_{0..7}
    for layer in range(1, 5):
        for b in range(2):
            i = (layer - 1) * 2 + b
            src = f"layer{layer}.{b}"
            blk = {
                "conv1": conv(f"{src}.conv1"),
                "bn1": bn(f"{src}.bn1"),
                "conv2": conv(f"{src}.conv2"),
                "bn2": bn(f"{src}.bn2"),
            }
            if f"{src}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{src}.downsample.0")
                blk["down_bn"] = bn(f"{src}.downsample.1")
            params[f"block_{i}"] = blk
    return {"params": params}


def is_torchvision_resnet18_sd(path_or_sd) -> bool:
    """Heuristic: does this torch checkpoint hold torchvision resnet18
    weights (vs one of our own frame-encoder checkpoints)?"""
    try:
        sd = _load_torch_state_dict(path_or_sd)
    except Exception:
        return False
    return "layer1.0.conv1.weight" in sd and "conv1.weight" in sd


def graft_resnet18_trunk(frame_variables: Dict, path_or_sd) -> Dict:
    """Insert imported torchvision weights at the ResnetEncoder's
    ``features`` trunk, leaving the transformer mixer untouched."""
    imported = import_torch_resnet18(path_or_sd)["params"]
    out = dict(frame_variables)
    out["params"] = dict(frame_variables["params"])
    out["params"]["features"] = imported
    return out


def save_pretrained(save_directory: str, params: Dict, config) -> None:
    """Hub-style local save — the reference generator's
    PyTorchModelHubMixin surface (/root/reference/BigVGAN/bigvgan.py:403-493):
    writes ``config.json`` + the generator weights (named
    ``bigvgan_generator.pt`` like the HF-renamed checkpoints the reference's
    scan_checkpoint accepts, utils.py:97-114)."""
    from dataclasses import asdict

    os.makedirs(save_directory, exist_ok=True)
    cfg = asdict(config) if hasattr(config, "__dataclass_fields__") else dict(
        config
    )
    with open(os.path.join(save_directory, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    save_checkpoint(
        os.path.join(save_directory, "bigvgan_generator.pt"),
        {"generator": params},
    )


def from_pretrained(directory: str):
    """→ (params, config_dict); inverse of save_pretrained.  Also accepts a
    reference-layout directory holding a torch ``bigvgan_generator.pt``."""
    with open(os.path.join(directory, "config.json")) as f:
        cfg = json.load(f)
    path = os.path.join(directory, "bigvgan_generator.pt")
    try:
        state = load_checkpoint(path)
        return state["generator"], cfg
    except Exception:
        from .config import VocoderConfig

        vcfg = VocoderConfig.from_attrdict(cfg)
        return import_torch_bigvgan(path, vcfg), cfg


def export_bigvgan_to_torch(params: Dict, config) -> Dict[str, np.ndarray]:
    """Inverse of import_torch_bigvgan — emit a reference-layout state dict
    (numpy values; wrap in torch tensors to torch.save)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def conv(src, dst, bias=True):
        sd[f"{dst}.weight_v"] = np.asarray(p[src]["v"]).transpose(2, 1, 0)
        sd[f"{dst}.weight_g"] = np.asarray(p[src]["g"]).reshape(-1, 1, 1)
        if bias and "b" in p[src]:
            sd[f"{dst}.bias"] = np.asarray(p[src]["b"])

    conv("conv_pre", "conv_pre")
    num_kernels = len(config.resblock_kernel_sizes)
    for i in range(len(config.upsample_rates)):
        conv(f"up_{i}", f"ups.{i}.0")
        for j in range(num_kernels):
            flat = i * num_kernels + j
            blk = p[f"resblock_{i}_{j}"]
            n_dil = len(config.resblock_dilation_sizes[j])
            for m in range(n_dil):
                for oname, tname in (
                    (f"conv1_{m}", f"convs1.{m}"),
                    (f"conv2_{m}", f"convs2.{m}"),
                ):
                    sd[f"resblocks.{flat}.{tname}.weight_v"] = np.asarray(
                        blk[oname]["v"]
                    ).transpose(2, 1, 0)
                    sd[f"resblocks.{flat}.{tname}.weight_g"] = np.asarray(
                        blk[oname]["g"]
                    ).reshape(-1, 1, 1)
                    sd[f"resblocks.{flat}.{tname}.bias"] = np.asarray(
                        blk[oname]["b"]
                    )
            for a in range(2 * n_dil):
                act = blk[f"act{a}"]["act"]
                sd[f"resblocks.{flat}.activations.{a}.act.alpha"] = np.asarray(
                    act["alpha"]
                )
                if "beta" in act:
                    sd[f"resblocks.{flat}.activations.{a}.act.beta"] = (
                        np.asarray(act["beta"])
                    )
    act = p["activation_post"]["act"]
    sd["activation_post.act.alpha"] = np.asarray(act["alpha"])
    if "beta" in act:
        sd["activation_post.act.beta"] = np.asarray(act["beta"])
    conv("conv_post", "conv_post", bias=config.use_bias_at_final)
    return sd
