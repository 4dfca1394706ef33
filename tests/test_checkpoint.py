"""Checkpoint roundtrip + torch import shim tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffbinaural_tpu.core.checkpoint import (
    export_bigvgan_to_torch,
    import_torch_bigvgan,
    import_torch_clip_vision,
    load_checkpoint,
    save_checkpoint,
    scan_checkpoint,
)
from diffbinaural_tpu.core.config import CLIPConfig, VocoderConfig
from diffbinaural_tpu.models.bigvgan import BigVGAN
from diffbinaural_tpu.models.visual import CLIPVisionTransformer, MultiHeadAttention

TINY = VocoderConfig(
    num_mels=8,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def test_save_load_scan_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.float32(2.5)}}
    for step in (1, 12, 120):
        save_checkpoint(str(tmp_path / f"g_{step:08d}"), tree)
    latest = scan_checkpoint(str(tmp_path), "g_")
    assert latest.endswith("g_00000120")
    loaded = load_checkpoint(latest)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    assert float(loaded["b"]["c"]) == 2.5


def test_bigvgan_torch_roundtrip_and_forward():
    """export → import must be identity, and the imported params must run."""
    model = BigVGAN(TINY)
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    params = model.init(jax.random.PRNGKey(1), mel)
    ref_out = model.apply(params, mel)

    sd = export_bigvgan_to_torch(params, TINY)
    # simulate a reference .pth: torch tensors wrapped in {"generator": ...}
    sd_t = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    re_params = import_torch_bigvgan({k: v for k, v in sd_t.items()}, TINY)
    out = model.apply(re_params, mel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)


def test_clip_attention_import_matches_torch():
    """Imported in_proj split must reproduce torch MultiheadAttention."""
    d, h, n = 32, 4, 6
    torch.manual_seed(0)
    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(2, n, d)
    with torch.no_grad():
        want, _ = mha(x, x, x)

    sd = {k: v.detach().numpy() for k, v in mha.state_dict().items()}
    in_w, in_b = sd["in_proj_weight"], sd["in_proj_bias"]
    params = {
        "params": {
            "q_proj": {"kernel": in_w[:d].T, "bias": in_b[:d]},
            "k_proj": {"kernel": in_w[d : 2 * d].T, "bias": in_b[d : 2 * d]},
            "v_proj": {"kernel": in_w[2 * d :].T, "bias": in_b[2 * d :]},
            "out_proj": {"kernel": sd["out_proj.weight"].T,
                         "bias": sd["out_proj.bias"]},
        }
    }
    ours = MultiHeadAttention(d, h)
    got = ours.apply(params, jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
                     jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_clip_vision_import_shapes():
    """A synthetic visual.* state dict imports and runs the tower."""
    cfg = CLIPConfig(image_size=32, patch_size=16, width=64, layers=2, heads=2)
    rng = np.random.default_rng(0)
    sd = {
        "visual.conv1.weight": rng.standard_normal((64, 3, 16, 16)).astype(
            np.float32
        ),
        "visual.class_embedding": rng.standard_normal(64).astype(np.float32),
        "visual.positional_embedding": rng.standard_normal((5, 64)).astype(
            np.float32
        ),
        "visual.ln_pre.weight": np.ones(64, np.float32),
        "visual.ln_pre.bias": np.zeros(64, np.float32),
        "visual.ln_post.weight": np.ones(64, np.float32),
        "visual.ln_post.bias": np.zeros(64, np.float32),
        "visual.proj": rng.standard_normal((64, 512)).astype(np.float32),
    }
    for i in range(2):
        b = f"visual.transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = np.ones(64, np.float32)
        sd[f"{b}.ln_1.bias"] = np.zeros(64, np.float32)
        sd[f"{b}.ln_2.weight"] = np.ones(64, np.float32)
        sd[f"{b}.ln_2.bias"] = np.zeros(64, np.float32)
        sd[f"{b}.attn.in_proj_weight"] = rng.standard_normal((192, 64)).astype(
            np.float32
        )
        sd[f"{b}.attn.in_proj_bias"] = np.zeros(192, np.float32)
        sd[f"{b}.attn.out_proj.weight"] = rng.standard_normal((64, 64)).astype(
            np.float32
        )
        sd[f"{b}.attn.out_proj.bias"] = np.zeros(64, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = rng.standard_normal((256, 64)).astype(
            np.float32
        )
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(256, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = rng.standard_normal((64, 256)).astype(
            np.float32
        )
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(64, np.float32)

    params = import_torch_clip_vision(sd)
    model = CLIPVisionTransformer(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    # identical tree structure → apply works with the imported weights
    a = jax.tree_util.tree_structure(ref)
    b_ = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params)
    )
    assert a == b_
    out = model.apply(params, jnp.zeros((2, 3, 32, 32)))
    assert out.shape == (2, 512)
    assert bool(jnp.isfinite(out).all())


def test_orbax_backend_roundtrip(tmp_path):
    """backend="orbax" writes a directory; load_checkpoint auto-detects it
    and conforms to a target structure like the msgpack path does."""
    from diffbinaural_tpu.core import checkpoint as ckpt

    tree = {
        "w": np.arange(6, dtype=np.float32).reshape(2, 3),
        "nested": {"b": np.float32(2.5), "ints": np.arange(4)},
    }
    path = str(tmp_path / "g_00000001")
    ckpt.save_checkpoint(path, tree, backend="orbax")
    assert os.path.isdir(path)

    restored = ckpt.load_checkpoint(path)
    np.testing.assert_array_equal(restored["w"], tree["w"])
    np.testing.assert_array_equal(restored["nested"]["ints"], tree["nested"]["ints"])

    # target-conforming restore + scan_checkpoint finds the directory
    target = {"w": np.zeros((2, 3), np.float32),
              "nested": {"b": np.float32(0), "ints": np.zeros(4, np.int64)}}
    conformed = ckpt.load_checkpoint(path, target)
    np.testing.assert_array_equal(conformed["w"], tree["w"])
    assert ckpt.scan_checkpoint(str(tmp_path), "g_") == path

    # overwrite with new values (same path) must not raise
    tree["w"] = tree["w"] + 1
    ckpt.save_checkpoint(path, tree, backend="orbax")
    np.testing.assert_array_equal(ckpt.load_checkpoint(path)["w"], tree["w"])


def test_orbax_restore_conforms_by_name_not_order(tmp_path):
    """A dataclass target whose flatten order differs from sorted-key order
    must restore correctly — order-based tree_unflatten would silently swap
    the leaves here."""
    import flax.struct

    from diffbinaural_tpu.core import checkpoint as ckpt

    @flax.struct.dataclass
    class State:
        zeta: np.ndarray  # field order (zeta, alpha) != sorted (alpha, zeta)
        alpha: np.ndarray

    state = State(
        zeta=np.full((2, 2), 7.0, np.float32),
        alpha=np.arange(3, dtype=np.float32),
    )
    path = str(tmp_path / "state_ckpt")
    ckpt.save_checkpoint(path, state, backend="orbax")
    target = State(
        zeta=np.zeros((2, 2), np.float32), alpha=np.zeros(3, np.float32)
    )
    restored = ckpt.load_checkpoint(path, target)
    np.testing.assert_array_equal(restored.zeta, state.zeta)
    np.testing.assert_array_equal(restored.alpha, state.alpha)


def test_orbax_overwrite_is_crash_safe(tmp_path, monkeypatch):
    """A save that dies mid-write must leave the previous checkpoint
    loadable (tmp-dir + rename semantics, like the msgpack path)."""
    import orbax.checkpoint as ocp

    from diffbinaural_tpu.core import checkpoint as ckpt

    tree = {"w": np.ones(4, np.float32)}
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, tree, backend="orbax")

    class Boom(Exception):
        pass

    class FailingCkptr:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def save(self, *a, **k):
            raise Boom()

    monkeypatch.setattr(ocp, "PyTreeCheckpointer", FailingCkptr)
    import pytest

    with pytest.raises(Boom):
        ckpt.save_checkpoint(path, {"w": np.zeros(4)}, backend="orbax")
    monkeypatch.undo()  # restore the real checkpointer for the load
    np.testing.assert_array_equal(ckpt.load_checkpoint(path)["w"], tree["w"])


def test_orbax_rename_window_recovers_newest(tmp_path):
    """A crash BETWEEN _orbax_save's two renames leaves no dir at ``path``
    but a complete new save at .ocp-tmp and the previous at .ocp-old —
    load_checkpoint must recover the newest; scan must never return the
    sibling dirs."""
    from diffbinaural_tpu.core import checkpoint as ckpt

    path = str(tmp_path / "g_00000001")
    # reconstruct the window: previous save at .ocp-old, the newest
    # (finalised) save at .ocp-tmp, nothing at path
    ckpt.save_checkpoint(path, {"w": np.ones(4, np.float32)},
                         backend="orbax")
    os.rename(path, path + ".ocp-old")
    stage = str(tmp_path / "stage")
    ckpt.save_checkpoint(stage, {"w": np.full(4, 2.0, np.float32)},
                         backend="orbax")
    os.rename(stage, path + ".ocp-tmp")

    assert ckpt.scan_checkpoint(str(tmp_path), "g_") is None
    restored = ckpt.load_checkpoint(path)  # triggers recovery
    np.testing.assert_array_equal(restored["w"], np.full(4, 2.0))
    assert os.path.isdir(path)
    assert ckpt.scan_checkpoint(str(tmp_path), "g_") == path

    # old-only window (crash after the tmp rename completed): previous
    # checkpoint comes back
    import shutil

    shutil.rmtree(path + ".ocp-old")  # left in place by the recovery above
    os.rename(path, path + ".ocp-old")
    np.testing.assert_array_equal(
        ckpt.load_checkpoint(path)["w"], np.full(4, 2.0)
    )


def test_unknown_backend_raises(tmp_path):
    from diffbinaural_tpu.core import checkpoint as ckpt

    with pytest.raises(ValueError):
        ckpt.save_checkpoint(str(tmp_path / "x"), {"a": np.zeros(1)},
                             backend="hdf5")
