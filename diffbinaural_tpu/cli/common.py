"""Shared CLI machinery: model builder + stage-1 trainer/generator drivers.

Capability parity with the reference driver layer:
  * ModelBuilder (/root/reference/DiffBinaural/modules/models.py:8-43)
  * the train/eval/checkpoint epoch loop (train_realBinaural.py:244-469,
    train_fairplay.py:342-536): AdamW two-group LRs, ×0.95 at lr_steps and
    ×decay_factor every learning_rate_decrease_itr epochs, eval every
    eval_epoch with 25-step DDIM mel-L2, basic (latest/best) + advanced
    (numbered + history json) checkpoints, auto-resume by prefix scan
  * full-clip mel dumping with overlap-average (test_realBinaural.py:137-211,
    :266-278)

TPU design: the whole train step (visual encoder + diffusion loss + AdamW)
is one jitted function over the data-parallel mesh; eval batches the DDIM
windows through a single scanned sampler.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..diffusion import GaussianDiffusion
from ..infer.stage1 import Stage1Sampler, generate_clip
from ..models import AudioVisualModel
from ..models.visual import build_visual
from ..parallel import make_mesh, shard_batch
from ..train import TrainingStabilizer, make_stage1_train_step
from ..utils import AverageMeter, SummaryLogger


class ModelBuilder:
    """(reference models.py:8-43)"""

    def build_visual(self, pool_type="maxpool", input_channel=3, fc_out=512,
                     weights="", arch_frame="resnet18", clip_config=None):
        kwargs = {}
        if clip_config is not None and arch_frame.startswith("clip"):
            kwargs["clip"] = clip_config
        net = build_visual(arch_frame, **kwargs)
        return net

    def build_unet(self, dim=64, input_nc=2, output_nc=2, weights=""):
        return AudioVisualModel(dim=dim, input_nc=input_nc, output_nc=output_nc)


def visual_apply_fn(net, arch_frame: str):
    """Route the encoder signature by architecture family."""

    def apply(params, frames, pos2d, mask, pos3d=None):
        if arch_frame == "resnet18":
            # (B, 3, T, N, H, W) → mean over sources for the plain trunk
            x = frames.mean(axis=3)
            return net.apply(params, x)
        if arch_frame == "clip":
            return net.apply(params, frames.mean(axis=3))
        if arch_frame == "clip_pos":
            return net.apply(params, frames, pos3d, mask)
        return net.apply(params, frames, pos2d, mask)

    return apply


class Stage1Trainer:
    def __init__(self, args, dataset_train, dataset_val, mel_key="mono_mel"):
        self.args = args
        self.mel_key = mel_key
        builder = ModelBuilder()
        clip_config = getattr(args, "clip_config", None)  # tests shrink it
        self.net_frame = builder.build_visual(
            pool_type=args.img_pool, arch_frame=args.arch_frame,
            clip_config=clip_config,
        )
        self.net_unet = builder.build_unet(
            dim=getattr(args, "unet_dim", 64)  # hidden test knob
        )
        self.diffusion = GaussianDiffusion(
            image_size=80, timesteps=1000, sampling_timesteps=25,
            loss_type=args.loss, objective="pred_noise",
            beta_schedule="cosine", auto_normalize=False,
        )
        self.visual_apply = visual_apply_fn(self.net_frame, args.arch_frame)
        self._visual_jit = jax.jit(self.visual_apply)  # eval-path features
        self.unet_apply = lambda p, x, t, c: self.net_unet.apply(p, x, t, c)

        self.mesh = make_mesh()
        self.stabilizer = TrainingStabilizer()
        self.dataset_train = dataset_train
        self.dataset_val = dataset_val
        self.exp_dir = os.path.join(args.ckpt, args.id)
        self.writer = SummaryLogger(os.path.join(self.exp_dir, "runs"))
        self.history: Dict = {"train_loss": [], "val_mel_l2": [], "epoch": 0}
        self.best_mel_l2 = float("inf")

        init_fn, self.step_fn = make_stage1_train_step(
            unet_apply=self.unet_apply,
            visual_apply=self.visual_apply,
            diffusion=self.diffusion,
            lr_unet=args.lr_unet,
            lr_frame=args.lr_frame,
            b1=args.beta1,
            weight_decay=args.weight_decay,
        )
        self._init_fn = init_fn
        self.sampler = Stage1Sampler(
            self._sample_apply, self.diffusion, sampling_timesteps=25
        )
        self.state = None
        self.start_epoch = 0

    # ------------------------------------------------------------------

    def _sample_apply(self, params, x, t, cond):
        mix, feat, mix_t = cond
        return self.unet_apply(params["unet"], x, t, (mix, feat, mix_t))

    def init_params(self, batch):
        rng = jax.random.PRNGKey(self.args.seed)
        b = {k: jnp.asarray(v[:1]) for k, v in batch.items()
             if isinstance(v, np.ndarray)}
        frames, pos2, pos3, mask = (
            b["frames"], b["2d_pos_data"], b["pos_data"], b["mask"]
        )
        if self.args.arch_frame in ("resnet18", "clip"):
            frame_params = self.net_frame.init(rng, frames.mean(axis=3))
        elif self.args.arch_frame == "clip_pos":
            frame_params = self.net_frame.init(rng, frames, pos3, mask)
        else:
            frame_params = self.net_frame.init(rng, frames, pos2, mask)
        mel = b[self.mel_key]
        target = b["binaural_mel"]
        unet_params = self.net_unet.init(
            rng, target, jnp.zeros((1,), jnp.int32),
            (mel, jnp.zeros((1, 512)), jnp.zeros_like(target)),
        )
        frame_params = self._maybe_load_frame_weights(frame_params)
        unet_params = self._maybe_load_unet_weights(unet_params)
        params = {"frame": frame_params, "unet": unet_params}
        self.state = self._init_fn(params)

    def _maybe_load_frame_weights(self, frame_params):
        """--weights_frame warm start (reference models.py:10-35 loads
        ``weights`` into the encoder; for resnet18 the reference trunk is
        additionally torchvision-``pretrained=True`` — a torchvision state
        dict given here grafts onto the trunk the same way)."""
        path = getattr(self.args, "weights_frame", "")
        if not path:
            return frame_params
        if not os.path.exists(path):
            # the reference's torch.load raises immediately; silently
            # training from random init would waste the whole run
            raise FileNotFoundError(f"--weights_frame {path!r} not found")
        from ..core import checkpoint as ckpt

        if (
            self.args.arch_frame == "resnet18"
            and path.endswith((".pth", ".pt"))
            and ckpt.is_torchvision_resnet18_sd(path)
        ):
            print(f"grafting torchvision resnet18 weights from {path}")
            return ckpt.graft_resnet18_trunk(frame_params, path)
        print(f"loading frame-encoder checkpoint {path}")
        return ckpt.load_checkpoint(path, target=frame_params)

    def _maybe_load_unet_weights(self, unet_params):
        """--weights_unet warm start (reference models.py:38-43 loads
        ``weights`` into the UNet at build time)."""
        path = getattr(self.args, "weights_unet", "")
        if not path:
            return unet_params
        if not os.path.exists(path):
            raise FileNotFoundError(f"--weights_unet {path!r} not found")
        from ..core import checkpoint as ckpt

        print(f"loading unet checkpoint {path}")
        return ckpt.load_checkpoint(path, target=unet_params)

    def _prep_batch(self, batch) -> Dict:
        out = {
            "mono_mel": batch[self.mel_key],
            "binaural_mel": batch["binaural_mel"],
            "frames": batch["frames"],
            "pos": batch["2d_pos_data"]
            if self.args.arch_frame != "clip_pos"
            else batch["pos_data"],
            "mask": batch["mask"],
        }
        return shard_batch(out, self.mesh)

    # ------------------------------------------------------------------

    def lr_scale_for_epoch(self, epoch: int) -> float:
        """×0.95 at each lr_steps epoch passed; ×decay_factor every
        learning_rate_decrease_itr epochs (reference :334-344, :461-467,
        :494-496)."""
        scale = 1.0
        for e in self.args.lr_steps:
            if epoch >= e:
                scale *= 0.95
        itr = self.args.learning_rate_decrease_itr
        if itr and itr > 0:
            scale *= self.args.decay_factor ** (epoch // itr)
        return scale

    def train_epoch(self, loader, epoch: int, rng) -> float:
        meter = AverageMeter()
        batch_timer = AverageMeter()
        tic = time.time()
        self.state = self.state.replace(
            lr_scale=jnp.asarray(self.lr_scale_for_epoch(epoch))
        )
        for i, batch in enumerate(loader):
            rng, step_rng = jax.random.split(rng)
            with self.mesh:
                self.state, metrics = self.step_fn(
                    self.state, self._prep_batch(batch), step_rng
                )
            loss = float(metrics["loss"])
            meter.update(loss)
            self.stabilizer.training_step(loss, float(metrics["grad_norm"]))
            batch_timer.update(time.time() - tic)
            tic = time.time()
            if i % self.args.disp_iter == 0:
                step = int(self.state.step)
                print(f"Epoch: [{epoch}][{i}/{len(loader)}] "
                      f"time: {batch_timer.average():.3f} loss: {loss:.4f}")
                self.writer.scalar("train/loss", loss, step)
                self.writer.scalar("train/lr_scale",
                                   float(self.state.lr_scale), step)
        return meter.average() if meter.initialized else 0.0

    def evaluate(self, loader, epoch: int) -> float:
        """25-step DDIM val; per-sample mel L2 (reference :208-242)."""
        errs = []
        for bi, batch in enumerate(loader):
            mono = jnp.asarray(batch[self.mel_key])
            feat = self._features(batch)
            pred = self.sampler.sample(self.state.params, mono, feat)
            target = batch["binaural_mel"]
            errs.extend(
                np.mean((np.asarray(pred) - target) ** 2, axis=(1, 2, 3))
            )
            if bi == 0:
                self.writer.mel_figure("val/pred_L", np.asarray(pred)[0, 0],
                                       epoch)
                self.writer.mel_figure("val/gt_L", target[0, 0], epoch)
            if self.args.num_val > 0 and len(errs) >= self.args.num_val:
                break
        mel_l2 = float(np.mean(errs)) if errs else float("nan")
        print(f"[Eval] epoch {epoch} mel_l2: {mel_l2:.4f}")
        self.writer.scalar("val/mel_l2", mel_l2, epoch)
        return mel_l2

    def _features(self, batch) -> jnp.ndarray:
        pos = (batch["pos_data"] if self.args.arch_frame == "clip_pos"
               else batch["2d_pos_data"])
        return self._visual_jit(
            self.state.params["frame"], jnp.asarray(batch["frames"]),
            jnp.asarray(pos), jnp.asarray(batch["mask"]),
        )

    # ------------------------------------------------------------------

    def save_checkpoints(self, epoch: int, mel_l2: float):
        """latest/best + numbered + history (reference :295-325)."""
        d = self.exp_dir
        params = self.state.params
        ckpt.save_checkpoint(os.path.join(d, "frame_latest.pth"),
                             params["frame"])
        ckpt.save_checkpoint(os.path.join(d, "unet_latest.pth"),
                             params["unet"])
        if mel_l2 < self.best_mel_l2:
            self.best_mel_l2 = mel_l2
            ckpt.save_checkpoint(os.path.join(d, "frame_best.pth"),
                                 params["frame"])
            ckpt.save_checkpoint(os.path.join(d, "unet_best.pth"),
                                 params["unet"])
        if epoch % max(self.args.eval_epoch * 10, 1) == 0:
            ckpt.save_checkpoint(os.path.join(d, f"frame_{epoch:06d}"),
                                 params["frame"])
            ckpt.save_checkpoint(os.path.join(d, f"unet_{epoch:06d}"),
                                 params["unet"])
            ckpt.save_history(os.path.join(d, f"history_{epoch:06d}"),
                              self.history)

    def try_resume(self):
        """Scan prefix globs (reference :524-536, helpers.py:308-327)."""
        d = self.exp_dir
        frame_cp = ckpt.scan_checkpoint(d, "frame_0")
        unet_cp = ckpt.scan_checkpoint(d, "unet_0")
        hist_cp = ckpt.scan_checkpoint(d, "history_0")
        if frame_cp and unet_cp:
            params = {
                "frame": ckpt.load_checkpoint(frame_cp,
                                              self.state.params["frame"]),
                "unet": ckpt.load_checkpoint(unet_cp,
                                             self.state.params["unet"]),
            }
            self.state = self._init_fn(params)
            if hist_cp:
                self.history = ckpt.load_history(hist_cp)
                self.start_epoch = int(self.history.get("epoch", 0)) + 1
            print(f"Resumed from {frame_cp} / {unet_cp} "
                  f"at epoch {self.start_epoch}")

    # ------------------------------------------------------------------

    def fit(self, loader_train, loader_val, rng=None):
        args = self.args
        rng = rng or jax.random.PRNGKey(args.seed)
        for epoch in range(self.start_epoch, args.num_epoch):
            loader_train.set_epoch(epoch)
            rng, ep_rng = jax.random.split(rng)
            train_loss = self.train_epoch(loader_train, epoch, ep_rng)
            self.history["train_loss"].append(train_loss)
            self.history["epoch"] = epoch
            if epoch % args.eval_epoch == 0:
                mel_l2 = self.evaluate(loader_val, epoch)
                self.history["val_mel_l2"].append(mel_l2)
                self.stabilizer.validation_step(mel_l2)
                self.save_checkpoints(epoch, mel_l2)
        self.writer.close()


def dump_clip_mels(args, sampler: Stage1Sampler, params, dataset,
                   out_left: str, out_right: str, features_fn=None):
    """Generate full-clip L/R mels and save the stage-2 .npy pair
    (reference test_realBinaural.py:222-281).

    features_fn(item) → (512,) per-window conditioning vector; None → zero
    conditioning (the CFG-unconditional branch)."""
    os.makedirs(out_left, exist_ok=True)
    os.makedirs(out_right, exist_ok=True)
    full = dataset.full_mel[None]  # (1, 80, total)
    if features_fn is None:
        feats = np.zeros((len(dataset), 512), np.float32)
    else:
        feats = np.stack(
            [np.asarray(features_fn(dataset[i])) for i in range(len(dataset))]
        )
    mel = generate_clip(
        sampler, params, full, feats,
        stride=dataset.starts[1] - dataset.starts[0]
        if len(dataset.starts) > 1 else 40,
        crop_frames=args.crop_frames,
    )
    base = dataset.rows[0]["video_id"]
    np.save(os.path.join(out_left, base + ".npy"), mel[0])
    np.save(os.path.join(out_right, base + ".npy"), mel[1])
    return mel
