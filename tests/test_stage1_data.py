"""Stage-1 dataset reconstruction tests on a synthetic on-disk dataset."""

import csv
import os

import numpy as np
import pytest

from diffbinaural_tpu.data import (
    FairPlayPosDataset,
    GenAudioRealBinauralDataset,
    RealBinauralDataset,
)
from diffbinaural_tpu.data.audio_io import save_wav
from diffbinaural_tpu.data.position_utils import (
    angle_to_2d,
    apply_binaural_weighting,
    compute_ild_factor,
    compute_itd_factor,
    spherical_to_2d,
)

SR = 22050


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("realbinaural")
    mono = root / "processed" / "mono_audios_22050Hz"
    binaural = root / "processed" / "binaural_audios_22050Hz"
    mono.mkdir(parents=True)
    binaural.mkdir(parents=True)
    rng = np.random.default_rng(0)
    t = np.arange(SR * 2) / SR
    for vid in ["vid1", "vid2"]:
        x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(len(t))
        save_wav(str(mono / f"{vid}.wav"), x.astype(np.float32), SR)
        stereo = np.stack([x * 0.8, x * 0.6]).astype(np.float32)
        save_wav(str(binaural / f"{vid}.wav"), stereo, SR)
    splits = root / "splits"
    splits.mkdir()
    with open(splits / "train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "start_time", "end_time", "action_label"])
        w.writerow(["vid1", "0.0", "2.0", "speaking"])
        w.writerow(["vid2", "0.0", "2.0", "music"])
    det = root / "action_detection_results"
    det.mkdir()
    with open(det / "detection_results.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "time", "source", "x1", "y1", "x2", "y2"])
        for t_ in np.arange(0, 2.0, 0.25):
            w.writerow(["vid1", f"{t_:.2f}", "0", "0.1", "0.2", "0.4", "0.8"])
            w.writerow(["vid1", f"{t_:.2f}", "1", "0.6", "0.2", "0.9", "0.8"])
    return root


def test_real_binaural_contract(dataset_root):
    ds = RealBinauralDataset(
        csv_file=str(dataset_root / "splits" / "train.csv"),
        data_root=str(dataset_root),
        detection_csv=str(
            dataset_root / "action_detection_results" / "detection_results.csv"
        ),
        split="train",
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["mono_mel"].shape == (1, 80, 80)
    assert item["binaural_mel"].shape == (2, 80, 80)
    assert item["frames"].shape == (3, 5, 4, 224, 224)
    assert item["pos_data"].shape == (5, 4, 3)
    assert item["2d_pos_data"].shape == (5, 4, 2)
    assert item["mask"].shape == (5, 4)
    # raw ln-mel range (SURVEY §2.7): within clamp bounds
    assert item["mono_mel"].min() >= np.log(1e-5) - 1e-5
    assert item["mono_mel"].max() <= 3.0
    # vid1 has 2 detected sources → at least those valid
    assert (~item["mask"][:, :2]).all()
    assert item["mask"][:, 2:].all()


def test_fairplay_mix_is_mean_of_channels(dataset_root):
    ds = FairPlayPosDataset(
        csv_file=str(dataset_root / "splits" / "train.csv"),
        data_root=str(dataset_root / "processed"),
        split="val",
    )
    # audio resolution falls back to data_root/binaural_audios... configured:
    ds.audio_subdir = "binaural_audios_22050Hz"
    item = ds[0]
    assert item["mix_mel"].shape == (1, 80, 80)
    assert item["binaural_mel"].shape == (2, 80, 80)


def test_genaudio_windows_cover_clip(dataset_root):
    wav = str(
        dataset_root / "processed" / "mono_audios_22050Hz" / "vid1.wav"
    )
    ds = GenAudioRealBinauralDataset(wav, stride=40)
    total = ds.total_time_frame
    assert total > 80
    items = [ds[i] for i in range(len(ds))]
    assert all(i["total_time_frame"] == total for i in items)
    starts = [int(i["start_time_frame"]) for i in items]
    assert starts[0] == 0
    assert starts[-1] == total - 80  # right-aligned last window
    assert items[0]["mono_mel"].shape == (1, 80, 80)


def test_position_utils_formulas():
    p = angle_to_2d(90.0)
    np.testing.assert_allclose(p, [1.0, 0.0], atol=1e-6)
    s = spherical_to_2d(0.0, 60.0)
    np.testing.assert_allclose(s, [0.0, 0.5], atol=1e-6)
    # hard-left source: ITD = r/c, ILD = +0.5
    left = np.array([1.0, 0.0])
    np.testing.assert_allclose(compute_itd_factor(left), 0.0875 / 343.0,
                               rtol=1e-5)
    np.testing.assert_allclose(compute_ild_factor(left), 0.5, rtol=1e-5)
    spec = np.ones((1, 4, 4), np.float32)
    l, r = apply_binaural_weighting(spec, left[None])
    np.testing.assert_allclose(l, 1.5)
    np.testing.assert_allclose(r, 0.5)
