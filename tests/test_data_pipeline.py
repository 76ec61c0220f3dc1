"""Data pipeline semantics: id construction, replication, GT derivation,
degradation synthesis, augmentation invariants."""

import os

import numpy as np
import pytest
from PIL import Image

from promptir_tpu.data.augment import (
    crop_to_multiple,
    dihedral,
    random_augmentation,
    random_crop,
)
from promptir_tpu.data.datasets import (
    DenoiseTestDataset,
    DerainDehazeDataset,
    PromptTrainDataset,
    dehaze_gt_name,
    derain_gt_name,
)
from promptir_tpu.data.degradations import add_gaussian_noise
from promptir_tpu.data.loader import TrainLoader


def _img(path, size=(160, 170), seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(
        rng.integers(0, 255, (size[0], size[1], 3), dtype=np.uint8)
    ).save(path)


@pytest.fixture
def corpus(tmp_path):
    root = str(tmp_path)
    # data_dir txt lists
    os.makedirs(f"{root}/data_dir/noisy", exist_ok=True)
    os.makedirs(f"{root}/data_dir/rainy", exist_ok=True)
    os.makedirs(f"{root}/data_dir/hazy", exist_ok=True)
    with open(f"{root}/data_dir/noisy/denoise.txt", "w") as f:
        f.write("a.png\nb.png\nmissing.png\n")
    with open(f"{root}/data_dir/rainy/rainTrain.txt", "w") as f:
        f.write("rainy/rain-1.png\nrainy/rain-2.png\n")
    with open(f"{root}/data_dir/hazy/hazy_outside.txt", "w") as f:
        f.write("synthetic/0001_0.8_0.2.jpg\n")
    # denoise dir: a, b present; c not in txt (filtered out)
    for n in ("a.png", "b.png", "c.png"):
        _img(f"{root}/denoise/{n}")
    # derain pairs
    _img(f"{root}/derain/rainy/rain-1.png")
    _img(f"{root}/derain/rainy/rain-2.png")
    _img(f"{root}/derain/gt/norain-1.png")
    _img(f"{root}/derain/gt/norain-2.png")
    # dehaze pair
    _img(f"{root}/dehaze/synthetic/0001_0.8_0.2.jpg")
    _img(f"{root}/dehaze/original/0001.jpg")
    return root


def test_gt_name_derivation():
    assert derain_gt_name("/d/rainy/rain-42.png") == "/d/gt/norain-42.png"
    assert (
        dehaze_gt_name("/d/synthetic/part1/0025_0.8_0.04.jpg")
        == "/d/original/0025.jpg"
    )


def test_train_dataset_replication(corpus):
    ds = PromptTrainDataset(
        data_file_dir=f"{corpus}/data_dir/",
        denoise_dir=f"{corpus}/denoise/",
        derain_dir=f"{corpus}/derain/",
        dehaze_dir=f"{corpus}/dehaze/",
        patch_size=64,
    )
    # 2 valid denoise images x3 replication x3 sigmas + 2 rain x120 + 1 haze
    assert len(ds) == 2 * 3 * 3 + 2 * 120 + 1
    de_counts = {}
    for s in ds.samples:
        de_counts[s.de_type] = de_counts.get(s.de_type, 0) + 1
    assert de_counts == {0: 6, 1: 6, 2: 6, 3: 240, 4: 1}


def test_train_dataset_samples_load(corpus):
    ds = PromptTrainDataset(
        data_file_dir=f"{corpus}/data_dir/",
        denoise_dir=f"{corpus}/denoise/",
        derain_dir=f"{corpus}/derain/",
        dehaze_dir=f"{corpus}/dehaze/",
        patch_size=64,
    )
    rng = np.random.default_rng(0)
    # one of each task type
    for idx in (0, 18, 258):
        de, deg, clean = ds.get(idx, np.random.default_rng(idx))
        assert deg.shape == (64, 64, 3) and clean.shape == (64, 64, 3)
        assert deg.dtype == np.float32 and 0 <= deg.min() <= deg.max() <= 1


def test_train_loader_determinism(corpus):
    ds = PromptTrainDataset(
        data_file_dir=f"{corpus}/data_dir/",
        denoise_dir=f"{corpus}/denoise/",
        derain_dir=f"{corpus}/derain/",
        dehaze_dir=f"{corpus}/dehaze/",
        patch_size=64,
    )
    l1 = TrainLoader(ds, batch_size=4, seed=7, num_workers=2)
    l2 = TrainLoader(ds, batch_size=4, seed=7, num_workers=2)
    b1 = next(iter(l1.epoch(3)))
    b2 = next(iter(l2.epoch(3)))
    np.testing.assert_array_equal(b1["degraded"], b2["degraded"])
    np.testing.assert_array_equal(b1["de_type"], b2["de_type"])


def test_noise_uint8_domain():
    rng = np.random.default_rng(0)
    clean = np.full((8, 8, 3), 200, np.uint8)
    noisy = add_gaussian_noise(rng, clean, 50.0)
    assert noisy.dtype == np.uint8
    assert noisy.max() <= 255 and noisy.min() >= 0
    assert not np.array_equal(noisy, clean)


def test_crop_to_multiple_center():
    img = np.arange(20 * 35 * 3, dtype=np.uint8).reshape(20, 35, 3)
    out = crop_to_multiple(img, 16)
    assert out.shape == (16, 32, 3)
    # center crop: h offset (20%16)//2 = 2, w offset (35%16)//2 = 1
    np.testing.assert_array_equal(out, img[2:18, 1:33])


def test_random_augmentation_never_identity():
    rng = np.random.default_rng(0)
    img = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    for _ in range(20):
        (out,) = random_augmentation(rng, img)
        assert not np.array_equal(out, img)  # mode 0 unreachable (reference)


def test_dihedral_modes_are_involutive_set():
    img = np.random.default_rng(1).normal(size=(8, 8, 3))
    outs = [dihedral(img, m) for m in range(8)]
    # all 8 modes produce distinct results for a generic image
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(outs[i], outs[j])


def test_paired_crop_alignment(corpus):
    rng = np.random.default_rng(0)
    a = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    pa, pb = random_crop(rng, 32, a, a.copy())
    np.testing.assert_array_equal(pa, pb)


def test_denoise_test_dataset(corpus):
    ds = DenoiseTestDataset(f"{corpus}/denoise/", sigma=25)
    assert len(ds) == 3
    name, noisy, clean = ds.get(0)
    assert noisy.shape == clean.shape
    ds.set_sigma(50)
    _, noisy50, _ = ds.get(0)
    assert float(np.abs(noisy50 - clean).mean()) > float(
        np.abs(noisy - clean).mean()
    )


def test_derain_dehaze_dataset(corpus):
    os.makedirs(f"{corpus}/deraintest/input", exist_ok=True)
    os.makedirs(f"{corpus}/deraintest/target", exist_ok=True)
    _img(f"{corpus}/deraintest/input/1.png")
    _img(f"{corpus}/deraintest/target/1.png")
    ds = DerainDehazeDataset(derain_path=f"{corpus}/deraintest/", task="derain")
    assert len(ds) == 1
    name, deg, clean = ds.get(0)
    assert name == "1"
    assert deg.shape == clean.shape
