"""Native (C++) sample-preparation kernel vs the Python pipeline."""

import numpy as np
import pytest

from promptir_tpu.data import native
from promptir_tpu.data.augment import dihedral

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_paired_matches_python_exactly():
    rng = np.random.default_rng(0)
    d = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    c = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    for mode in range(8):
        nd, nc = native.prepare_paired_sample(d, c, 5, 9, 32, mode)
        pd = dihedral(d[5:37, 9:41], mode).astype(np.float32) / 255.0
        pc = dihedral(c[5:37, 9:41], mode).astype(np.float32) / 255.0
        np.testing.assert_array_equal(nd, pd)
        np.testing.assert_array_equal(nc, pc)


def test_denoise_clean_exact_noise_statistical():
    rng = np.random.default_rng(1)
    img = rng.integers(30, 220, (256, 256, 3), dtype=np.uint8)
    deg, clean = native.prepare_denoise_sample(img, 10, 20, 128, 4, 25.0, 42)
    ref_clean = dihedral(img[10:138, 20:148], 4).astype(np.float32) / 255.0
    np.testing.assert_array_equal(clean, ref_clean)
    # degraded = clip(clean*255 + N(0,1)*25, 0, 255)//1 / 255
    noise = deg * 255.0 - np.floor(clean * 255.0)
    # interior (unclipped) pixels: mean ~0, std ~25
    mask = (clean * 255 > 60) & (clean * 255 < 190)
    vals = (noise[mask])
    assert abs(vals.mean()) < 0.5
    assert abs(vals.std() - 25.0) < 1.0
    # deterministic in the seed
    deg2, _ = native.prepare_denoise_sample(img, 10, 20, 128, 4, 25.0, 42)
    np.testing.assert_array_equal(deg, deg2)
    deg3, _ = native.prepare_denoise_sample(img, 10, 20, 128, 4, 25.0, 43)
    assert not np.array_equal(deg, deg3)


def test_dataset_native_vs_python_crops_match(tmp_path):
    import os

    from PIL import Image

    from promptir_tpu.data.datasets import PromptTrainDataset

    root = str(tmp_path)
    os.makedirs(f"{root}/data_dir/noisy", exist_ok=True)
    with open(f"{root}/data_dir/noisy/denoise.txt", "w") as f:
        f.write("a.png\n")
    os.makedirs(f"{root}/denoise", exist_ok=True)
    rng = np.random.default_rng(2)
    Image.fromarray(
        rng.integers(0, 255, (160, 170, 3), dtype=np.uint8)
    ).save(f"{root}/denoise/a.png")

    kw = dict(
        data_file_dir=f"{root}/data_dir/",
        denoise_dir=f"{root}/denoise/",
        derain_dir="", dehaze_dir="",
        de_type=("denoise_25",), patch_size=64,
    )
    ds_n = PromptTrainDataset(**kw, use_native=True)
    ds_p = PromptTrainDataset(**kw, use_native=False)
    _, dn, cn = ds_n.get(0, np.random.default_rng(5))
    _, dp, cp = ds_p.get(0, np.random.default_rng(5))
    # same crop + dihedral (same rng draws) -> identical clean patches
    np.testing.assert_array_equal(cn, cp)
    # noise streams differ by design but share sigma
    assert abs((dn - cn).std() - (dp - cp).std()) < 0.01


def test_png_decode_matches_pil():
    """Native PNG reader vs PIL across color modes (+ JPEG fallback)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    cases = {
        "RGB": Image.fromarray(base, "RGB"),
        "L": Image.fromarray(base[..., 0], "L"),
        "RGBA": Image.fromarray(
            np.concatenate([base, np.full((37, 53, 1), 255, np.uint8)], -1),
            "RGBA",
        ),
        "P": Image.fromarray(base, "RGB").convert(
            "P", palette=Image.ADAPTIVE
        ),
        "LA": Image.fromarray(base[..., 0], "L").convert("LA"),
    }
    for mode, im in cases.items():
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        data = buf.getvalue()
        out = native.decode_png_rgb(data)
        assert out is not None, f"native decoder declined mode {mode}"
        ref = np.array(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(out, ref, err_msg=f"mode {mode}")

    # out-of-scope input -> None (caller falls back to PIL)
    buf = io.BytesIO()
    Image.fromarray(base, "RGB").save(buf, format="JPEG")
    assert native.decode_png_rgb(buf.getvalue()) is None


def test_load_image_rgb_uses_native_path(tmp_path):
    from PIL import Image

    from promptir_tpu.data.datasets import load_image_rgb

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (21, 19, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    np.testing.assert_array_equal(load_image_rgb(str(p)), arr)
