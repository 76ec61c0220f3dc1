"""End-to-end tests of the user-facing eval entry points.

Covers the reference's test.py --mode 0..3 semantics (per-image loop,
flip-pad-64, forward, crop-back, PSNR/SSIM, PNG dumps — test.py:84-164,
237-259), the no-pad per-image-JSON flavor (test_promptir.py:64-123), and
demo.py's padded + tiled paths (demo.py:79-127) — all driven through the
actual CLIs on a fabricated 2-image corpus with a depth-1 PromptIR.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

TINY = ["--num_blocks", "1", "1", "1", "1", "--num_refinement_blocks", "1"]


def _write_png(path, hw, seed):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    h, w = hw
    yy, xx = np.meshgrid(np.linspace(0, 200, h), np.linspace(0, 200, w),
                         indexing="ij")
    img = np.stack([xx, yy, (xx + yy) / 2], -1)
    img = img + rng.normal(0, 12, img.shape)
    Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(path)


@pytest.fixture
def corpus(tmp_path):
    """BSD68/Rain100L/SOTS-shaped miniature test corpus."""
    d = tmp_path / "data"
    for i in range(2):
        _write_png(str(d / "denoise" / f"img{i}.png"), (40, 56), i)
        _write_png(str(d / "derain" / "input" / f"rain-{i}.png"), (40, 56), 10 + i)
        _write_png(str(d / "derain" / "target" / f"rain-{i}.png"), (40, 56), 20 + i)
        _write_png(
            str(d / "dehaze" / "input" / f"{i:04d}_0.95_0.2.png"), (40, 56), 30 + i
        )
        _write_png(str(d / "dehaze" / "target" / f"{i:04d}.png"), (40, 56), 40 + i)
    return d


def _cli_args(corpus, out):
    return [
        "--denoise_path", str(corpus / "denoise"),
        "--derain_path", str(corpus / "derain"),
        "--dehaze_path", str(corpus / "dehaze"),
        "--output_path", str(out),
        *TINY,
    ]


@pytest.mark.slow
def test_cli_test_mode3_all_in_one(corpus, tmp_path):
    from promptir_tpu.cli.test import main

    out = tmp_path / "out"
    results = main(["--mode", "3", *_cli_args(corpus, out)])
    assert set(results) == {
        "denoise_15", "denoise_25", "denoise_50", "derain", "dehaze"
    }
    for r in results.values():
        assert r["n"] == 2
        assert np.isfinite(r["psnr"]) and 0 <= r["ssim"] <= 1
    # restored PNGs: crop-back to the crop-16 size (40,56) -> (32,48)
    png = out / "denoise_15" / "img0.png"
    assert png.exists()
    assert Image.open(png).size == (48, 32)  # PIL size is (W, H)
    assert (out / "derain" / "rain-0.png").exists()
    assert (out / "dehaze" / "0000_0.95_0.2.png").exists()
    # random weights restore worse than the noisy input — the flow is what
    # is under test; quality is pinned by the golden parity suite


@pytest.mark.slow
def test_cli_test_mode_single_tasks(corpus, tmp_path):
    from promptir_tpu.cli.test import main

    r1 = main(["--mode", "1", *_cli_args(corpus, tmp_path / "o1")])
    assert set(r1) == {"derain"}
    r2 = main(["--mode", "2", *_cli_args(corpus, tmp_path / "o2")])
    assert set(r2) == {"dehaze"}


@pytest.mark.slow
def test_cli_test_nopad_per_image_json(corpus, tmp_path):
    from promptir_tpu.cli.test import main

    out = tmp_path / "out"
    results = main(
        ["--mode", "0", "--nopad", "--json_dir", str(tmp_path / "json"),
         *_cli_args(corpus, out)]
    )
    for sigma in (15, 25, 50):
        jp = tmp_path / "json" / f"psnr_denoise_{sigma}.json"
        assert jp.exists()
        d = json.loads(jp.read_text())
        assert set(d) == {"img0", "img1"}
        assert results[f"denoise_{sigma}"]["per_image"] == d


@pytest.mark.slow
def test_cli_demo_padded_and_tiled(corpus, tmp_path):
    from promptir_tpu.cli.demo import main

    out1 = tmp_path / "demo_plain"
    main([
        "--test_path", str(corpus / "denoise"),
        "--output_path", str(out1), *TINY,
    ])
    p = out1 / "img0.png"
    # demo loader crop-16s first (reference crop_img base=16,
    # utils/dataset_utils.py:334): (40,56) -> (32,48); PIL size is (W,H)
    assert p.exists() and Image.open(p).size == (48, 32)

    out2 = tmp_path / "demo_tiled"
    main([
        "--test_path", str(corpus / "denoise" / "img1.png"),
        "--output_path", str(out2),
        "--tile", "--tile_size", "32", "--tile_overlap", "8", *TINY,
    ])
    p2 = out2 / "img1.png"
    assert p2.exists() and Image.open(p2).size == (48, 32)
    arr = np.asarray(Image.open(p2))
    assert arr.shape == (32, 48, 3)


def test_cli_psnr_offline_recompute(tmp_path):
    """Offline dir-vs-dir PSNR/SSIM (reference compute_baseline_psnr.py):
    GT larger than restored gets cropped; identical images give inf/1."""
    from promptir_tpu.cli.psnr import main

    rdir, gdir = tmp_path / "restored", tmp_path / "gt"
    _write_png(str(rdir / "a.png"), (32, 48), 1)
    # GT 1px larger each way (the reference's 321x481-vs-320x480 case)
    img = np.asarray(Image.open(rdir / "a.png"))
    os.makedirs(gdir, exist_ok=True)
    Image.fromarray(np.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")).save(
        gdir / "a.png"
    )
    _write_png(str(rdir / "b.png"), (32, 48), 2)
    _write_png(str(gdir / "b.png"), (32, 48), 3)

    r = main(["--restored", str(rdir), "--gt", str(gdir),
              "--json", str(tmp_path / "p.json")])
    assert r["n"] == 2
    d = json.loads((tmp_path / "p.json").read_text())
    assert d["a"] > 80  # identical after crop
    assert np.isfinite(d["b"]) and d["b"] < d["a"]


@pytest.mark.slow
def test_cli_demo_spatial_sharded_matches_single_chip(corpus, tmp_path):
    """--spatial (exact H-sharded multi-chip inference) must produce the
    same PNG as the single-chip demo path on the 8-device CPU mesh."""
    from promptir_tpu.cli.demo import main

    # 64x64 source: crop-16 and both pad paths leave it unchanged, so the
    # two CLI paths run the model on identical input
    src = str(tmp_path / "sq" / "img0.png")
    _write_png(src, (64, 64), 99)
    out_s = tmp_path / "demo_spatial"
    main(["--test_path", src, "--output_path", str(out_s),
          "--spatial", *TINY])
    out_p = tmp_path / "demo_plain2"
    main(["--test_path", src, "--output_path", str(out_p), *TINY])
    a = np.asarray(Image.open(out_s / "img0.png")).astype(np.int16)
    b = np.asarray(Image.open(out_p / "img0.png")).astype(np.int16)
    assert a.shape == b.shape
    # identical math up to psum reassociation -> at most 1 uint8 step
    assert np.abs(a - b).max() <= 1


@pytest.mark.slow
@pytest.mark.parametrize(
    "variant", ["easypromptxrestormer", "capromptxrestormereffv2"]
)
def test_cli_test_covers_variant_models(corpus, tmp_path, variant):
    """The reference ships per-variant eval-script clones
    (test_promptxrestormer.py, test_caprompt.py); here one CLI covers every
    registered family via --model. Drive two non-PromptIR families — the
    Easy blocks and the CAMixer-v2 routed blocks (whose deterministic eval
    path must yield a plain tensor, not the training tuple) — through mode
    1 end to end."""
    from promptir_tpu.cli.test import main

    r = main(["--model", variant, "--mode", "1",
              *_cli_args(corpus, tmp_path / variant)])
    assert set(r) == {"derain"}
    assert r["derain"]["n"] == 2 and np.isfinite(r["derain"]["psnr"])
    assert (tmp_path / variant / "derain" / "rain-0.png").exists()


@pytest.mark.slow
def test_cli_demo_ocab_family_non_aligned_size(tmp_path):
    """demo.py on an OCAB family at a non-64-multiple size: the plain
    path must pre-pad to the family's window-aligned base
    (parallel/spatial.py:pad_bases) — the reference's pad-to-8
    (demo.py:17-24) leaves deeper levels with non-window-divisible grids
    and the OCAB window reshape crashes."""
    from promptir_tpu.cli.demo import main

    src = tmp_path / "in" / "scene.png"
    _write_png(str(src), (88, 120), 7)  # crop-16 -> 80x112, not % 64
    out = tmp_path / "demo_ocab"
    main(["--model", "promptxrestormerir", "--test_path", str(src),
          "--output_path", str(out), *TINY])
    im = np.asarray(Image.open(out / "scene.png"))
    assert im.shape == (80, 112, 3)
