"""Visualization CLI: curves/compare/zoombox/windowgrid."""

import json

import numpy as np
from PIL import Image

from promptir_tpu.cli.viz import compare_psnr_dicts, main, window_grid, zoombox


def test_compare_psnr_dicts():
    base = {"a": 30.0, "b": 31.0, "c": 32.0, "only_base": 1.0}
    ours = {"a": 30.5, "b": 30.0, "c": 33.0, "only_ours": 2.0}
    r = compare_psnr_dicts(base, ours)
    assert r["n_common"] == 3
    assert r["n_base_only"] == 1 and r["n_ours_only"] == 1
    assert abs(r["mean_base"] - 31.0) < 1e-12
    assert abs(r["mean_delta"] - 0.5 / 3) < 1e-12
    # deltas sorted descending
    assert list(r["deltas"]) == ["c", "a", "b"]


def test_zoombox_geometry():
    img = Image.fromarray(np.zeros((64, 96, 3), np.uint8))
    out = zoombox(img, x=10, y=12, size=16, scale=2)
    arr = np.array(out)
    assert out.size == img.size
    # red source box at (10,12)..(25,27)
    assert tuple(arr[12, 10]) == (255, 0, 0)
    # green inset box at bottom-right corner
    assert tuple(arr[63, 95]) == (0, 255, 0)


def test_window_grid_lines_and_noise():
    img = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    out = np.array(window_grid(img, window=8, sigma=0.0))
    assert tuple(out[0, 8]) == (255, 255, 0)
    assert tuple(out[8, 0]) == (255, 255, 0)
    noisy = np.array(window_grid(img, window=8, sigma=15.0, seed=0))
    interior = (slice(1, 7), slice(1, 7))
    assert np.std(noisy[interior].astype(np.float64)) > 5.0
    assert np.std(out[interior].astype(np.float64)) < 1e-9


def test_cli_curves_and_compare(tmp_path):
    run = tmp_path / "metrics.jsonl"
    with open(run, "w") as f:
        for i in range(5):
            f.write(json.dumps({"step": i, "train_loss": 1.0 / (i + 1)}) + "\n")
    out = tmp_path / "c.png"
    main(["curves", str(run), "--metric", "train_loss", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0

    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps({"x": 30.0}))
    b.write_text(json.dumps({"x": 31.0}))
    cmp_out = tmp_path / "cmp.json"
    main(["compare", str(a), str(b), "--out", str(cmp_out)])
    assert json.loads(cmp_out.read_text())["mean_delta"] == 1.0
