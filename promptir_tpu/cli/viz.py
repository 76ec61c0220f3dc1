"""Visualization toolkit: training curves, per-image PSNR A/B, zoom-box
figures, window-grid overlays.

Replaces the reference's notebook forensics and figure scripts with
reproducible CLIs:

- ``curves``   — plot metric curves from one or more training runs'
  ``metrics.jsonl`` streams (the reference hand-pastes per-epoch PSNR lists
  into ``plot_training_curve.ipynb`` cell 1 / ``plot_line.ipynb``).
- ``compare``  — A/B two per-image PSNR JSON dumps (as written by
  ``run_eval_nopad``/``cli/test.py --json``): summary deltas plus the
  biggest wins/regressions (the reference's ``compare_psnr.ipynb``).
- ``zoombox``  — crop a box, enlarge 2x, paste bottom-right, draw a red box
  around the source and a green box around the inset
  (``crop_image.py:4-31`` semantics, PIL instead of cv2).
- ``windowgrid`` — overlay the 8px attention-window grid on an image,
  optionally after adding sigma-Gaussian noise (``apply_window_grid.ipynb``).

Usage:
  python -m promptir_tpu.cli.viz curves runA/metrics.jsonl runB/metrics.jsonl \
      --metric eval_rain100l_psnr --out curves.png
  python -m promptir_tpu.cli.viz compare base.json ours.json --top 10
  python -m promptir_tpu.cli.viz zoombox img.png --box 180 70 80 --out fig.png
  python -m promptir_tpu.cli.viz windowgrid img.png --sigma 15 --out grid.png
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List


def _read_jsonl(path: str) -> List[dict]:
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cmd_curves(args) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 6))
    plotted = 0
    for path in args.runs:
        records = _read_jsonl(path)
        label = args.labels.pop(0) if args.labels else (
            os.path.basename(os.path.dirname(path)) or path
        )
        xs = [r["step"] for r in records if args.metric in r]
        ys = [r[args.metric] for r in records if args.metric in r]
        if not xs:
            available = sorted({k for r in records for k in r} - {"step", "time"})
            print(f"{path}: no '{args.metric}' records; available: {available}")
            continue
        plt.plot(xs, ys, label=label, linewidth=2)
        plotted += 1
        print(f"{label}: {len(xs)} points, last {args.metric}={ys[-1]:.4f}")
    if not plotted:
        raise SystemExit("nothing to plot")
    plt.xlabel(args.xlabel)
    plt.ylabel(args.metric)
    plt.title(args.title)
    plt.legend()
    plt.grid(True)
    plt.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


def compare_psnr_dicts(base: Dict[str, float], ours: Dict[str, float]) -> dict:
    """Per-image A/B: mean PSNRs over the common keyset plus sorted deltas.

    Same computation as the reference's compare_psnr.ipynb cells 3-8
    (dict diff, mean over images, largest per-image differences).
    """
    common = sorted(set(base) & set(ours))
    deltas = {k: ours[k] - base[k] for k in common}
    result = {
        "n_common": len(common),
        "n_base_only": len(set(base) - set(ours)),
        "n_ours_only": len(set(ours) - set(base)),
        "mean_base": sum(base[k] for k in common) / max(len(common), 1),
        "mean_ours": sum(ours[k] for k in common) / max(len(common), 1),
        "deltas": dict(sorted(deltas.items(), key=lambda kv: -kv[1])),
    }
    result["mean_delta"] = result["mean_ours"] - result["mean_base"]
    return result


def cmd_compare(args) -> None:
    with open(args.base) as f:
        base = json.load(f)
    with open(args.ours) as f:
        ours = json.load(f)
    r = compare_psnr_dicts(base, ours)
    print(
        f"common images: {r['n_common']} "
        f"(base-only {r['n_base_only']}, ours-only {r['n_ours_only']})"
    )
    print(f"mean PSNR  base: {r['mean_base']:.4f}  ours: {r['mean_ours']:.4f}  "
          f"delta: {r['mean_delta']:+.4f} dB")
    items = list(r["deltas"].items())
    if items:
        print(f"top {min(args.top, len(items))} improvements:")
        for k, d in items[: args.top]:
            print(f"  {k}: {d:+.3f} dB")
        print(f"top {min(args.top, len(items))} regressions:")
        for k, d in items[-args.top :][::-1]:
            print(f"  {k}: {d:+.3f} dB")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)
        print(f"wrote {args.out}")


def zoombox(
    img,  # PIL.Image
    x: int,
    y: int,
    size: int,
    scale: int = 2,
    box_width: int = 2,
):
    """Crop (x,y,size), enlarge by `scale`, paste at the bottom-right, red box
    on the source area, green box on the inset (crop_image.py:10-27)."""
    from PIL import ImageDraw

    img = img.convert("RGB").copy()
    crop = img.crop((x, y, x + size, y + size))
    inset = crop.resize((size * scale, size * scale))
    w, h = img.size
    sx, sy = w - inset.width, h - inset.height
    img.paste(inset, (sx, sy))
    draw = ImageDraw.Draw(img)
    draw.rectangle([x, y, x + size - 1, y + size - 1], outline=(255, 0, 0), width=box_width)
    draw.rectangle([sx, sy, w - 1, h - 1], outline=(0, 255, 0), width=box_width)
    return img


def cmd_zoombox(args) -> None:
    from PIL import Image

    x, y, size = args.box
    img = zoombox(Image.open(args.image), x, y, size, scale=args.scale)
    img.save(args.out)
    print(f"wrote {args.out}")


def window_grid(img, window: int = 8, sigma: float = 0.0, seed: int = 0):
    """Overlay the attention-window grid; optional uint8-domain noise first
    (apply_window_grid.ipynb cells 2-3)."""
    import numpy as np
    from PIL import Image, ImageDraw

    arr = np.array(img.convert("RGB")).astype(np.float64)
    if sigma > 0:
        rng = np.random.default_rng(seed)
        arr = arr + rng.normal(0.0, sigma, arr.shape)
    out = Image.fromarray(np.clip(arr, 0, 255).astype("uint8"))
    draw = ImageDraw.Draw(out)
    w, h = out.size
    for gx in range(0, w, window):
        draw.line([(gx, 0), (gx, h)], fill=(255, 255, 0), width=1)
    for gy in range(0, h, window):
        draw.line([(0, gy), (w, gy)], fill=(255, 255, 0), width=1)
    return out


def cmd_windowgrid(args) -> None:
    from PIL import Image

    out = window_grid(
        Image.open(args.image), window=args.window, sigma=args.sigma, seed=args.seed
    )
    out.save(args.out)
    print(f"wrote {args.out}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="promptir_tpu.cli.viz", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("curves", help="plot metric curves from metrics.jsonl runs")
    c.add_argument("runs", nargs="+", help="metrics.jsonl paths")
    c.add_argument("--metric", default="train_loss")
    c.add_argument("--labels", nargs="*", default=[])
    c.add_argument("--xlabel", default="step")
    c.add_argument("--title", default="Training Curve Comparison")
    c.add_argument("--out", default="curves.png")
    c.set_defaults(fn=cmd_curves)

    c = sub.add_parser("compare", help="A/B two per-image PSNR JSON dumps")
    c.add_argument("base")
    c.add_argument("ours")
    c.add_argument("--top", type=int, default=10)
    c.add_argument("--out", default=None, help="write full comparison JSON")
    c.set_defaults(fn=cmd_compare)

    c = sub.add_parser("zoombox", help="zoom-box detail figure")
    c.add_argument("image")
    c.add_argument("--box", nargs=3, type=int, required=True, metavar=("X", "Y", "SIZE"))
    c.add_argument("--scale", type=int, default=2)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_zoombox)

    c = sub.add_parser("windowgrid", help="overlay attention-window grid")
    c.add_argument("image")
    c.add_argument("--window", type=int, default=8)
    c.add_argument("--sigma", type=float, default=0.0)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_windowgrid)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
