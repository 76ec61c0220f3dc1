"""Offline PSNR/SSIM recompute between a restored dir and a GT dir.

Parity target: /root/reference/compute_baseline_psnr.py:1-46 — pair the
sorted listings of two directories, crop the (often 1px-larger) ground
truth down to the restored size, and report skimage-semantics PSNR/SSIM.
Hard-coded personal paths replaced by flags; averages over the whole set
(the reference resets its meters per image, printing only the last pair —
we report the set average, which is the obvious intent).

  python -m promptir_tpu.cli.psnr --restored out/denoise_15 \
      --gt test/denoise/bsd68 [--json per_image.json]
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="offline PSNR/SSIM recompute")
    p.add_argument("--restored", required=True, help="restored images dir")
    p.add_argument("--gt", required=True, help="ground-truth images dir")
    p.add_argument("--json", default=None, help="write per-image PSNR here")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np

    from promptir_tpu.data.datasets import IMAGE_EXTENSIONS, load_image_rgb
    from promptir_tpu.eval.metrics import AverageMeter, psnr_ssim

    def listing(d):
        return sorted(
            n for n in os.listdir(d) if n.lower().endswith(IMAGE_EXTENSIONS)
        )

    restored_names = listing(args.restored)
    gt_names = listing(args.gt)
    if not restored_names:
        raise SystemExit(f"no images in {args.restored}")

    # pair by filename stem when the sets line up; positional zip over two
    # independently sorted listings silently truncates on a count mismatch
    # and can mispair when names differ
    def stem(n):
        return n.rsplit(".", 1)[0]

    gt_by_stem = {stem(n): n for n in gt_names}
    if all(stem(n) in gt_by_stem for n in restored_names):
        pairs = [(n, gt_by_stem[stem(n)]) for n in restored_names]
    elif len(restored_names) != len(gt_names):
        raise SystemExit(
            f"cannot pair: {len(restored_names)} restored vs "
            f"{len(gt_names)} GT images and stems don't match "
            f"({args.restored} vs {args.gt})"
        )
    else:
        import sys

        print(
            "warning: filenames differ between dirs; pairing by sorted "
            "position (reference compute_baseline_psnr.py semantics)",
            file=sys.stderr,
        )
        pairs = list(zip(restored_names, gt_names))

    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    per_image = {}
    for rn, gn in pairs:
        restored = load_image_rgb(os.path.join(args.restored, rn))
        clean = load_image_rgb(os.path.join(args.gt, gn))
        h, w = restored.shape[:2]
        clean = clean[:h, :w]  # GT may be up to a crop larger
        r = restored.astype(np.float32)[None] / 255.0
        c = clean.astype(np.float32)[None] / 255.0
        p, s = psnr_ssim(np.asarray(c), np.asarray(r))
        per_image[rn.rsplit(".", 1)[0]] = float(p[0])
        psnr_m.update(float(p[0]), 1)
        ssim_m.update(float(s[0]), 1)

    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(per_image, f, indent=1)
    print(f"PSNR: {psnr_m.avg:.2f}, SSIM: {ssim_m.avg:.4f}")
    return {"psnr": psnr_m.avg, "ssim": ssim_m.avg, "n": psnr_m.count}


if __name__ == "__main__":
    main()
