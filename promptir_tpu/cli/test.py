"""Evaluation CLI — the framework's `python test.py --mode {0,1,2,3}`.

Parity with /root/reference/test.py:167-259: mode 0 denoise (sigma 15/25/
50), 1 derain, 2 dehaze, 3 all-in-one; fixed seeds; loads either a
converted PyTorch/Lightning .ckpt (via the compat layer) or a native
Orbax/npz checkpoint; reports PSNR/SSIM per set and saves restored PNGs.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="promptir_tpu evaluation")
    p.add_argument("--mode", type=int, default=0, choices=[0, 1, 2, 3])
    p.add_argument("--model", default="promptir")
    p.add_argument("--ckpt_name", default=None, help=".ckpt/.pt/.npz weights")
    p.add_argument("--denoise_path", default="test/denoise/bsd68/")
    p.add_argument("--derain_path", default="test/derain/")
    p.add_argument("--dehaze_path", default="test/dehaze/")
    p.add_argument("--output_path", default="output/")
    p.add_argument("--pad_base", type=int, default=64)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    p.add_argument("--num_refinement_blocks", type=int, default=None)
    p.add_argument(
        "--fused", action="store_true",
        help="fused Pallas transformer-block kernels (TPU)",
    )
    p.add_argument(
        "--nopad", action="store_true",
        help="forward at native size and dump per-image PSNR JSON "
             "(reference test_promptir.py flavor)",
    )
    p.add_argument("--json_dir", default=None)
    return p


def validation_shape(model_name: str) -> tuple:
    """Smallest input every family can forward: derived from the family's
    window-aligned pad base (Uformer skeletons need 128-multiples, OCAB/
    CAMixer X-Restormer 64, window-free families 8 — a hardcoded 64 crashes
    the 4-downsample Uformer families in window_partition)."""
    from promptir_tpu.parallel.spatial import pad_bases

    base_h, base_w = pad_bases(model_name)
    return (1, base_h, base_w, 3)


def load_params(model, ckpt_name, sample_shape=(1, 64, 64, 3)):
    import jax
    import jax.numpy as jnp

    if ckpt_name is None:
        print("WARNING: no checkpoint given; using random init")
        return model.init(jax.random.PRNGKey(0), jnp.zeros(sample_shape))["params"]
    if ckpt_name.endswith(".npz"):
        from promptir_tpu.train.checkpoints import load_params_npz

        return load_params_npz(ckpt_name)
    from promptir_tpu.compat.torch_ckpt import (
        check_params_match,
        convert_state_dict,
        load_torch_state_dict,
    )

    variables = convert_state_dict(load_torch_state_dict(ckpt_name))
    # fail HERE with the missing/extra/mis-shaped tensor paths instead of
    # a cryptic flax apply error later (wrong --model for the ckpt, a
    # truncated file, a different depth config...)
    try:
        init = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros(sample_shape))
        )
    except Exception:
        # the shape-only init itself failed (caller passed a sample shape
        # this family can't forward) — don't let the validation aid block
        # a legitimate load; flax will still shape-check at apply time
        return variables["params"]
    check_params_match(variables, init)
    return variables["params"]


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    np.random.seed(args.seed)  # reference seeds np/torch (test.py:183-184)

    from promptir_tpu.data.datasets import DenoiseTestDataset, DerainDehazeDataset
    from promptir_tpu.eval.runner import test_denoise, test_derain_dehaze
    from promptir_tpu.models import create_model

    from promptir_tpu.cli.demo import model_kwargs
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    model = create_model(args.model, **model_kwargs(args))
    params = load_params(
        model, args.ckpt_name, sample_shape=validation_shape(args.model)
    )

    @jax.jit
    def model_fn(p, x):
        return model.apply({"params": p}, x)

    results = {}
    if args.mode in (0, 3):
        ds = DenoiseTestDataset(args.denoise_path)
        for sigma in (15, 25, 50):
            if args.nopad:
                from promptir_tpu.eval.runner import run_eval_nopad

                ds.set_sigma(sigma)
                jp = (
                    f"{args.json_dir or args.output_path}/"
                    f"psnr_denoise_{sigma}.json"
                )
                r = run_eval_nopad(
                    model_fn, params, ds, jp,
                    os.path.join(args.output_path, f"denoise_{sigma}"),
                )
                print(f"Denoise sigma={sigma}: psnr: {r['psnr']:.2f}, "
                      f"ssim: {r['ssim']:.4f}")
            else:
                r = test_denoise(
                    model_fn, params, ds, sigma, args.output_path,
                    args.pad_base,
                )
            results[f"denoise_{sigma}"] = r
    if args.mode in (1, 3):
        ds = DerainDehazeDataset(
            derain_path=args.derain_path, dehaze_path=args.dehaze_path,
            task="derain",
        )
        results["derain"] = test_derain_dehaze(
            model_fn, params, ds, "derain", args.output_path, args.pad_base
        )
    if args.mode in (2, 3):
        ds = DerainDehazeDataset(
            derain_path=args.derain_path, dehaze_path=args.dehaze_path,
            task="dehaze",
        )
        results["dehaze"] = test_derain_dehaze(
            model_fn, params, ds, "dehaze", args.output_path, args.pad_base
        )
    return results


if __name__ == "__main__":
    main()
