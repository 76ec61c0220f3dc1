"""Training CLI — the framework's `python train.py`.

Flag parity with /root/reference/options.py:1-39 and train.py:303-341:
`--model`, `--de_type`, `--epochs`, `--batch_size`, `--lr`, `--patch_size`,
data/ckpt paths, `--wblogger`, plus TPU-first flags (--dtype, --n_data,
--remat, --synthetic for data-free smoke runs).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="promptir_tpu trainer")
    p.add_argument("--model", default="promptir")
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--batch_size", type=int, default=6, help="per DP shard")
    p.add_argument(
        "--grad_accum", type=int, default=1,
        help="microbatches per optimizer step (scan-accumulated grads; "
             "reproduces the reference's 4-GPU global batch on fewer chips "
             "without extra activation memory)",
    )
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument(
        "--de_type",
        nargs="+",
        default=["denoise_15", "denoise_25", "denoise_50", "derain", "dehaze"],
    )
    p.add_argument("--patch_size", type=int, default=128)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--data_file_dir", default="data_dir/")
    p.add_argument("--denoise_dir", default="data/Train/Denoise/")
    p.add_argument("--derain_dir", default="data/Train/Derain/")
    p.add_argument("--dehaze_dir", default="data/Train/Dehaze/")
    p.add_argument("--output_path", default="output/")
    p.add_argument("--ckpt_dir", default="ckpt/train_all")
    p.add_argument("--resume", default=None, help="resume from latest or epoch N")
    p.add_argument("--wblogger", default=None, help="wandb project name")
    p.add_argument("--seed", type=int, default=0)
    # TPU-first knobs
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--n_data", type=int, default=None, help="DP mesh size")
    p.add_argument("--remat", action="store_true")
    p.add_argument(
        "--remat_levels", type=int, nargs="*", default=None,
        help="with --remat: rematerialize only these U-Net levels "
             "(1=dim .. 4=latent); levels 1-2 hold ~90%% of activation "
             "memory, so '--remat_levels 1 2' keeps the memory win while "
             "skipping the cheap-to-store levels' backward replay",
    )
    p.add_argument(
        "--fused", action="store_true",
        help="train with the fused Pallas kernels (custom-VJP backward; "
             "promptir only). NOTE: measured SLOWER than --remat for "
             "training on v5e (tools/tbench.py: 925 vs 529 ms/step at "
             "batch 24 — the custom VJP already remats the unfused "
             "composition). The fused kernels are the inference/serving "
             "optimization; for training use --remat.",
    )
    p.add_argument(
        "--profile_dir", default=None,
        help="write a jax.profiler trace of training steps 2-7 here",
    )
    p.add_argument(
        "--synthetic", action="store_true",
        help="train on synthetic data (no image corpus needed)",
    )
    # epoch-end eval (reference EvaluationCallback, train.py:134-172:
    # BSD68 sigma-15 + Rain100L PSNR/SSIM logged every epoch)
    p.add_argument("--eval_denoise_path", default=None,
                   help="clean BSD68-style dir for epoch-end sigma-15 eval")
    p.add_argument("--eval_derain_path", default=None,
                   help="Rain100L-style input/+target/ dir for epoch-end eval")
    p.add_argument("--eval_every_epochs", type=int, default=1)
    # model-size overrides (reference hardcodes these; exposed for smoke
    # runs and scaling experiments)
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    p.add_argument("--num_refinement_blocks", type=int, default=None)
    p.add_argument("--dim", type=int, default=None, help="base channel width")
    p.add_argument("--log_dir", default=None,
                   help="metrics.jsonl / logger dir (default: config)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from promptir_tpu.config import Config
    from promptir_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.train.model = args.model
    cfg.train.epochs = args.epochs
    cfg.train.batch_size = args.batch_size
    cfg.train.grad_accum = args.grad_accum
    cfg.train.lr = args.lr
    cfg.train.seed = args.seed
    cfg.train.ckpt_dir = args.ckpt_dir
    if args.log_dir is not None:
        cfg.train.log_dir = args.log_dir
    cfg.train.wandb_project = args.wblogger
    cfg.data.patch_size = args.patch_size
    cfg.data.num_workers = args.num_workers
    cfg.data.de_type = args.de_type
    cfg.data.data_file_dir = args.data_file_dir
    cfg.data.denoise_dir = args.denoise_dir
    cfg.data.derain_dir = args.derain_dir
    cfg.data.dehaze_dir = args.dehaze_dir
    cfg.system.compute_dtype = args.dtype
    cfg.system.n_data = args.n_data
    cfg.system.remat = args.remat
    if args.remat_levels is not None:
        cfg.system.remat_levels = tuple(args.remat_levels)
    cfg.system.profile_dir = args.profile_dir

    if args.synthetic:
        from promptir_tpu.data.synthetic import SyntheticTrainDataset

        dataset = SyntheticTrainDataset(patch_size=args.patch_size)
    else:
        from promptir_tpu.data.datasets import PromptTrainDataset

        dataset = PromptTrainDataset(
            data_file_dir=cfg.data.data_file_dir,
            denoise_dir=cfg.data.denoise_dir,
            derain_dir=cfg.data.derain_dir,
            dehaze_dir=cfg.data.dehaze_dir,
            de_type=cfg.data.de_type,
            patch_size=cfg.data.patch_size,
            seed=cfg.train.seed,
        )
        print(f"total samples: {len(dataset)}")

    model = None
    if (args.num_blocks is not None or args.num_refinement_blocks is not None
            or args.dim is not None or args.fused):
        import jax.numpy as jnp

        from promptir_tpu.models import create_model

        kw = {"dtype": jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32}
        if args.num_blocks is not None:
            kw["num_blocks"] = tuple(args.num_blocks)
        if args.num_refinement_blocks is not None:
            kw["num_refinement_blocks"] = args.num_refinement_blocks
        if args.dim is not None:
            kw["dim"] = args.dim
        if args.fused:
            kw["fused_ffn"] = True
        if args.remat:  # keep remat when size overrides build the model
            kw["remat"] = True
            if args.remat_levels is not None:
                kw["remat_levels"] = tuple(args.remat_levels)
        model = create_model(args.model, **kw)

    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    eval_hook = None
    if args.eval_denoise_path or args.eval_derain_path:
        from promptir_tpu.eval.runner import make_epoch_eval_hook

        cfg.train.eval_every_epochs = args.eval_every_epochs
        eval_hook = make_epoch_eval_hook(
            denoise_path=args.eval_denoise_path,
            derain_path=args.eval_derain_path,
        )
    trainer = Trainer(cfg, dataset, model=model, eval_hook=eval_hook)
    if args.resume is not None:
        trainer.resume(None if args.resume == "latest" else int(args.resume))
    trainer.fit()


if __name__ == "__main__":
    main()
