"""End-to-end training demonstration on live hardware.

Runs the real training harness (Trainer -> jitted DP step -> orbax
checkpoints -> JSONL metrics) on the synthetic mixed-noise dataset and
reports PSNR on a held-out synthetic denoise set before and after — the
whole reference workflow (train.py -> test.py) compressed into one
self-contained command that needs no downloaded corpora.

  python tools/train_demo.py --epochs 3 --batch 4 --dtype bfloat16 --fused

Expect the L1 loss to fall monotonically and post-training PSNR to beat
the identity/noisy baseline by several dB within a few epochs at this
scale (a reduced-depth PromptIR; pass --full for the 35.6M-param model if
you can afford the compile time on a tunneled TPU).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n_train", type=int, default=48)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fused", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--full", action="store_true",
                   help="full 35.6M-param PromptIR (long first compile)")
    p.add_argument("--ckpt_dir", default="logs/train_demo/ckpt")
    p.add_argument("--log_dir", default="logs/train_demo")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from promptir_tpu.config import Config
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    # executables persist across processes (the relay's remote compile of
    # a fresh shape takes minutes; a warm re-run starts in seconds)
    enable_persistent_cache()
    from promptir_tpu.data.synthetic import (
        SyntheticDenoiseTestDataset,
        SyntheticTrainDataset,
    )
    from promptir_tpu.eval.metrics import psnr_ssim
    from promptir_tpu.models import create_model
    from promptir_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.train.epochs = args.epochs
    cfg.train.batch_size = args.batch
    cfg.train.lr = args.lr
    cfg.train.warmup_epochs = 1
    cfg.train.cosine_max_epochs = max(args.epochs, 2)
    cfg.train.ckpt_dir = args.ckpt_dir
    cfg.train.log_dir = args.log_dir
    cfg.data.patch_size = args.patch
    cfg.system.compute_dtype = args.dtype
    cfg.system.remat = args.remat

    kw = {"dtype": jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32}
    if not args.full:
        kw.update(num_blocks=(2, 3, 3, 4), num_refinement_blocks=2)
    if args.fused:
        kw["fused_ffn"] = True
    if args.remat:
        kw["remat"] = True
    model = create_model("promptir", **kw)

    train_ds = SyntheticTrainDataset(n=args.n_train, patch_size=args.patch)
    test_ds = SyntheticDenoiseTestDataset(n=4, size=args.patch, sigma=25.0)

    @jax.jit
    def fwd(params, x):
        return jnp.clip(model.apply({"params": params}, x), 0.0, 1.0)

    def eval_psnr(params):
        ps = []
        noisy_ps = []
        for i in range(len(test_ds)):
            _, noisy, clean = test_ds.get(i)
            restored = fwd(params, jnp.asarray(noisy[None]))
            p_, _ = psnr_ssim(jnp.asarray(clean[None]), restored)
            ps.append(float(p_[0]))
            pn, _ = psnr_ssim(
                jnp.asarray(clean[None]), jnp.asarray(noisy[None])
            )
            noisy_ps.append(float(pn[0]))
        return float(np.mean(ps)), float(np.mean(noisy_ps))

    trainer = Trainer(cfg, train_ds, model=model)
    psnr0, psnr_noisy = eval_psnr(trainer.state.params)
    print(f"[demo] devices: {jax.devices()}  mesh: {trainer.mesh.shape}")
    print(f"[demo] PSNR before training: {psnr0:.2f} dB "
          f"(noisy input: {psnr_noisy:.2f} dB)")

    t0 = time.time()
    trainer.fit()
    dt = time.time() - t0

    psnr1, _ = eval_psnr(trainer.state.params)
    print(f"[demo] PSNR after {args.epochs} epochs ({dt:.0f}s): "
          f"{psnr1:.2f} dB  (delta {psnr1 - psnr0:+.2f} dB)")
    if psnr1 <= psnr0:
        raise SystemExit("training demo FAILED: PSNR did not improve")
    print("[demo] OK — loss curve in", args.log_dir + "/metrics.jsonl",
          "checkpoints in", args.ckpt_dir)


if __name__ == "__main__":
    main()
