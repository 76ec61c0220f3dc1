"""End-to-end training smoke tests: loop, schedule, checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from promptir_tpu.config import Config
from promptir_tpu.data.synthetic import SyntheticTrainDataset
from promptir_tpu.models import create_model
from promptir_tpu.train.schedules import warmup_cosine
from promptir_tpu.train.trainer import Trainer


@pytest.fixture
def tiny_cfg(tmp_path):
    cfg = Config()
    cfg.train.epochs = 2
    cfg.train.batch_size = 1  # per shard; 8 devices -> global 8
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.data.patch_size = 32
    return cfg


def tiny_model():
    return create_model(
        "promptir", dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
        decoder=False,
    )


def test_trainer_fit_and_resume(tiny_cfg):
    ds = SyntheticTrainDataset(n=16, patch_size=32)
    trainer = Trainer(tiny_cfg, ds, model=tiny_model())
    assert trainer.global_batch == 8
    trainer.fit()
    assert trainer.ckpt.latest_epoch() == 1
    # loss decreased over the two epochs (sanity, not a strict bound)
    # epoch-level records are written unconditionally (per-step records are
    # throttled to every 50 steps), so even this 4-step run must produce a
    # plottable train_loss stream
    import json

    with open(os.path.join(tiny_cfg.train.log_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    epoch_records = [r for r in records if "train_loss" in r]
    assert len(epoch_records) >= 2
    assert all(np.isfinite(r["train_loss"]) for r in epoch_records)

    # resume into a third epoch
    cfg2 = tiny_cfg
    cfg2.train.epochs = 3
    trainer2 = Trainer(cfg2, ds, model=tiny_model())
    trainer2.resume()
    assert trainer2.start_epoch == 2
    trainer2.fit()
    assert trainer2.ckpt.latest_epoch() == 2


def test_warmup_cosine_reference_values():
    lr = warmup_cosine(2e-4, warmup_epochs=15, max_epochs=150)
    assert lr(0) == 0.0
    assert lr(14) == pytest.approx(2e-4)
    assert lr(15) == pytest.approx(2e-4)
    assert lr(150) == pytest.approx(0.0, abs=1e-12)
    # halfway point of the cosine
    assert lr((150 + 15) // 2) == pytest.approx(1e-4, rel=0.05)


def test_training_reduces_loss():
    ds = SyntheticTrainDataset(n=8, patch_size=32)
    cfg = Config()
    cfg.train.epochs = 1
    cfg.train.batch_size = 1
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg.train.ckpt_dir = os.path.join(td, "ckpt")
        cfg.train.log_dir = os.path.join(td, "logs")
        cfg.data.patch_size = 32
        cfg.train.lr = 1e-3
        model = tiny_model()
        trainer = Trainer(cfg, ds, model=model)
        # capture first/last step losses across a few epochs manually
        losses = []
        for epoch in range(3):
            for batch in trainer.loader.epoch(epoch):
                trainer.state, m = trainer.step_fn(trainer.state, batch)
                losses.append(float(m["train_loss"]))
        assert losses[-1] < losses[0]


def test_trainer_profile_trace(tiny_cfg, tmp_path):
    """--profile_dir writes a jax.profiler trace around steps 2-7."""
    prof = str(tmp_path / "prof")
    tiny_cfg.system.profile_dir = prof
    tiny_cfg.train.epochs = 3  # 6 steps: window opens at global step 2
    ds = SyntheticTrainDataset(n=16, patch_size=32)
    Trainer(tiny_cfg, ds, model=tiny_model()).fit()
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(prof)
        for f in fs
        if f.endswith((".trace.json.gz", ".xplane.pb"))
    ]
    assert found, f"no trace files under {prof}"

def test_gan_loss_matches_torch():
    """gan_loss parity with the reference's GANLoss
    (/root/reference/utils/loss_utils.py:6-45): lsgan == MSELoss vs a
    real/fake target tensor, vanilla == BCEWithLogitsLoss."""
    import torch

    from promptir_tpu.train.losses import gan_loss

    rng = np.random.default_rng(3)
    logits = rng.normal(0, 2.0, (4, 1, 8, 8)).astype(np.float32)
    t = torch.from_numpy(logits)
    for target_is_real in (True, False):
        tgt = torch.full_like(t, 1.0 if target_is_real else 0.0)
        ref_ls = torch.nn.MSELoss()(t, tgt).item()
        ref_bce = torch.nn.BCEWithLogitsLoss()(t, tgt).item()
        ours_ls = float(gan_loss(jnp.asarray(logits), target_is_real, "lsgan"))
        ours_bce = float(gan_loss(jnp.asarray(logits), target_is_real, "vanilla"))
        np.testing.assert_allclose(ours_ls, ref_ls, rtol=1e-6)
        np.testing.assert_allclose(ours_bce, ref_bce, rtol=1e-6)
    with pytest.raises(ValueError):
        gan_loss(jnp.zeros((2, 2)), True, "wgan")
