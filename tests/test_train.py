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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_trainer_restores_signal_handlers_on_error(tiny_cfg):
    """fit() installs a PreemptionGuard over SIGTERM/SIGINT; when step_fn
    raises, the previous handlers must come back (try/finally) — an
    orphaned handler would swallow Ctrl-C/SIGTERM for the whole process."""
    import signal

    ds = SyntheticTrainDataset(n=16, patch_size=32)
    trainer = Trainer(tiny_cfg, ds, model=tiny_model())
    before = signal.getsignal(signal.SIGTERM)

    def boom(state, batch):
        raise RuntimeError("injected step failure")

    trainer.step_fn = boom
    with pytest.raises(RuntimeError, match="injected step failure"):
        trainer.fit()
    assert signal.getsignal(signal.SIGTERM) is before


@pytest.mark.slow
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


@pytest.mark.slow
def test_remat_value_preserving_full_and_selective():
    """nn.remat trades memory for recompute without changing values:
    forward and grads match the plain model exactly for remat=True and
    for selective remat (remat_levels restricts replay to the pixel-heavy
    levels; levels 3-4's activations are cheap to store)."""
    import jax

    from promptir_tpu.models import create_model

    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 32, 32, 3)), jnp.float32
    )
    kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
              decoder=False)
    plain = create_model("promptir", **kw)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    def loss(model):
        return jax.jit(
            lambda p: jnp.mean(jnp.abs(model.apply({"params": p}, x)))
        )

    ref_l, ref_g = jax.value_and_grad(loss(plain))(params)
    for variant_kw in (
        {"remat": True},
        {"remat": True, "remat_levels": (1, 2)},
    ):
        m = create_model("promptir", **kw, **variant_kw)
        l, g = jax.value_and_grad(loss(m))(params)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_g), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


def test_preemption_guard_latches_sigterm():
    import signal

    from promptir_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        assert not guard.preempted()
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.preempted()  # latched, process still alive
    # restore() reinstalled the previous handler
    assert signal.getsignal(signal.SIGTERM) is not guard._on_signal


@pytest.mark.slow
def test_trainer_preemption_checkpoint_and_resume(tiny_cfg):
    """Preemption-safe training (the reference has no preemption handling,
    SURVEY.md §5): a preemption request mid-epoch checkpoints and returns
    cleanly; resume replays the interrupted epoch and completes the run."""
    import json

    from promptir_tpu.train.preemption import PreemptionGuard

    guard = PreemptionGuard(signals=())  # cooperative (no real signal)

    class PreemptAfter:
        """Request preemption once the loader has pulled k samples (the
        loader prefetches, so the flag is up within epoch 0)."""

        def __init__(self, ds, k):
            self.ds, self.k, self.n = ds, k, 0

        def __len__(self):
            return len(self.ds)

        def get(self, i, rng=None):
            self.n += 1
            if self.n == self.k:
                guard.request()
            return self.ds.get(i, rng)

    tiny_cfg.train.epochs = 2
    ds = SyntheticTrainDataset(n=16, patch_size=32)
    trainer = Trainer(
        tiny_cfg, PreemptAfter(ds, 4), model=tiny_model(),
        preemption_guard=guard,
    )
    trainer.fit()
    # preempted inside epoch 0; its checkpoint is tagged so resume
    # replays the epoch (state.epoch == -1, saved under step 0)
    assert trainer.ckpt.latest_epoch() == 0
    with open(os.path.join(tiny_cfg.train.log_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert any(r.get("preempted_in_epoch") == 0 for r in records)

    t2 = Trainer(tiny_cfg, ds, model=tiny_model())
    t2.resume(None)
    assert t2.start_epoch == 0  # replays the interrupted epoch
    t2.fit()  # re-saving epoch 0 overwrites the preemption checkpoint
    assert t2.ckpt.latest_epoch() == 1


@pytest.mark.slow
def test_trainer_epoch_end_eval_hook(tiny_cfg, tmp_path):
    """Epoch-end eval (reference EvaluationCallback, train.py:134-172):
    BSD68 sigma-15 + Rain100L metrics land in metrics.jsonl every epoch."""
    import json

    from PIL import Image

    from promptir_tpu.eval.runner import make_epoch_eval_hook

    def write_png(path, seed):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arr = np.random.default_rng(seed).integers(
            0, 255, (40, 56, 3), dtype=np.uint8
        )
        Image.fromarray(arr).save(path)

    d = tmp_path / "eval"
    for i in range(2):
        write_png(str(d / "denoise" / f"img{i}.png"), i)
        write_png(str(d / "derain" / "input" / f"rain-{i}.png"), 10 + i)
        write_png(str(d / "derain" / "target" / f"rain-{i}.png"), 20 + i)

    hook = make_epoch_eval_hook(
        denoise_path=str(d / "denoise"), derain_path=str(d / "derain")
    )
    tiny_cfg.train.epochs = 1
    ds = SyntheticTrainDataset(n=8, patch_size=32)
    trainer = Trainer(tiny_cfg, ds, model=tiny_model(), eval_hook=hook)
    trainer.fit()

    with open(os.path.join(tiny_cfg.train.log_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    ev = [r for r in records if "eval_psnr_denoise15" in r]
    assert len(ev) == 1
    assert np.isfinite(ev[0]["eval_psnr_denoise15"])
    assert 0 <= ev[0]["eval_ssim_denoise15"] <= 1
    assert np.isfinite(ev[0]["eval_psnr_derain"])


@pytest.mark.slow
def test_cli_train_end_to_end(tmp_path):
    """The training CLI end to end (the reference's `python train.py`):
    synthetic data, width/depth overrides, scan-accumulated grads, epoch-end
    denoise eval, checkpoint + metrics stream on disk."""
    import json

    from PIL import Image

    from promptir_tpu.cli.train import main

    d = tmp_path / "bsd"
    os.makedirs(d)
    for i in range(2):
        arr = np.random.default_rng(i).integers(
            0, 255, (40, 56, 3), dtype=np.uint8
        )
        Image.fromarray(arr).save(str(d / f"img{i}.png"))

    main([
        "--model", "promptir", "--synthetic", "--epochs", "1",
        "--batch_size", "2", "--grad_accum", "2", "--patch_size", "32",
        "--dim", "8", "--num_blocks", "1", "1", "1", "1",
        "--num_refinement_blocks", "1",
        "--eval_denoise_path", str(d),
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    assert os.path.isdir(tmp_path / "ckpt" / "0")
    with open(tmp_path / "logs" / "metrics.jsonl") as f:
        records = [json.loads(line) for line in f]
    assert any("train_loss" in r for r in records)
    ev = [r for r in records if "eval_psnr_denoise15" in r]
    assert len(ev) == 1 and np.isfinite(ev[0]["eval_psnr_denoise15"])
