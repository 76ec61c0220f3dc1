"""The training harness: epochs over a data-parallel mesh.

The TPU-native equivalent of the reference's Lightning setup
(/root/reference/train.py:303-341): jitted DP train step (XLA grad psum
over ICI instead of NCCL DDP), per-epoch warmup-cosine LR, every-epoch
async Orbax checkpoints, epoch-end PSNR/SSIM eval hook
(train.py:134-172), and JSONL/wandb/TB metric logging.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from promptir_tpu.config import Config
from promptir_tpu.data.loader import TrainLoader
from promptir_tpu.models import create_model
from promptir_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from promptir_tpu.train.checkpoints import CheckpointManager
from promptir_tpu.train.metrics_logger import MetricLogger
from promptir_tpu.train.schedules import warmup_cosine
from promptir_tpu.train.state import (
    create_train_state,
    make_optimizer,
    set_learning_rate,
)
from promptir_tpu.train.step import jit_train_step, make_eval_step, make_train_step


class Trainer:
    def __init__(
        self,
        cfg: Config,
        dataset,
        model=None,
        eval_hook: Optional[Callable] = None,
        aux_loss_fn: Optional[Callable] = None,
        preemption_guard=None,
    ):
        self.cfg = cfg
        self.mesh = create_mesh(cfg.system.n_data, cfg.system.n_model)
        n_shards = self.mesh.devices.shape[0]
        self.global_batch = cfg.train.batch_size * n_shards

        dtype = jnp.bfloat16 if cfg.system.compute_dtype == "bfloat16" else jnp.float32
        model_kw = {"dtype": dtype}
        if cfg.system.remat:
            model_kw["remat"] = True  # supported by the flagship model
            if cfg.system.remat_levels:
                model_kw["remat_levels"] = tuple(cfg.system.remat_levels)
        self.model = model if model is not None else create_model(
            cfg.train.model, **model_kw
        )
        self.dataset = dataset
        self.eval_hook = eval_hook

        self.loader = TrainLoader(
            dataset,
            batch_size=self.global_batch,
            seed=cfg.train.seed,
            num_workers=cfg.data.num_workers,
            sharding=batch_sharding(self.mesh),
        )
        tx = make_optimizer(cfg.train.lr, cfg.train.weight_decay)
        # CAMixer-family models sample Gumbel routing during training and
        # return auxiliary ratio losses
        stochastic = getattr(self.model, "variant", None) in ("v1", "v2", "cata")
        if stochastic and aux_loss_fn is None and self.model.variant == "v1":
            # v1 returns the raw mean decision; apply the v2-style ratio
            # objective to it (the v2/cata models compute losses in-model)
            from promptir_tpu.train.losses import ratio_loss

            r = self.model.ratio
            aux_loss_fn = lambda d: ratio_loss(d, r)  # noqa: E731
        self.state = create_train_state(
            self.model,
            jax.random.PRNGKey(cfg.train.seed),
            jnp.zeros((1, cfg.data.patch_size, cfg.data.patch_size, 3)),
            tx=tx,
        )
        self.state = jax.device_put(self.state, replicated(self.mesh))
        if self.global_batch % cfg.train.grad_accum:
            raise ValueError(
                f"global batch {self.global_batch} not divisible by "
                f"grad_accum {cfg.train.grad_accum}"
            )
        self.step_fn = jit_train_step(
            make_train_step(
                self.model, aux_loss_fn, stochastic=stochastic,
                seed=cfg.train.seed, grad_accum=cfg.train.grad_accum,
            ),
            self.mesh,
        )
        self.eval_step = make_eval_step(self.model)
        self.schedule = warmup_cosine(
            cfg.train.lr, cfg.train.warmup_epochs, cfg.train.cosine_max_epochs
        )
        self.ckpt = CheckpointManager(cfg.train.ckpt_dir)
        self.logger = MetricLogger(cfg.train.log_dir, cfg.train.wandb_project)
        self.global_step = 0
        self.start_epoch = 0
        # preemption-safe training (SIGTERM/SIGINT -> checkpoint -> clean
        # return; the reference has no preemption handling, SURVEY.md §5).
        # Pass a PreemptionGuard to share it (cooperative shutdown/tests);
        # by default one is installed at fit() time.
        self.preemption = preemption_guard

    def resume(self, epoch: Optional[int] = None) -> None:
        self.state = self.ckpt.restore(self.state, epoch)
        self.start_epoch = int(self.state.epoch) + 1
        self.global_step = int(self.state.step)
        print(f"resumed from epoch {self.start_epoch - 1}")

    def _save_preempted(self, epoch: int) -> None:
        """Checkpoint so `resume()` replays the interrupted epoch: the
        state is saved mid-epoch but tagged epoch-1 (resume continues at
        state.epoch + 1). Partial progress in the interrupted epoch is
        kept — replaying it continues training from the saved weights."""
        self.state = self.state.replace(
            epoch=jnp.asarray(epoch - 1, jnp.int32)
        )
        self.ckpt.save(epoch, jax.device_get(self.state), overwrite=True)
        self.ckpt.wait()
        self.logger.log(
            {"preempted_in_epoch": epoch}, self.global_step
        )
        self.logger.close()
        print(
            f"preempted in epoch {epoch}: checkpoint saved "
            f"(resume replays the epoch)"
        )

    def fit(self) -> None:
        cfg = self.cfg
        guard = self.preemption
        own_guard = guard is None
        if own_guard:
            from promptir_tpu.train.preemption import PreemptionGuard

            guard = PreemptionGuard()
        try:
            self._fit_epochs(cfg, guard)
        finally:
            # always restore the previous SIGTERM/SIGINT handlers and
            # close an in-flight trace, even when step_fn raises — an
            # installed-but-orphaned handler would swallow Ctrl-C/SIGTERM
            # for the rest of the process
            if self._prof_started and not self._prof_stopped:
                jax.profiler.stop_trace()
                self._prof_stopped = True
            if own_guard:
                guard.restore()

    def _fit_epochs(self, cfg, guard) -> None:
        # profiler window: steps [2, 7) of the first epoch land in an XLA
        # trace viewable in TensorBoard/Perfetto (the reference has no
        # profiling story at all, SURVEY.md §5)
        prof_dir = cfg.system.profile_dir
        self._prof_started = self._prof_stopped = not prof_dir
        for epoch in range(self.start_epoch, cfg.train.epochs):
            lr = self.schedule(epoch)
            self.state = set_learning_rate(self.state, lr)
            t0 = time.time()
            losses = []
            for batch in self.loader.epoch(epoch):
                if not self._prof_started and self.global_step >= 2:
                    jax.profiler.start_trace(prof_dir)
                    self._prof_started = True
                self.state, metrics = self.step_fn(self.state, batch)
                self.global_step += 1
                if (
                    self._prof_started
                    and not self._prof_stopped
                    and self.global_step >= 7
                ):
                    jax.tree.map(
                        lambda x: x.block_until_ready(), self.state.params
                    )
                    jax.profiler.stop_trace()
                    self._prof_stopped = True
                    print(f"profiler trace written to {prof_dir}")
                losses.append(metrics["train_loss"])
                if guard.preempted():
                    if self._prof_started and not self._prof_stopped:
                        jax.profiler.stop_trace()
                        self._prof_stopped = True
                    self._save_preempted(epoch)
                    return
                if self.global_step % 50 == 0:
                    self.logger.log(
                        {
                            "train_loss": float(metrics["train_loss"]),
                            "lr": lr,
                            "epoch": epoch,
                        },
                        self.global_step,
                    )
            dt = time.time() - t0
            epoch_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            if self._prof_started and not self._prof_stopped:
                # run too short to reach the window's end: close it now
                jax.profiler.stop_trace()
                self._prof_stopped = True
                print(f"profiler trace written to {prof_dir}")
            imgs = len(self.loader) * self.global_batch
            print(
                f"epoch {epoch}: loss {epoch_loss:.4f} lr {lr:.2e} "
                f"{imgs / max(dt, 1e-9):.1f} img/s"
            )
            # Always write an epoch-level record: the per-step record above
            # is throttled to every 50 steps (a float() fetch per step would
            # sync the device), so short runs would otherwise leave
            # metrics.jsonl empty and `cli/viz.py curves` blank. The
            # reference's training curves are epoch-level too
            # (plot_training_curve.ipynb).
            self.logger.log(
                {
                    "train_loss": epoch_loss,
                    "lr": lr,
                    "epoch": epoch,
                    "imgs_per_sec": imgs / max(dt, 1e-9),
                },
                self.global_step,
            )
            self.state = self.state.replace(epoch=jnp.asarray(epoch, jnp.int32))
            # overwrite handles replaying an epoch whose preemption
            # checkpoint already occupies this step
            self.ckpt.save(epoch, jax.device_get(self.state), overwrite=True)
            if (
                self.eval_hook is not None
                and (epoch + 1) % cfg.train.eval_every_epochs == 0
            ):
                eval_metrics = self.eval_hook(self.eval_step, self.state.params)
                self.logger.log(eval_metrics, self.global_step)
        self.ckpt.wait()
        self.logger.close()
