"""Structured configuration (replaces the reference's argparse singleton).

Field-for-field coverage of /root/reference/options.py:1-39 plus TPU-first
knobs (mesh shape, compute dtype, remat, tiling). CLIs build this from
flags; library code takes it explicitly — no global state.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence


@dataclass
class DataConfig:
    data_file_dir: str = "data_dir/"
    denoise_dir: str = "data/Train/Denoise/"
    derain_dir: str = "data/Train/Derain/"
    dehaze_dir: str = "data/Train/Dehaze/"
    de_type: List[str] = field(
        default_factory=lambda: [
            "denoise_15",
            "denoise_25",
            "denoise_50",
            "derain",
            "dehaze",
        ]
    )
    patch_size: int = 128
    num_workers: int = 4


@dataclass
class EvalConfig:
    denoise_path: str = "test/denoise/bsd68/"
    derain_path: str = "test/derain/"
    dehaze_path: str = "test/dehaze/"
    output_path: str = "output/"
    mode: int = 0  # 0 denoise / 1 derain / 2 dehaze / 3 all-in-one
    pad_base: int = 64  # flip-pad multiple (reference test.py:100-104)


@dataclass
class TrainConfig:
    model: str = "promptir"
    epochs: int = 120
    batch_size: int = 6  # per data-parallel shard (reference: per GPU)
    grad_accum: int = 1  # microbatches per optimizer step (scan-accumulated)
    lr: float = 2e-4
    warmup_epochs: int = 15
    cosine_max_epochs: int = 150
    weight_decay: float = 0.01
    seed: int = 0
    ckpt_dir: str = "ckpt/train_all"
    resume: Optional[str] = None
    wandb_project: Optional[str] = None
    log_dir: str = "logs/"
    eval_every_epochs: int = 1


@dataclass
class SystemConfig:
    n_data: Optional[int] = None  # data-parallel mesh size (None = all)
    n_model: int = 1
    compute_dtype: str = "float32"  # "bfloat16" for max MXU throughput
    matmul_precision: Optional[str] = None  # e.g. "highest" for parity
    remat: bool = False  # rematerialize transformer blocks
    remat_levels: Optional[tuple] = None  # restrict remat to these levels
    tile: int = 128
    tile_overlap: int = 32
    tile_chunk: int = 8
    profile_dir: Optional[str] = None  # jax.profiler trace of steps 2-7


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    system: SystemConfig = field(default_factory=SystemConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
