"""Conv/Dense aliases with torch-default initialization.

All framework modules use these so from-scratch training matches the
reference's initialization statistics (see utils/init.py).
"""

from __future__ import annotations

from functools import partial

from flax import linen as nn

from promptir_tpu.utils.init import torch_kernel_init

Conv = partial(nn.Conv, kernel_init=torch_kernel_init)
Dense = partial(nn.Dense, kernel_init=torch_kernel_init)
ConvTranspose = partial(nn.ConvTranspose, kernel_init=torch_kernel_init)
