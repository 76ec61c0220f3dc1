"""Weight initializers matching torch's Conv2d/Linear defaults.

torch initializes conv/linear weights with kaiming_uniform(a=sqrt(5)),
which reduces to uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)). Matching this
keeps from-scratch training statistically equivalent to the reference
recipe (/root/reference/train.py uses torch defaults everywhere).

For flax kernels, fan_in = prod(shape[:-1]) covers both HWIO convs
(kh*kw*cin_per_group) and (in,out) dense kernels.
"""

from __future__ import annotations

import math

import jax


def torch_kernel_init(key, shape, dtype=jax.numpy.float32):
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)
