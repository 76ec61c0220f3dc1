"""Loss library.

Parity targets:
  * L1 restoration loss — `nn.L1Loss` (/root/reference/train.py:32,43).
  * CAMixer ratio loss — `2*ratio*(mean(decision)-0.5)^2`, computed inside
    the model in the reference
    (/root/reference/net/camixer_prompt_xrestormer_effv2.py:932) and added
    to L1 (/root/reference/train_capromptxrestormer.py:58-60); the CATA
    variant adds a second hard-ratio term
    (/root/reference/net/ca_ta_promptxrestormer.py:915-918).
  * GANLoss — LSGAN (MSE) / vanilla (BCE-with-logits) discriminator loss
    (/root/reference/utils/loss_utils.py:6-45), present-but-unused in the
    reference main path; provided for capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def ratio_loss(decision_mean: jnp.ndarray, ratio: float) -> jnp.ndarray:
    """Penalty keeping the mean routing decision near 0.5, scaled by the
    target ratio (CAMixer formulation)."""
    return 2.0 * ratio * jnp.square(decision_mean - 0.5)


def gan_loss(
    logits: jnp.ndarray, target_is_real: bool, gan_type: str = "lsgan"
) -> jnp.ndarray:
    """LSGAN (mse) or vanilla (bce-with-logits) GAN objective."""
    target = jnp.full_like(logits, 1.0 if target_is_real else 0.0)
    if gan_type == "lsgan":
        return jnp.mean(jnp.square(logits - target))
    if gan_type in ("vanilla", "bce"):
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
    raise ValueError(f"unknown gan_type {gan_type}")
