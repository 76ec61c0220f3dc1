import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp, numpy as np
from PIL import Image
yy, xx = np.meshgrid(np.linspace(0,255,150), np.linspace(0,255,200), indexing='ij')
img = np.stack([xx, yy, (xx+yy)/2], -1).clip(0,255).astype(np.uint8)
Image.fromarray(img).save('/tmp/scene.png')

from promptir_tpu.models import create_model
from promptir_tpu.data.datasets import DenoiseTestDataset
from promptir_tpu.eval.tiling import tiled_inference
from promptir_tpu.eval.metrics import compute_psnr_ssim

ds = DenoiseTestDataset('/tmp/', sigma=25)
name, noisy, clean = ds.get(0)
model = create_model('nafnetlocal', width=8, middle_blk_num=1,
                     enc_blk_nums=(1,1), dec_blk_nums=(1,1),
                     tlc_train_size=(64,64))
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,64,64,3)))
fwd = jax.jit(lambda p, x: model.apply(p, x))
restored = tiled_inference(fwd, params, jnp.asarray(noisy[None]))
p = compute_psnr_ssim(np.asarray(restored), clean[None])
print("nafnetlocal drive:", restored.shape, "psnr/ssim:", p)
assert restored.shape == (1,) + clean.shape
print("range:", float(jnp.min(restored)), float(jnp.max(restored)))
