"""promptir_tpu: TPU-native all-in-one blind image restoration framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
PromptIR research codebase (kongwanbianjinyu/PromptIR): one model restores
images degraded by Gaussian noise (sigma in {15,25,50}), rain streaks, or
haze without being told the degradation type, via a learned prompt bank
injected into the decoder.

Layout is NHWC throughout (TPU lanes = channels); compute is built from
XLA-fused convolutions/matmuls plus Pallas kernels for the hot fused ops.
"""

__version__ = "0.1.0"
