"""diffbinaural_tpu — TPU-native mono→binaural audio generation framework.

A from-scratch JAX/XLA/Pallas re-design of the two-stage DiffBinaural pipeline
(reference: harukana1435/DiffBinaural-binaural-audio-generation):

  stage 1  conditional diffusion (2D UNet + CLIP/position visual conditioning)
           mono log-mel → binaural (L/R) log-mels, 25-step DDIM as lax.scan
  stage 2  BigVGAN-style GAN vocoder (256× upsampling, alias-free snakebeta
           activations as fused Pallas kernels) log-mel → 22.05 kHz waveform

Everything under `jit`; data-parallel + model-parallel over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
