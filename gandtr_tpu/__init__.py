"""gandtr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities
of mohwald/gandtr: day→night GAN generators (CycleGAN, CUT, HED-GAN, HED^N-GAN)
used as training-time augmentation for GeM global-descriptor embedding networks
(VGG16 / ResNet-101), plus retrieval evaluation on ROxford5k / RParis6k / Tokyo 24/7.

Everything on the compute path is functional JAX compiled by XLA; data layout is
NHWC (TPU-native); parallelism is expressed with `jax.sharding.Mesh` + GSPMD.
"""

__version__ = "0.1.0"
