"""hsi_dmgasr_tpu: TPU-native framework for two-stage latent-diffusion
hyperspectral-image super-resolution (DMGASR, AAAI-2024).

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
handsomewzy/HSI-DMGASR (the PyTorch reference): a Group AutoEncoder (GAE)
that folds C spectral bands into G overlapping 3-channel latent images,
an SR3-style conditional DDPM operating in that latent space, the full
HSI metric/eval suite, the baseline HSI-SR model zoo, and the data
pipelines — all designed TPU-first (NHWC layouts, lax.scan samplers,
pjit/shard_map data parallelism, Pallas attention kernels).

Reference parity citations in docstrings point into the upstream repo
as ``<file>:<lines>`` (e.g. ``AE.py:256-361``).
"""

__version__ = "0.1.0"
