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


def __getattr__(name):
    # lazy top-level API (avoids importing jax at package import time)
    if name == "DMGASRPipeline":
        from .pipeline import DMGASRPipeline

        return DMGASRPipeline
    if name == "DDPMModel":
        from .train.ddpm_model import DDPMModel

        return DDPMModel
    if name == "GAETrainer":
        from .train.stage1_gae import GAETrainer

        return GAETrainer
    if name == "GAE":
        from .models.gae import GAE

        return GAE
    if name == "load_torch_gae":
        from .io.convert_torch import load_torch_gae

        return load_torch_gae
    raise AttributeError(name)
