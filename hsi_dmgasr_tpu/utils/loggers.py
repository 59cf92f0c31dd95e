"""Experiment logging: TensorBoard + optional Weights & Biases.

TensorBoard replaces the reference's tensorboardX usage (sr_gae.py:157,
266-269) via tf.summary (tensorflow ships in this image). WandbLogger
mirrors core/wandb_logger.py:3-117 and degrades to a no-op when the
wandb package is unavailable (this image has no egress anyway).
"""

from __future__ import annotations

import logging

logger = logging.getLogger("base")


class TBLogger:
    """Scalar/image writer; no-op if tensorflow is unavailable."""

    def __init__(self, log_dir):
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None
            self._writer = None

    def add_scalar(self, tag, value, step):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def add_image(self, tag, img_hwc, step):
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.image(tag, img_hwc[None], step=int(step))

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


class WandbLogger:
    """core/wandb_logger.py equivalent; inert without wandb installed."""

    def __init__(self, opt):
        try:
            import wandb
        except ImportError:
            logger.warning("wandb not installed; WandbLogger is a no-op")
            self._wandb = None
            return
        self._wandb = wandb
        if wandb.run is None:
            wandb.init(
                project=(opt.get("wandb") or {}).get("project", "dmgasr_tpu"),
                config=dict(opt),
                dir=(opt.get("path") or {}).get("experiments_root", "."),
            )
        self.config = self._wandb.config

    def log_metrics(self, metrics, commit=True):
        if self._wandb:
            self._wandb.log(metrics, commit=commit)

    def log_image(self, key, image):
        if self._wandb:
            self._wandb.log({key: self._wandb.Image(image)})

    def log_images(self, key, images):
        if self._wandb:
            self._wandb.log({key: [self._wandb.Image(im) for im in images]})

    def log_checkpoint(self, current_epoch, current_step):
        if not self._wandb:
            return
        art = self._wandb.Artifact(
            f"model-{self._wandb.run.id}", type="model"
        )
        self._wandb.log_artifact(
            art, aliases=[f"I{current_step}_E{current_epoch}", "latest"]
        )
