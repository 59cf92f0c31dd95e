"""Device-resident training scenes: upload once, sample on device.

The stage-2 training loop over the remote-TPU tunnel is transfer-bound:
a 4-cube 128^2x102 {HR, SR} batch is ~27 MB at f16 (~1.1 s at the
~25 MB/s tunnel upload) while the jitted step computes in ~0.15 s.
The reference never hits this wall (its data loader and GPU share a
PCIe bus) but re-reads + re-normalizes the full .mat scene from disk
on EVERY item instead (HStrain.py:35-54).

This module is the TPU-native answer for the common case where the
training corpus is a handful of modest scenes (Pavia/Chikusei-style
crops): keep the normalized scene stack in HBM (8 scenes of
192^2x102 f32 = 120 MB) and replace the per-step host upload with an
all-device jitted sampler — random scene pick, random crop, 8-way
flip/rot with the exact ``utils.augment.data_augmentation`` mode
semantics (reference utils.py:3-27) — so only a PRNG key crosses the
host boundary. Degradation then happens on device too
(pipeline.train_step_from_hr). Measured: 1.0 s/step (host path, f16,
prefetch) -> compute-bound (~5x) on the round-3 production run.

Sampling uses jax RNG (scene, crop, mode drawn per item per step)
rather than the host dataset's visit-seeded numpy RNG: the marginal
distribution is identical (uniform scene x uniform valid crop x
uniform mode); the draw ORDER differs, which SURVEY.md §7 documents
as acceptable (stochastic sampler).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def augment_device(x, mode):
    """jnp twin of utils.augment.data_augmentation on an (H, W, C)
    array with a TRACED mode in [0, 8): odd modes add flipud on top of
    ccw rot90 multiples k = mode // 2."""
    branches = [
        lambda a: a,
        lambda a: jnp.flipud(a),
        lambda a: jnp.rot90(a),
        lambda a: jnp.flipud(jnp.rot90(a)),
        lambda a: jnp.rot90(a, k=2),
        lambda a: jnp.flipud(jnp.rot90(a, k=2)),
        lambda a: jnp.rot90(a, k=3),
        lambda a: jnp.flipud(jnp.rot90(a, k=3)),
    ]
    return jax.lax.switch(mode, branches, x)


@functools.partial(jax.jit, static_argnames=("batch_size", "gt_size"))
def _sample_batch(scenes, key, batch_size, gt_size):
    """(S, H, W, C) scene stack -> (B, gt_size, gt_size, C) HR crops."""
    S, H, W, _ = scenes.shape
    k_idx, k_row, k_col, k_mode = jax.random.split(key, 4)
    idx = jax.random.randint(k_idx, (batch_size,), 0, S)
    row = jax.random.randint(k_row, (batch_size,), 0, H - gt_size + 1)
    col = jax.random.randint(k_col, (batch_size,), 0, W - gt_size + 1)
    mode = jax.random.randint(k_mode, (batch_size,), 0, 8)

    def one(i, r, c, m):
        scene = jax.lax.dynamic_index_in_dim(scenes, i, 0, keepdims=False)
        crop = jax.lax.dynamic_slice(
            scene, (r, c, 0), (gt_size, gt_size, scene.shape[-1])
        )
        return augment_device(crop, m)

    return jax.vmap(one)(idx, row, col, mode)


class DeviceSceneCache:
    """Normalized scene stack in device memory + jitted batch sampler.

    ``scenes``: list of (H, W, C) float32 arrays, already per-scene
    min-max normalized (HSTrainingData._scene provides exactly this).
    All scenes must share one shape — the uniform-stack requirement is
    what makes the sampler a single static-shape jit; mixed-size
    corpora stay on the host path.
    """

    def __init__(self, scenes, gt_size):
        shapes = {s.shape for s in scenes}
        if len(shapes) != 1:
            raise ValueError(
                f"device-resident sampling needs uniform scene shapes, "
                f"got {sorted(shapes)}"
            )
        h, w, _ = next(iter(shapes))
        if gt_size > min(h, w):
            raise ValueError(
                f"gt_size {gt_size} exceeds scene extent {(h, w)}"
            )
        self.gt_size = int(gt_size)
        self.n_scenes = len(scenes)
        # upload per scene (~15 MB messages) and stack on device: one
        # monolithic 100+ MB device_put has been observed to drop the
        # remote-tunnel connection, and per-scene puts retry cheaply
        parts = [
            jax.device_put(np.ascontiguousarray(s, dtype=np.float32))
            for s in scenes
        ]
        self.scenes = jax.jit(lambda *xs: jnp.stack(xs))(*parts)

    def sample(self, key, batch_size):
        """(batch_size, gt_size, gt_size, C) HR crops, on device."""
        return _sample_batch(self.scenes, key, batch_size, self.gt_size)

    @classmethod
    def from_dataset(cls, ds, gt_size):
        """Build from an HSTrainingData-style dataset (reuses its scene
        loading + per-scene min-max normalization and cache)."""
        scenes = [ds._scene(i) for i in range(len(ds.image_files))]
        return cls(scenes, gt_size)
