"""Stage-1 GAE trainer (reference AE.py:516-637 __main__).

Trains the Group AutoEncoder on HR cubes with the GELIN HLoss(0.3, 0.1)
(AE.py:613-614), Adam 1e-4 (AE.py:565). The reference's optional VGG19
"VGGSAM" perceptual term — full torchvision vgg19 logits on 3 random
bands, L1, weighted 1e-3 (AE.py:551-604) — is available via
``make_vgg_perceptual_fn`` with user-supplied weights
(``io.convert_torch.load_torch_vgg19``; torchvision's download is
blocked by zero egress, and the shipped checkpoints were trained with
HLoss only). Any callable ``(recon, hr)`` or ``(recon, hr, key)`` works
as ``perceptual_fn``.

The whole update is one jitted function; with a data mesh the gradient
all-reduce replaces the commented-out DataParallel of AE.py:549.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.gae import GAE
from ..parallel.mesh import data_parallel_mesh, replicate, shard_batch
from .losses import h_loss
from .state import create_train_state


def make_vgg_perceptual_fn(vgg_variables):
    """The reference's p_loss (AE.py:602-604): L1 between full-vgg19
    logits of 3 uniformly random bands of recon vs target. Returns a
    ``(recon, hr, key)`` callable for ``GAETrainer(perceptual_fn=...)``.
    """
    from ..models.vgg import VGG19

    vgg = VGG19()

    def fn(recon, hr, key):
        bands = jax.random.randint(key, (3,), 0, hr.shape[-1])
        r3 = jnp.take(recon, bands, axis=-1)
        h3 = jnp.take(hr, bands, axis=-1)
        return jnp.mean(jnp.abs(
            vgg.apply(vgg_variables, r3) - vgg.apply(vgg_variables, h3)
        ))

    return fn


class GAETrainer:
    def __init__(self, n_subs=16, n_ovls=4, n_colors=102, n_feats=64,
                 lr=1e-4, la1=0.3, la2=0.1, mesh=None, seed=0,
                 example_hw=64, variables=None,
                 perceptual_fn: Optional[Callable] = None,
                 perceptual_weight=1e-3, mask_p=0.0, loss="hloss"):
        self.gae = GAE(
            n_subs=n_subs, n_ovls=n_ovls, n_colors=n_colors, n_feats=n_feats
        )
        self.config = dict(
            n_subs=n_subs, n_ovls=n_ovls, n_colors=n_colors, n_feats=n_feats
        )
        self.la1, self.la2 = la1, la2
        # AEddp masked-reconstruction recipe (GAE/AEddp.py:196-247):
        # zero a random fraction of the cube, train the AE to match the
        # MASKED target with plain L1 (mask_p=0.6, loss='l1' there)
        self.mask_p = mask_p
        self.loss = loss
        self.perceptual_fn = perceptual_fn
        self.perceptual_weight = perceptual_weight
        if perceptual_fn is not None:
            import inspect

            n_args = len(inspect.signature(perceptual_fn).parameters)
            self._perceptual_wants_key = n_args >= 3
        else:
            self._perceptual_wants_key = False
        self._key = jax.random.PRNGKey(seed + 101)

        if variables is None:
            x0 = jnp.zeros((1, example_hw, example_hw, n_colors))
            variables = self.gae.init(jax.random.PRNGKey(seed), x0)
        self.tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
        self.state = create_train_state(dict(variables), self.tx)
        self.mesh = mesh if mesh is not None else data_parallel_mesh(1)
        self.state = replicate(self.mesh, self.state)
        self._train_step = jax.jit(self._train_step_impl)

    def _train_step_impl(self, state, hr, key):
        if self.mask_p > 0:
            from ..models.gae import random_mask

            k_mask, key = jax.random.split(key)
            hr = random_mask(k_mask, hr, p=self.mask_p)

        def loss_fn(params):
            recon, _ = self.gae.apply({"params": params}, hr)
            if self.loss == "l1":
                loss = jnp.mean(jnp.abs(recon - hr))
            else:
                loss = h_loss(recon, hr, self.la1, self.la2)
            if self.perceptual_fn is not None:
                p = (self.perceptual_fn(recon, hr, key)
                     if self._perceptual_wants_key
                     else self.perceptual_fn(recon, hr))
                loss = loss + self.perceptual_weight * p
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(self.tx, grads), loss

    def train_step(self, hr, key=None):
        """One Adam step on an HR cube batch (B, H, W, C). Accepts
        half-precision host->device transfers (widened on device —
        the tunnel upload is the loop bottleneck, see BENCHMARKS)."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        hr = jnp.asarray(hr)
        if hr.dtype in (jnp.float16, jnp.bfloat16):
            hr = hr.astype(jnp.float32)
        hr = shard_batch(self.mesh, hr)
        self.state, loss = self._train_step(self.state, hr, key)
        return loss

    # ------------------------------------------------------------- eval

    def reconstruct(self, x):
        recon, _ = self.gae.apply({"params": self.state.params}, jnp.asarray(x))
        return recon

    @property
    def variables(self):
        return {"params": jax.device_get(self.state.params)}

    # ------------------------------------------------------ checkpoints

    def save(self, path):
        """Save GAE weights + config (replaces the whole-module
        torch.save of AE.py:634-637)."""
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {"params": jax.device_get(self.state.params),
                 "config": {k: np.asarray(v) for k, v in self.config.items()}},
                force=True,  # re-saving a given path overwrites (resume reruns)
            )

    @classmethod
    def load_gae_variables(cls, path):
        """Load (variables, config) saved by ``save`` — the counterpart
        of torch.load on a GAE .pth."""
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path))
        cfg = {k: int(v) for k, v in restored["config"].items()}
        import math

        cfg["G"] = math.ceil(
            (cfg["n_colors"] - cfg["n_ovls"]) / (cfg["n_subs"] - cfg["n_ovls"])
        )
        return {"params": restored["params"]}, cfg
