"""Generic trainer for the baseline HSI-SR zoo.

Covers the reference's per-model training scripts (SSPSR.py:208-269,
GAE/{GELIN,EDSR,MCNet_train,GDRNN_train}.py): Adam, model-specific loss
(HybridLoss for SSPSR, HLoss for GELIN, L1 for EDSR/MCNet, myloss_spe for
GDRRN), optional gradient clipping (GDRNN_train.py:35), jitted step over
the data mesh (supersedes the DDP boilerplate).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.baselines import EDSR, GDRNN, GELIN, MCNet, SSPSR
from ..parallel.mesh import data_parallel_mesh, replicate, shard_batch
from .losses import h_loss, hybrid_loss, spe_loss
from .state import create_train_state

_TWO_INPUT = {"sspsr", "gelin"}  # forward(lr, lms)


def build_baseline(name, n_colors, scale=4, **overrides):
    name = name.lower()
    if name == "sspsr":
        kw = dict(n_subs=8, n_ovls=2, n_colors=n_colors, n_blocks=3,
                  n_feats=256, n_scale=scale, res_scale=0.1)
        kw.update(overrides)
        return SSPSR(**kw)
    if name == "gelin":
        kw = dict(n_feats=64, n_colors=n_colors, n_subs=8, n_ovls=2,
                  blocks=4, scale=scale)
        kw.update(overrides)
        return GELIN(**kw)
    if name == "edsr":
        kw = dict(n_resblocks=16, n_feats=64, n_colors=n_colors)
        kw.update(overrides)
        return EDSR(**kw)
    if name == "mcnet":
        kw = dict(scale=scale, n_colors=n_colors, n_feats=32)
        kw.update(overrides)
        return MCNet(**kw)
    if name == "gdrrn":
        kw = dict(input_chnl_hsi=n_colors, group=overrides.pop("group", 1))
        kw.update(overrides)
        return GDRNN(**kw)
    raise ValueError(f"unknown baseline {name}")


def default_loss(name):
    name = name.lower()
    if name == "sspsr":
        return lambda y, gt, b: hybrid_loss(y, gt)
    if name == "gelin":
        return lambda y, gt, b: h_loss(y, gt, 0.3, 0.1)
    if name == "gdrrn":
        return lambda y, gt, b: spe_loss(y, gt, n=b)
    return lambda y, gt, b: jnp.mean(jnp.abs(y - gt))


class BaselineTrainer:
    def __init__(self, name, n_colors, scale=4, lr=1e-4, mesh=None, seed=0,
                 example_hw=8, grad_clip=None, loss_fn=None, **overrides):
        self.name = name.lower()
        self.model = build_baseline(name, n_colors, scale, **overrides)
        self.two_input = self.name in _TWO_INPUT
        self.loss_fn = loss_fn or default_loss(name)

        x0 = jnp.zeros((1, example_hw, example_hw, n_colors))
        if self.two_input:
            variables = self.model.init(jax.random.PRNGKey(seed), x0, x0)
        else:
            variables = self.model.init(jax.random.PRNGKey(seed), x0)

        tx = optax.adam(lr)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        self.tx = tx
        self.state = create_train_state(dict(variables), tx)
        self.mesh = mesh if mesh is not None else data_parallel_mesh(1)
        self.state = replicate(self.mesh, self.state)
        self._step = jax.jit(self._step_impl)
        self._fwd = jax.jit(self._fwd_impl)

    def _apply(self, params, lr_cube, lms):
        if self.two_input:
            return self.model.apply({"params": params}, lr_cube, lms)
        return self.model.apply({"params": params}, lr_cube)

    def _step_impl(self, state, lr_cube, lms, hr):
        def loss(params):
            y = self._apply(params, lr_cube, lms)
            return self.loss_fn(y, hr, hr.shape[0])

        l, grads = jax.value_and_grad(loss)(state.params)
        return state.apply_gradients(self.tx, grads), l

    def _fwd_impl(self, params, lr_cube, lms):
        return self._apply(params, lr_cube, lms)

    def train_step(self, lr_cube, hr, lms=None):
        lr_cube = jnp.asarray(lr_cube)
        hr = jnp.asarray(hr)
        lms = lr_cube if lms is None else jnp.asarray(lms)
        batch = shard_batch(self.mesh, (lr_cube, lms, hr))
        self.state, loss = self._step(self.state, *batch)
        return loss

    def predict(self, lr_cube, lms=None):
        lr_cube = jnp.asarray(lr_cube)
        lms = lr_cube if lms is None else jnp.asarray(lms)
        return self._fwd(self.state.params, lr_cube, lms)

    def save(self, path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                os.path.abspath(path),
                {"params": jax.device_get(self.state.params)},
                force=True,  # re-saving a given path overwrites (resume reruns)
            )

    def load(self, path):
        import orbax.checkpoint as ocp

        target = {"params": jax.tree.map(np.asarray,
                                         jax.device_get(self.state.params))}
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), target)
        self.state = self.state.replace(
            params=replicate(self.mesh, restored["params"])
        )
