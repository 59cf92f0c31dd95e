"""RaGAN trainer for the 3-D attention GAN (reference GAE/train.py:84-199).

Alternating G/D Adam steps with the relativistic-average GAN losses plus
L1 fidelity and the spectral-angle term, all inside two jitted updates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models.baselines.gan3d import (
    Discriminator,
    Generator,
    ragan_d_loss,
    ragan_g_loss,
    spe_loss_gan,
)
from .state import create_train_state


class GAN3DTrainer:
    def __init__(self, n_bands=31, lr_g=1e-4, lr_d=1e-4, l1_weight=1.0,
                 spe_weight=1e-2, adv_weight=1e-3, seed=0, example_hw=9):
        self.G = Generator(n_bands=n_bands)
        self.D = Discriminator()
        self.l1_weight = l1_weight
        self.spe_weight = spe_weight
        self.adv_weight = adv_weight

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        x0 = jnp.zeros((1, example_hw, example_hw, n_bands))
        gv = self.G.init(k1, x0)
        hr0 = jnp.zeros((1, example_hw * 4, example_hw * 4, n_bands))
        dv = self.D.init(k2, hr0)

        self.tx_g = optax.adam(lr_g)
        self.tx_d = optax.adam(lr_d)
        self.g_state = create_train_state(dict(gv), self.tx_g)
        self.d_state = create_train_state(dict(dv), self.tx_d)
        self._g_step = jax.jit(self._g_step_impl)
        self._d_step = jax.jit(self._d_step_impl)

    def _d_apply(self, params, batch_stats, x, train):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if train:
            out, upd = self.D.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return out, upd["batch_stats"]
        return self.D.apply(variables, x, train=False), batch_stats

    def _g_step_impl(self, g_state, d_state, lr_cube, hr):
        def loss_fn(params):
            fake = self.G.apply({"params": params}, lr_cube)
            d_fake, _ = self._d_apply(
                d_state.params, d_state.batch_stats, fake, False
            )
            d_real, _ = self._d_apply(
                d_state.params, d_state.batch_stats, hr, False
            )
            adv = ragan_g_loss(d_real, d_fake)
            l1 = jnp.mean(jnp.abs(fake - hr))
            spe = spe_loss_gan(fake, hr)
            return (self.l1_weight * l1 + self.spe_weight * spe
                    + self.adv_weight * adv)

        loss, grads = jax.value_and_grad(loss_fn)(g_state.params)
        return g_state.apply_gradients(self.tx_g, grads), loss

    def _d_step_impl(self, g_state, d_state, lr_cube, hr):
        fake = jax.lax.stop_gradient(
            self.G.apply({"params": g_state.params}, lr_cube)
        )

        def loss_fn(params):
            d_fake, stats = self._d_apply(
                params, d_state.batch_stats, fake, True
            )
            d_real, stats = self._d_apply(params, stats, hr, True)
            return ragan_d_loss(d_real, d_fake), stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(d_state.params)
        return (
            d_state.apply_gradients(self.tx_d, grads, new_batch_stats=stats),
            loss,
        )

    def train_step(self, lr_cube, hr):
        lr_cube = jnp.asarray(lr_cube)
        hr = jnp.asarray(hr)
        self.d_state, d_loss = self._d_step(self.g_state, self.d_state,
                                            lr_cube, hr)
        self.g_state, g_loss = self._g_step(self.g_state, self.d_state,
                                            lr_cube, hr)
        return g_loss, d_loss

    def generate(self, lr_cube):
        return self.G.apply({"params": self.g_state.params},
                            jnp.asarray(lr_cube))
