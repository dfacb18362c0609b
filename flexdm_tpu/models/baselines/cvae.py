"""Conditional-VAE building blocks (flax.linen).

Counterpart of reference ``src/mfp/mfp/models/architecture/cvae.py``: the
reparameterized :class:`Head` (cvae.py:7-48), the :class:`Prior` /
:class:`VAEEncoder` / :class:`VAEDecoder` stacks (cvae.py:51-176), and their
per-attribute ``MA*`` wrappers (cvae.py:66-91, 121-147, 179-204).  Keras
``add_loss`` side channels become explicit return values: modules hand back
``(z-dict, aux)`` where ``aux`` carries KL terms for the trainer to sum.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..transformer import make_dense

Aux = Dict[str, jnp.ndarray]


class Head(nn.Module):
    """mean/log_sigma projection + reparameterization (cvae.py:7-48)."""

    latent_dim: int = 32
    compute_kl: bool = False

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[Dict[str, jnp.ndarray], Aux]:
        z_mean = make_dense(self.latent_dim, "fc_mean")(h)
        z_log_sigma = make_dense(self.latent_dim, "fc_log_sigma")(h)
        if deterministic:
            z = z_mean
        else:
            eps = jax.random.normal(self.make_rng("vae"), z_log_sigma.shape)
            z = z_mean + jnp.exp(0.5 * z_log_sigma) * eps

        aux: Aux = {}
        if self.compute_kl and not deterministic:
            aux["kl_divergence"] = -0.5 * jnp.mean(
                1.0 + z_log_sigma - jnp.square(z_mean) - jnp.exp(z_log_sigma)
            )
        return {"z": z, "z_mean": z_mean, "z_log_sigma": z_log_sigma}, aux


class Prior(nn.Module):
    """relu Dense -> Head (cvae.py:51-63)."""

    latent_dim: int = 32

    @nn.compact
    def __call__(self, h, deterministic: bool = True):
        h = nn.relu(make_dense(self.latent_dim, "fc")(h))
        out, _ = Head(self.latent_dim, name="head")(h, deterministic)
        return out


class VAEEncoder(nn.Module):
    """Posterior over one attribute given (gt embedding, context)
    (cvae.py:94-118)."""

    dim_in: int = 128
    dim_out: int = 32

    @nn.compact
    def __call__(self, hidden, context, deterministic: bool = True):
        h = make_dense(self.dim_in, "fc1")(hidden)
        h = jnp.concatenate([h, context], axis=-1)
        h = nn.relu(make_dense(self.dim_out, "fc2")(h))
        out, _ = Head(name="head")(h, deterministic)
        return out


class VAEDecoder(nn.Module):
    """(z, context) -> per-attribute feature (cvae.py:150-176)."""

    hidden_dim: int = 128
    out_dim: int = 64

    @nn.compact
    def __call__(self, z, context, deterministic: bool = True):
        h = jnp.concatenate([z, context], axis=-1)
        h = nn.relu(make_dense(self.hidden_dim, "fc1")(h))
        return nn.relu(make_dense(self.out_dim, "fc2")(h))


class MAPrior(nn.Module):
    """Separate prior per attribute (cvae.py:66-91)."""

    keys: Tuple[str, ...]

    @nn.compact
    def __call__(self, context, deterministic: bool = True):
        return {
            k: Prior(name=f"prior_{k}")(context, deterministic)
            for k in self.keys
        }


class MACVAEEncoder(nn.Module):
    """Separate posterior per attribute (cvae.py:121-147)."""

    keys: Tuple[str, ...]

    @nn.compact
    def __call__(self, h_gts, context, deterministic: bool = True):
        return {
            k: VAEEncoder(name=f"enc_{k}")(h_gts[k], context, deterministic)
            for k in self.keys
        }


class MACVAEDecoder(nn.Module):
    """Separate decoder per attribute (cvae.py:179-204)."""

    keys: Tuple[str, ...]

    @nn.compact
    def __call__(self, zs, context, deterministic: bool = True):
        return {
            k: VAEDecoder(name=f"dec_{k}")(zs[k], context, deterministic)
            for k in self.keys
        }


def gaussian_kl(
    mean_q: jnp.ndarray,
    log_sigma_q: jnp.ndarray,
    mean_p: jnp.ndarray,
    log_sigma_p: jnp.ndarray,
) -> jnp.ndarray:
    """KL(q || p) between diagonal Gaussians, summed over the last axis.

    Matches ``tfp.distributions.MultivariateNormalDiag.kl_divergence`` with
    scale ``exp(0.5 * log_sigma)`` (reference layoutvae.py:116-118).
    """
    var_q = jnp.exp(log_sigma_q)
    var_p = jnp.exp(log_sigma_p)
    return 0.5 * jnp.sum(
        (var_q + jnp.square(mean_q - mean_p)) / var_p
        + log_sigma_p
        - log_sigma_q
        - 1.0,
        axis=-1,
    )
