"""Pluggable certificates for randomized smoothing.

Mirrors /root/reference/smoothing/certificate.py (abstract Certificate +
L2Certificate): noise sampling lives on device (jax.random), the certificate
math (Phi^{-1}) on host. ``sigma`` may be a scalar (isotropic) or a
per-attribute vector (anisotropic diagonal Sigma, certificate.py:64-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.stats import gaussian_quantile


class Certificate:
    def compute_proxy_gap(self, probs: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def sample_noise(self, key: jax.Array, shape, sigma) -> jnp.ndarray:
        raise NotImplementedError

    def compute_gap(self, p_a_bar: float) -> float:
        raise NotImplementedError

    def compute_radius_estimate(self, probs, sigma):
        raise NotImplementedError


class L2Certificate(Certificate):
    """Gaussian smoothing; gap = Phi^{-1}(pABar) (certificate.py:52-76)."""

    norm = "l2"

    def compute_proxy_gap(self, probs: jnp.ndarray) -> jnp.ndarray:
        p0 = jnp.clip(probs[:, 0], 0.001, 0.999)
        p1 = jnp.clip(probs[:, 1], 0.001, 0.999)
        return jax.scipy.special.ndtri(p0) - jax.scipy.special.ndtri(p1)

    def sample_noise(self, key: jax.Array, shape, sigma) -> jnp.ndarray:
        return jax.random.normal(key, shape, jnp.float32) * sigma

    def compute_gap(self, p_a_bar: float) -> float:
        return gaussian_quantile(p_a_bar)

    def compute_gap_vec(self, p_a_bar):
        """Vectorized compute_gap (numpy array in/out) — used by the
        adaptive-device threshold builder (adaptive_device.build_thresholds)
        to evaluate the stopping rule over all candidate success counts in
        one scipy call."""
        from scipy.stats import norm
        return norm.ppf(p_a_bar)

    def compute_radius_estimate(self, probs: jnp.ndarray, sigma) -> jnp.ndarray:
        return sigma / 2.0 * self.compute_proxy_gap(probs)
