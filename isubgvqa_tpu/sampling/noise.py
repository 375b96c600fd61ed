"""Noise distributions for perturb-and-MAP sampling.

TPU-native equivalents of the reference's noise module
(``sampling/methods/noise.py``): Gumbel(loc, scale) — the one actually
used by ISubGVQA with scale 0.3 (``models/masking.py:227,262``) — and
the Sum-of-Gamma distribution from the I-MLE paper.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gumbel_noise(key: jax.Array, shape, loc: float = 0.0, scale: float = 1.0,
                 dtype=jnp.float32) -> jax.Array:
    """Gumbel(loc, scale) samples (reference ``noise.py:71-89``)."""
    return loc + scale * jax.random.gumbel(key, shape, dtype=dtype)


def sum_of_gamma_noise(key: jax.Array, shape, k: float,
                       nb_iterations: int = 10, dtype=jnp.float32) -> jax.Array:
    """Sum-of-Gamma noise (reference ``noise.py:29-68``).

    ``(sum_{i=1..s} Gamma(1/k, k/i) - log s) / k`` — for integer k this
    approximates a distribution whose sum of k iid copies is Gumbel,
    matching the I-MLE paper's top-k perturbation.
    """
    keys = jax.random.split(key, nb_iterations)
    total = jnp.zeros(shape, dtype=dtype)
    for i in range(1, nb_iterations + 1):
        g = jax.random.gamma(keys[i - 1], 1.0 / k, shape, dtype=dtype)
        # Gamma(concentration, rate): jax.random.gamma is rate-1, so scale.
        total = total + g * (k / i)
    return (total - math.log(nb_iterations)) / k
