"""In-kernel activations for Pallas TPU (Mosaic) bodies.

Mosaic has no ``erf``/``erfc`` lowering, so the exact (erf) GELU the
reference's ``torch.nn.GELU`` computes is evaluated inside kernels with
the Abramowitz-Stegun 7.1.26 rational polynomial (max abs error
1.5e-7 on erf, ~7e-7 on gelu) — pure elementwise mul/add/exp/abs, all
VPU ops.  The XLA paths outside kernels use
``jax.nn.gelu(approximate=False)`` directly; the two agree to ~1e-6,
far inside the fused-vs-reference test tolerances.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _erf_poly(x):
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def gelu_exact(x):
    """Exact-GELU (torch ``nn.GELU()`` parity) via polynomial erf."""
    return 0.5 * x * (1.0 + _erf_poly(x * (1.0 / math.sqrt(2.0))))


def gelu_grad_exact(x):
    """d/dx of exact GELU: ``Phi(x) + x * phi(x)`` with the same
    polynomial erf — used by the hand-written Pallas backward kernels
    (:mod:`.metalayer_train`)."""
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf_poly(x * (1.0 / math.sqrt(2.0))))
    return cdf + x * phi
