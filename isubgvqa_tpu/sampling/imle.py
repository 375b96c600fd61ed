"""I-MLE: implicit maximum-likelihood estimation via perturb-and-MAP,
as a ``jax.custom_vjp`` (Niepert, Minervini & Franceschi, NeurIPS 2021).

TPU-native equivalent of the torch-imle port at
``sampling/methods/wrapper.py`` + ``target.py``:

* forward — tile the scores ``nb_samples`` times, add
  ``Gumbel(0, noise_scale)`` noise scaled by the input temperature,
  solve MAP = per-row top-k (``wrapper.py:75-121``);
* backward — build target params ``θ' = α·θ − β·∇y``
  (``target.py:44-48``), re-perturb with the *saved* noise at the
  target temperature, re-solve, and return
  ``mean_samples(MAP(θ+ε) − MAP(θ'+ε))`` (``wrapper.py:123-172``).

The saved forward noise lives in the VJP residuals, replacing the
autograd ``ctx.save_for_backward`` (``wrapper.py:112``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .noise import gumbel_noise, sum_of_gamma_noise
from .topk import topk_mask


@dataclasses.dataclass(frozen=True)
class IMLEConfig:
    k: int
    nb_samples: int = 1                    # --nb_samples (arg_parser.py:18)
    input_noise_temperature: float = 1.0   # --tau (masking.py:228-229)
    target_noise_temperature: float = 1.0
    alpha: float = 1.0                     # --alpha (target.py:47)
    beta: float = 10.0                     # --beta
    noise_scale: float = 0.3               # masking.py:227 GumbelDistribution(0, 0.3)
    noise: str = "gumbel"                  # or "sum_of_gamma"
    sog_iterations: int = 10

    def for_eval(self) -> "IMLEConfig":
        """Validation sampler: deterministic when nb_samples == 1
        (masking.py:234-243 sets input temperature 0)."""
        temp = self.input_noise_temperature if self.nb_samples > 1 else 0.0
        return dataclasses.replace(self, input_noise_temperature=temp)


def _sample_noise(key, shape, cfg: IMLEConfig):
    if cfg.noise == "gumbel":
        return gumbel_noise(key, shape, scale=cfg.noise_scale)
    if cfg.noise == "sum_of_gamma":
        return sum_of_gamma_noise(key, shape, k=float(max(cfg.k, 1)),
                                  nb_iterations=cfg.sog_iterations)
    raise ValueError(f"unknown noise {cfg.noise!r}")


def _solve(theta_bsn: jax.Array, k: int) -> jax.Array:
    """MAP solver on [B, S, N]: per-row hard top-k (no gradient)."""
    return topk_mask(jax.lax.stop_gradient(theta_bsn), k)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def imle_topk(theta: jax.Array, key: jax.Array, cfg: IMLEConfig) -> jax.Array:
    """Perturb-and-MAP top-k over ``theta [B, N]`` → masks ``[S, B, N]``.

    The sample axis leads, matching the reference forward's permute
    (``wrapper.py:115-121``); callers with ``nb_samples == 1`` take
    ``out[0]`` like ``masking.py:169-173``.
    """
    z, _ = _imle_fwd(theta, key, cfg)
    return z


def _imle_fwd(theta, key, cfg: IMLEConfig):
    b, n = theta.shape
    s = cfg.nb_samples
    noise = _sample_noise(key, (b, s, n), cfg)
    perturbed = theta[:, None, :] + noise * cfg.input_noise_temperature
    z = _solve(perturbed, cfg.k)                       # [B, S, N]
    return jnp.swapaxes(z, 0, 1), (theta, noise, z)


def _imle_bwd(cfg: IMLEConfig, residuals, dy):
    theta, noise, z = residuals
    dy = jnp.swapaxes(dy, 0, 1)                        # [B, S, N]
    theta_tiled = jnp.broadcast_to(theta[:, None, :], dy.shape)
    # θ' = α·θ − β·∇y   (target.py:44-48)
    target = cfg.alpha * theta_tiled - cfg.beta * dy
    perturbed_target = target + noise * cfg.target_noise_temperature
    z_target = _solve(perturbed_target, cfg.k)
    grad = jnp.mean(z - z_target, axis=1)              # [B, N]
    key_ct = np.zeros((), dtype=jax.dtypes.float0)
    return grad.astype(theta.dtype), key_ct


imle_topk.defvjp(_imle_fwd, _imle_bwd)
