"""Adaptive I-MLE (AIMLE) with symmetric perturbation and an *explicit*
adaptive-target state, as a ``jax.custom_vjp``.

TPU-native equivalent of the torch-adaptive-imle port at
``sampling/methods/aimle.py`` + ``target_aimle.py``:

* forward — ``z = MAP(θ + ε·τ_θ)`` with saved noise
  (``aimle.py:82-138``);
* backward — symmetric targets ``θ'_L = α·θ + λ·∇y``,
  ``θ'_R = α·θ − λ·∇y`` with ``λ = β·‖θ‖/‖∇y‖``
  (``target_aimle.py:111-128``), gradient
  ``(MAP(θ'_L+ε) − MAP(θ'_R+ε)) / 2 / λ`` (``aimle.py:199-243``,
  ``target_aimle.py:161``);
* the adaptive β update (``target_aimle.py:130-161``) mutates Python
  object state in the reference — here it is an explicit
  :class:`AIMLEState` input whose *cotangent* carries the updated
  state out of the backward pass (cotangent smuggling).  The train
  step differentiates w.r.t. the state input and reads the new state
  from that "gradient"; since the state feeds nothing else, the
  cotangent is exactly the smuggled value.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .noise import gumbel_noise, sum_of_gamma_noise
from .topk import topk_mask


@dataclasses.dataclass(frozen=True)
class AIMLEConfig:
    k: int
    nb_samples: int = 1
    theta_noise_temperature: float = 1.0    # --tau (masking.py:264)
    target_noise_temperature: float = 1.0
    symmetric_perturbation: bool = True     # masking.py:266
    alpha: float = 1.0                      # initial_alpha (masking.py:260)
    beta_update_step: float = 1e-4          # target_aimle.py:95
    beta_update_momentum: float = 0.0
    grad_norm_decay_rate: float = 0.9
    target_norm: float = 1.0
    noise_scale: float = 0.3                # masking.py:262
    noise: str = "gumbel"
    sog_iterations: int = 10

    def for_eval(self) -> "AIMLEConfig":
        """Validation sampler keeps forward noise at temperature tau
        when nb_samples == 1 (masking.py:271-278) — noisy eval is
        reference behavior."""
        temp = 1.0 if self.nb_samples > 1 else self.theta_noise_temperature
        return dataclasses.replace(self, theta_noise_temperature=temp)


class AIMLEState(struct.PyTreeNode):
    """Adaptive target-distribution state (target_aimle.py:100-109)."""

    beta: jax.Array           # scalar f32, init 0.0 (masking.py:260)
    grad_norm: jax.Array      # EMA of gradient non-zero rate, init 1.0
    prev_update: jax.Array    # previous beta update (momentum term)


def init_aimle_state(initial_beta: float = 0.0,
                     initial_grad_norm: float = 1.0) -> AIMLEState:
    return AIMLEState(
        beta=jnp.asarray(initial_beta, jnp.float32),
        grad_norm=jnp.asarray(initial_grad_norm, jnp.float32),
        prev_update=jnp.asarray(0.0, jnp.float32),
    )


def _sample_noise(key, shape, cfg: AIMLEConfig):
    if cfg.noise == "gumbel":
        return gumbel_noise(key, shape, scale=cfg.noise_scale)
    if cfg.noise == "sum_of_gamma":
        return sum_of_gamma_noise(key, shape, k=float(max(cfg.k, 1)),
                                  nb_iterations=cfg.sog_iterations)
    raise ValueError(f"unknown noise {cfg.noise!r}")


def _solve(theta_bsn: jax.Array, k: int) -> jax.Array:
    return topk_mask(jax.lax.stop_gradient(theta_bsn), k)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def aimle_topk(theta: jax.Array, state: AIMLEState, key: jax.Array,
               cfg: AIMLEConfig) -> jax.Array:
    """AIMLE top-k over ``theta [B, N]`` → masks ``[S, B, N]``.

    ``state`` only influences the backward pass (the β used to build
    the target distribution); its cotangent is the *updated* state.
    """
    z, _ = _aimle_fwd(theta, state, key, cfg)
    return z


def _aimle_fwd(theta, state, key, cfg: AIMLEConfig):
    b, n = theta.shape
    s = cfg.nb_samples
    noise = _sample_noise(key, (b, s, n), cfg)
    perturbed = theta[:, None, :] + noise * cfg.theta_noise_temperature
    z = _solve(perturbed, cfg.k)                       # [B, S, N]
    # reference aimle forward returns the flat [B*S, ...] view
    # (aimle.py:137-138); we expose the sample-leading view for a
    # uniform sampler interface and take out[0] at nb_samples == 1.
    return jnp.swapaxes(z, 0, 1), (theta, state, noise)


def _perturbation_magnitude(beta, theta, dy):
    """λ = β·‖θ‖/‖∇y‖, 0 when ‖∇y‖ = 0 (target_aimle.py:111-115)."""
    norm_dy = jnp.linalg.norm(dy.reshape(-1))
    norm_theta = jnp.linalg.norm(theta.reshape(-1))
    return jnp.where(norm_dy > 0.0, beta * norm_theta / jnp.maximum(norm_dy, 1e-30),
                     0.0)


def _aimle_bwd(cfg: AIMLEConfig, residuals, dy):
    theta, state, noise = residuals
    dy = jnp.swapaxes(dy, 0, 1)                        # [B, S, N]
    theta_tiled = jnp.broadcast_to(theta[:, None, :], dy.shape)

    # params() is called with the tiled theta (aimle.py:174-182)
    pm_params = _perturbation_magnitude(state.beta, theta_tiled, dy)
    target_r = cfg.alpha * theta_tiled - pm_params * dy
    if cfg.symmetric_perturbation:
        target_l = cfg.alpha * theta_tiled + pm_params * dy
    else:
        target_l = cfg.alpha * theta_tiled

    eps = noise * cfg.target_noise_temperature
    z_r = _solve(target_r + eps, cfg.k)
    z_l = _solve(target_l + eps, cfg.k)

    grad3d = z_l - z_r                                 # [B, S, N]
    if cfg.symmetric_perturbation:
        grad3d = grad3d / 2.0

    # process(): adaptive β update from the EMA of the gradient
    # non-zero rate (target_aimle.py:130-161).  Note the reference
    # calls it with the *untiled* theta.
    pm_process = _perturbation_magnitude(state.beta, theta, dy)
    b, s = grad3d.shape[0], grad3d.shape[1]
    grad_nnz = jnp.sum((grad3d != 0.0).astype(jnp.float32))
    nb_gradients = float(b * s)
    new_grad_norm = (cfg.grad_norm_decay_rate * state.grad_norm
                     + (1.0 - cfg.grad_norm_decay_rate) * grad_nnz / nb_gradients)
    direction = jnp.where(new_grad_norm < cfg.target_norm, 1.0, -1.0)
    beta_update = (cfg.beta_update_momentum * state.prev_update
                   + direction * cfg.beta_update_step)
    new_beta = jnp.maximum(state.beta + beta_update, 0.0)
    new_state = AIMLEState(beta=new_beta, grad_norm=new_grad_norm,
                           prev_update=beta_update)

    scaled = grad3d / jnp.where(pm_process > 0.0, pm_process, 1.0)
    grad = jnp.mean(scaled, axis=1).astype(theta.dtype)  # [B, N]

    key_ct = np.zeros((), dtype=jax.dtypes.float0)
    return grad, new_state, key_ct


aimle_topk.defvjp(_aimle_fwd, _aimle_bwd)
