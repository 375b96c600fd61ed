"""Jitted train / eval steps.

Equivalent of the per-batch body of ``train_epoch``
(``training/train_epoch.py:46-126``) and ``validate_epoch``
(``training/val_epoch.py:12-126``): forward with ``return_masks=True``,
cross-entropy on the short answer only (``train_epoch.py:109``), top-1
accuracy, clip-by-global-norm 2.0 and Adam update.  DDP's bucketed
all-reduce disappears: the step is compiled over a sharded batch and
XLA inserts the gradient reductions over the mesh's ICI.

Padding samples (partial final batches) carry ``sample_mask == 0`` and
contribute neither loss nor metrics.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from ..config import Config
from ..data.batching import GraphBatch
from ..models.isubgvqa import ISubGVQA
from .state import TrainState


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       sample_mask: jax.Array) -> jax.Array:
    """Mean CE over real samples (torch CrossEntropyLoss parity,
    main.py:141-144)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(sample_mask), 1.0)
    return jnp.sum(nll * sample_mask) / denom


def _metrics(logits, labels, sample_mask, loss):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32) * sample_mask
    count = jnp.sum(sample_mask)
    return {
        "loss_sum": loss * count,
        "correct": jnp.sum(correct),
        "count": count,
    }


def make_train_step(model: ISubGVQA, optimizer: optax.GradientTransformation,
                    cfg: Config):
    """Returns ``train_step(state, batch, rng) -> (state, metrics)``.

    Differentiates w.r.t. the AIMLE state as well when that sampler is
    active — the "gradient" of the state input is the *updated* state
    (cotangent smuggling; see :mod:`isubgvqa_tpu.sampling.aimle`).
    """
    use_aimle = cfg.sampler_type == "aimle"

    if cfg.model_parallel <= 1:
        # one concatenated-vector reduction; identical value to
        # optax.global_norm but ~220 fewer tiny reduce ops per step,
        # and the ravel CSEs with the flat optimizer's own
        # (train/schedule.py make_optimizer flat=True, the DP default)
        def grad_norm_fn(grads):
            flat, _ = jax.flatten_util.ravel_pytree(grads)
            return jnp.sqrt(jnp.sum(jnp.square(flat)))
    else:
        # under TP, concatenating differently-sharded leaves would
        # force resharding; per-leaf partial sums reduce locally
        grad_norm_fn = optax.global_norm

    def loss_fn(params, aimle_states, batch_stats, batch, rngs):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=True, aimle_states=aimle_states,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss = cross_entropy_loss(out.logits, batch.labels, batch.sample_mask)
        return loss, (out, mutated["batch_stats"])

    def train_step(state: TrainState, batch: GraphBatch, rng: jax.Array):
        drng, srng = jax.random.split(jax.random.fold_in(rng, state.step))
        rngs = {"dropout": drng, "sampler": srng}
        if use_aimle:
            (loss, (out, new_bstats)), (grads, new_aimle) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.aimle_states, state.batch_stats, batch, rngs)
        else:
            (loss, (out, new_bstats)), grads = jax.value_and_grad(
                loss_fn, argnums=0, has_aux=True
            )(state.params, state.aimle_states, state.batch_stats, batch, rngs)
            new_aimle = state.aimle_states

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_bstats,
            aimle_states=new_aimle,
        )
        metrics = _metrics(out.logits, batch.labels, batch.sample_mask, loss)
        metrics["grad_norm"] = grad_norm_fn(grads)
        return new_state, metrics

    return train_step


def make_multistep_train_step(model: ISubGVQA,
                              optimizer: optax.GradientTransformation,
                              cfg: Config):
    """Returns ``multi_step(state, stacked_batch, rng) -> (state,
    metrics)`` running K full optimizer updates in ONE executable: a
    ``lax.scan`` of :func:`make_train_step`'s body over a batch pytree
    with a leading ``[K]`` axis.

    The parameter trajectory is *identical* to K sequential
    ``train_step`` dispatches with the same ``rng``: the per-step RNG
    is folded on ``state.step`` inside the body, which increments each
    scan iteration (pinned by
    ``tests/test_multistep.py::test_multistep_matches_sequential``).
    Metrics come back stacked ``[K]`` per entry, so meters see every
    inner step.

    Why: one host dispatch per K steps.  The model is small enough
    (~30 ms device time per step at the reference's batch 256) that
    per-dispatch host overhead is a measurable slice of wall-clock —
    the classic TPU remedy is to move the step loop into the program
    (the reference's CUDA analogue would be graph capture; here it is
    just a scan).
    """
    single = make_train_step(model, optimizer, cfg)

    def multi_step(state: TrainState, stacked_batch: GraphBatch,
                   rng: jax.Array):
        def body(s, b):
            return single(s, b, rng)

        return jax.lax.scan(body, state, stacked_batch)

    return multi_step


def make_eval_step(model: ISubGVQA, cfg: Config, return_output: bool = False):
    """Returns ``eval_step(state, batch, rng) -> metrics`` (or
    ``(metrics, ModelOutput)``), mirroring ``validate_epoch``'s
    no-grad forward with the samplers' validation branches
    (``val_epoch.py:44-126``, ``masking.py:164-176``)."""

    def eval_step(state: TrainState, batch: GraphBatch, rng: jax.Array):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, aimle_states=state.aimle_states,
            rngs={"sampler": rng},
        )
        loss = cross_entropy_loss(out.logits, batch.labels, batch.sample_mask)
        metrics = _metrics(out.logits, batch.labels, batch.sample_mask, loss)
        if return_output:
            return metrics, out
        return metrics

    return eval_step
