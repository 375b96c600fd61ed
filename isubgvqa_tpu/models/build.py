"""Model construction + parameter initialization.

Equivalent of ``build_model`` (``models/build.py:4-27``): wires the
config through to :class:`ISubGVQA` and initializes parameters (the
scene-graph embedding from GloVe/meta vectors when available).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import Config
from ..data.batching import GraphBatch
from ..data.vocab import SceneGraphVocab
from .isubgvqa import ISubGVQA


def build_model(cfg: Config, vocab: SceneGraphVocab,
                bn_axis_name: Optional[str] = None) -> ISubGVQA:
    return ISubGVQA(
        cfg=cfg,
        sg_vocab_size=len(vocab),
        sg_vocab_vectors=vocab.vectors,
        bn_axis_name=bn_axis_name,
    )


def init_model(model: ISubGVQA, batch: GraphBatch, seed: int = 3407,
               aimle_states: Optional[dict] = None, on_cpu: bool = True):
    """Initialize params + batch_stats with a sample batch.

    Initialization runs on the host CPU backend by default — compiling
    the init program through the TPU tunnel takes minutes and wins
    nothing (init is one-shot, bandwidth-trivial); the resulting
    pytrees transfer to the accelerator on first use.
    """
    rngs = {"params": jax.random.PRNGKey(seed),
            "dropout": jax.random.PRNGKey(seed + 1),
            "sampler": jax.random.PRNGKey(seed + 2)}
    cpu = None
    if on_cpu:
        try:
            # local_devices, not devices: in a multi-process runtime
            # jax.devices("cpu")[0] is the COORDINATOR's device — a
            # non-addressable default_device segfaults eager dispatch
            # on every other process (caught by test_multiprocess.py)
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            batch_cpu = jax.device_put(batch, cpu)
            variables = model.init(rngs, batch_cpu, train=False,
                                   aimle_states=aimle_states)
    else:
        variables = model.init(rngs, batch, train=False,
                               aimle_states=aimle_states)
    return variables["params"], variables.get("batch_stats", {})


def apply_clip_text_tables(params, tables) -> dict:
    """Overwrite the question encoder's token/position tables with
    pretrained CLIP embeddings.

    Fresh-training equivalent of the reference's deep-copy init
    (``/root/reference/ISubGVQA/models/isubgvqa.py:119-121``: the text
    embedding tables start from pretrained CLIPModel weights, not
    random init).  ``tables`` is the dict returned by
    :func:`isubgvqa_tpu.convert.load_clip_text_tables` — the same
    loader the full-checkpoint converter uses, so both paths produce
    identical tables.  Returns a new params tree (input not mutated).
    """
    import jax.numpy as jnp
    import numpy as np

    emb = dict(params["question_encoder"]["text_vocab_embedding"])
    for name in ("token_embedding", "position_embedding"):
        tgt = emb[name]["embedding"]
        src = np.asarray(tables[name], np.float32)
        if src.shape != tgt.shape:
            raise ValueError(
                f"pretrained CLIP {name} shape {src.shape} does not match "
                f"the model's table {tuple(tgt.shape)} — check "
                f"text_vocab_size / question-position config")
        emb[name] = {"embedding": jnp.asarray(src, tgt.dtype)}
    qe = dict(params["question_encoder"])
    qe["text_vocab_embedding"] = emb
    new_params = dict(params)
    new_params["question_encoder"] = qe
    return new_params


def make_aimle_states(cfg: Config):
    """One AIMLE state per masked layer (threshold != 1.0), or None."""
    if cfg.sampler_type != "aimle":
        return None
    from ..sampling import init_aimle_state

    return {i: init_aimle_state()
            for i, t in enumerate(cfg.mgat_masks) if float(t) != 1.0}
