#!/usr/bin/env python
"""Component-level timing at bench shapes to locate the bottleneck."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.question_encoder import QuestionEncoder
from isubgvqa_tpu.models.question_decoder import QuestionDecoder
from isubgvqa_tpu.models.scene_graph_encoder import SceneGraphEncoder
from isubgvqa_tpu.models.mgat import MGAT
from isubgvqa_tpu.models.pooling import GlobalAttentionPooling

BS = 256
DT = jnp.bfloat16


def timeit(fn, *args, iters=16, label="", vary=0):
    """Times ``fn`` over *distinct* inputs: the tunnel dedups identical
    re-executions, so argument ``vary`` is perturbed per iteration
    (+i for float arrays, roll for int arrays)."""
    jfn = jax.jit(fn)

    def variant(i):
        a = list(args)
        x = a[vary]
        if jnp.issubdtype(x.dtype, jnp.floating):
            a[vary] = x + 1e-3 * (i + 1)
        else:
            a[vary] = jnp.roll(x, i + 1, axis=-1)
        return a
    variants = [variant(i) for i in range(iters)]
    jax.block_until_ready(jfn(*args))
    t0 = time.perf_counter()
    outs = [jfn(*v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:38s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    import sys
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    cfg = Config(batch_size=BS, compute_dtype="bfloat16",
                 sampler_type="gumbel", sample_k=3, question_len=32,
                 max_nodes_per_graph=n, max_edges_per_graph=e)
    vocab = SceneGraphVocab.build(cfg.meta_dir)
    answers = AnswerMap.build(cfg.meta_dir, cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=BS, seed=0)
    spec = BucketSpec(BS, max_nodes_per_graph=n, max_edges_per_graph=e,
                      question_len=cfg.question_len)
    print(f"shapes: B={BS} N={n} E={e}")
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size, max_len=32)
    coll = Collator(tok, spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(BS)])
    batch = jax.device_put(batch)

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampler": jax.random.PRNGKey(2)}

    # question encoder
    qe = QuestionEncoder(dtype=DT, vocab_size=cfg.text_vocab_size)
    qv = qe.init(rngs, batch.qst_tokens, batch.qst_mask)
    enc = qe.apply(qv, batch.qst_tokens, batch.qst_mask)
    timeit(lambda v, t, m: qe.apply(v, t, m),
           qv, batch.qst_tokens, batch.qst_mask, vary=1,
           label="question_encoder (4L, 512)")

    # program decoder
    qd = QuestionDecoder(dtype=DT)
    dv = qd.init(rngs, enc)
    timeit(lambda v, e: qd.apply(v, e), dv, enc, vary=1,
           label="program_decoder (3L)")

    # scene graph encoder
    sg = SceneGraphEncoder(sg_vocab_size=len(vocab),
                           vocab_vectors=vocab.vectors, dtype=DT)
    sv = sg.init(rngs, batch)
    x_enc, e_enc = sg.apply(sv, batch)
    timeit(lambda v, bb, b: sg.apply(v, b.replace(node_bbox=bb)),
           sv, batch.node_bbox, batch, vary=1, label="scene_graph_encoder")

    # MGAT (gumbel sampler, mask on last layer)
    instr = jnp.zeros((BS, 4, 300), DT)
    lang = jnp.zeros((BS, 300), DT)
    mg = MGAT(sampler_type="gumbel", sample_k=3, dtype=DT)
    mv = mg.init(rngs, x_enc, batch, e_enc, instr, lang)
    timeit(lambda v, x, b, e, i, l: mg.apply(v, x, b, e, i, l,
                                             rngs={"sampler": jax.random.PRNGKey(0)}),
           mv, x_enc, batch, e_enc, instr, lang, vary=1,
           label="MGAT x4 (incl sampler)")

    # pooling
    pl = GlobalAttentionPooling(dtype=DT)
    pv = pl.init(rngs, x_enc, lang, batch)
    timeit(lambda v, x, u, b: pl.apply(v, x, u, b),
           pv, x_enc, lang, batch, vary=1, label="global_attention_pooling")


if __name__ == "__main__":
    main()
