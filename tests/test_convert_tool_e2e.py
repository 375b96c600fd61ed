"""End-to-end checkpoint conversion: a reference-style torch ``.pth``
(the golden plain-torch model at full dims) goes through
``tools/convert_checkpoint.py`` into an orbax checkpoint + config
meta, is restored, and the rebuilt flax model must reproduce the torch
logits per sample (B=1 torch runs, as in the golden graph tests)."""

import dataclasses
import json
import runpy
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import build_model

from test_torch_golden_graph import TorchRefISubGVQA, _ragged_from_batch


def test_convert_checkpoint_tool_roundtrip(tmp_path):
    torch.manual_seed(0)
    vocab = SceneGraphVocab.synthetic()
    n_answers, text_vocab = 1842, 49408     # reference hard-codes
    m = TorchRefISubGVQA(text_vocab, len(vocab), n_answers).eval()

    args = SimpleNamespace(
        mgat_layers=4, sampler_type=None, sample_k=None, nb_samples=1,
        alpha=1.0, beta=10.0, tau=1.0, use_topk=True,
        interpretable_mode=False, concat_instr=False, use_all_instrs=False,
        use_global_mask=False, text_sampling=False, general_hidden_dim=300,
        mgat_masks=[1.0, 1.0, 1.0, 1.0])
    src = str(tmp_path / "ref_ckpt.pth")
    torch.save({"model": {f"module.{k}": v for k, v in
                          m.state_dict().items()},   # DDP-prefixed
                "args": args, "epoch": 7}, src)

    out_dir = str(tmp_path / "converted")
    argv = sys.argv
    sys.argv = ["convert_checkpoint.py", src, out_dir]
    try:
        runpy.run_path("tools/convert_checkpoint.py", run_name="__main__")
    finally:
        sys.argv = argv

    with open(out_dir + ".meta.json") as f:
        meta = json.load(f)
    assert meta["epoch"] == 7
    cfg = Config.from_json(json.dumps(meta["config"]))
    assert cfg.mgat_masks == (1.0, 1.0, 1.0, 1.0)

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(out_dir)
    params, stats = restored["params"], restored["batch_stats"]

    # rebuild and run (f32 so the parity check is tight)
    cfg = dataclasses.replace(cfg, compute_dtype="float32", synthetic=True)
    model = build_model(cfg, vocab)
    answers = AnswerMap.synthetic(8)
    ds = SyntheticGQA(vocab, answers, size=4, seed=0)
    spec = BucketSpec(batch_size=2, max_nodes_per_graph=32,
                      max_edges_per_graph=128, question_len=12)
    coll = Collator(HashWordTokenizer(vocab_size=text_vocab, max_len=12),
                    spec, vocab=vocab)
    batch, _ = coll.collate([ds[0], ds[1]])
    out = model.apply({"params": params, "batch_stats": stats}, batch,
                      train=False, rngs={"sampler": jax.random.PRNGKey(0)})
    logits_j = np.asarray(out.logits)
    assert logits_j.shape == (2, n_answers)

    for s in range(2):
        ids = torch.tensor(np.asarray(batch.qst_tokens[s:s + 1]),
                           dtype=torch.long)
        qmask = torch.tensor(np.asarray(batch.qst_mask[s:s + 1]),
                             dtype=torch.long)
        nt, bb, ei, et, sym, bvec = _ragged_from_batch(batch, s)
        with torch.no_grad():
            logits_t = m(ids, qmask, nt, bb, ei, et, sym, bvec)
        np.testing.assert_allclose(logits_j[s], logits_t.numpy()[0],
                                   rtol=1e-3, atol=2e-3)
