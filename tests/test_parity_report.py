"""End-to-end CI exercise of the one-command parity harness
(``scripts/parity_report.py``): a mini reference-style torch checkpoint
is converted, evaluated on the synthetic fixture, and the report's
accuracy and mask-overlap deltas against a recorded "reference run"
(the torch golden model executed sample-by-sample, as the reference's
``run_token_coo.py:65-79`` batch=1 loop would) must be zero."""

import json
import os
import runpy
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data import BucketSpec, Collator, HashWordTokenizer
from isubgvqa_tpu.data.build import build_datasets
from isubgvqa_tpu.data.vocab import SceneGraphVocab

from test_torch_golden_graph import TorchRefISubGVQA, _ragged_from_batch

TEXT_VOCAB = 512
QLEN = 12
N_CAP, E_CAP = 32, 128


_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "parity_report.py")


def _parity_main(argv):
    mod = runpy.run_path(_SCRIPT)
    return mod["main"](argv)


def test_parity_report_end_to_end(tmp_path):
    torch.manual_seed(0)
    base = Config()
    # the harness builds its vocab/answers from cfg.meta_dir — mirror it
    vocab = SceneGraphVocab.build(base.meta_dir, seed=base.seed)
    cfg = Config(synthetic=True, synthetic_size=32, batch_size=4,
                 eval_batch_factor=1, question_len=QLEN,
                 max_nodes_per_graph=N_CAP, max_edges_per_graph=E_CAP,
                 bucket_node_caps=(N_CAP,), bucket_question_lens=(QLEN,),
                 text_vocab_size=TEXT_VOCAB, compute_dtype="float32")
    data = build_datasets(cfg)
    n_answers = len(data.answers)

    m = TorchRefISubGVQA(TEXT_VOCAB, len(vocab), n_answers).eval()
    args = SimpleNamespace(
        mgat_layers=4, sampler_type=None, sample_k=None, nb_samples=1,
        alpha=1.0, beta=10.0, tau=1.0, use_topk=True,
        interpretable_mode=False, concat_instr=False,
        use_all_instrs=False, use_global_mask=False, text_sampling=False,
        general_hidden_dim=300, mgat_masks=[1.0, 1.0, 1.0, 1.0])
    src = str(tmp_path / "ref_ckpt.pth")
    torch.save({"model": {f"module.{k}": v
                          for k, v in m.state_dict().items()},
                "args": args, "epoch": 5}, src)

    # ---- "reference run": the torch model, one sample at a time ------
    ds = data.datasets["dev"]
    spec = BucketSpec(batch_size=1, max_nodes_per_graph=N_CAP,
                      max_edges_per_graph=E_CAP, question_len=QLEN)
    tok = HashWordTokenizer(vocab_size=TEXT_VOCAB, max_len=QLEN)
    coll = Collator(tok, spec, vocab=vocab)
    ref_hits, ref_masks = [], {}
    for i in range(len(ds)):
        sample = ds[i]
        batch, _ = coll.collate([sample])
        ids = torch.tensor(np.asarray(batch.qst_tokens[0:1]),
                           dtype=torch.long)
        qmask = torch.tensor(np.asarray(batch.qst_mask[0:1]),
                             dtype=torch.long)
        nt, bb, ei, et, sym, bvec = _ragged_from_batch(batch, 0)
        with torch.no_grad():
            logits_t = m(ids, qmask, nt, bb, ei, et, sym, bvec)
        pred = int(logits_t.numpy()[0].argmax())
        ref_hits.append(float(pred == int(np.asarray(batch.labels)[0])))
        # unmasked configuration: the discrete subgraph is all nodes
        ref_masks[str(sample.question_id)] = np.ones(nt.shape[0],
                                                     np.float32)
    ref_metrics = {"accuracy": float(np.mean(ref_hits))}
    ref_json = tmp_path / "ref_metrics.json"
    ref_json.write_text(json.dumps(ref_metrics))
    masks_npz = tmp_path / "ref_masks.npz"
    np.savez(masks_npz, **ref_masks)

    # ---- the one command ---------------------------------------------
    out = str(tmp_path / "report")
    payload = _parity_main([
        "--torch_ckpt", src, "--synthetic", "--synthetic_size", "32",
        "--reference_json", str(ref_json),
        "--reference_masks", str(masks_npz),
        "--out", out, "--work_dir", str(tmp_path / "work"),
        "--set", "batch_size=4", "--set", "eval_batch_factor=1",
        "--set", f"question_len={QLEN}",
        "--set", f"max_nodes_per_graph={N_CAP}",
        "--set", f"max_edges_per_graph={E_CAP}",
        "--set", f"bucket_node_caps=[{N_CAP}]",
        "--set", f"bucket_question_lens=[{QLEN}]",
        "--set", f"text_vocab_size={TEXT_VOCAB}",
        "--set", 'compute_dtype="float32"',
    ])

    assert payload["num_samples"] == len(ds)
    # logits parity (pinned elsewhere at rtol 1e-3) makes argmax agree:
    # answer accuracy must match the reference run exactly
    assert payload["metrics"]["accuracy"] == pytest.approx(
        ref_metrics["accuracy"])
    assert payload["delta"]["accuracy"] == pytest.approx(0.0)
    # unmasked configuration: full-graph masks on both sides
    assert payload["metrics"]["mask_iou"] == pytest.approx(1.0)
    assert payload["metrics"]["mask_exact"] == pytest.approx(1.0)
    assert payload["metrics"]["mask_n"] == len(ds)

    with open(out + ".json") as f:
        on_disk = json.load(f)
    assert on_disk["metrics"]["accuracy"] == payload["metrics"]["accuracy"]
    md = open(out + ".md").read()
    assert "| accuracy |" in md and "delta" in md
