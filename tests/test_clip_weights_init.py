"""Pretrained CLIP text-embedding initialization (``--clip_weights``).

The reference builds its question encoder from a deep copy of
pretrained CLIPModel text embeddings
(``/root/reference/ISubGVQA/models/isubgvqa.py:119-121``); here the
same tables are loaded at fresh init via ``cfg.clip_weights``
(:func:`isubgvqa_tpu.convert.load_clip_text_tables` +
:func:`isubgvqa_tpu.models.build.apply_clip_text_tables`) — the same
loader the full-checkpoint converter uses, so both paths must agree.
"""

import dataclasses

import numpy as np
import pytest

from isubgvqa_tpu.convert import (convert_state_dict,
                                  load_clip_text_tables)
from isubgvqa_tpu.data import (AnswerMap, BucketSpec, Collator,
                               HashWordTokenizer, SceneGraphVocab,
                               SyntheticGQA)
from isubgvqa_tpu.models.build import (apply_clip_text_tables,
                                       build_model, init_model)

from test_model import small_cfg

D = 512
VOCAB = 512
POS = 77


@pytest.fixture(scope="module")
def tables(tmp_path_factory):
    rng = np.random.default_rng(7)
    tok = rng.normal(size=(VOCAB, D)).astype(np.float32)
    pos = rng.normal(size=(POS, D)).astype(np.float32)
    return {"token_embedding": tok, "position_embedding": pos}


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    vocab = SceneGraphVocab.synthetic()
    answers = AnswerMap.synthetic(cfg.num_answers)
    ds = SyntheticGQA(vocab, answers, size=8, seed=0)
    spec = BucketSpec(batch_size=cfg.batch_size,
                      max_nodes_per_graph=cfg.max_nodes_per_graph,
                      max_edges_per_graph=cfg.max_edges_per_graph,
                      question_len=cfg.question_len)
    tok = HashWordTokenizer(vocab_size=cfg.text_vocab_size,
                            max_len=cfg.question_len)
    coll = Collator(tok, spec, vocab=vocab)
    batch, _ = coll.collate([ds[i] for i in range(cfg.batch_size)])
    return cfg, vocab, batch


def _emb_leaves(params):
    emb = params["question_encoder"]["text_vocab_embedding"]
    return (np.asarray(emb["token_embedding"]["embedding"]),
            np.asarray(emb["position_embedding"]["embedding"]))


def test_npz_roundtrip(tables, tmp_path):
    path = tmp_path / "clip_text.npz"
    np.savez(path, **tables)
    loaded = load_clip_text_tables(str(path))
    np.testing.assert_array_equal(loaded["token_embedding"],
                                  tables["token_embedding"])
    np.testing.assert_array_equal(loaded["position_embedding"],
                                  tables["position_embedding"])


def test_torch_reference_ckpt_roundtrip(tables, tmp_path):
    """Reference training-checkpoint format ({"model": sd}, DDP-prefixed
    names) feeds the same loader (train_loop.py:88-94 payload)."""
    torch = pytest.importorskip("torch")
    sd = {
        "module.text_vocab_embedding.token_embedding.weight":
            torch.from_numpy(tables["token_embedding"]),
        "module.text_vocab_embedding.position_embedding.weight":
            torch.from_numpy(tables["position_embedding"]),
    }
    path = tmp_path / "ref_ckpt.pth"
    torch.save({"model": sd, "epoch": 3}, path)
    loaded = load_clip_text_tables(str(path))
    np.testing.assert_array_equal(loaded["token_embedding"],
                                  tables["token_embedding"])


def test_hf_clip_names_accepted(tables, tmp_path):
    torch = pytest.importorskip("torch")
    sd = {
        "text_model.embeddings.token_embedding.weight":
            torch.from_numpy(tables["token_embedding"]),
        "text_model.embeddings.position_embedding.weight":
            torch.from_numpy(tables["position_embedding"]),
    }
    path = tmp_path / "clip_model.pt"
    torch.save(sd, path)
    loaded = load_clip_text_tables(str(path))
    np.testing.assert_array_equal(loaded["position_embedding"],
                                  tables["position_embedding"])


def test_safetensors_roundtrip(tables, tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    path = tmp_path / "clip_text.safetensors"
    st.save_file(tables, str(path))
    loaded = load_clip_text_tables(str(path))
    np.testing.assert_array_equal(loaded["token_embedding"],
                                  tables["token_embedding"])


def test_missing_tables_raise(tmp_path):
    path = tmp_path / "wrong.npz"
    np.savez(path, foo=np.zeros((2, 2), np.float32))
    with pytest.raises(KeyError, match="CLIP text-embedding"):
        load_clip_text_tables(str(path))


def test_apply_overwrites_embedding_leaves(setup, tables):
    cfg, vocab, batch = setup
    model = build_model(cfg, vocab)
    params, _ = init_model(model, batch)
    tok_before, _ = _emb_leaves(params)
    assert not np.allclose(tok_before, tables["token_embedding"])
    new_params = apply_clip_text_tables(params, tables)
    tok, pos = _emb_leaves(new_params)
    np.testing.assert_array_equal(tok, tables["token_embedding"])
    np.testing.assert_array_equal(pos, tables["position_embedding"])
    # original tree untouched; every other leaf shared
    tok_orig, _ = _emb_leaves(params)
    np.testing.assert_array_equal(tok_orig, tok_before)
    assert new_params["gat_seq"] is params["gat_seq"]


def test_apply_shape_mismatch_raises(setup, tables):
    cfg, vocab, batch = setup
    model = build_model(cfg, vocab)
    params, _ = init_model(model, batch)
    bad = dict(tables, token_embedding=tables["token_embedding"][:, :64])
    with pytest.raises(ValueError, match="does not match"):
        apply_clip_text_tables(params, bad)


def test_train_state_inits_from_fixture(setup, tables, tmp_path):
    """End-to-end: cfg.clip_weights → create_train_state starts from
    the fixture tables (the VERDICT's done-condition)."""
    from isubgvqa_tpu.train.schedule import make_optimizer
    from isubgvqa_tpu.train.state import create_train_state

    cfg, vocab, batch = setup
    path = tmp_path / "clip_text.npz"
    np.savez(path, **tables)
    cfg = dataclasses.replace(cfg, clip_weights=str(path))
    model = build_model(cfg, vocab)
    state = create_train_state(model, make_optimizer(cfg.lr, 4), batch, cfg)
    tok, pos = _emb_leaves(state.params)
    np.testing.assert_array_equal(tok, tables["token_embedding"])
    np.testing.assert_array_equal(pos, tables["position_embedding"])


def test_loader_matches_converter(tables, tmp_path):
    """--clip_weights and convert_state_dict must produce identical
    tables from the same reference state dict."""
    torch = pytest.importorskip("torch")
    from test_convert import fake_reference_state_dict

    rng = np.random.default_rng(3)
    sd = fake_reference_state_dict(rng)
    sd["text_vocab_embedding.token_embedding.weight"] = \
        tables["token_embedding"]
    sd["text_vocab_embedding.position_embedding.weight"] = \
        tables["position_embedding"]
    params, _ = convert_state_dict(sd)
    conv_tok = params["question_encoder"]["text_vocab_embedding"][
        "token_embedding"]["embedding"]

    path = tmp_path / "ref_full.pth"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)
    loaded = load_clip_text_tables(str(path))
    np.testing.assert_array_equal(loaded["token_embedding"], conv_tok)
    np.testing.assert_array_equal(loaded["token_embedding"],
                                  tables["token_embedding"])
