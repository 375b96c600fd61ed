"""Self-contained CLIP BPE vs HuggingFace CLIPTokenizer on identical
local vocab/merges files (no network)."""

import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def write_tiny_clip_vocab(d):
    """A miniature but valid CLIP-style BPE: byte alphabet + a few
    merges + specials."""
    chars = list("abcdefghijklmnopqrstuvwxyz?! ")
    vocab = {}
    for c in sorted(set(chars) - {" "}):
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = ["t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>",
              "i s</w>", "w h", "wh a", "wha t</w>"]
    for m in merges:
        tok = m.replace(" ", "")
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    vocab_path = os.path.join(d, "vocab.json")
    merges_path = os.path.join(d, "merges.txt")
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    with open(merges_path, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return vocab_path, merges_path


@pytest.mark.parametrize("text", [
    "the cat",
    "what is the dog?",
    "is the cat a dog!",
    "abc xyz",
])
def test_bpe_matches_huggingface(tmp_path, text):
    vocab_path, merges_path = write_tiny_clip_vocab(str(tmp_path))

    hf = transformers.CLIPTokenizer(vocab_file=vocab_path,
                                    merges_file=merges_path)
    from isubgvqa_tpu.data.tokenizer import ClipBPETokenizer

    mine = ClipBPETokenizer(vocab_path, merges_path, max_len=32)

    hf_ids = hf(text)["input_ids"]
    my_ids = mine.encode(text)
    assert my_ids == hf_ids, (text, my_ids, hf_ids)


def test_bpe_batch_shapes(tmp_path):
    vocab_path, merges_path = write_tiny_clip_vocab(str(tmp_path))
    from isubgvqa_tpu.data.tokenizer import ClipBPETokenizer

    mine = ClipBPETokenizer(vocab_path, merges_path, max_len=8)
    ids, mask = mine(["the cat", "what is the dog?"])
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    assert ids[0, 0] == mine.bos_id
    n = mask[1].sum()
    assert ids[1, n - 1] == mine.eos_id
