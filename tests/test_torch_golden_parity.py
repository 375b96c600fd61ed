"""Golden parity vs actual torch modules.

The reference's question encoder/decoder are plain ``torch.nn``
transformers (``question_encoder.py:22-38``, ``question_decoder.py:
27-71``) — no PyG involved — so we can instantiate the *same* torch
architecture here, push its weights through the checkpoint converter,
and demand numerical agreement from the flax modules.  This pins down
the two riskiest parity details end-to-end:

* the float ``src_key_padding_mask`` additive-bias behavior;
* the torch->flax weight mapping (in_proj q/k/v split, transposes).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from isubgvqa_tpu.convert import convert_state_dict
from isubgvqa_tpu.models.question_decoder import QuestionDecoder
from isubgvqa_tpu.models.question_encoder import QuestionEncoder

D, HEADS, FFN = 64, 4, 128
VOCAB, MAXPOS = 50, 77


class TorchRefText(torch.nn.Module):
    """CLIPTextEmbeddings-alike + reference QuestionEncoder +
    QuestionDecoder, with the reference's exact call semantics."""

    def __init__(self, enc_layers=2, dec_layers=2, n_queries=4):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(VOCAB, D)
        self.position_embedding = torch.nn.Embedding(MAXPOS, D)
        enc_layer = torch.nn.TransformerEncoderLayer(D, HEADS, FFN, 0.1)
        self.transformer_encoder = torch.nn.TransformerEncoder(
            enc_layer, enc_layers, norm=torch.nn.LayerNorm(D))
        self.query_embed = torch.nn.Embedding(n_queries, D)
        dec_layer = torch.nn.TransformerDecoderLayer(D, HEADS, FFN, 0.1)
        self.coarse_decoder = torch.nn.TransformerDecoder(
            dec_layer, dec_layers, norm=torch.nn.LayerNorm(D))

    def forward(self, ids, mask):
        pos = torch.arange(ids.shape[1])
        src = self.token_embedding(ids) + self.position_embedding(pos)[None]
        # reference passes [L, B, D] with a FLOAT key padding mask
        # (question_encoder.py:35-37) — torch adds it to the logits
        enc = self.transformer_encoder(
            src.permute(1, 0, 2), src_key_padding_mask=mask.float())
        b = enc.size(1)
        queries = self.query_embed.weight.unsqueeze(1).repeat(1, b, 1)
        dec = self.coarse_decoder(tgt=queries, memory=enc, tgt_mask=None)
        return enc.permute(1, 0, 2), dec.permute(1, 0, 2)


def reference_style_state_dict(m: TorchRefText):
    sd = {}
    for k, v in m.state_dict().items():
        if k.startswith(("token_embedding", "position_embedding")):
            sd[f"text_vocab_embedding.{k}"] = v.numpy()
        elif k.startswith("transformer_encoder"):
            sd[f"question_encoder.{k}"] = v.numpy()
        elif k.startswith(("query_embed", "coarse_decoder")):
            sd[f"program_decoder.{k}"] = v.numpy()
    return sd


@pytest.fixture(scope="module")
def modules():
    torch.manual_seed(0)
    m = TorchRefText().eval()
    sd = reference_style_state_dict(m)
    params, _ = convert_state_dict(sd, encoder_layers=2, decoder_layers=2)
    return m, params


def test_encoder_matches_torch(modules):
    m, params = modules
    rng = np.random.default_rng(0)
    ids = rng.integers(0, VOCAB, size=(3, 9))
    mask = np.ones((3, 9), np.int64)
    mask[0, 6:] = 0
    mask[2, 4:] = 0

    with torch.no_grad():
        enc_t, _ = m(torch.tensor(ids), torch.tensor(mask))

    qe = QuestionEncoder(dim=D, num_heads=HEADS, ffn_dim=FFN, num_layers=2,
                         vocab_size=VOCAB)
    enc_j = qe.apply({"params": params["question_encoder"]},
                     jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(enc_j), enc_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_decoder_matches_torch(modules):
    m, params = modules
    rng = np.random.default_rng(1)
    ids = rng.integers(0, VOCAB, size=(2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0

    with torch.no_grad():
        enc_t, dec_t = m(torch.tensor(ids), torch.tensor(mask))

    qd = QuestionDecoder(n_instructions=4, dim=D, num_heads=HEADS,
                         ffn_dim=FFN, num_layers=2)
    dec_j = qd.apply({"params": params["program_decoder"]},
                     jnp.asarray(enc_t.numpy()))
    np.testing.assert_allclose(np.asarray(dec_j), dec_t.numpy(),
                               rtol=2e-4, atol=2e-5)
