"""Question encoder/decoder specifics, incl. the reference's additive
float key-padding-mask behavior (question_encoder.py:36: torch treats
a float src_key_padding_mask as an additive bias, so padding is NOT
masked out — +1 is added to real keys' logits instead)."""

import jax
import jax.numpy as jnp
import numpy as np

from isubgvqa_tpu.models.question_decoder import QuestionDecoder
from isubgvqa_tpu.models.question_encoder import QuestionEncoder, TextEmbedding


def test_text_embedding_adds_positions():
    te = TextEmbedding(vocab_size=50, dim=8, max_positions=16)
    v = te.init(jax.random.PRNGKey(0), jnp.zeros((2, 5), jnp.int32))
    same_tok = te.apply(v, jnp.zeros((1, 5), jnp.int32))
    # same token at different positions -> different embeddings
    assert not np.allclose(np.asarray(same_tok[0, 0]),
                           np.asarray(same_tok[0, 1]))


def test_encoder_padding_is_biased_not_masked():
    """The additive quirk: flipping a padding token's id changes the
    output (a true mask would make it invisible)."""
    qe = QuestionEncoder(dim=32, num_heads=4, ffn_dim=64, num_layers=1,
                         vocab_size=64)
    ids = jnp.array([[1, 2, 3, 4, 4]])
    mask = jnp.array([[1, 1, 1, 0, 0]])
    v = qe.init(jax.random.PRNGKey(0), ids, mask)
    out1 = qe.apply(v, ids, mask)
    ids2 = ids.at[0, 4].set(9)
    out2 = qe.apply(v, ids2, mask)
    # real positions see the changed padding key -> outputs differ
    assert float(jnp.abs(out1[0, :3] - out2[0, :3]).max()) > 1e-6


def test_encoder_mask_bias_affects_output():
    qe = QuestionEncoder(dim=32, num_heads=4, ffn_dim=64, num_layers=1,
                         vocab_size=64)
    ids = jnp.array([[1, 2, 3, 4, 4]])
    v = qe.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 5), jnp.int32))
    a = qe.apply(v, ids, jnp.array([[1, 1, 1, 0, 0]]))
    b = qe.apply(v, ids, jnp.array([[1, 1, 1, 1, 1]]))
    assert float(jnp.abs(a - b).max()) > 1e-6


def test_decoder_shapes_and_query_dependence():
    qd = QuestionDecoder(n_instructions=4, dim=32, num_heads=4, ffn_dim=64,
                         num_layers=2)
    mem = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 32))
    v = qd.init(jax.random.PRNGKey(0), mem)
    out = qd.apply(v, mem)
    assert out.shape == (3, 4, 32)
    # queries differ -> instruction vectors differ
    o = np.asarray(out[0])
    assert not np.allclose(o[0], o[1])
    # memory-dependent
    out2 = qd.apply(v, mem * 2.0)
    assert float(jnp.abs(out - out2).max()) > 1e-5
