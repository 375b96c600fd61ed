"""GloVe-file loading path for the scene-graph vocabulary."""

import numpy as np

from isubgvqa_tpu.data.vocab import SceneGraphVocab


def test_glove_vectors_loaded_from_file(tmp_path):
    glove = tmp_path / "glove.300d.txt"
    dim = 300
    vec_obj0 = np.arange(dim, dtype=np.float32) / dim
    lines = [
        "obj0 " + " ".join(f"{v:.6f}" for v in vec_obj0),
        "missingword " + " ".join("0.5" for _ in range(dim)),
    ]
    glove.write_text("\n".join(lines))

    v = SceneGraphVocab.synthetic()
    v._glove_path = str(glove)
    vecs = v.vectors
    np.testing.assert_allclose(vecs[v.stoi["obj0"]], vec_obj0, atol=1e-6)
    # tokens without GloVe rows keep the seeded random init
    assert vecs[v.stoi["obj1"]].std() > 0.5
    # pad row zeroed (nn.Embedding padding_idx parity)
    np.testing.assert_allclose(vecs[v.pad_index], 0.0)


def test_vectors_deterministic_across_instances():
    a = SceneGraphVocab.synthetic().vectors
    b = SceneGraphVocab.synthetic().vectors
    np.testing.assert_allclose(a, b)
