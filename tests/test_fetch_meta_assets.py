"""tools/fetch_meta_assets.py — copy + integrity-check the eight GQA
meta-info assets (the files a real-GQA run needs at --meta_dir).

The happy path runs against the mounted reference assets when present;
the failure modes run against synthetic fixtures either way."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from fetch_meta_assets import ASSETS, fetch, main, validate  # noqa: E402

from isubgvqa_tpu.config import Config
from isubgvqa_tpu.data.gqa import AnswerMap
from isubgvqa_tpu.data.vocab import SceneGraphVocab

META = Config().meta_dir
have_real = os.path.isfile(os.path.join(META, "name_gqa.txt"))


def _write_fixture(dst, n_answers=4):
    os.makedirs(dst, exist_ok=True)
    for name, kind, _ in ASSETS:
        path = os.path.join(dst, name)
        if kind == "txt":
            with open(path, "w") as f:
                f.write("alpha\nbeta\n")
        elif name == "trainval_ans2label.json":
            with open(path, "w") as f:
                json.dump({f"a{i}": i for i in range(n_answers)}, f)
        elif name == "trainval_label2ans.json":
            with open(path, "w") as f:
                json.dump([f"a{i}" for i in range(n_answers)], f)
        else:
            with open(path, "w") as f:
                json.dump(["x", "y"], f)


@pytest.mark.skipif(not have_real, reason="reference assets not mounted")
def test_fetch_real_assets_roundtrip(tmp_path):
    dst = str(tmp_path / "meta")
    warnings = fetch(META, dst)
    # the reference's own assets match the documented counts exactly
    assert warnings == []
    # the fetched copy drives the production loaders end-to-end
    vocab = SceneGraphVocab.build(dst)
    assert "helmet" in vocab.stoi
    answers = AnswerMap.build(dst)
    assert len(answers) == 1842
    assert answers.label2ans[answers.ans2label["yes"]] == "yes"


@pytest.mark.skipif(not have_real, reason="reference assets not mounted")
def test_cli_validate_only():
    assert main(["--src", META, "--validate-only"]) == 0


def test_fixture_counts_warn_not_fail(tmp_path):
    src = str(tmp_path / "src")
    _write_fixture(src)
    warnings = validate(src)
    assert warnings  # tiny fixture counts differ from the documented ones
    with pytest.raises(ValueError):
        validate(src, strict_counts=True)


def test_missing_file_fails(tmp_path):
    src = str(tmp_path / "src")
    _write_fixture(src)
    os.remove(os.path.join(src, "rel_gqa.txt"))
    with pytest.raises(FileNotFoundError):
        validate(src)
    with pytest.raises(FileNotFoundError):
        fetch(src, str(tmp_path / "dst"))


def test_broken_bijection_fails(tmp_path):
    src = str(tmp_path / "src")
    _write_fixture(src)
    with open(os.path.join(src, "trainval_label2ans.json"), "w") as f:
        json.dump(["a0", "WRONG", "a2", "a3"], f)
    with pytest.raises(ValueError, match="bijection"):
        validate(src)
