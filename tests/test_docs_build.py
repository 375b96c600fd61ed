"""Docs build gate (VERDICT r3 item 7).

The full gate runs ``sphinx-build -W`` (warnings-as-errors) when sphinx
is installed — CI environments with docs deps get the real build.  The
sandbox image ships no sphinx, so structural checks that need no
sphinx always run: conf.py executes, every toctree entry resolves to a
file, and every ``automodule`` target in the rst tree imports.
Reference surface: ``/root/reference/docs/conf.py:12-25`` +
``.readthedocs.yaml``."""

import importlib
import os
import re
import subprocess
import sys

import pytest

DOCS = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "docs"))


def _rst_files():
    return [os.path.join(DOCS, f) for f in sorted(os.listdir(DOCS))
            if f.endswith(".rst")]


def test_conf_executes():
    conf = {}
    src = open(os.path.join(DOCS, "conf.py")).read()
    exec(compile(src, "conf.py", "exec"), conf)
    assert conf["project"] == "ISubGVQA-TPU"
    assert "sphinx.ext.autodoc" in conf["extensions"]


def test_toctree_entries_exist():
    entries = []
    for path in _rst_files():
        text = open(path).read()
        for block in re.findall(
                r"\.\. toctree::\n((?:[ \t]+.*\n|\n)+)", text):
            for line in block.splitlines():
                line = line.strip()
                if line and not line.startswith(":"):
                    entries.append(line)
    assert entries, "no toctree entries found"
    for e in entries:
        assert os.path.isfile(os.path.join(DOCS, e + ".rst")), \
            f"toctree entry {e!r} has no docs/{e}.rst"


def test_automodule_targets_import():
    mods = []
    for path in _rst_files():
        mods += re.findall(r"\.\. automodule:: ([\w.]+)", open(path).read())
    assert mods, "no automodule directives found"
    for m in sorted(set(mods)):
        importlib.import_module(m)


def test_sphinx_build_warnings_as_errors(tmp_path):
    pytest.importorskip("sphinx")
    out = subprocess.run(
        [sys.executable, "-m", "sphinx", "-W", "-b", "html", DOCS,
         str(tmp_path / "_build")],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
