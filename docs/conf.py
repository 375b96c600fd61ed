# Sphinx configuration — the reference ships ReadTheDocs/Sphinx docs
# (docs/conf.py + .readthedocs.yaml); same surface here, over the
# isubgvqa_tpu package.

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "ISubGVQA-TPU"
author = "ISubGVQA-TPU contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "orbax", "chex"]

templates_path = ["_templates"]
exclude_patterns = ["_build"]
html_theme = "alabaster"
