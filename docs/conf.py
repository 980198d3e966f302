# Sphinx configuration for gpu_se_tpu (autodoc over the package,
# mirroring the reference's docs layer: /root/reference/docs/conf.py).
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "gpu_se_tpu"
author = "gpu_se_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_mock_imports = []
napoleon_numpy_docstring = True
exclude_patterns = ["_build"]
html_theme = "alabaster"
