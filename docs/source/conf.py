# Sphinx configuration for MRphy-TPU API docs
# (parity with the reference's autodoc setup, /root/reference/docs).

import os
import sys

sys.path.insert(0, os.path.abspath('../..'))

project = 'MRphy-TPU'
author = 'mrphy-tpu developers'

from mrphy_tpu.version import __version__ as release  # noqa: E402

extensions = [
    'sphinx.ext.autodoc',
    'sphinx.ext.napoleon',
    'sphinx.ext.viewcode',
    'sphinx.ext.mathjax',
]

autodoc_member_order = 'bysource'
html_theme = 'sphinx_rtd_theme'
exclude_patterns = []
