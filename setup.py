"""Compatibility shim: all metadata lives in pyproject.toml.

Lets ``python setup.py develop --user`` style editable installs work in
environments whose pip cannot build PEP 660 editable wheels (e.g. no
``wheel`` package available offline); ``pip install -e .`` is the normal
path everywhere else.
"""

from setuptools import setup

setup()
