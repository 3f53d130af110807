"""Shim for wheel-less environments.

`pip install -e .` uses pyproject.toml (PEP 517) and needs the `wheel`
package to build the editable wheel; containers without `wheel` can use
the legacy path instead:

    python setup.py develop

which installs the same console entry point (`collimate-spark`) via
egg-info, no wheel build involved.
"""

from setuptools import setup

setup()
