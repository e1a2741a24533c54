"""Legacy-install shim: metadata lives in pyproject.toml. Kept so
offline environments without the `wheel` package can still do an
editable install (`python setup.py develop` uses egg-link, no wheel
build), mirroring the reference's setup.py+pyproject pairing."""
from setuptools import setup

setup()
