"""Sionna-TPU: a TPU-native library for communication-systems research.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference library (NVlabs/sionna): PHY link-level simulation, SYS
system-level simulation, and RT ray tracing.
"""

__version__ = "0.1.0"

from . import phy
from . import sys
from . import rt

_LAZY_SUBPACKAGES = ("sys", "rt")


def __getattr__(name):
    # Lazy subpackage import (mirrors reference src/sionna/__init__.py)
    if name in _LAZY_SUBPACKAGES:
        import importlib
        module = importlib.import_module(f".{name}", __name__)
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
