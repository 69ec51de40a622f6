"""Optical channel models (reference:
src/sionna/phy/channel/optical/__init__.py)."""

from .fiber import SSFM
from .edfa import EDFA
