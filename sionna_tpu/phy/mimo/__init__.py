"""MIMO sub-package (reference: src/sionna/phy/mimo/__init__.py)."""

from .stream_management import StreamManagement
