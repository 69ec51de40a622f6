"""Channel sub-package of Sionna-TPU PHY (reference:
src/sionna/phy/channel/__init__.py)."""

from .awgn import AWGN
