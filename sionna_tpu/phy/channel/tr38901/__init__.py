"""3GPP TR 38.901 channel models (reference:
src/sionna/phy/channel/tr38901/__init__.py)."""

from .tdl import TDL
from .antenna import (AntennaElement, AntennaPanel, PanelArray, Antenna,
                      AntennaArray)
from .rays import Rays
from .channel_coefficients import Topology, ChannelCoefficientsGenerator
from .cdl import CDL
