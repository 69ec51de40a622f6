"""OFDM sub-package (reference: src/sionna/phy/ofdm/__init__.py)."""

from .pilot_pattern import (PilotPattern, EmptyPilotPattern,
                            KroneckerPilotPattern)
from .resource_grid import (ResourceGrid, ResourceGridMapper,
                            ResourceGridDemapper, RemoveNulledSubcarriers)
from .modulator import OFDMModulator
from .demodulator import OFDMDemodulator
