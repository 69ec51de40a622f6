"""Rays container (reference: src/sionna/phy/channel/tr38901/rays.py:16).

The full RaysGenerator (steps 6-9 for the system-level models) lives
alongside the scenario classes.
"""

from ...block import Object

__all__ = ["Rays"]


class Rays(Object):
    """Container for ray parameters.

    delays/powers: [batch, num_tx, num_rx, num_clusters]
    aoa/aod/zoa/zod/xpr: [batch, num_tx, num_rx, num_clusters, num_rays]
    (angles in radian).
    """

    def __init__(self, delays, powers, aoa, aod, zoa, zod, xpr):
        super().__init__()
        self.delays = delays
        self.powers = powers
        self.aoa = aoa
        self.aod = aod
        self.zoa = zoa
        self.zod = zod
        self.xpr = xpr
