"""Erbium-doped fiber amplifier (reference:
src/sionna/phy/channel/optical/edfa.py:12)."""

import jax
import jax.numpy as jnp

from ... import constants
from ...block import Block
from ...config import config

__all__ = ["EDFA"]


class EDFA(Block):
    """Amplifies by sqrt(g) and adds ASE noise."""

    def __init__(self, g=4.0, f=7.0, f_c=193.55e12, dt=1e-12,
                 with_dual_polarization=False, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._g = float(g)
        self._f = float(f)
        self._f_c = float(f_c)
        self._dt = float(dt)
        if not isinstance(with_dual_polarization, bool):
            raise TypeError("with_dual_polarization must be bool.")
        self._with_dual_polarization = with_dual_polarization

        if self._g == 1.0:
            self._n_sp = 0.0
        else:
            self._n_sp = self._f / 2.0 * self._g / (self._g - 1.0)
        self._rho_n_ase = (self._n_sp * (self._g - 1.0) * constants.H
                           * self._f_c)
        self._p_n_ase = 2.0 * self._rho_n_ase / self._dt
        if self._with_dual_polarization:
            self._p_n_ase /= 2.0

    def call(self, inputs, key=None):
        x = jnp.asarray(inputs, self.cdtype)
        if self._with_dual_polarization and x.shape[-2] != 2:
            raise ValueError("Dual polarization requires two "
                             "polarizations on the second-to-last axis.")
        if key is None:
            key = config.next_key()
        kr, ki = jax.random.split(key)
        std = jnp.sqrt(jnp.asarray(self._p_n_ase / 2.0, self.rdtype))
        n = (std * jax.random.normal(kr, x.shape, self.rdtype)
             + 1j * std * jax.random.normal(ki, x.shape, self.rdtype)
             ).astype(self.cdtype)
        return x * jnp.asarray(jnp.sqrt(self._g), self.cdtype) + n
