"""Split-step Fourier method fiber model (reference:
src/sionna/phy/channel/optical/fiber.py:15).

TPU design: the fixed-step symmetric SSFM runs as a ``lax.fori_loop``
over segments with XLA FFTs (reference uses tf.while_loop,
fiber.py:416-420); the adaptive mode uses ``lax.while_loop`` with the
same step math. All parameters follow the reference's normalized-unit
convention (t_norm).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ... import constants
from ...block import Block
from ...config import config
from ..utils import time_frequency_vector

__all__ = ["SSFM"]


class SSFM(Block):
    """Split-step Fourier method for the NLSE / Manakov equation."""

    def __init__(self, alpha=0.046, beta_2=-21.67, f_c=193.55e12,
                 gamma=1.27, half_window_length=0, length=80, n_ssfm=1,
                 n_sp=1.0, sample_duration=1.0, t_norm=1e-12,
                 with_amplification=False, with_attenuation=True,
                 with_dispersion=True, with_manakov=False,
                 with_nonlinearity=True, phase_inc=1e-4,
                 swap_memory=True, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._alpha = float(alpha)
        self._beta_2 = float(beta_2)
        self._f_c = float(f_c)
        self._gamma = float(gamma)
        self._half_window_length = int(half_window_length)
        self._length = float(length)
        self._phase_inc = float(phase_inc)

        if n_ssfm == "adaptive":
            self._n_ssfm = -1
        elif isinstance(n_ssfm, int):
            if n_ssfm <= 0:
                raise ValueError("n_ssfm must be positive.")
            self._n_ssfm = n_ssfm
        else:
            raise ValueError(
                "Unsupported n_ssfm; must be int or 'adaptive'.")
        self._dz = self._length / max(self._n_ssfm, 1)
        self._n_sp = float(n_sp)
        self._t_norm = float(t_norm)
        self._sample_duration = float(sample_duration)

        self._with_amplification = bool(with_amplification)
        self._with_attenuation = bool(with_attenuation)
        self._with_dispersion = bool(with_dispersion)
        self._with_manakov = bool(with_manakov)
        self._with_nonlinearity = bool(with_nonlinearity)

        # distributed ASE noise density (W/Hz) and power
        self._rho_n = (constants.H * self._f_c * self._alpha
                       * self._length * self._n_sp)
        self._p_n_ase = self._rho_n / self._sample_duration / self._t_norm
        if self._with_manakov:
            self._p_n_ase /= 2.0

        hw = self._half_window_length
        if hw > 0:
            n = np.arange(2 * hw)
            self._window_edge = (0.54 - 0.46 * np.cos(
                2 * np.pi * n / (2 * hw - 1))).astype(np.float64)
        else:
            self._window_edge = np.zeros(0)

    def _window_for(self, n):
        hw = self._half_window_length
        w = np.ones(n)
        if hw > 0:
            w[:hw] = self._window_edge[:hw]
            w[-hw:] = self._window_edge[hw:]
        return jnp.asarray(w, self.rdtype).astype(self.cdtype)

    def _linear(self, q, dz, f):
        if self._with_dispersion:
            phase = (-self._beta_2 / 2.0 * dz
                     * (2 * constants.PI * f) ** 2)
            disp = jnp.exp(1j * phase.astype(self.rdtype)
                           .astype(self.cdtype))
            disp = jnp.fft.fftshift(disp, axes=-1)
            q = jnp.fft.ifft(jnp.fft.fft(q, axis=-1) * disp, axis=-1)
        if self._with_attenuation:
            q = q * jnp.asarray(jnp.exp(-self._alpha / 2.0 * dz),
                                self.cdtype)
        if self._with_amplification:
            q = q * jnp.asarray(jnp.exp(self._alpha / 2.0 * dz),
                                self.cdtype)
        return q

    def _noise(self, q, dz, key):
        if not self._with_amplification:
            return q
        step_noise = self._p_n_ase * dz / self._length / 2.0
        kr, ki = jax.random.split(key)
        std = jnp.sqrt(jnp.asarray(step_noise, self.rdtype))
        n = (std * jax.random.normal(kr, q.shape, self.rdtype)
             + 1j * std * jax.random.normal(ki, q.shape, self.rdtype)
             ).astype(self.cdtype)
        return q + n

    def _nonlinear(self, q, dz):
        if not self._with_nonlinearity:
            return q
        if self._with_manakov:
            power = jnp.sum(jnp.abs(q) ** 2, axis=-2, keepdims=True)
            phase = -(8.0 / 9.0) * power * self._gamma * dz
        else:
            phase = -jnp.abs(q) ** 2 * self._gamma * dz
        return q * jnp.exp(1j * phase.astype(self.rdtype)
                           .astype(self.cdtype))

    def call(self, inputs, key=None):
        x = jnp.asarray(inputs, self.cdtype)
        if self._with_manakov and x.shape[-2] != 2:
            raise ValueError("Manakov requires two polarizations on "
                             "the second-to-last axis.")
        if key is None:
            key = config.next_key()
        n = x.shape[-1]
        _, f = time_frequency_vector(n, self._sample_duration,
                                     precision=self.precision)
        window = self._window_for(n)

        if self._n_ssfm == -1:
            # adaptive step size based on max nonlinear phase increment
            def cond(state):
                _, remaining, _, _ = state
                return remaining >= 1e-3

            def body(state):
                q, remaining, k, i = state
                max_power = jnp.max(jnp.abs(q) ** 2)
                dz = jnp.minimum(
                    self._phase_inc / self._gamma / max_power, remaining)
                q = q * window
                q = self._linear(q, dz, f)
                q = self._nonlinear(q, dz)
                q = self._noise(q, dz, jax.random.fold_in(k, i))
                return q, remaining - dz, k, i + 1

            x, _, _, _ = jax.lax.while_loop(
                cond, body,
                (x, jnp.asarray(self._length, self.rdtype), key, 0))
            return x

        dz = self._dz
        dz_half = dz / 2.0
        # symmetric SSFM: half linear, (N-1) x (window, N, noise, D),
        # final N + noise, half linear
        x = self._linear(x, dz_half, f)

        def body(i, q):
            q = q * window
            q = self._nonlinear(q, dz)
            q = self._noise(q, dz, jax.random.fold_in(key, i))
            q = self._linear(q, dz, f)
            return q

        x = jax.lax.fori_loop(0, self._n_ssfm - 1, body, x)
        x = self._nonlinear(x, dz)
        x = self._noise(x, dz, jax.random.fold_in(key, self._n_ssfm))
        x = self._linear(x, dz_half, f)
        return x
