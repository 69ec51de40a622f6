"""3GPP TR 38.901 tapped delay line (TDL) models A-E / A30/B100/C300
(reference: src/sionna/phy/channel/tr38901/tdl.py:18).

Doppler is modeled with the sum-of-sinusoids method (20 sinusoids by
default); all randomness is drawn at call time (optionally keyed) and
the per-tap time evolution is a fused cos/sin over
[batch, rx_ant, tx_ant, clusters, time, sinusoids].
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...config import config
from ...constants import PI, SPEED_OF_LIGHT
from ...utils.tensors import insert_dims, flatten_last_dims, split_dim
from ..channel_model import ChannelModel

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "models")


class TDL(ChannelModel):
    """Tapped-delay-line channel model per TR 38.901."""

    def __init__(self, model, delay_spread, carrier_frequency,
                 num_sinusoids=20, los_angle_of_arrival=PI / 4.,
                 min_speed=0., max_speed=None, num_rx_ant=1, num_tx_ant=1,
                 spatial_corr_mat=None, rx_corr_mat=None, tx_corr_mat=None,
                 precision=None):
        super().__init__(precision=precision)
        if model not in ("A", "B", "C", "D", "E", "A30", "B100", "C300"):
            raise ValueError("Invalid TDL model")
        if model in ("A30", "B100", "C300"):
            forced = {"A30": 30e-9, "B100": 100e-9, "C300": 300e-9}[model]
            if delay_spread != forced:
                print(f"Warning: Delay spread is set to "
                      f"{forced*1e9:.0f}ns with this model")
                delay_spread = forced
        self._load_parameters(f"TDL-{model}.json")

        self._num_rx_ant = int(num_rx_ant)
        self._num_tx_ant = int(num_tx_ant)
        self._carrier_frequency = float(carrier_frequency)
        self._num_sinusoids = int(num_sinusoids)
        self._los_angle_of_arrival = float(los_angle_of_arrival)
        self._delay_spread = float(delay_spread)
        self._min_speed = float(min_speed)
        self._max_speed = self._min_speed if max_speed is None \
            else float(max_speed)
        if self._max_speed < self._min_speed:
            raise ValueError("min_speed cannot be larger than max_speed")
        self._min_doppler = self._compute_doppler(self._min_speed)
        self._max_doppler = self._compute_doppler(self._max_speed)

        n = self._num_sinusoids
        alpha_const = (2. * PI / n) * np.arange(1, n + 1)
        self._alpha_const = alpha_const.reshape(
            [1] * 7 + [n]).astype(self.np_rdtype)

        def chol(m):
            return np.linalg.cholesky(np.asarray(m, self.np_cdtype))

        self._spatial_corr_mat_sqrt = None
        self._rx_corr_mat_sqrt = None
        self._tx_corr_mat_sqrt = None
        if spatial_corr_mat is not None:
            self._spatial_corr_mat_sqrt = chol(spatial_corr_mat)
        else:
            if rx_corr_mat is not None:
                self._rx_corr_mat_sqrt = chol(rx_corr_mat)
            if tx_corr_mat is not None:
                self._tx_corr_mat_sqrt = chol(tx_corr_mat)

    # ------------------------------------------------------------------
    @property
    def num_clusters(self):
        return self._num_clusters

    @property
    def los(self):
        return self._los

    @property
    def k_factor(self):
        """Ratio of specular to diffuse power of the first path
        (LoS models only)."""
        if not self._los:
            return None
        return self._los_power / self._mean_powers[0]

    @property
    def delays(self):
        """Path delays [s] (reference tdl.py:336 — scaled by the
        delay spread, or ns -> s for fixed-delay models)."""
        if self._scale_delays:
            return self._delays * self._delay_spread
        return self._delays * 1e-9

    @property
    def mean_powers(self):
        """Path powers in linear scale; for LoS models the first tap
        combines the specular and diffuse power (reference
        tdl.py:344)."""
        if self._los:
            return np.concatenate(
                [self._mean_powers[:1] + self._los_power,
                 self._mean_powers[1:]], axis=0)
        return self._mean_powers

    @property
    def mean_power_los(self):
        return self._los_power if self._los else None

    @property
    def delay_spread(self):
        return self._delay_spread

    @delay_spread.setter
    def delay_spread(self, value):
        if self._scale_delays:
            self._delay_spread = float(value)
        else:
            print("Warning: delay spread is fixed for this model")

    # ------------------------------------------------------------------
    def __call__(self, batch_size, num_time_steps, sampling_frequency,
                 key=None):
        if key is None:
            key = config.next_key()
        k_dop, k_theta, k_phi, k_phi0 = jax.random.split(key, 4)
        rdtype = self.rdtype
        m = self._num_clusters
        n = self._num_sinusoids

        sample_times = (jnp.arange(num_time_steps, dtype=rdtype)
                        / sampling_frequency)

        # Sum-of-sinusoids in BATCH-MINOR layout: every axis of the
        # natural [batch, ..., clusters, T, sinusoids] arrangement is
        # small (m~23, T~14, n~20), so a trailing sinusoid dim pads
        # 20 -> 128 TPU lanes (6.4x wasted VPU work on the cos/sin
        # chain — the hot op of the generator).  Generating with the
        # batch as the minor dim keeps all 128 lanes busy; one cheap
        # transpose at the end restores the ChannelModel layout.
        nr, nt = self._num_rx_ant, self._num_tx_ant
        doppler = jax.random.uniform(
            k_dop, (1, 1, 1, 1, 1, batch_size), rdtype,
            self._min_doppler, self._max_doppler)
        theta = jax.random.uniform(
            k_theta, (1, 1, m, 1, n, batch_size), rdtype,
            -PI / n, PI / n)
        alpha = (jnp.asarray(self._alpha_const.reshape(
            1, 1, 1, 1, n, 1), rdtype) + theta)
        phi = jax.random.uniform(
            k_phi, (nr, nt, m, 1, n, batch_size), rdtype, -PI, PI)

        # Incremental phasor rotation over time: the argument is
        # affine in t (arg_k = phi + k * dt * doppler cos(alpha)), so
        # e^{j arg_k} = e^{j phi} (e^{j step})^k — transcendentals run
        # once per (tap, sinusoid) instead of per (tap, sinusoid,
        # time): ~T x fewer cos/sin on the hot path (exact same
        # sum-of-sinusoids statistics; f32 drift over T steps is
        # O(T * ulp)).
        step = ((doppler / sampling_frequency)
                * jnp.cos(alpha))[..., 0, :, :]    # [nr,nt,m,n,B]
        phi0 = phi[..., 0, :, :]
        h0 = (jnp.cos(phi0).astype(self.cdtype)
              + 1j * jnp.sin(phi0).astype(self.cdtype))
        rot = (jnp.cos(step).astype(self.cdtype)
               + 1j * jnp.sin(step).astype(self.cdtype))

        def trot(cur, _):
            return cur * rot, jnp.sum(cur, axis=-2)

        _, hb = jax.lax.scan(trot, h0, None, length=num_time_steps)
        # hb: [T, nr, nt, m, B]
        scale = (jnp.sqrt(jnp.asarray(self._mean_powers, rdtype))
                 / jnp.sqrt(jnp.asarray(n, rdtype))).astype(self.cdtype)
        hb = hb * scale.reshape(1, 1, 1, m, 1)
        # -> [B, 1, nr, 1, nt, m, T] (ChannelModel layout)
        h = jnp.transpose(hb, (4, 1, 2, 3, 0))[:, None, :, None]

        doppler = jnp.reshape(doppler,
                              (batch_size, 1, 1, 1, 1, 1, 1, 1))
        sample_times = insert_dims(sample_times, 6, 0)[..., None]

        if self._los:
            phi_0 = jax.random.uniform(
                k_phi0, (batch_size, 1, 1, 1, 1, 1, 1), rdtype, -PI, PI)
            doppler_s = doppler[..., 0]
            sample_times_s = sample_times[..., 0]
            arg_spec = (doppler_s * sample_times_s
                        * jnp.cos(self._los_angle_of_arrival) + phi_0)
            h_spec = (jnp.cos(arg_spec)
                      + 1j * jnp.sin(arg_spec)).astype(self.cdtype)
            los_amp = jnp.sqrt(
                jnp.asarray(self._los_power, rdtype)).astype(self.cdtype)
            h = jnp.concatenate(
                [h_spec * los_amp + h[:, :, :, :, :, :1, :],
                 h[:, :, :, :, :, 1:, :]], axis=5)

        if self._scale_delays:
            delays = self._delays * self._delay_spread
        else:
            delays = self._delays * 1e-9
        delays = jnp.asarray(delays, rdtype)
        delays = insert_dims(delays, 3, 0)
        delays = jnp.tile(delays, (batch_size, 1, 1, 1))

        # spatial correlation
        if self._spatial_corr_mat_sqrt is not None:
            hp = jnp.transpose(h, (0, 1, 3, 5, 6, 2, 4))
            hp = flatten_last_dims(hp, 2)[..., None]
            hp = jnp.matmul(
                jnp.asarray(self._spatial_corr_mat_sqrt, h.dtype),
                hp)[..., 0]
            hp = split_dim(hp, [self._num_rx_ant, self._num_tx_ant],
                           hp.ndim - 1)
            h = jnp.transpose(hp, (0, 1, 5, 2, 6, 3, 4))
        elif (self._rx_corr_mat_sqrt is not None
              or self._tx_corr_mat_sqrt is not None):
            hp = jnp.transpose(h, (0, 1, 3, 5, 6, 2, 4))
            if self._rx_corr_mat_sqrt is not None:
                hp = jnp.matmul(
                    jnp.asarray(self._rx_corr_mat_sqrt, h.dtype), hp)
            if self._tx_corr_mat_sqrt is not None:
                hp = jnp.matmul(
                    hp, jnp.conjugate(jnp.swapaxes(jnp.asarray(
                        self._tx_corr_mat_sqrt, h.dtype), -2, -1)))
            h = jnp.transpose(hp, (0, 1, 5, 2, 6, 3, 4))

        h = jax.lax.stop_gradient(h)
        delays = jax.lax.stop_gradient(delays)
        return h, delays

    # ------------------------------------------------------------------
    def _compute_doppler(self, speed):
        return 2. * PI * speed / SPEED_OF_LIGHT * self._carrier_frequency

    def _load_parameters(self, fname):
        with open(os.path.join(_MODELS_DIR, fname)) as f:
            params = json.load(f)
        self._los = bool(params["los"])
        self._scale_delays = bool(params["scale_delays"])
        self._num_clusters = int(params["num_clusters"])
        delays = np.asarray(params["delays"], np.float64)
        mean_powers = np.power(10.0, np.asarray(params["powers"],
                                                np.float64) / 10.0)
        if self._los:
            # first entry is the specular component of the first path
            self._los_power = mean_powers[0]
            mean_powers = mean_powers[1:]
            delays = delays[1:]
            # note: the JSON num_clusters already excludes the
            # specular entry
            norm = mean_powers.sum() + self._los_power
            self._los_power = self._los_power / norm
            mean_powers = mean_powers / norm
        else:
            mean_powers = mean_powers / mean_powers.sum()
        self._delays = delays
        self._mean_powers = mean_powers
