"""TR 38.901 clustered delay line (CDL) models A-E (reference:
src/sionna/phy/channel/tr38901/cdl.py:22)."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...config import config
from ...constants import PI
from ..channel_model import ChannelModel
from .rays import Rays
from .channel_coefficients import Topology, ChannelCoefficientsGenerator

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "models")

# TR 38.901 Table 7.5-3: ray offset angles within a cluster
_RAY_OFFSETS = np.array([0.0447, -0.0447, 0.1413, -0.1413, 0.2492,
                         -0.2492, 0.3715, -0.3715, 0.5129, -0.5129,
                         0.6797, -0.6797, 0.8844, -0.8844, 1.1481,
                         -1.1481, 1.5195, -1.5195, 2.1551, -2.1551])


class CDL(ChannelModel):
    """Clustered delay line channel model (single TX, single RX, both
    possibly multi-antenna)."""

    NUM_RAYS = 20

    def __init__(self, model, delay_spread, carrier_frequency, ut_array,
                 bs_array, direction, ut_orientation=None,
                 bs_orientation=None, min_speed=0., max_speed=None,
                 precision=None):
        super().__init__(precision=precision)
        if direction not in ("uplink", "downlink"):
            raise ValueError("Invalid link direction")
        self._direction = direction
        if ut_orientation is None:
            ut_orientation = np.array([PI, 0.0, 0.0])
        if bs_orientation is None:
            bs_orientation = np.zeros(3)
        if direction == "downlink":
            self._moving_end = "rx"
            self._tx_array, self._rx_array = bs_array, ut_array
            self._tx_orientation = np.asarray(bs_orientation, float)
            self._rx_orientation = np.asarray(ut_orientation, float)
        else:
            self._moving_end = "tx"
            self._tx_array, self._rx_array = ut_array, bs_array
            self._tx_orientation = np.asarray(ut_orientation, float)
            self._rx_orientation = np.asarray(bs_orientation, float)

        self._carrier_frequency = float(carrier_frequency)
        self._delay_spread = float(delay_spread)
        self._min_speed = float(min_speed)
        self._max_speed = self._min_speed if max_speed is None \
            else float(max_speed)
        if self._max_speed < self._min_speed:
            raise ValueError("min_speed cannot be larger than max_speed")

        if model not in ("A", "B", "C", "D", "E"):
            raise ValueError("Invalid CDL model")
        self._load_parameters(f"CDL-{model}.json")

        self._cir_sampler = ChannelCoefficientsGenerator(
            carrier_frequency, self._tx_array, self._rx_array,
            subclustering=False, precision=precision)

    # ------------------------------------------------------------------
    @property
    def num_clusters(self):
        return self._num_clusters

    @property
    def los(self):
        return self._los

    @property
    def k_factor(self):
        """K-factor (linear) of the zero-delay path (reference
        cdl.py:345 — specular over diffuse power of path 0)."""
        if not self._los:
            return None
        return self._k_factor[0, 0, 0] / self._powers[0, 0, 0, 0]

    @property
    def delays(self):
        return self._delays[0, 0, 0] * self._delay_spread

    @property
    def powers(self):
        """Path powers in linear scale; for LoS models path 0
        combines the specular and diffuse power and the total is
        renormalized by K+1 (reference cdl.py:358)."""
        p = np.asarray(self._powers[0, 0, 0])
        if self._los:
            k = np.asarray(self._k_factor[0, 0, 0])
            p = p.copy()
            p[0] = p[0] + k
            p = p / (k + 1.)
        return p

    @property
    def delay_spread(self):
        return self._delay_spread

    @delay_spread.setter
    def delay_spread(self, value):
        self._delay_spread = float(value)

    # ------------------------------------------------------------------
    def __call__(self, batch_size, num_time_steps, sampling_frequency,
                 key=None):
        if key is None:
            key = config.next_key()
        k_v, k_shuf, k_cir = jax.random.split(key, 3)
        rdtype = self.rdtype

        # random velocity vectors
        kv1, kv2, kv3 = jax.random.split(k_v, 3)
        v_r = jax.random.uniform(kv1, (batch_size, 1), rdtype,
                                 self._min_speed, self._max_speed)
        v_phi = jax.random.uniform(kv2, (batch_size, 1), rdtype, 0.,
                                   2. * PI)
        v_theta = jax.random.uniform(kv3, (batch_size, 1), rdtype, 0.,
                                     PI)
        velocities = jnp.stack(
            [v_r * jnp.cos(v_phi) * jnp.sin(v_theta),
             v_r * jnp.sin(v_phi) * jnp.sin(v_theta),
             v_r * jnp.cos(v_theta)], axis=-1)

        los = jnp.full([batch_size, 1, 1], self._los)
        tile3 = lambda x: jnp.tile(jnp.asarray(x, rdtype),
                                   (batch_size, 1, 1))
        tile4 = lambda x: jnp.tile(jnp.asarray(x, rdtype),
                                   (batch_size, 1, 1, 1))
        tile5 = lambda x: jnp.tile(jnp.asarray(x, rdtype),
                                   (batch_size, 1, 1, 1, 1))

        topology = Topology(
            velocities=velocities, moving_end=self._moving_end,
            los_aoa=tile3(self._los_aoa), los_zoa=tile3(self._los_zoa),
            los_aod=tile3(self._los_aod), los_zod=tile3(self._los_zod),
            los=los, distance_3d=jnp.zeros([batch_size, 1, 1], rdtype),
            tx_orientations=jnp.tile(
                jnp.asarray(self._tx_orientation, rdtype)[None, None],
                (batch_size, 1, 1)),
            rx_orientations=jnp.tile(
                jnp.asarray(self._rx_orientation, rdtype)[None, None],
                (batch_size, 1, 1)))

        delays = tile4(self._delays * self._delay_spread)
        powers = tile4(self._powers)
        aoa = tile5(self._aoa)
        aod = tile5(self._aod)
        zoa = tile5(self._zoa)
        zod = tile5(self._zod)
        xpr = tile5(self._xpr)

        aoa, aod, zoa, zod = self._random_coupling(aoa, aod, zoa, zod,
                                                   k_shuf)

        rays = Rays(delays=delays, powers=powers, aoa=aoa, aod=aod,
                    zoa=zoa, zod=zod, xpr=xpr)

        k_factor = tile3(self._k_factor)
        h, delays = self._cir_sampler(num_time_steps,
                                      sampling_frequency, k_factor,
                                      rays, topology, key=k_cir)
        # [b, tx, rx, cl, rxa, txa, T] -> [b, rx, rxa, tx, txa, cl, T]
        h = jnp.transpose(h, (0, 2, 4, 1, 5, 3, 6))
        delays = jnp.transpose(delays, (0, 2, 1, 3))
        return jax.lax.stop_gradient(h), jax.lax.stop_gradient(delays)

    # ------------------------------------------------------------------
    def _load_parameters(self, fname):
        with open(os.path.join(_MODELS_DIR, fname)) as f:
            params = json.load(f)
        self._los = bool(params["los"])
        self._num_clusters = int(params["num_clusters"])
        delays = np.asarray(params["delays"], np.float64)
        powers = np.power(10.0, np.asarray(params["powers"],
                                           np.float64) / 10.0)
        powers = powers / powers.sum()
        c_aod = float(params["cASD"])
        c_aoa = float(params["cASA"])
        c_zod = float(params["cZSD"])
        c_zoa = float(params["cZSA"])
        aod = np.asarray(params["aod"], np.float64)
        aoa = np.asarray(params["aoa"], np.float64)
        zod = np.asarray(params["zod"], np.float64)
        zoa = np.asarray(params["zoa"], np.float64)

        if self._los:
            los_power = powers[0]
            powers, delays = powers[1:], delays[1:]
            los_aod, aod = aod[0], aod[1:]
            los_aoa, aoa = aoa[0], aoa[1:]
            los_zod, zod = zod[0], zod[1:]
            los_zoa, zoa = zoa[0], zoa[1:]
            norm_fact = powers.sum()
            powers = powers / norm_fact
            k_factor = los_power / norm_fact
            los_aod = np.deg2rad(los_aod)
            los_aoa = np.deg2rad(los_aoa)
            los_zod = np.deg2rad(los_zod)
            los_zoa = np.deg2rad(los_zoa)
            self._los_power = los_power
        else:
            k_factor = 1.0
            los_aod = los_aoa = los_zod = los_zoa = 0.0

        def rays_from(angles, c):
            # (7.7-0a): cluster angle + spread * fixed offsets
            return np.deg2rad(angles[:, None] + c * _RAY_OFFSETS[None, :])

        aod = rays_from(aod, c_aod)
        aoa = rays_from(aoa, c_aoa)
        zod = rays_from(zod, c_zod)
        zoa = rays_from(zoa, c_zoa)

        r3 = lambda x: np.asarray(x)[None, None, None]
        self._k_factor = r3(k_factor)
        self._delays = r3(delays)
        self._powers = r3(powers)
        if self._direction == "downlink":
            self._los_aoa, self._los_zoa = r3(los_aoa), r3(los_zoa)
            self._los_aod, self._los_zod = r3(los_aod), r3(los_zod)
            self._aoa, self._zoa = r3(aoa), r3(zoa)
            self._aod, self._zod = r3(aod), r3(zod)
        else:  # uplink: swap departure and arrival
            self._los_aoa, self._los_zoa = r3(los_aod), r3(los_zod)
            self._los_aod, self._los_zod = r3(los_aoa), r3(los_zoa)
            self._aoa, self._zoa = r3(aod), r3(zod)
            self._aod, self._zod = r3(aoa), r3(zoa)

        # note: for LoS JSONs num_clusters already excludes the
        # specular entry
        xpr = np.power(10.0, float(params["xpr"]) / 10.0)
        self._xpr = r3(np.full([self._num_clusters, CDL.NUM_RAYS], xpr))

    def _random_coupling(self, aoa, aod, zoa, zod, key):
        """Step 8: random per-cluster shuffling of ray angles."""
        keys = jax.random.split(key, 4)

        def shuffle(a, k):
            r = jax.random.normal(k, a.shape)
            idx = jnp.argsort(r, axis=-1)
            return jnp.take_along_axis(a, idx, axis=-1)

        return (shuffle(aoa, keys[0]), shuffle(aod, keys[1]),
                shuffle(zoa, keys[2]), shuffle(zod, keys[3]))
