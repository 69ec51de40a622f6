"""Rays container and RaysGenerator, TR 38.901 Sec. 7.5 steps 5-9
(reference: src/sionna/phy/channel/tr38901/rays.py:16,54; fresh JAX
implementation).

The generator consumes an :class:`LSP` realization (JAX arrays) and a
scenario whose topology state is host NumPy; all randomness threads an
explicit ``key`` so channel generation jits end-to-end.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Object
from ...config import config
from ...constants import PI

__all__ = ["Rays", "RaysGenerator"]

# Ray offset angles within a cluster, Table 7.5-3 (spec-exact; the
# reference rays.py:93 has a typo -0.1481 for the 16th entry)
_RAY_OFFSETS = np.array([0.0447, -0.0447, 0.1413, -0.1413,
                         0.2492, -0.2492, 0.3715, -0.3715,
                         0.5129, -0.5129, 0.6797, -0.6797,
                         0.8844, -0.8844, 1.1481, -1.1481,
                         1.5195, -1.5195, 2.1551, -2.1551])


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


class RaysGenerator(Object):
    """Samples rays from a scenario + LSP realization, implementing
    TR 38.901 Sec. 7.5 steps 5 to 9 (reference rays.py:54)."""

    def __init__(self, scenario):
        super().__init__(precision=scenario.precision)
        self._scenario = scenario

    def __call__(self, lsp, key=None):
        if key is None:
            key = config.next_key()
        keys = jax.random.split(key, 8)

        delays, delays_unscaled = self._cluster_delays(
            lsp.ds, lsp.k_factor, keys[0])
        powers, powers_for_angles = self._cluster_powers(
            lsp.ds, lsp.k_factor, delays_unscaled, keys[1])
        aoa = self._azimuth_angles(lsp.asa, lsp.k_factor,
                                   powers_for_angles, "aoa", keys[2])
        aod = self._azimuth_angles(lsp.asd, lsp.k_factor,
                                   powers_for_angles, "aod", keys[3])
        zoa = self._zenith_angles(lsp.zsa, lsp.k_factor,
                                  powers_for_angles, "zoa", keys[4])
        zod = self._zenith_angles(lsp.zsd, lsp.k_factor,
                                  powers_for_angles, "zod", keys[5])
        xpr = self._cross_polarization_power_ratios(keys[6])
        aoa, aod, zoa, zod = self._random_coupling(aoa, aod, zoa, zod,
                                                   keys[7])
        to_rad = PI / 180.
        return Rays(delays=delays, powers=powers,
                    aoa=aoa * to_rad, aod=aod * to_rad,
                    zoa=zoa * to_rad, zod=zod * to_rad, xpr=xpr)

    def topology_updated_callback(self):
        """Recomputes the per-link cluster mask (host-side)."""
        self._compute_clusters_mask()

    # ------------------------------------------------------------------
    # Internal utilities
    # ------------------------------------------------------------------
    def _compute_clusters_mask(self):
        """Mask [batch, num_bs, num_ut, num_clusters_max]; 1 marks a
        cluster unused by that link's state (reference rays.py:175)."""
        sc = self._scenario
        n_max = sc.num_clusters_max
        cl = np.arange(n_max)

        indoor = np.broadcast_to(sc.indoor[:, None, :, None],
                                 (sc.batch_size, sc.num_bs, sc.num_ut, 1))
        los = sc.los[..., None]
        nlos = ~los & ~indoor

        mask = np.zeros((sc.batch_size, sc.num_bs, sc.num_ut, n_max),
                        sc.np_rdtype)
        mask = np.where(indoor, (cl >= sc.num_clusters_indoor
                                 ).astype(sc.np_rdtype), mask)
        mask = np.where(los, (cl >= sc.num_clusters_los
                              ).astype(sc.np_rdtype), mask)
        mask = np.where(nlos, (cl >= sc.num_clusters_nlos
                               ).astype(sc.np_rdtype), mask)
        self._cluster_mask = mask

    def _cluster_delays(self, delay_spread, rician_k_factor, key):
        """Step 5 (reference rays.py:241)."""
        sc = self._scenario
        shape = (sc.batch_size, sc.num_bs, sc.num_ut,
                 sc.num_clusters_max)
        mask = jnp.asarray(self._cluster_mask, self.rdtype)
        r_tau = jnp.asarray(sc.get_param("rTau"), self.rdtype)[..., None]
        ds = delay_spread[..., None]

        x = jax.random.uniform(key, shape, self.rdtype, 1e-6, 1.0)
        unscaled = -r_tau * ds * jnp.log(x)
        # Unused clusters get a huge (1 s) delay so they sort to the end
        unscaled = unscaled * (1. - mask) + mask
        unscaled = unscaled - jnp.min(unscaled, axis=3, keepdims=True)
        unscaled = jnp.sort(unscaled, axis=3)

        # LoS scaling (7.5-3)
        k_db = 10. * jnp.log10(rician_k_factor)
        c_tau = (0.7705 - 0.0433 * k_db + 0.0002 * k_db ** 2
                 + 0.000017 * k_db ** 3)[..., None]
        los = jnp.asarray(sc.los)[..., None]
        delays = jnp.where(los, unscaled / c_tau, unscaled)
        return delays, unscaled

    def _cluster_powers(self, delay_spread, rician_k_factor,
                        unscaled_delays, key):
        """Step 6 (reference rays.py:308)."""
        sc = self._scenario
        shape = (sc.batch_size, sc.num_bs, sc.num_ut,
                 sc.num_clusters_max)
        mask = jnp.asarray(self._cluster_mask, self.rdtype)
        r_tau = jnp.asarray(sc.get_param("rTau"), self.rdtype)[..., None]
        zeta = jnp.asarray(sc.get_param("zeta"), self.rdtype)[..., None]
        ds = delay_spread[..., None]

        z = zeta * jax.random.normal(key, shape, self.rdtype)
        powers = (jnp.exp(-unscaled_delays * (r_tau - 1.)
                          / (r_tau * ds))
                  * jnp.power(jnp.asarray(10., self.rdtype), -z / 10.))
        powers = powers * (1. - mask)
        powers = powers / jnp.sum(powers, axis=3, keepdims=True)

        # LoS specular component (7.5-8): only used for angle generation
        k = rician_k_factor[..., None]
        p_scale = 1. / (k + 1.)
        p1_los = k * p_scale
        powers_1 = p_scale * powers[..., :1] + p1_los
        powers_n = p_scale * powers[..., 1:]
        los = jnp.asarray(sc.los)[..., None]
        powers_for_angles = jnp.where(
            los, jnp.concatenate([powers_1, powers_n], axis=3), powers)
        return powers, powers_for_angles

    def _azimuth_angles(self, azimuth_spread, rician_k_factor,
                        cluster_powers, angle_type, key):
        """Step 7, azimuth (reference rays.py:376)."""
        sc = self._scenario
        n_cl = sc.num_clusters_max
        n_rays = sc.rays_per_cluster
        shape = (sc.batch_size, sc.num_bs, sc.num_ut, n_cl)
        k_sign, k_comp = jax.random.split(key)

        asp = azimuth_spread[..., None]
        if angle_type == "aod":
            angles_los = jnp.asarray(sc.los_aod, self.rdtype)[..., None]
            c_spread = sc.get_param("cASD")
        else:
            angles_los = jnp.asarray(sc.los_aoa, self.rdtype)[..., None]
            c_spread = sc.get_param("cASA")
        c_spread = jnp.asarray(c_spread, self.rdtype)[..., None, None]

        k_db = 10. * jnp.log10(rician_k_factor)[..., None]
        c_phi_nlos = jnp.asarray(sc.get_param("CPhiNLoS"),
                                 self.rdtype)[..., None]
        c_phi_los = c_phi_nlos * (1.1035 - 0.028 * k_db
                                  - 0.002 * k_db ** 2
                                  + 0.0001 * k_db ** 3)
        los = jnp.asarray(sc.los)[..., None]
        c_phi = jnp.where(los, c_phi_los, c_phi_nlos)

        # Inverse Gaussian (7.5-9)
        z = cluster_powers / jnp.max(cluster_powers, axis=3,
                                     keepdims=True)
        z = jnp.clip(z, 1e-6, 1.)
        angles_prime = (2. * asp / 1.4) * jnp.sqrt(-jnp.log(z)) / c_phi

        sign = 2. * jax.random.randint(
            k_sign, (sc.batch_size, sc.num_bs, 1, n_cl), 0, 2
        ).astype(self.rdtype) - 1.
        comp = (asp / 7.0) * jax.random.normal(k_comp, shape,
                                               self.rdtype)
        angles = sign * angles_prime + comp + angles_los
        # Enforce the first cluster at the LoS direction for LoS links
        angles = angles - jnp.where(
            los, sign[..., :1] * angles_prime[..., :1] + comp[..., :1],
            0.)

        # Per-ray offsets (7.5-13)
        offsets = jnp.asarray(_RAY_OFFSETS[:n_rays], self.rdtype)
        angles = angles[..., None] + c_spread * offsets

        angles = jnp.mod(angles, 360.)
        angles = jnp.where(angles > 180., angles - 360., angles)
        return angles

    def _zenith_angles(self, zenith_spread, rician_k_factor,
                       cluster_powers, angle_type, key):
        """Step 7, zenith (reference rays.py:524)."""
        sc = self._scenario
        n_cl = sc.num_clusters_max
        n_rays = sc.rays_per_cluster
        shape = (sc.batch_size, sc.num_bs, sc.num_ut, n_cl)
        k_sign, k_comp = jax.random.split(key)

        indoor = np.broadcast_to(sc.indoor[:, None, :],
                                 sc.los.shape)
        los_uts = jnp.asarray(sc.los & ~indoor)[..., None]
        nlos_uts = jnp.asarray(~sc.los & ~indoor)[..., None]
        indoor_uts = jnp.asarray(indoor)[..., None]

        zsp = zenith_spread[..., None]
        if angle_type == "zod":
            angles_los = jnp.asarray(sc.los_zod, self.rdtype)[..., None]
            # Table 7.5-6 note: cZSD = (3/8) 10^{mu_lgZSD}
            c_spread = (3. / 8.) * jnp.power(
                jnp.asarray(10., self.rdtype),
                jnp.asarray(sc.lsp_log_mean[..., 6], self.rdtype))
            c_spread = c_spread[..., None]
        else:
            angles_los = jnp.asarray(sc.los_zoa, self.rdtype)[..., None]
            c_spread = jnp.asarray(sc.get_param("cZSA"),
                                   self.rdtype)[..., None]
        zod_offset = jnp.asarray(sc.zod_offset, self.rdtype)[..., None]

        k_db = 10. * jnp.log10(rician_k_factor)[..., None]
        c_theta_nlos = jnp.asarray(sc.get_param("CThetaNLoS"),
                                   self.rdtype)[..., None]
        c_theta_los = c_theta_nlos * (1.3086 + 0.0339 * k_db
                                      - 0.0077 * k_db ** 2
                                      + 0.0002 * k_db ** 3)
        c_theta = jnp.where(los_uts, c_theta_los, c_theta_nlos)

        # Inverse Laplacian (7.5-14)
        z = cluster_powers / jnp.max(cluster_powers, axis=3,
                                     keepdims=True)
        z = jnp.clip(z, 1e-6, 1.)
        angles_prime = -zsp * jnp.log(z) / c_theta

        sign = 2. * jax.random.randint(
            k_sign, (sc.batch_size, sc.num_bs, 1, n_cl), 0, 2
        ).astype(self.rdtype) - 1.
        comp = (zsp / 7.0) * jax.random.normal(k_comp, shape,
                                               self.rdtype)
        angles = sign * angles_prime + comp

        los_additional = -(sign[..., :1] * angles_prime[..., :1]
                           + comp[..., :1] - angles_los)
        if angle_type == "zod":
            additional = jnp.where(los_uts, los_additional,
                                   angles_los + zod_offset)
        else:
            additional = jnp.where(los_uts, los_additional, 0.)
            additional = jnp.where(nlos_uts, angles_los, additional)
            additional = jnp.where(indoor_uts,
                                   jnp.asarray(90., self.rdtype),
                                   additional)
        angles = angles + additional

        offsets = jnp.asarray(_RAY_OFFSETS[:n_rays], self.rdtype)
        angles = angles[..., None] + c_spread[..., None] * offsets

        angles = jnp.mod(angles, 360.)
        angles = jnp.where(angles > 180., 360. - angles, angles)
        return angles

    def _shuffle_angles(self, angles, key):
        """Random per-cluster permutation of ray angles, shared across
        UTs (reference rays.py:698)."""
        sc = self._scenario
        r = jax.random.normal(
            key, (sc.batch_size, sc.num_bs, 1, sc.num_clusters_max,
                  sc.rays_per_cluster), self.rdtype)
        idx = jnp.argsort(r, axis=-1)
        idx = jnp.broadcast_to(
            idx, angles.shape[:-1] + (sc.rays_per_cluster,))
        return jnp.take_along_axis(angles, idx, axis=-1)

    def _random_coupling(self, aoa, aod, zoa, zod, key):
        """Step 8: random coupling of rays (reference rays.py:731)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return (self._shuffle_angles(aoa, k1),
                self._shuffle_angles(aod, k2),
                self._shuffle_angles(zoa, k3),
                self._shuffle_angles(zod, k4))

    def _cross_polarization_power_ratios(self, key):
        """Step 9: per-ray XPR (reference rays.py:774)."""
        sc = self._scenario
        shape = (sc.batch_size, sc.num_bs, sc.num_ut,
                 sc.num_clusters_max, sc.rays_per_cluster)
        mu = jnp.asarray(sc.get_param("muXPR"),
                         self.rdtype)[..., None, None]
        std = jnp.asarray(sc.get_param("sigmaXPR"),
                          self.rdtype)[..., None, None]
        x = mu + std * jax.random.normal(key, shape, self.rdtype)
        return jnp.power(jnp.asarray(10., self.rdtype), x / 10.)
