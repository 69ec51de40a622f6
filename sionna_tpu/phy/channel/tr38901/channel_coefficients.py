"""TR 38.901 steps 10-11: channel coefficient generation (reference:
src/sionna/phy/channel/tr38901/channel_coefficients.py:15,78).

All of step 11 is dense tensor algebra over
[batch, tx, rx, clusters, rays, rx_ant, tx_ant, time] - ideal VPU/MXU
work; the JAX version relies on native broadcasting (no TF rank
workarounds) and fuses the field/array/Doppler factors in one
expression.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Object
from ...config import config
from ...constants import PI, SPEED_OF_LIGHT

__all__ = ["Topology", "ChannelCoefficientsGenerator"]


class Topology(Object):
    """Network topology container (reference
    channel_coefficients.py:15). Shapes: see reference docstring."""

    def __init__(self, velocities, moving_end, los_aoa, los_aod,
                 los_zoa, los_zod, los, distance_3d, tx_orientations,
                 rx_orientations):
        super().__init__()
        self.velocities = velocities
        self.moving_end = moving_end
        self.los_aoa = los_aoa
        self.los_aod = los_aod
        self.los_zoa = los_zoa
        self.los_zod = los_zod
        self.los = los
        self.distance_3d = distance_3d
        self.tx_orientations = tx_orientations
        self.rx_orientations = rx_orientations


class ChannelCoefficientsGenerator(Object):
    """Samples channel impulse responses from rays + topology
    (TR 38.901 Sec. 7.5 steps 10-11)."""

    # Sub-cluster info, Table 7.5-5
    _SUB_CL_1_IND = np.array([0, 1, 2, 3, 4, 5, 6, 7, 18, 19])
    _SUB_CL_2_IND = np.array([8, 9, 10, 11, 16, 17])
    _SUB_CL_3_IND = np.array([12, 13, 14, 15])
    _SUB_CL_DELAY_OFFSETS = np.array([0., 1.28, 2.56])

    def __init__(self, carrier_frequency, tx_array, rx_array,
                 subclustering, precision=None):
        super().__init__(precision=precision)
        self._lambda_0 = SPEED_OF_LIGHT / carrier_frequency
        self._tx_array = tx_array
        self._rx_array = rx_array
        self._subclustering = bool(subclustering)

    def __call__(self, num_time_samples, sampling_frequency, k_factor,
                 rays, topology, c_ds=None, debug=False, key=None):
        if key is None:
            key = config.next_key()
        sample_times = (jnp.arange(num_time_samples, dtype=self.rdtype)
                        / sampling_frequency)
        # Step 10: random phases [b, tx, rx, cl, rays, 4]
        phi = jax.random.uniform(
            key, tuple(jnp.shape(rays.aoa)) + (4,), self.rdtype, -PI, PI)
        # Step 11
        h, delays = self._step_11(phi, topology, k_factor, rays,
                                  sample_times, c_ds)
        if debug:
            return h, delays, phi, sample_times
        return h, delays

    # ------------------------------------------------------------------
    # Geometry helpers (TR 38.901 Sec. 7.1)
    # ------------------------------------------------------------------
    def _unit_sphere_vector(self, theta, phi):
        """(7.1-6): [..., 3, 1] unit vector."""
        rho_hat = jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                             jnp.sin(theta) * jnp.sin(phi),
                             jnp.cos(theta)], axis=-1)
        return rho_hat[..., None]

    def _forward_rotation_matrix(self, orientations):
        """(7.1-4): [..., 3, 3] composite rotation."""
        a = orientations[..., 0]
        b = orientations[..., 1]
        c = orientations[..., 2]
        cos, sin = jnp.cos, jnp.sin
        row_1 = jnp.stack([cos(a) * cos(b),
                           cos(a) * sin(b) * sin(c) - sin(a) * cos(c),
                           cos(a) * sin(b) * cos(c) + sin(a) * sin(c)],
                          axis=-1)
        row_2 = jnp.stack([sin(a) * cos(b),
                           sin(a) * sin(b) * sin(c) + cos(a) * cos(c),
                           sin(a) * sin(b) * cos(c) - cos(a) * sin(c)],
                          axis=-1)
        row_3 = jnp.stack([-sin(b), cos(b) * sin(c), cos(b) * cos(c)],
                          axis=-1)
        return jnp.stack([row_1, row_2, row_3], axis=-2)

    def _rot_pos(self, orientations, positions):
        """Rotate positions [..., 3, 1] by orientations [..., 3]."""
        return jnp.matmul(self._forward_rotation_matrix(orientations),
                          positions)

    def _gcs_to_lcs(self, orientations, theta, phi):
        """(7.1-7/8): angles in the local coordinate system."""
        rho_hat = self._unit_sphere_vector(theta, phi)  # [..., 3, 1]
        rot_inv = jnp.swapaxes(
            self._forward_rotation_matrix(orientations), -2, -1)
        rot_rho = jnp.matmul(rot_inv, rho_hat)[..., 0]  # [..., 3]
        z = jnp.clip(rot_rho[..., 2], -1., 1.)
        theta_prime = jnp.arccos(z)
        phi_prime = jnp.angle(rot_rho[..., 0]
                              + 1j * rot_rho[..., 1])
        return theta_prime, phi_prime

    def _compute_psi(self, orientations, theta, phi):
        """(7.1-15): displacement angle psi."""
        a = orientations[..., 0]
        b = orientations[..., 1]
        c = orientations[..., 2]
        cos, sin = jnp.cos, jnp.sin
        real = sin(c) * cos(theta) * sin(phi - a) \
            + cos(c) * (cos(b) * sin(theta)
                        - sin(b) * cos(theta) * cos(phi - a))
        imag = sin(c) * cos(phi - a) + sin(b) * cos(c) * sin(phi - a)
        return jnp.angle(real + 1j * imag)

    def _l2g_response(self, f_prime, orientations, theta, phi):
        """(7.1-11): LCS field components to GCS. f_prime [..., 2] ->
        [..., 2, 1]."""
        psi = self._compute_psi(orientations, theta, phi)
        cos, sin = jnp.cos(psi), jnp.sin(psi)
        row1 = jnp.stack([cos, -sin], axis=-1)
        row2 = jnp.stack([sin, cos], axis=-1)
        mat = jnp.stack([row1, row2], axis=-2)
        return jnp.matmul(mat, f_prime[..., None])

    def _tx_antenna_positions_gcs(self, topology):
        """d_bar_tx (7.5-22): [batch, num_tx, num_tx_ant, 3]."""
        orient = jnp.asarray(topology.tx_orientations,
                             self.rdtype)[:, :, None]  # [b, tx, 1, 3]
        pos_lcs = jnp.asarray(self._tx_array.ant_pos,
                              self.rdtype)[None, None, :, :, None]
        return self._rot_pos(orient, pos_lcs)[..., 0]

    def _rx_antenna_positions_gcs(self, topology):
        orient = jnp.asarray(topology.rx_orientations,
                             self.rdtype)[:, :, None]
        pos_lcs = jnp.asarray(self._rx_array.ant_pos,
                              self.rdtype)[None, None, :, :, None]
        return self._rot_pos(orient, pos_lcs)[..., 0]

    # ------------------------------------------------------------------
    # Step 11 pieces
    # ------------------------------------------------------------------
    def _step_11_phase_matrix(self, phi, rays):
        """(7.5-22) phase/XPR matrix:
        [b, tx, rx, cl, rays, 2, 2] complex."""
        xpr = jnp.asarray(rays.xpr, self.rdtype)
        xpr_scaling = jnp.sqrt(1 / xpr).astype(self.cdtype)
        e = jnp.exp(1j * phi.astype(self.cdtype))
        e0 = e[..., 0]
        e1 = xpr_scaling * e[..., 1]
        e2 = xpr_scaling * e[..., 2]
        e3 = e[..., 3]
        h_phase = jnp.stack([e0, e1, e2, e3], axis=-1)
        return jnp.reshape(h_phase, h_phase.shape[:-1] + (2, 2))

    def _step_11_doppler_matrix(self, topology, aoa, zoa, t):
        """(7.5-22) Doppler factor:
        [b, tx, rx, cl, rays, time] complex."""
        v_bar = jnp.asarray(topology.velocities,
                            self.rdtype)[..., None]  # [b, n, 3, 1]
        if topology.moving_end == "rx":
            v_bar = v_bar[:, None]        # [b, 1, rx, 3, 1]
        else:
            v_bar = v_bar[:, :, None]     # [b, tx, 1, 3, 1]
        v_bar = v_bar[..., None, None, :, :]  # [b, ., ., 1, 1, 3, 1]
        r_hat_rx = self._unit_sphere_vector(zoa, aoa)  # [...,3,1]
        exponent = (2 * PI / self._lambda_0
                    * jnp.sum(r_hat_rx * v_bar, axis=-2)) * t
        return jnp.exp(1j * exponent.astype(self.cdtype))

    def _step_11_array_offsets(self, topology, aoa, aod, zoa, zod):
        """(7.5-22) element phase offsets:
        [b, tx, rx, cl, rays, rx_ant, tx_ant] complex."""
        r_hat_rx = self._unit_sphere_vector(zoa, aoa)[..., 0]
        r_hat_tx = self._unit_sphere_vector(zod, aod)[..., 0]
        d_bar_rx = self._rx_antenna_positions_gcs(topology)
        d_bar_tx = self._tx_antenna_positions_gcs(topology)
        # broadcast: r_hat [b,tx,rx,cl,rays,1,3];
        # d_rx [b,1,rx,1,1,rx_ant,3]; d_tx [b,tx,1,1,1,tx_ant,3]
        r_hat_rx = r_hat_rx[..., None, :]
        r_hat_tx = r_hat_tx[..., None, :]
        d_bar_rx = d_bar_rx[:, None, :, None, None]
        d_bar_tx = d_bar_tx[:, :, None, None, None]
        exp_rx = (2 * PI / self._lambda_0
                  * jnp.sum(r_hat_rx * d_bar_rx, axis=-1))
        exp_tx = (2 * PI / self._lambda_0
                  * jnp.sum(r_hat_tx * d_bar_tx, axis=-1))
        exp_rx = jnp.exp(1j * exp_rx.astype(self.cdtype))
        exp_tx = jnp.exp(1j * exp_tx.astype(self.cdtype))
        return exp_rx[..., :, None] * exp_tx[..., None, :]

    def _step_11_field_matrix(self, topology, aoa, aod, zoa, zod,
                              h_phase):
        """(7.5-22) polarized element responses:
        [b, tx, rx, cl, rays, rx_ant, tx_ant] complex."""
        tx_orient = jnp.asarray(topology.tx_orientations, self.rdtype)
        rx_orient = jnp.asarray(topology.rx_orientations, self.rdtype)
        tx_orient_b = tx_orient[:, :, None, None, None, :]
        rx_orient_b = rx_orient[:, None, :, None, None, :]

        zod_prime, aod_prime = self._gcs_to_lcs(tx_orient_b, zod, aod)
        zoa_prime, aoa_prime = self._gcs_to_lcs(rx_orient_b, zoa, aoa)

        f_tx_pol1_prime = jnp.stack(
            self._tx_array.ant_pol1.field(zod_prime, aod_prime), axis=-1)
        f_rx_pol1_prime = jnp.stack(
            self._rx_array.ant_pol1.field(zoa_prime, aoa_prime), axis=-1)
        f_tx_pol1 = self._l2g_response(f_tx_pol1_prime, tx_orient_b,
                                       zod, aod)  # [..., 2, 1]
        f_rx_pol1 = self._l2g_response(f_rx_pol1_prime, rx_orient_b,
                                       zoa, aoa)

        if self._tx_array.polarization == "dual":
            f_tx_pol2_prime = jnp.stack(
                self._tx_array.ant_pol2.field(zod_prime, aod_prime),
                axis=-1)
            f_tx_pol2 = self._l2g_response(f_tx_pol2_prime, tx_orient_b,
                                           zod, aod)
        if self._rx_array.polarization == "dual":
            f_rx_pol2_prime = jnp.stack(
                self._rx_array.ant_pol2.field(zoa_prime, aoa_prime),
                axis=-1)
            f_rx_pol2 = self._l2g_response(f_rx_pol2_prime, rx_orient_b,
                                           zoa, aoa)

        # TX: apply phase matrix: [..., 2, 2] x [..., 2, 1]
        pol1_tx = jnp.matmul(h_phase, f_tx_pol1.astype(self.cdtype))
        if self._tx_array.polarization == "dual":
            pol2_tx = jnp.matmul(h_phase, f_tx_pol2.astype(self.cdtype))

        num_ant_tx = self._tx_array.num_ant
        if self._tx_array.polarization == "single":
            f_tx_array = jnp.tile(
                pol1_tx[None], (num_ant_tx,) + (1,) * pol1_tx.ndim)
        else:
            pol_tx = jnp.stack([pol1_tx, pol2_tx], 0)
            gather_ind = np.zeros([num_ant_tx], int)
            gather_ind[self._tx_array.ant_ind_pol2] = 1
            f_tx_array = jnp.take(pol_tx, jnp.asarray(gather_ind),
                                  axis=0)

        num_ant_rx = self._rx_array.num_ant
        if self._rx_array.polarization == "single":
            f_rx_array = jnp.tile(
                f_rx_pol1[None],
                (num_ant_rx,) + (1,) * f_rx_pol1.ndim).astype(self.cdtype)
        else:
            pol_rx = jnp.stack([f_rx_pol1, f_rx_pol2], 0)
            gather_ind = np.zeros([num_ant_rx], int)
            gather_ind[self._rx_array.ant_ind_pol2] = 1
            f_rx_array = jnp.take(pol_rx, jnp.asarray(gather_ind),
                                  axis=0).astype(self.cdtype)

        # sum over polarization components:
        # f_rx [rxa, 1, ..., 2, 1] * f_tx [1, txa, ..., 2, 1]
        h_field = jnp.sum(f_rx_array[:, None] * f_tx_array[None],
                          axis=(-2, -1))
        # [rxa, txa, b, tx, rx, cl, rays] -> [b,tx,rx,cl,rays,rxa,txa]
        return jnp.moveaxis(h_field, (0, 1), (-2, -1))

    def _step_11_nlos(self, phi, topology, rays, t):
        """(7.5-28): full NLoS matrix
        [b, tx, rx, cl, rays, rxa, txa, time]."""
        h_phase = self._step_11_phase_matrix(phi, rays)
        h_field = self._step_11_field_matrix(topology, rays.aoa,
                                             rays.aod, rays.zoa,
                                             rays.zod, h_phase)
        h_array = self._step_11_array_offsets(topology, rays.aoa,
                                              rays.aod, rays.zoa,
                                              rays.zod)
        h_doppler = self._step_11_doppler_matrix(topology, rays.aoa,
                                                 rays.zoa, t)
        h_full = (h_field * h_array)[..., None] \
            * h_doppler[..., None, None, :]
        num_rays = h_full.shape[4]
        power_scaling = jnp.sqrt(
            jnp.asarray(rays.powers, self.rdtype) / num_rays
        ).astype(self.cdtype)
        h_full = h_full * power_scaling[..., None, None, None, None]
        return h_full

    def _step_11_reduce_nlos(self, h_full, rays, c_ds):
        """(7.5-27): sum rays per cluster; with subclustering, split
        the two strongest clusters into three sub-clusters."""
        if not self._subclustering:
            h_nlos = jnp.sum(h_full, axis=4)
            delays_nlos = jnp.asarray(rays.delays, self.rdtype)
        else:
            powers = jnp.asarray(rays.powers, self.rdtype)
            delays = jnp.asarray(rays.delays, self.rdtype)
            strongest = jnp.argsort(-powers, axis=-1)
            delays_sorted = jnp.take_along_axis(delays, strongest,
                                                axis=3)
            delays_strong = delays_sorted[..., :2]
            delays_weak = delays_sorted[..., 2:]
            offsets = jnp.asarray(self._SUB_CL_DELAY_OFFSETS,
                                  self.rdtype)
            # [b,tx,rx,3,2]
            delays_sub_cl = (delays_strong[..., None, :]
                             + offsets[:, None]
                             * jnp.asarray(c_ds, self.rdtype)
                             [..., None, None])
            delays_sub_cl = jnp.reshape(
                delays_sub_cl, delays_sub_cl.shape[:-2] + (-1,))
            idx_strong = strongest[..., :2, None, None, None, None]
            idx_weak = strongest[..., 2:, None, None, None, None]
            h_strong = jnp.take_along_axis(h_full, idx_strong, axis=3)
            h_weak = jnp.take_along_axis(h_full, idx_weak, axis=3)
            h_sub_cl_1 = jnp.sum(jnp.take(
                h_strong, jnp.asarray(self._SUB_CL_1_IND), axis=4),
                axis=4)
            h_sub_cl_2 = jnp.sum(jnp.take(
                h_strong, jnp.asarray(self._SUB_CL_2_IND), axis=4),
                axis=4)
            h_sub_cl_3 = jnp.sum(jnp.take(
                h_strong, jnp.asarray(self._SUB_CL_3_IND), axis=4),
                axis=4)
            h_weak = jnp.sum(h_weak, axis=4)
            h_nlos = jnp.concatenate(
                [h_sub_cl_1, h_sub_cl_2, h_sub_cl_3, h_weak], axis=3)
            delays_nlos = jnp.concatenate([delays_sub_cl, delays_weak],
                                          axis=3)
        # sort by delay
        delays_ind = jnp.argsort(delays_nlos, axis=-1)
        delays_nlos = jnp.take_along_axis(delays_nlos, delays_ind,
                                          axis=3)
        h_nlos = jnp.take_along_axis(
            h_nlos, delays_ind[..., None, None, None], axis=3)
        return h_nlos, delays_nlos

    def _step_11_los(self, topology, t):
        """(7.5-29): LoS component
        [b, tx, rx, 1, rxa, txa, time]."""
        aoa = jnp.asarray(topology.los_aoa,
                          self.rdtype)[..., None, None]
        aod = jnp.asarray(topology.los_aod,
                          self.rdtype)[..., None, None]
        zoa = jnp.asarray(topology.los_zoa,
                          self.rdtype)[..., None, None]
        zod = jnp.asarray(topology.los_zod,
                          self.rdtype)[..., None, None]
        h_phase = jnp.reshape(
            jnp.asarray([[1., 0.], [0., -1.]], self.cdtype),
            [1, 1, 1, 1, 1, 2, 2])
        h_field = self._step_11_field_matrix(topology, aoa, aod, zoa,
                                             zod, h_phase)
        h_array = self._step_11_array_offsets(topology, aoa, aod, zoa,
                                              zod)
        h_doppler = self._step_11_doppler_matrix(topology, aoa, zoa, t)
        d3d = jnp.asarray(topology.distance_3d, self.rdtype)
        h_delay = jnp.exp(
            1j * (2 * PI * d3d / self._lambda_0).astype(self.cdtype))
        # squeeze the rays dim (size 1), keep cluster dim
        h_field = h_field[:, :, :, :, 0][..., None]       # +time slot
        h_array = h_array[:, :, :, :, 0][..., None]
        h_doppler = h_doppler[:, :, :, :, 0][..., None, None, :]
        h_delay = h_delay[..., None, None, None, None]
        return h_field * h_array * h_doppler * h_delay

    def _step_11(self, phi, topology, k_factor, rays, t, c_ds):
        """(7.5-30): combine LoS and NLoS."""
        h_full = self._step_11_nlos(phi, topology, rays, t)
        h_nlos, delays_nlos = self._step_11_reduce_nlos(h_full, rays,
                                                        c_ds)
        h_los_los_comp = self._step_11_los(topology, t)
        k = jnp.asarray(k_factor, self.rdtype)
        k = k[..., None, None, None, None].astype(self.cdtype)
        h_los_los_comp = h_los_los_comp * jnp.sqrt(k / (k + 1))
        h_los_nlos_comp = h_nlos * jnp.sqrt(1 / (k + 1))
        h_los_cl = h_los_los_comp + h_los_nlos_comp[:, :, :, :1]
        h_los = jnp.concatenate([h_los_cl, h_los_nlos_comp[:, :, :, 1:]],
                                axis=3)
        los_ind = jnp.asarray(topology.los)[..., None, None, None, None]
        h = jnp.where(los_ind, h_los, h_nlos)
        return h, delays_nlos
