"""System-level channel models: SystemLevelChannel base plus UMa, UMi
and RMa (reference: src/sionna/phy/channel/tr38901/
system_level_channel.py:17, uma.py:9, umi.py, rma.py; fresh JAX
implementation).

``set_topology`` is host-side (NumPy scenario state + correlation
Choleskys); ``__call__`` is pure JAX — LSPs, rays and CIRs are sampled
with explicit keys so the whole generation jits on TPU.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..channel_model import ChannelModel
from ...config import config
from ...constants import PI
from .lsp import LSP, LSPGenerator
from .rays import Rays, RaysGenerator
from .channel_coefficients import Topology, ChannelCoefficientsGenerator
from .scenarios import UMaScenario, UMiScenario, RMaScenario

__all__ = ["SystemLevelChannel", "UMa", "UMi", "RMa"]


class SystemLevelChannel(ChannelModel):
    """Base class for 3GPP system-level channel models
    (reference system_level_channel.py:17).

    Output of ``__call__``:
    a : [batch, num_rx, num_rx_ant, num_tx, num_tx_ant, num_paths,
    num_time_steps] complex path coefficients; tau : [batch, num_rx,
    num_tx, num_paths] path delays [s].
    """

    def __init__(self, scenario, always_generate_lsp=False,
                 precision=None):
        super().__init__(precision=scenario.precision)
        self._scenario = scenario
        self._lsp_sampler = LSPGenerator(scenario)
        self._ray_sampler = RaysGenerator(scenario)
        self._set_topology_called = False
        self._return_rays = False
        self._always_generate_lsp = bool(always_generate_lsp)
        self._lsp = None

        if scenario.direction == "uplink":
            tx_array = scenario.ut_array
            rx_array = scenario.bs_array
        else:
            tx_array = scenario.bs_array
            rx_array = scenario.ut_array
        self._cir_sampler = ChannelCoefficientsGenerator(
            scenario.carrier_frequency, tx_array, rx_array,
            subclustering=True, precision=self.precision)

    @property
    def return_rays(self):
        """If `True`, ``__call__`` also returns the sampled rays."""
        return self._return_rays

    @return_rays.setter
    def return_rays(self, value):
        if not isinstance(value, bool):
            raise TypeError("return_rays must be bool")
        self._return_rays = value

    def set_topology(self, ut_loc=None, bs_loc=None,
                     ut_orientations=None, bs_orientations=None,
                     ut_velocities=None, in_state=None, los=None,
                     bs_virtual_loc=None):
        """Sets the network topology; see reference
        system_level_channel.py:94 for semantics."""
        need_for_update = self._scenario.set_topology(
            ut_loc, bs_loc, ut_orientations, bs_orientations,
            ut_velocities, in_state, los, bs_virtual_loc)

        if need_for_update:
            self._lsp_sampler.topology_updated_callback()
            self._ray_sampler.topology_updated_callback()
            if not self._always_generate_lsp:
                # Freeze the LSP realization on host so it embeds as a
                # trace-time constant in subsequent jitted calls
                lsp = self._lsp_sampler()
                self._lsp = LSP(
                    *(np.asarray(x) for x in
                      (lsp.ds, lsp.asd, lsp.asa, lsp.sf,
                       lsp.k_factor, lsp.zsa, lsp.zsd)))
        self._set_topology_called = True
        return need_for_update

    def __call__(self, batch_size=None, num_time_steps=None,
                 sampling_frequency=None, key=None):
        if not self._set_topology_called:
            raise RuntimeError("set_topology() must be called before "
                               "sampling the channel")
        # The batch size is fixed by the topology; `batch_size` is
        # accepted (and ignored) for ChannelModel-interface
        # compatibility with Generate{OFDM,Time}Channel.
        if sampling_frequency is None:
            num_time_steps, sampling_frequency = (batch_size,
                                                  num_time_steps)
        if key is None:
            key = config.next_key()
        k_lsp, k_rays, k_cir, k_pl = jax.random.split(key, 4)

        if self._always_generate_lsp:
            lsp = self._lsp_sampler(key=k_lsp)
        else:
            lsp = self._lsp
        rays = self._ray_sampler(lsp, key=k_rays)

        sc = self._scenario
        to_rad = PI / 180.
        if sc.direction == "downlink":
            moving_end = "rx"
            tx_orientations = sc.bs_orientations
            rx_orientations = sc.ut_orientations
        else:
            moving_end = "tx"
            tx_orientations = sc.ut_orientations
            rx_orientations = sc.bs_orientations

        los_aoa = sc.los_aoa * to_rad
        los_aod = sc.los_aod * to_rad
        los_zoa = sc.los_zoa * to_rad
        los_zod = sc.los_zod * to_rad
        los = sc.los
        distance_3d = sc.distance_3d
        c_ds = sc.get_param("cDS") * 1e-9
        k_factor = lsp.k_factor
        sf = lsp.sf

        if sc.direction == "uplink":
            # Swap TX/RX: transpose BS<->UT axes and exchange
            # departure/arrival angles (functional, unlike the
            # reference's in-place mutation)
            def t3(x):
                return jnp.transpose(jnp.asarray(x), (0, 2, 1))

            def t4(x):
                return jnp.transpose(x, (0, 2, 1, 3))

            def t5(x):
                return jnp.transpose(x, (0, 2, 1, 3, 4))

            rays = Rays(delays=t4(rays.delays), powers=t4(rays.powers),
                        aoa=t5(rays.aod), aod=t5(rays.aoa),
                        zoa=t5(rays.zod), zod=t5(rays.zoa),
                        xpr=t5(rays.xpr))
            los_aoa, los_aod = (np.transpose(los_aod, (0, 2, 1)),
                                np.transpose(los_aoa, (0, 2, 1)))
            los_zoa, los_zod = (np.transpose(los_zod, (0, 2, 1)),
                                np.transpose(los_zoa, (0, 2, 1)))
            los = np.transpose(los, (0, 2, 1))
            distance_3d = np.transpose(distance_3d, (0, 2, 1))
            c_ds = np.transpose(c_ds, (0, 2, 1))
            k_factor = jnp.transpose(k_factor, (0, 2, 1))
            sf = jnp.transpose(sf, (0, 2, 1))

        topology = Topology(
            velocities=jnp.asarray(sc.ut_velocities, self.rdtype),
            moving_end=moving_end,
            los_aoa=jnp.asarray(los_aoa, self.rdtype),
            los_aod=jnp.asarray(los_aod, self.rdtype),
            los_zoa=jnp.asarray(los_zoa, self.rdtype),
            los_zod=jnp.asarray(los_zod, self.rdtype),
            los=jnp.asarray(los),
            distance_3d=jnp.asarray(distance_3d, self.rdtype),
            tx_orientations=jnp.asarray(tx_orientations, self.rdtype),
            rx_orientations=jnp.asarray(rx_orientations, self.rdtype))

        h, delays = self._cir_sampler(
            num_time_steps, sampling_frequency, k_factor, rays,
            topology, c_ds, key=k_cir)

        # Step 12: pathloss and shadow fading
        h = self._step_12(h, sf, key=k_pl)

        # [b, tx, rx, paths, rx_ant, tx_ant, time]
        # -> [b, rx, rx_ant, tx, tx_ant, paths, time]
        h = jnp.transpose(h, (0, 2, 4, 1, 5, 3, 6))
        delays = jnp.transpose(delays, (0, 2, 1, 3))

        h = jax.lax.stop_gradient(h)
        delays = jax.lax.stop_gradient(delays)
        if self._return_rays:
            return h, delays, rays
        return h, delays

    # ------------------------------------------------------------------
    # Internal utilities
    # ------------------------------------------------------------------
    def _step_12(self, h, sf, key=None):
        """Applies pathloss and shadow fading (reference
        system_level_channel.py:403)."""
        sc = self._scenario
        if sc.pathloss_enabled:
            pl_db = self._lsp_sampler.sample_pathloss(key=key)
            if sc.direction == "uplink":
                pl_db = jnp.transpose(pl_db, (0, 2, 1))
        else:
            pl_db = jnp.asarray(0., self.rdtype)

        if not sc.shadow_fading_enabled:
            sf = jnp.ones_like(sf)

        gain = (jnp.power(jnp.asarray(10., self.rdtype), -pl_db / 20.)
                * jnp.sqrt(sf))
        gain = gain.reshape(gain.shape
                            + (1,) * (h.ndim - gain.ndim))
        return h * gain.astype(self.cdtype)

    def show_topology(self, bs_index=0, batch_index=0):
        """3D scatter plot of the network topology (reference
        system_level_channel.py:283; simplified)."""
        import matplotlib.pyplot as plt
        sc = self._scenario
        indoor = np.asarray(sc.indoor)[batch_index]
        los = np.asarray(sc.los)[batch_index, bs_index]
        ut_loc = np.asarray(sc.ut_loc)[batch_index]
        bs_loc = np.asarray(sc.bs_loc)[batch_index]
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        ax.scatter(bs_loc[:, 0], bs_loc[:, 1], bs_loc[:, 2], c="k",
                   label="BS", depthshade=False)
        sel_in = indoor
        sel_los = los & ~indoor
        sel_nlos = ~los & ~indoor
        for sel, c, lbl in ((sel_in, "b", "UT Indoor"),
                            (sel_los, "r", "UT LoS"),
                            (sel_nlos, "y", "UT NLoS")):
            pts = ut_loc[sel]
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=c, label=lbl,
                       depthshade=False)
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_zlabel("z [m]")
        plt.legend()
        return fig


class UMa(SystemLevelChannel):
    """Urban macrocell (UMa) channel model (reference uma.py:9)."""

    def __init__(self, carrier_frequency, o2i_model, ut_array, bs_array,
                 direction, enable_pathloss=True,
                 enable_shadow_fading=True, always_generate_lsp=False,
                 precision=None):
        scenario = UMaScenario(carrier_frequency, o2i_model, ut_array,
                               bs_array, direction, enable_pathloss,
                               enable_shadow_fading,
                               precision=precision)
        super().__init__(scenario, always_generate_lsp)


class UMi(SystemLevelChannel):
    """Urban microcell (UMi) channel model (reference umi.py)."""

    def __init__(self, carrier_frequency, o2i_model, ut_array, bs_array,
                 direction, enable_pathloss=True,
                 enable_shadow_fading=True, always_generate_lsp=False,
                 precision=None):
        scenario = UMiScenario(carrier_frequency, o2i_model, ut_array,
                               bs_array, direction, enable_pathloss,
                               enable_shadow_fading,
                               precision=precision)
        super().__init__(scenario, always_generate_lsp)


class RMa(SystemLevelChannel):
    """Rural macrocell (RMa) channel model (reference rma.py)."""

    def __init__(self, carrier_frequency, ut_array, bs_array, direction,
                 enable_pathloss=True, enable_shadow_fading=True,
                 average_street_width=20.0, average_building_height=5.0,
                 always_generate_lsp=False, precision=None):
        scenario = RMaScenario(carrier_frequency, ut_array, bs_array,
                               direction, enable_pathloss,
                               enable_shadow_fading,
                               average_street_width,
                               average_building_height,
                               precision=precision)
        super().__init__(scenario, always_generate_lsp)
