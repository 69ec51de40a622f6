"""Large-scale parameter (LSP) sampling, TR 38.901 Sec. 7.5 steps 1-4
and pathloss Sec. 7.4 (reference: src/sionna/phy/channel/tr38901/
lsp.py:15,52; fresh JAX implementation).

Correlation matrix square roots are precomputed on host (NumPy
Cholesky) at topology updates; per-call sampling is pure JAX so the
whole generation jits.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...block import Object
from ...config import config

__all__ = ["LSP", "LSPGenerator"]


class LSP(Object):
    """Container for LSP realizations (reference lsp.py:15).
    Each field has shape [batch, num_bs, num_ut] (or transposed for
    uplink use)."""

    def __init__(self, ds, asd, asa, sf, k_factor, zsa, zsd):
        super().__init__()
        self.ds = ds
        self.asd = asd
        self.asa = asa
        self.sf = sf
        self.k_factor = k_factor
        self.zsa = zsa
        self.zsd = zsd


def _cholesky_psd(mat):
    """Cholesky with a small-jitter fallback for numerically
    semi-definite matrices (e.g., co-located UTs)."""
    try:
        return np.linalg.cholesky(mat)
    except np.linalg.LinAlgError:
        eye = np.eye(mat.shape[-1], dtype=mat.dtype)
        for jitter in (1e-10, 1e-8, 1e-6, 1e-4):
            try:
                return np.linalg.cholesky(mat + jitter * eye)
            except np.linalg.LinAlgError:
                continue
        raise


class LSPGenerator(Object):
    """Samples LSPs and pathloss for a system-level scenario
    (reference lsp.py:52)."""

    def __init__(self, scenario):
        super().__init__(precision=scenario.precision)
        self._scenario = scenario

    def sample_pathloss(self, key=None):
        """Total pathloss [dB] per link: basic (7.4.1) + O2I penetration
        (7.4.3); reference lsp.py:85."""
        pl_b = jnp.asarray(self._scenario.basic_pathloss, self.rdtype)
        if self._scenario.o2i_model == "low":
            pl_o2i = self._o2i_loss(key, l_glass_a=2., l_glass_b=0.2,
                                    glass_frac=0.3, std_db=4.4)
        else:
            pl_o2i = self._o2i_loss(key, l_glass_a=23., l_glass_b=0.3,
                                    glass_frac=0.7, std_db=6.5)
        return pl_b + pl_o2i

    def __call__(self, key=None):
        if key is None:
            key = config.next_key()
        sc = self._scenario
        shape = (sc.batch_size, sc.num_bs, sc.num_ut, 7)
        s = jax.random.normal(key, shape, self.rdtype)

        # Cross-LSP correlation (step 4)
        l_cross = jnp.asarray(self._cross_lsp_corr_sqrt, self.rdtype)
        s = jnp.einsum("bsupq,bsuq->bsup", l_cross, s)

        # Spatial correlation across UTs (per LSP p)
        l_spat = jnp.asarray(self._spatial_lsp_corr_sqrt, self.rdtype)
        s = jnp.einsum("bspuv,bsvp->bsup", l_spat, s)

        lsp_log = (jnp.asarray(sc.lsp_log_std, self.rdtype) * s
                   + jnp.asarray(sc.lsp_log_mean, self.rdtype))
        lsp = jnp.power(jnp.asarray(10., self.rdtype), lsp_log)

        # ASA/ASD limited to 104 deg, ZSA/ZSD to 52 deg
        return LSP(ds=lsp[..., 0],
                   asd=jnp.minimum(lsp[..., 1], 104.0),
                   asa=jnp.minimum(lsp[..., 2], 104.0),
                   sf=lsp[..., 3],
                   k_factor=lsp[..., 4],
                   zsa=jnp.minimum(lsp[..., 5], 52.0),
                   zsd=jnp.minimum(lsp[..., 6], 52.0))

    def topology_updated_callback(self):
        """Recomputes correlation matrix square roots (host-side)."""
        self._compute_cross_lsp_correlation_matrix()
        self._compute_lsp_spatial_correlation_sqrt()

    # ------------------------------------------------------------------
    # Internal utilities
    # ------------------------------------------------------------------
    def _compute_cross_lsp_correlation_matrix(self):
        """Per-link 7x7 cross-LSP correlation matrix square root
        (reference lsp.py:187).  LSP order: DS ASD ASA SF K ZSA ZSD."""
        sc = self._scenario
        c = np.zeros((sc.batch_size, sc.num_bs, sc.num_ut, 7, 7),
                     sc.np_rdtype)
        c[..., np.arange(7), np.arange(7)] = 1.

        pairs = [("corrASDvsDS", 0, 1), ("corrASAvsDS", 0, 2),
                 ("corrASAvsSF", 3, 2), ("corrASDvsSF", 3, 1),
                 ("corrDSvsSF", 3, 0), ("corrASDvsASA", 1, 2),
                 ("corrASDvsK", 1, 4), ("corrASAvsK", 2, 4),
                 ("corrDSvsK", 0, 4), ("corrSFvsK", 3, 4),
                 ("corrZSDvsSF", 3, 6), ("corrZSAvsSF", 3, 5),
                 ("corrZSDvsK", 6, 4), ("corrZSAvsK", 5, 4),
                 ("corrZSDvsDS", 6, 0), ("corrZSAvsDS", 5, 0),
                 ("corrZSDvsASD", 6, 1), ("corrZSAvsASD", 5, 1),
                 ("corrZSDvsASA", 6, 2), ("corrZSAvsASA", 5, 2),
                 ("corrZSDvsZSA", 5, 6)]
        for name, m, n in pairs:
            v = sc.get_param(name)
            c[..., m, n] = v
            c[..., n, m] = v
        self._cross_lsp_corr_sqrt = _cholesky_psd(c)

    def _compute_lsp_spatial_correlation_sqrt(self):
        """Spatial exp(-d/D) correlation over UT pairs sharing the same
        state, one matrix per LSP (reference lsp.py:292).
        Shape: [batch, num_bs, 7, num_ut, num_ut]."""
        sc = self._scenario
        indoor = np.broadcast_to(sc.indoor[:, None, :],
                                 (sc.batch_size, sc.num_bs, sc.num_ut))
        los_ut = sc.los
        nlos_ut = ~sc.los & ~indoor

        same_state = (
            (los_ut[..., :, None] & los_ut[..., None, :])
            | (nlos_ut[..., :, None] & nlos_ut[..., None, :])
            | (indoor[..., :, None] & indoor[..., None, :]))

        eye = np.eye(sc.num_ut, dtype=sc.np_rdtype)
        filtering = np.where(same_state, 1.0, eye)

        ut_dist_2d = sc.matrix_ut_distance_2d[:, None, :, :]  # [b,1,u,u]

        mats = []
        for name in ("corrDistDS", "corrDistASD", "corrDistASA",
                     "corrDistSF", "corrDistK", "corrDistZSA",
                     "corrDistZSD"):
            # Row UT's correlation distance; same-state pairs share the
            # same parameter value, so the matrix stays symmetric.
            scaling = (-1. / sc.get_param(name))[..., :, None]  # [b,s,u,1]
            mats.append(np.exp(ut_dist_2d * scaling) * filtering)
        # [b, s, 7, u, u]
        corr = np.stack(mats, axis=2)
        self._spatial_lsp_corr_sqrt = _cholesky_psd(corr)

    def _o2i_loss(self, key, l_glass_a, l_glass_b, glass_frac, std_db):
        """O2I penetration loss (7.4.3.1).  Parameterized over the low
        (standard glass) and high (IIR glass) loss models
        (reference lsp.py:393,449)."""
        if key is None:
            key = config.next_key()
        sc = self._scenario
        fc = sc.carrier_frequency / 1e9  # GHz

        l_glass = l_glass_a + l_glass_b * fc
        l_concrete = 5. + 4. * fc
        pl_tw = 5.0 - 10. * np.log10(
            glass_frac * 10 ** (-l_glass / 10.0)
            + (1. - glass_frac) * 10 ** (-l_concrete / 10.0))

        indoor_mask = jnp.asarray(
            sc.indoor[:, None, :].astype(sc.np_rdtype), self.rdtype)
        pl_tw = pl_tw * indoor_mask
        pl_in = 0.5 * jnp.asarray(sc.distance_2d_in, self.rdtype)
        pl_rnd = std_db * jax.random.normal(
            key, (sc.batch_size, sc.num_bs, sc.num_ut), self.rdtype)
        return pl_tw + pl_in + pl_rnd * indoor_mask
