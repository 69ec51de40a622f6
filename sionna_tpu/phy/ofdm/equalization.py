"""OFDM MIMO equalization (reference:
src/sionna/phy/ofdm/equalization.py:17,277,346,405; fresh JAX
implementations)."""

import jax.numpy as jnp

from ..block import Block
from ..mimo import (lmmse_equalizer, zf_equalizer, mf_equalizer,
                    lmmse_matrix)
from ..utils.tensors import flatten_dims, split_dim, expand_to_rank
from ..utils.linalg import inv_cholesky
from .detection import OFDMDetector

__all__ = ["OFDMEqualizer", "LMMSEEqualizer", "ZFEqualizer",
           "MFEqualizer", "PostEqualizationSINR",
           "LMMSEPostEqualizationSINR"]


class OFDMEqualizer(OFDMDetector):
    """Wraps a per-RE MIMO equalizer function for OFDM resource grids
    (reference equalization.py:17).

    Output: (x_hat [b, num_tx, num_streams, num_data_symbols],
    no_eff same shape).
    """

    def __init__(self, equalizer, resource_grid, stream_management,
                 precision=None, **kwargs):
        if not callable(equalizer):
            raise TypeError("equalizer must be callable.")

        def detector(y, h, s):
            x_hat, no_eff = equalizer(y, h, s,
                                      precision=self.precision)
            # stack on a trailing dim so the base class extraction
            # applies to both
            return jnp.stack(
                [x_hat, no_eff.astype(x_hat.dtype)], axis=-1)

        super().__init__(detector, "symbol", resource_grid,
                         stream_management, precision=precision,
                         **kwargs)

    def call(self, y, h_hat, err_var, no):
        y_dt, h_desired, s = self._preprocess_inputs(y, h_hat, err_var,
                                                     no)
        z = self._detector(y_dt, h_desired, s)
        z = self._extract_datasymbols(z)  # [b, tx, s, n_data, 2]
        x_hat = z[..., 0]
        no_eff = jnp.real(z[..., 1])
        return x_hat, no_eff


class LMMSEEqualizer(OFDMEqualizer):
    """LMMSE OFDM equalizer (reference equalization.py:277).

    TPU fast path: for small antenna/stream counts the per-RE
    matrices are unrolled into "planes" (see utils.linalg) so the
    whole equalizer is elementwise VPU work plus one one-hot MXU
    extraction - no [..., m, m] tensors with lane-padding waste."""

    # plane path unrolls matrix loops; cap the unroll size
    _PLANE_MAX_DIM = 8

    def __init__(self, resource_grid, stream_management,
                 whiten_interference=True, precision=None, **kwargs):
        def eq(y, h, s, precision=None):
            return lmmse_equalizer(y, h, s,
                                   whiten_interference=whiten_interference,
                                   precision=precision)
        super().__init__(eq, resource_grid, stream_management,
                         precision=precision, **kwargs)
        self._whiten_interference = whiten_interference

    def call(self, y, h_hat, err_var, no):
        sm = self._stream_management
        if (self._whiten_interference and self._use_onehot_extract
                and jnp.asarray(y).shape[2] <= self._PLANE_MAX_DIM
                and sm.num_streams_per_rx <= self._PLANE_MAX_DIM):
            return self._call_planes(y, h_hat, err_var, no)
        return super().call(y, h_hat, err_var, no)

    def _call_planes(self, y, h_hat, err_var, no):
        from ..mimo.equalization import lmmse_planes
        sm = self._stream_management
        y = jnp.asarray(y, self.cdtype)
        h_hat = jnp.asarray(h_hat, self.cdtype)
        err_var = jnp.asarray(err_var, self.rdtype)
        no = jnp.asarray(no, self.rdtype)

        y_eff = self._removed_nulled_scs(y)  # [b, rx, rxa, sym, eff]
        ev = jnp.broadcast_to(err_var, h_hat.shape)
        m = y_eff.shape[2]
        t_s = sm.num_streams_per_tx
        no3 = jnp.broadcast_to(expand_to_rank(no, 3, -1),
                               y.shape[:3])  # [b, rx, rxa]

        des = [int(q) for q in sm.detection_desired_ind]
        und = [int(q) for q in sm.detection_undesired_ind]

        x_planes = [None] * (sm.num_rx * sm.num_streams_per_rx)
        ne_planes = [None] * (sm.num_rx * sm.num_streams_per_rx)
        for r in range(sm.num_rx):
            per_rx = sm.num_tx * t_s
            d_pairs = [(int(q) % per_rx // t_s, int(q) % t_s)
                       for q in des if int(q) // per_rx == r]
            u_pairs = [(int(q) % per_rx // t_s, int(q) % t_s)
                       for q in und if int(q) // per_rx == r]
            h_pl = [[h_hat[:, r, i, t, s] for (t, s) in d_pairs]
                    for i in range(m)]
            y_pl = [y_eff[:, r, i] for i in range(m)]
            # csi error power summed over every stream, on the diag
            csi = [jnp.sum(ev[:, r, i], axis=(1, 2))
                   if ev.shape[3] * ev.shape[4] > 1
                   else ev[:, r, i, 0, 0]
                   for i in range(m)]
            s_pl = [[None] * m for _ in range(m)]
            for i in range(m):
                for j in range(i, m):
                    acc = jnp.zeros_like(y_pl[0])
                    for (t, s) in u_pairs:
                        acc = acc + (h_hat[:, r, i, t, s]
                                     * jnp.conjugate(h_hat[:, r, j, t, s]))
                    if i == j:
                        diag = no3[:, r, i][:, None, None] + csi[i]
                        acc = acc + diag.astype(acc.dtype)
                    s_pl[i][j] = acc
                    if i != j:
                        s_pl[j][i] = jnp.conjugate(acc)
            x_r, ne_r = lmmse_planes(y_pl, h_pl, s_pl)
            for k_r in range(len(x_r)):
                x_planes[r * sm.num_streams_per_rx + k_r] = x_r[k_r]
                ne_planes[r * sm.num_streams_per_rx + k_r] = ne_r[k_r]

        x_hat = self._extract_stream_planes(x_planes)
        no_eff = self._extract_stream_planes(ne_planes)
        return x_hat, no_eff


class ZFEqualizer(OFDMEqualizer):
    """ZF OFDM equalizer (reference equalization.py:346)."""

    def __init__(self, resource_grid, stream_management, precision=None,
                 **kwargs):
        super().__init__(zf_equalizer, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class MFEqualizer(OFDMEqualizer):
    """MF OFDM equalizer (reference equalization.py:405)."""

    def __init__(self, resource_grid, stream_management, precision=None,
                 **kwargs):
        super().__init__(mf_equalizer, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class PostEqualizationSINR(Block):
    """Abstract block computing the per-stream SINR after equalization
    from an effective precoded channel (reference
    equalization.py:464).

    Input: h_eff [b, rx, rxa, tx, streams_per_tx, sym, n_eff_sc],
    no (broadcastable), optional h_eff_hat.  Output: sinr
    [b, sym, n_eff_sc, rx, streams_per_rx].
    """

    def __init__(self, resource_grid, stream_management,
                 precision=None):
        super().__init__(precision=precision)
        self._resource_grid = resource_grid
        self._stream_management = stream_management

    def get_per_rx_channels(self, h_eff):
        """Splits the effective channel into desired / undesired
        streams per receiver (reference equalization.py:574).

        Returns (h_eff_desired [b, rx, sym, sc, rxa, streams_per_rx],
        h_eff_undesired [b, rx, sym, sc, rxa, n_interf])."""
        sm = self._stream_management
        # [rx, tx, streams_per_tx, b, rxa, sym, sc]
        h = jnp.transpose(h_eff, (1, 3, 4, 0, 2, 5, 6))
        h = flatten_dims(h, 3, axis=0)
        h_des = jnp.take(h, jnp.asarray(sm.detection_desired_ind),
                         axis=0)
        h_und = jnp.take(h, jnp.asarray(sm.detection_undesired_ind),
                         axis=0)
        h_des = split_dim(h_des, [sm.num_rx, sm.num_streams_per_rx], 0)
        h_und = split_dim(h_und, [sm.num_rx, -1], 0)
        # [b, rx, sym, sc, rxa, streams]
        h_des = jnp.transpose(h_des, (2, 0, 4, 5, 3, 1))
        h_und = jnp.transpose(h_und, (2, 0, 4, 5, 3, 1))
        return h_des, h_und

    def compute_interference_covariance_matrix(self, no=None,
                                               h_eff_undesired=None):
        """S = diag(no) + H_u H_u^H (reference equalization.py:627)."""
        s = 0.
        if no is not None:
            s = s + jnp.vectorize(jnp.diag,
                                  signature="(n)->(n,n)")(
                jnp.asarray(no, self.rdtype)).astype(self.cdtype)
        if h_eff_undesired is not None:
            s = s + jnp.matmul(
                h_eff_undesired,
                jnp.conjugate(jnp.swapaxes(h_eff_undesired, -2, -1)))
        return s

    def compute_desired_signal_power(self, h_eff_desired, f):
        """|f_s^H h_s|^2 per stream (reference equalization.py:659)."""
        p = jnp.einsum("...mn,...nm->...m", f, h_eff_desired)
        return jnp.abs(p) ** 2

    def compute_total_power(self, h_eff_desired, h_eff_undesired, f):
        """sum_s' |f^H h_s'|^2 (reference equalization.py:684)."""
        h_all = jnp.concatenate([h_eff_desired, h_eff_undesired],
                                axis=-1)
        return jnp.sum(jnp.abs(jnp.matmul(f, h_all)) ** 2, axis=-1)

    def compute_noise_power(self, no, f):
        """sigma^2 ||f||^2 (reference equalization.py:711)."""
        no = jnp.asarray(no, self.rdtype)[..., None, :]
        return jnp.sum(jnp.abs(f) ** 2 * no, axis=-1)

    def compute_sinr(self, h_eff_desired, h_eff_undesired, no, f):
        """SINR_s = u_s / (v_s + n_s) (reference
        equalization.py:727)."""
        signal_power = self.compute_desired_signal_power(
            h_eff_desired, f)
        total_power = self.compute_total_power(
            h_eff_desired, h_eff_undesired, f)
        interference = jnp.maximum(total_power - signal_power, 0.)
        noise_power = self.compute_noise_power(no, f)
        den = interference + noise_power
        sinr = jnp.where(den > 0., signal_power / den, 0.)
        # [b, sym, sc, rx, streams_per_rx]
        return jnp.transpose(sinr, (0, 2, 3, 1, 4))

    def call(self, h_eff, no, h_eff_hat=None):
        raise NotImplementedError


class LMMSEPostEqualizationSINR(PostEqualizationSINR):
    """SINR after LMMSE equalization with optional interference
    whitening (reference equalization.py:758)."""

    def call(self, h_eff, no, h_eff_hat=None,
             interference_whitening=True):
        if h_eff_hat is None:
            h_eff_hat = h_eff
        h_eff = jnp.asarray(h_eff, self.cdtype)
        h_eff_hat = jnp.asarray(h_eff_hat, self.cdtype)

        no = expand_to_rank(jnp.asarray(no, self.rdtype), 5, axis=-1)
        no = jnp.broadcast_to(
            no, (h_eff.shape[0], h_eff.shape[1], h_eff.shape[2],
                 h_eff.shape[5], h_eff.shape[6]))
        # [b, rx, sym, sc, rxa]
        no = jnp.transpose(no, (0, 1, 3, 4, 2))

        h_des, h_und = self.get_per_rx_channels(h_eff_hat)
        if interference_whitening:
            s = self.compute_interference_covariance_matrix(
                no=no, h_eff_undesired=h_und)
        else:
            s = self.compute_interference_covariance_matrix(no=no)

        l_inv = inv_cholesky(s)
        h_des = jnp.matmul(l_inv, h_des)
        h_und = jnp.matmul(l_inv, h_und)

        f = lmmse_matrix(h_des, precision=self.precision)
        return self.compute_sinr(h_des, h_und, jnp.ones_like(no), f)
