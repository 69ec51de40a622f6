"""OFDM detection: grid-aware wrappers of the MIMO detectors
(reference: src/sionna/phy/ofdm/detection.py:20,319,524,627,740,849,
969,1062; fresh JAX implementations)."""

import numpy as np

import jax.numpy as jnp

from ..block import Block
from ..utils.tensors import (expand_to_rank, flatten_last_dims,
                             flatten_dims, split_dim)
from ..mimo import detection as mimo_detection
from .resource_grid import RemoveNulledSubcarriers

__all__ = ["OFDMDetector", "OFDMDetectorWithPrior", "LinearDetector",
           "MaximumLikelihoodDetector", "MaximumLikelihoodDetectorWithPrior",
           "KBestDetector", "EPDetector", "MMSEPICDetector"]


class OFDMDetector(Block):
    """Wraps a per-RE MIMO detector for OFDM resource grids
    (reference detection.py:20).

    Inputs (y, h_hat, err_var, no); see reference docstring for
    shapes. Output: per-stream bits [b, num_tx, num_streams,
    n_data*nbps] or symbols.
    """

    def __init__(self, detector, output, resource_grid,
                 stream_management, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._detector = detector
        self._resource_grid = resource_grid
        self._stream_management = stream_management
        self._removed_nulled_scs = RemoveNulledSubcarriers(
            resource_grid, precision=self.precision)
        self._output = output
        mask = np.array(resource_grid.pilot_pattern.mask)
        num_data_symbols = resource_grid.pilot_pattern.num_data_symbols
        mask_flat = mask.reshape(mask.shape[:-2] + (-1,))
        # stable sort: data positions (mask==0) first, in row-major
        # order
        data_ind = np.argsort(mask_flat, axis=-1, kind="stable")
        self._data_ind = data_ind[..., :num_data_symbols]
        self._build_extract_layout(mask)

    # One-hot matrices above this element count fall back to the
    # gather path (memory guard for very large grids).
    _ONEHOT_BUDGET = 2**25

    def _build_extract_layout(self, mask):
        """TPU fast path for data-RE extraction: per OFDM symbol the
        data REs are pulled out with a one-hot [eff, eff] matmul
        (MXU) instead of a minor-axis gather, keeping the batch dim
        leading throughout.  Exact in f32 (each output is a single
        input value).  ``mask``: [tx, s, sym, eff]."""
        t, s, n_sym, eff = mask.shape
        self._use_onehot_extract = (t * s * n_sym * eff * eff
                                    <= self._ONEHOT_BUDGET)
        if not self._use_onehot_extract:
            return
        onehot = np.zeros((t, s, n_sym, eff, eff), np.float32)
        counts = np.zeros((t, s, n_sym), np.int64)
        # contiguous data runs bypass the matmul entirely: a symbol
        # whose data REs are consecutive (all-data symbols of a
        # kronecker grid, guard-band interiors) is extracted with one
        # static slice -- the identity-matrix einsum it replaces cost
        # ~13 GFLOP per flagship Monte-Carlo iteration
        slices = [[[None] * n_sym for _ in range(s)] for _ in range(t)]
        for i in range(t):
            for j in range(s):
                for y in range(n_sym):
                    d_sc = np.where(mask[i, j, y] == 0)[0]
                    onehot[i, j, y, d_sc, np.arange(len(d_sc))] = 1.
                    counts[i, j, y] = len(d_sc)
                    if len(d_sc) > 0 and np.array_equal(
                            d_sc, np.arange(d_sc[0],
                                            d_sc[0] + len(d_sc))):
                        slices[i][j][y] = (int(d_sc[0]), len(d_sc))
        self._extract_onehot = onehot
        self._extract_counts = counts
        self._extract_slices = slices

    def _extract_datasymbols_onehot(self, z):
        """z: [b, rx, sym, eff, s_rx] or [..., d]; returns
        [b, tx, s_tx, n_data(, d)] (flattened over d for "bit")."""
        from jax import lax
        sm = self._stream_management
        rank_extended = z.ndim < 6
        z = expand_to_rank(z, 6, -1)  # [b, rx, sym, eff, s_rx, d]
        b = z.shape[0]
        d = z.shape[-1]
        n_sym, eff = z.shape[2], z.shape[3]
        # -> [b, rx, s_rx, d, sym, eff]: batch stays leading, eff
        # stays minor (lane-friendly)
        z = jnp.transpose(z, (0, 1, 4, 5, 2, 3))
        z = jnp.reshape(z, (b, -1, d, n_sym, eff))  # [b, rx*s_rx, ...]
        z = jnp.take(z, jnp.asarray(sm.stream_ind), axis=1)
        z = jnp.reshape(z, (b, sm.num_tx, sm.num_streams_per_tx,
                            d, n_sym, eff))
        is_complex = jnp.iscomplexobj(z)
        outs = []
        for i in range(sm.num_tx):
            for j in range(sm.num_streams_per_tx):
                zs = z[:, i, j]  # [b, d, sym, eff]
                sl = self._extract_slices[i][j]
                need_mm = any(sl[y] is None
                              and int(self._extract_counts[i, j, y]) > 0
                              for y in range(n_sym))
                if need_mm:
                    m = jnp.asarray(self._extract_onehot[i, j])

                    def mm(x):
                        return jnp.einsum(
                            "bdyf,yfg->bdyg", x, m,
                            precision=lax.Precision.HIGHEST)

                    if is_complex:
                        slots = lax.complex(mm(jnp.real(zs)),
                                            mm(jnp.imag(zs)))
                    else:
                        slots = mm(zs)
                parts = []
                for y in range(n_sym):
                    c = int(self._extract_counts[i, j, y])
                    if c == 0:
                        continue
                    if sl[y] is not None:
                        st, c2 = sl[y]
                        parts.append(zs[:, :, y, st:st + c2])
                    else:
                        parts.append(slots[:, :, y, :c])
                outs.append(jnp.concatenate(parts, axis=-1)
                            if len(parts) > 1 else parts[0])
        out = jnp.stack(outs, axis=1)  # [b, t*s, d, n_data]
        n_data = out.shape[-1]
        out = jnp.reshape(out, (b, sm.num_tx, sm.num_streams_per_tx,
                                d, n_data))
        out = jnp.swapaxes(out, -2, -1)  # [b, t, s, n_data, d]
        if self._output == "bit":
            out = flatten_dims(out, 2, 3)
        elif rank_extended:
            out = out[..., 0]
        return out

    def _preprocess_inputs(self, y, h_hat, err_var, no):
        sm = self._stream_management
        y = jnp.asarray(y, self.cdtype)
        h_hat = jnp.asarray(h_hat, self.cdtype)
        err_var = jnp.asarray(err_var, self.rdtype)
        no = jnp.asarray(no, self.rdtype)

        # [b, rx, sym, eff, rxa]
        y_eff = self._removed_nulled_scs(y)
        y_dt = jnp.transpose(y_eff, (0, 1, 3, 4, 2))

        # error variances: [b, rx, sym, eff, rxa, tx*s]
        err_var_dt = jnp.broadcast_to(err_var, h_hat.shape)
        err_var_dt = jnp.transpose(err_var_dt, (0, 1, 5, 6, 2, 3, 4))
        err_var_dt = flatten_last_dims(err_var_dt, 2)

        # desired/undesired channels
        h_dt = jnp.transpose(h_hat, (1, 3, 4, 0, 2, 5, 6))
        h_dt = flatten_dims(h_dt, 3, 0)  # [rx*tx*s, b, rxa, sym, eff]
        h_desired = jnp.take(h_dt,
                             jnp.asarray(sm.detection_desired_ind),
                             axis=0)
        h_undesired = jnp.take(h_dt,
                               jnp.asarray(sm.detection_undesired_ind),
                               axis=0)
        h_desired = split_dim(h_desired,
                              [sm.num_rx, sm.num_streams_per_rx], 0)
        h_undesired = split_dim(h_undesired, [sm.num_rx, -1], 0)
        # -> [b, rx, sym, eff, rxa, streams]
        h_desired = jnp.transpose(h_desired, (2, 0, 4, 5, 3, 1))
        h_undesired = jnp.transpose(h_undesired, (2, 0, 4, 5, 3, 1))

        # noise-plus-interference covariance
        no3 = jnp.broadcast_to(expand_to_rank(no, 3, -1), y.shape[:3])
        no_dt = jnp.broadcast_to(no3[:, :, None, None, :], y_dt.shape)
        s_inf = jnp.matmul(
            h_undesired,
            jnp.conjugate(jnp.swapaxes(h_undesired, -2, -1)))
        eye = jnp.eye(y_dt.shape[-1], dtype=self.cdtype)
        s_no = no_dt[..., None] * eye
        s_csi = jnp.sum(err_var_dt, -1)[..., None] * eye
        s = s_inf + s_no.astype(self.cdtype) + s_csi.astype(self.cdtype)
        return y_dt, h_desired, s

    def _extract_stream_planes(self, planes):
        """Data-RE extraction for plane-based detectors.

        ``planes``: list over rx*streams_per_rx (row-major (rx, s_rx))
        of [b, sym, eff] arrays.  Returns [b, tx, s_tx, n_data]
        (requires the one-hot layout; callers check
        ``_use_onehot_extract``)."""
        from jax import lax
        sm = self._stream_management
        ordered = [planes[int(i)] for i in np.asarray(sm.stream_ind)]
        outs = []
        for i in range(sm.num_tx):
            for j in range(sm.num_streams_per_tx):
                zs = ordered[i * sm.num_streams_per_tx + j]
                sl = self._extract_slices[i][j]
                n_sym_p = zs.shape[1]
                need_mm = any(sl[y] is None
                              and int(self._extract_counts[i, j, y]) > 0
                              for y in range(n_sym_p))
                if need_mm:
                    m = jnp.asarray(self._extract_onehot[i, j])

                    def mm(x):
                        return jnp.einsum(
                            "byf,yfg->byg", x, m,
                            precision=lax.Precision.HIGHEST)

                    if jnp.iscomplexobj(zs):
                        slots = lax.complex(mm(jnp.real(zs)),
                                            mm(jnp.imag(zs)))
                    else:
                        slots = mm(zs)
                parts = []
                for y in range(n_sym_p):
                    c = int(self._extract_counts[i, j, y])
                    if c == 0:
                        continue
                    if sl[y] is not None:
                        st, c2 = sl[y]
                        parts.append(zs[:, y, st:st + c2])
                    else:
                        parts.append(slots[:, y, :c])
                outs.append(jnp.concatenate(parts, axis=-1)
                            if len(parts) > 1 else parts[0])
        out = jnp.stack(outs, axis=1)
        return jnp.reshape(out, (out.shape[0], sm.num_tx,
                                 sm.num_streams_per_tx, -1))

    def _extract_datasymbols(self, z):
        if self._use_onehot_extract:
            return self._extract_datasymbols_onehot(z)
        sm = self._stream_management
        rank_extended = z.ndim < 6
        z = expand_to_rank(z, 6, -1)
        # [b, rx, sym, eff, s_rx, d] -> [rx, s_rx, sym, eff, d, b]
        z = jnp.transpose(z, (1, 4, 2, 3, 5, 0))
        z = flatten_dims(z, 2, 0)  # [rx*s_rx, sym, eff, d, b]
        z = jnp.take(z, jnp.asarray(sm.stream_ind), axis=0)
        z = split_dim(z, [sm.num_tx, sm.num_streams_per_tx], 0)
        z = flatten_dims(z, 2, 2)  # [tx, s_tx, sym*eff, d, b]
        # gather data REs per (tx, stream)
        idx = jnp.asarray(
            self._data_ind[..., None, None])  # [tx, s, n_data, 1, 1]
        z = jnp.take_along_axis(z, jnp.broadcast_to(
            idx, z.shape[:2] + (idx.shape[2],) + z.shape[3:]), axis=2)
        z = jnp.transpose(z, (4, 0, 1, 2, 3))  # [b, tx, s, n_data, d]
        if self._output == "bit":
            z = flatten_dims(z, 2, 3)
        if rank_extended:
            z = z[..., 0] if self._output != "bit" else z
        return z

    def call(self, y, h_hat, err_var, no):
        y_dt, h_desired, s = self._preprocess_inputs(y, h_hat, err_var,
                                                     no)
        z = self._detector(y_dt, h_desired, s)
        return self._extract_datasymbols(z)


class OFDMDetectorWithPrior(OFDMDetector):
    """OFDM detector wrapper passing priors through to the MIMO
    detector (reference detection.py:319).

    Priors come in two granularities, matching the reference input
    spec (detection.py:1119):

    - per data RE: ``[b, num_tx, s_tx, num_data_symbols*nbps]``
      (``output="bit"``) or ``[b, num_tx, s_tx, num_data_symbols,
      num_points]`` (``output="symbol"``) — the iterative
      detection-and-decoding (IDD) feedback path;
    - per stream: ``[b, num_tx, s_tx, nbps]`` /
      ``[b, num_tx, s_tx, num_points]``, broadcast over all data REs.

    Per-RE priors are scattered back onto the resource grid with a
    precomputed inverse of the data-RE gather (pilot REs get zero
    prior, which is the uninformative value in both LLR and logit
    domains)."""

    def __init__(self, detector, output, resource_grid,
                 stream_management, constellation, precision=None,
                 **kwargs):
        super().__init__(detector, output, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)
        self._constellation = constellation
        # Inverse of the data-RE gather: for each (tx, stream) and
        # flattened grid position sym*eff, the index into the
        # data-symbol list (or n_data for "not a data RE" -> zero pad)
        data_ind = np.asarray(self._data_ind)        # [tx, s, n_data]
        n_data = data_ind.shape[-1]
        mask = np.array(resource_grid.pilot_pattern.mask)
        n_grid = mask.shape[-1] * mask.shape[-2]     # sym * eff
        inv = np.full(data_ind.shape[:-1] + (n_grid,), n_data,
                      np.int32)
        np.put_along_axis(inv, data_ind,
                          np.arange(n_data, dtype=np.int32), axis=-1)
        self._inv_data_ind = inv

    def _priors_to_grid(self, prior, y_dt_shape):
        """Maps user priors onto the detector's RG layout
        [b, rx, sym, eff, s_rx, d]."""
        sm = self._stream_management
        rg = self._resource_grid
        prior = jnp.asarray(prior, self.rdtype)
        n_data = self._data_ind.shape[-1]
        if self._output == "bit":
            d = self._constellation.num_bits_per_symbol
            per_re = prior.shape[-1] != d or n_data * d == d
        else:
            d = prior.shape[-1]
            per_re = prior.ndim >= 5
        b = prior.shape[0]
        if per_re:
            pr = jnp.reshape(prior, (b, sm.num_tx,
                                     sm.num_streams_per_tx, n_data, d))
            # dummy row at index n_data: pilot/guard REs -> zero prior
            pr = jnp.concatenate(
                [pr, jnp.zeros(pr.shape[:3] + (1, d), pr.dtype)],
                axis=3)
            inv = jnp.asarray(self._inv_data_ind)    # [tx, s, grid]
            idx = jnp.broadcast_to(
                inv[None, :, :, :, None],
                (b,) + inv.shape + (d,))
            pr = jnp.take_along_axis(pr, idx, axis=3)
            # [b, tx, s, sym*eff, d] -> rx-stream ordering
            pr = jnp.reshape(pr, (b, -1) + pr.shape[3:])
            pr = jnp.take(pr,
                          jnp.asarray(sm.rx_stream_ids.reshape(-1)),
                          axis=1)
            pr = jnp.reshape(pr, (b, sm.num_rx, sm.num_streams_per_rx,
                                  rg.num_ofdm_symbols, -1, d))
            # [b, rx, s_rx, sym, eff, d] -> [b, rx, sym, eff, s_rx, d]
            return jnp.transpose(pr, (0, 1, 3, 4, 2, 5))
        # per-stream prior, broadcast over REs
        pr = jnp.reshape(prior, (b, -1, d))
        pr = jnp.take(pr, jnp.asarray(sm.rx_stream_ids.reshape(-1)),
                      axis=1)
        pr = jnp.reshape(pr, (b, sm.num_rx, sm.num_streams_per_rx, d))
        pr = pr[:, :, None, None]  # broadcast over sym, eff
        return jnp.broadcast_to(pr, y_dt_shape[:4] + pr.shape[-2:])

    def call(self, y, h_hat, prior, err_var, no):
        y_dt, h_desired, s = self._preprocess_inputs(y, h_hat, err_var,
                                                     no)
        if prior is None:
            z = self._detector(y_dt, h_desired, s)
        else:
            pr = self._priors_to_grid(prior, y_dt.shape)
            z = self._detector(y_dt, h_desired, s, prior=pr)
        return self._extract_datasymbols(z)


class LinearDetector(OFDMDetector):
    """OFDM linear detector (reference detection.py:524)."""

    def __init__(self, equalizer, output, demapping_method,
                 resource_grid, stream_management,
                 constellation_type=None, num_bits_per_symbol=None,
                 constellation=None, hard_out=False, precision=None,
                 **kwargs):
        detector = mimo_detection.LinearDetector(
            equalizer, output, demapping_method,
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, hard_out=hard_out,
            precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class MaximumLikelihoodDetector(OFDMDetector):
    """OFDM ML detector (reference detection.py:627)."""

    def __init__(self, output, demapping_method, resource_grid,
                 stream_management, constellation_type=None,
                 num_bits_per_symbol=None, constellation=None,
                 hard_out=False, precision=None, **kwargs):
        detector = mimo_detection.MaximumLikelihoodDetector(
            output, demapping_method,
            stream_management.num_streams_per_rx,
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, hard_out=hard_out,
            precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class MaximumLikelihoodDetectorWithPrior(OFDMDetectorWithPrior):
    """OFDM ML detector with prior (reference detection.py:740)."""

    def __init__(self, output, demapping_method, resource_grid,
                 stream_management, constellation_type=None,
                 num_bits_per_symbol=None, constellation=None,
                 hard_out=False, precision=None, **kwargs):
        from ..mapping import Constellation
        constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)
        detector = mimo_detection.MaximumLikelihoodDetector(
            output, demapping_method,
            stream_management.num_streams_per_rx,
            constellation=constellation, hard_out=hard_out,
            precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, constellation,
                         precision=precision, **kwargs)


class KBestDetector(OFDMDetector):
    """OFDM K-Best detector (reference detection.py:849)."""

    def __init__(self, output, num_streams, k, resource_grid,
                 stream_management, constellation_type=None,
                 num_bits_per_symbol=None, constellation=None,
                 hard_out=False, use_real_rep=False, list2llr=None,
                 precision=None, **kwargs):
        detector = mimo_detection.KBestDetector(
            output, num_streams, k,
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, hard_out=hard_out,
            use_real_rep=use_real_rep, list2llr=list2llr,
            precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class EPDetector(OFDMDetector):
    """OFDM EP detector (reference detection.py:969)."""

    def __init__(self, output, resource_grid, stream_management,
                 num_bits_per_symbol, hard_out=False, l=10, beta=0.9,
                 precision=None, **kwargs):
        detector = mimo_detection.EPDetector(
            output, num_bits_per_symbol, hard_out=hard_out, l=l,
            beta=beta, precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, precision=precision,
                         **kwargs)


class MMSEPICDetector(OFDMDetectorWithPrior):
    """OFDM MMSE-PIC detector (reference detection.py:1062).

    Soft-input soft-output: ``call(y, h_hat, prior, err_var, no)``
    with ``prior`` the decoder feedback (per data RE, see
    :class:`OFDMDetectorWithPrior`) or ``None`` for the first IDD
    pass."""

    def __init__(self, output, resource_grid, stream_management,
                 demapping_method="maxlog", num_iter=1,
                 constellation_type=None, num_bits_per_symbol=None,
                 constellation=None, hard_out=False, precision=None,
                 **kwargs):
        from ..mapping import Constellation
        constellation = Constellation.check_or_create(
            constellation_type=constellation_type,
            num_bits_per_symbol=num_bits_per_symbol,
            constellation=constellation, precision=precision)
        detector = mimo_detection.MMSEPICDetector(
            output, demapping_method=demapping_method,
            num_iter=num_iter, constellation=constellation,
            hard_out=hard_out, precision=precision)
        super().__init__(detector, output, resource_grid,
                         stream_management, constellation,
                         precision=precision, **kwargs)
