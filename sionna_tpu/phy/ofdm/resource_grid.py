"""OFDM resource grid (reference: src/sionna/phy/ofdm/resource_grid.py:
15,350,414,522; fresh JAX implementations).

TPU design note: the reference maps data/pilots with ``scatter_nd``;
here the mapper is a pure gather - for every resource element a static
source index into ``concat([data, pilots, zero])`` is precomputed on
the host, so the whole grid assembly is one ``take_along_axis``.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..block import Object, Block
from .pilot_pattern import (PilotPattern, EmptyPilotPattern,
                            KroneckerPilotPattern)

__all__ = ["ResourceGrid", "ResourceGridMapper", "ResourceGridDemapper",
           "RemoveNulledSubcarriers"]


class ResourceGrid(Object):
    """Slot geometry: OFDM symbols x subcarriers, guards, DC, pilots."""

    def __init__(self, num_ofdm_symbols, fft_size, subcarrier_spacing,
                 num_tx=1, num_streams_per_tx=1, cyclic_prefix_length=0,
                 num_guard_carriers=(0, 0), dc_null=False,
                 pilot_pattern=None, pilot_ofdm_symbol_indices=None,
                 precision=None):
        super().__init__(precision=precision)
        self._num_ofdm_symbols = int(num_ofdm_symbols)
        self._fft_size = int(fft_size)
        self._subcarrier_spacing = float(subcarrier_spacing)
        self._cyclic_prefix_length = int(cyclic_prefix_length)
        self._num_tx = int(num_tx)
        self._num_streams_per_tx = int(num_streams_per_tx)
        self._num_guard_carriers = np.array(num_guard_carriers, int)
        self._dc_null = bool(dc_null)
        self._pilot_ofdm_symbol_indices = pilot_ofdm_symbol_indices
        self.pilot_pattern = pilot_pattern
        self._check_settings()

    @property
    def cyclic_prefix_length(self):
        return self._cyclic_prefix_length

    @property
    def num_tx(self):
        return self._num_tx

    @property
    def num_streams_per_tx(self):
        return self._num_streams_per_tx

    @property
    def num_ofdm_symbols(self):
        return self._num_ofdm_symbols

    @property
    def num_resource_elements(self):
        return self._fft_size * self._num_ofdm_symbols

    @property
    def num_effective_subcarriers(self):
        return (self._fft_size - self._dc_null
                - int(np.sum(self._num_guard_carriers)))

    @property
    def effective_subcarrier_ind(self):
        """Indices of non-guard, non-DC subcarriers."""
        num_gc = self._num_guard_carriers
        sc_ind = np.arange(num_gc[0], self.fft_size - num_gc[1])
        if self.dc_null:
            sc_ind = np.delete(sc_ind, self.dc_ind - num_gc[0])
        return sc_ind

    @property
    def num_data_symbols(self):
        return (self.num_effective_subcarriers * self._num_ofdm_symbols
                - self.num_pilot_symbols)

    @property
    def num_pilot_symbols(self):
        return int(self.pilot_pattern.num_pilot_symbols)

    @property
    def num_zero_symbols(self):
        return ((self._fft_size - self.num_effective_subcarriers)
                * self._num_ofdm_symbols)

    @property
    def num_guard_carriers(self):
        return self._num_guard_carriers

    @property
    def dc_ind(self):
        return int(self._fft_size / 2 - (self._fft_size % 2 == 1) / 2)

    @property
    def fft_size(self):
        return self._fft_size

    @property
    def subcarrier_spacing(self):
        return self._subcarrier_spacing

    @property
    def ofdm_symbol_duration(self):
        return ((1. + self.cyclic_prefix_length / self.fft_size)
                / self.subcarrier_spacing)

    @property
    def bandwidth(self):
        return self.fft_size * self.subcarrier_spacing

    @property
    def num_time_samples(self):
        return ((self.fft_size + self.cyclic_prefix_length)
                * self._num_ofdm_symbols)

    @property
    def dc_null(self):
        return self._dc_null

    @property
    def pilot_pattern(self):
        return self._pilot_pattern

    @pilot_pattern.setter
    def pilot_pattern(self, value):
        if value is None or (isinstance(value, str) and value == "empty"):
            value = EmptyPilotPattern(self._num_tx,
                                      self._num_streams_per_tx,
                                      self._num_ofdm_symbols,
                                      self.num_effective_subcarriers,
                                      precision=self.precision)
        elif isinstance(value, str) and value == "kronecker":
            if self._pilot_ofdm_symbol_indices is None:
                raise ValueError(
                    "pilot_ofdm_symbol_indices must be provided for "
                    "kronecker pilot pattern.")
            value = KroneckerPilotPattern(
                self, self._pilot_ofdm_symbol_indices,
                precision=self.precision)
        elif not isinstance(value, PilotPattern):
            raise ValueError("Unsupported pilot_pattern")
        self._pilot_pattern = value

    def _check_settings(self):
        if self._num_ofdm_symbols <= 0:
            raise ValueError("num_ofdm_symbols must be positive.")
        if self.num_effective_subcarriers <= 0:
            raise ValueError("No effective subcarriers left.")
        if self.cyclic_prefix_length > self.fft_size:
            raise ValueError(
                "cyclic_prefix_length cannot be longer than fft_size.")
        pp = self._pilot_pattern
        if (pp.num_tx != self._num_tx
                or pp.num_streams_per_tx != self._num_streams_per_tx
                or pp.num_ofdm_symbols != self._num_ofdm_symbols
                or pp.num_effective_subcarriers
                != self.num_effective_subcarriers):
            raise ValueError(
                "pilot_pattern is inconsistent with the resource grid.")

    def build_type_grid(self):
        """[num_tx, num_streams_per_tx, num_ofdm_symbols, fft_size]
        int: 0=data, 1=pilot, 2=guard, 3=DC."""
        mask = self.pilot_pattern.mask  # [tx, s, sym, eff]
        shape = mask.shape[:3]
        gc_l = 2 * np.ones(shape + (self._num_guard_carriers[0],), int)
        gc_r = 2 * np.ones(shape + (self._num_guard_carriers[1],), int)
        dc = 3 * np.ones(shape + (int(self._dc_null),), int)
        split_ind = self.dc_ind - self._num_guard_carriers[0]
        return np.concatenate(
            [gc_l, mask[..., :split_ind], dc, mask[..., split_ind:],
             gc_r], -1)

    def show(self, tx_ind=0, tx_stream_ind=0):
        import matplotlib.pyplot as plt
        grid = self.build_type_grid()[tx_ind, tx_stream_ind]
        fig, ax = plt.subplots()
        cmap = plt.cm.get_cmap("tab10", 4) if hasattr(plt.cm, "get_cmap") \
            else "tab10"
        ax.imshow(grid.T, origin="lower", aspect="auto", cmap=cmap)
        ax.set_xlabel("OFDM Symbol")
        ax.set_ylabel("Subcarrier")
        return fig


class ResourceGridMapper(Block):
    """Maps data symbols (+ pilots) onto the resource grid
    (reference resource_grid.py:350).

    Input [batch, num_tx, num_streams_per_tx, num_data_symbols] ->
    [batch, num_tx, num_streams_per_tx, num_ofdm_symbols, fft_size].
    """

    # One-hot matrices above this element count fall back to the
    # gather path (memory guard for very large grids).
    _ONEHOT_BUDGET = 2**25

    def __init__(self, resource_grid, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._resource_grid = resource_grid
        rg = resource_grid
        rg_type = rg.build_type_grid()  # [tx, s, sym, fft]
        n_data = rg.num_data_symbols
        n_pil = rg.num_pilot_symbols
        # per (tx, stream): source index into concat([data, pilots,
        # zero]) for each (sym, subcarrier)
        src = np.full(rg_type.shape, n_data + n_pil, np.int32)
        for i in range(rg.num_tx):
            for j in range(rg.num_streams_per_tx):
                flat = rg_type[i, j].reshape(-1)
                d_pos = np.where(flat == 0)[0]
                p_pos = np.where(flat == 1)[0]
                s = src[i, j].reshape(-1)
                s[d_pos] = np.arange(len(d_pos))
                s[p_pos] = n_data + np.arange(len(p_pos))
                src[i, j] = s.reshape(rg_type.shape[2:])
        self._src_idx = src.reshape(rg.num_tx,
                                    rg.num_streams_per_tx, -1)
        self._build_onehot_layout(rg, rg_type, n_data)

    def _build_onehot_layout(self, rg, rg_type, n_data):
        """TPU fast path: grid assembly as one batched MXU matmul.

        Data (and pilot) symbols fill the grid in resource-element
        scan order, so within one OFDM symbol the data sources are a
        contiguous range of the data vector and the pilot sources a
        contiguous range of the pilot vector.  Per (tx, stream, sym)
        the two static slices are concatenated, zero-padded to
        ``fft_size`` and pushed through a per-symbol one-hot
        [fft, fft] matrix.  One-hot matmuls are exact in f32 (each
        output is a single input value), so this is numerically
        identical to the gather path while running on the MXU instead
        of the (slow) minor-axis gather unit.
        """
        t, s, n_sym, fft = rg_type.shape
        self._use_onehot = (t * s * n_sym * fft * fft
                            <= self._ONEHOT_BUDGET)
        if not self._use_onehot:
            return
        # ranges[t][s][sym] = (d0, d1, p0, p1)
        ranges = np.zeros((t, s, n_sym, 4), np.int64)
        onehot = np.zeros((t, s, n_sym, fft, fft), np.float32)
        for i in range(t):
            for j in range(s):
                d_seen = p_seen = 0
                for y in range(n_sym):
                    row = rg_type[i, j, y]
                    d_sc = np.where(row == 0)[0]
                    p_sc = np.where(row == 1)[0]
                    nd, npil = len(d_sc), len(p_sc)
                    ranges[i, j, y] = (d_seen, d_seen + nd,
                                       p_seen, p_seen + npil)
                    onehot[i, j, y, np.arange(nd), d_sc] = 1.
                    onehot[i, j, y, nd + np.arange(npil), p_sc] = 1.
                    d_seen += nd
                    p_seen += npil
        self._onehot = onehot
        self._ranges = ranges

    def _call_onehot(self, x, pilots):
        """x: [batch, tx, s, n_data] cdtype; pilots: [tx, s, n_pil]."""
        rg = self._resource_grid
        t, s = rg.num_tx, rg.num_streams_per_tx
        n_sym, fft = rg.num_ofdm_symbols, rg.fft_size
        batch = x.shape[0]
        pilots = jnp.broadcast_to(pilots, (batch,) + tuple(pilots.shape))
        # assemble [batch, tx, s, n_sym, fft] per-symbol source rows
        rows = []
        for i in range(t):
            for j in range(s):
                sym_rows = []
                for y in range(n_sym):
                    d0, d1, p0, p1 = (int(v)
                                      for v in self._ranges[i, j, y])
                    parts = []
                    if d1 > d0:
                        parts.append(x[:, i, j, d0:d1])
                    if p1 > p0:
                        parts.append(pilots[:, i, j, p0:p1])
                    used = (d1 - d0) + (p1 - p0)
                    if used < fft:
                        parts.append(jnp.zeros((batch, fft - used),
                                               x.dtype))
                    sym_rows.append(jnp.concatenate(parts, axis=-1)
                                    if len(parts) > 1 else parts[0])
                rows.append(jnp.stack(sym_rows, axis=1))
        # [batch, tx*s, n_sym, fft]
        src = jnp.stack(rows, axis=1)
        src = jnp.reshape(src, (batch, t, s, n_sym, fft))
        m = jnp.asarray(self._onehot.reshape(t, s, n_sym, fft, fft))
        # HIGHEST keeps the one-hot matmul bit-exact in f32 (bf16x3
        # splitting); DEFAULT would truncate operands to bf16.
        grid_re = jnp.einsum("btsyj,tsyjf->btsyf", jnp.real(src), m,
                             precision=lax.Precision.HIGHEST)
        grid_im = jnp.einsum("btsyj,tsyjf->btsyf", jnp.imag(src), m,
                             precision=lax.Precision.HIGHEST)
        return lax.complex(grid_re, grid_im).astype(x.dtype)

    def call(self, inputs):
        rg = self._resource_grid
        x = jnp.asarray(inputs, self.cdtype)
        batch = x.shape[0]
        pilots = jnp.asarray(self._resource_grid.pilot_pattern.pilots,
                             self.cdtype)  # [tx,s,P]
        if self._use_onehot:
            return self._call_onehot(x, pilots)
        pilots = jnp.broadcast_to(pilots,
                                  (batch,) + tuple(pilots.shape))
        zero = jnp.zeros(x.shape[:3] + (1,), self.cdtype)
        src_vals = jnp.concatenate([x, pilots, zero], axis=-1)
        idx = jnp.broadcast_to(jnp.asarray(self._src_idx)[None],
                               (batch,) + tuple(self._src_idx.shape))
        grid = jnp.take_along_axis(src_vals, idx, axis=-1)
        return jnp.reshape(
            grid, (batch, rg.num_tx, rg.num_streams_per_tx,
                   rg.num_ofdm_symbols, rg.fft_size))


class ResourceGridDemapper(Block):
    """Extracts data-carrying REs from a resource grid
    (reference resource_grid.py:414).

    Input [batch, num_rx, num_streams_per_rx, num_ofdm_symbols,
    fft_size(, data_dim)] -> [batch, num_tx, num_streams_per_tx,
    num_data_symbols(, data_dim)].
    """

    def __init__(self, resource_grid, stream_management, precision=None,
                 **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._resource_grid = resource_grid
        self._stream_management = stream_management
        rg = resource_grid
        rg_type = rg.build_type_grid()
        # per (tx, stream) flat positions of data REs
        data_pos = np.stack(
            [[np.where(rg_type[i, j].reshape(-1) == 0)[0]
              for j in range(rg.num_streams_per_tx)]
             for i in range(rg.num_tx)])
        self._data_pos = data_pos.astype(np.int32)
        self._stream_ind = np.asarray(stream_management.stream_ind,
                                      np.int32)

    def call(self, y):
        rg = self._resource_grid
        y = jnp.asarray(y)
        has_data_dim = (y.ndim == 6)
        if not has_data_dim:
            y = y[..., None]
        batch = y.shape[0]
        data_dim = y.shape[-1]
        # [batch, num_rx*num_streams_per_rx, sym*fft, d] ->
        # reorder to tx-stream order
        y = jnp.reshape(y, (batch, -1, rg.num_ofdm_symbols * rg.fft_size,
                            data_dim))
        y = jnp.take(y, jnp.asarray(self._stream_ind), axis=1)
        y = jnp.reshape(y, (batch, rg.num_tx, rg.num_streams_per_tx,
                            rg.num_ofdm_symbols * rg.fft_size, data_dim))
        idx = jnp.broadcast_to(
            jnp.asarray(self._data_pos)[None, ..., None],
            (batch,) + tuple(self._data_pos.shape) + (data_dim,))
        out = jnp.take_along_axis(y, idx, axis=3)
        if not has_data_dim:
            out = out[..., 0]
        return out


class RemoveNulledSubcarriers(Block):
    """Removes guard and DC subcarriers from a full resource grid
    (reference resource_grid.py:522).

    Input [..., fft_size] -> [..., num_effective_subcarriers].
    """

    def __init__(self, resource_grid, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        self._sc_ind = np.asarray(resource_grid.effective_subcarrier_ind,
                                  np.int32)

    def call(self, inputs):
        return jnp.take(jnp.asarray(inputs), jnp.asarray(self._sc_ind),
                        axis=-1)
