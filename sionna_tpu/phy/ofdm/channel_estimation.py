"""OFDM channel estimation (reference:
src/sionna/phy/ofdm/channel_estimation.py:20,175,323,437,736,1367;
fresh JAX implementations).

TPU design: every interpolator is precomputed host-side into either a
static gather map (nearest neighbor) or a dense interpolation operator
[num_REs, num_pilots] applied as one MXU matmul (linear and LMMSE) -
this removes the reference's no-XLA constraint on the LMMSE
interpolator (channel_estimation.py:1575).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..block import Block, Object
from ..constants import SPEED_OF_LIGHT
from ..utils.tensors import expand_to_rank, flatten_last_dims
from .resource_grid import ResourceGrid, RemoveNulledSubcarriers

__all__ = ["BaseChannelEstimator", "BaseChannelInterpolator",
           "LSChannelEstimator", "NearestNeighborInterpolator",
           "LinearInterpolator", "LMMSEInterpolator",
           "LMMSEInterpolator1D", "SpatialChannelFilter",
           "tdl_freq_cov_mat", "tdl_time_cov_mat"]


class BaseChannelInterpolator(Object):
    """Abstract OFDM channel interpolator
    (reference channel_estimation.py:~300)."""

    def __call__(self, h_hat, err_var):
        raise NotImplementedError


# Static-gather-as-matmul helpers: a gather with precomputed indices
# is a one-hot matrix product, which runs on the MXU instead of the
# (slow) TPU gather unit and is exact in f32 at HIGHEST precision.
# One-hot matrices above this element count fall back to the gather.
_ONEHOT_BUDGET = 2**25


def _gather_onehot(idx, n_src):
    """idx: [t, s, Q] int -> one-hot [t, s, n_src, Q] f32."""
    t, s, q = idx.shape
    w = np.zeros((t, s, n_src, q), np.float32)
    for i in range(t):
        for j in range(s):
            w[i, j, idx[i, j], np.arange(q)] = 1.
    return w


def _gather_runs(idx, max_runs=8):
    """Decomposes idx [t, s, Q] into per-(t, s) lists of consecutive
    runs [(start, length), ...] covering idx in order, or None when
    any (t, s) needs more than ``max_runs`` runs.  A run-decomposable
    static gather is applied as slices + concat — zero FLOPs, exact,
    and free of both the TPU gather unit and the one-hot matmul
    (Kronecker pilot layouts decompose into 1-2 runs)."""
    t, s, q = idx.shape
    out = []
    for i in range(t):
        row = []
        for j in range(s):
            sel = idx[i, j]
            runs = []
            a = 0
            while a < q:
                b = a + 1
                while b < q and sel[b] == sel[b - 1] + 1:
                    b += 1
                runs.append((int(sel[a]), b - a))
                a = b
            if len(runs) > max_runs:
                return None
            row.append(runs)
        out.append(row)
    return out


def _apply_ts_runs(x, runs, t, s):
    """Slice+concat application of a run-decomposed gather:
    x [..., t(b), s(b), N] -> [..., t, s, Q].  t/s dims of x may be
    broadcast (size 1)."""
    xt = x.shape[-3] if x.ndim >= 3 else 1
    xs = x.shape[-2] if x.ndim >= 2 else 1
    rows = []
    for i in range(t):
        cols = []
        for j in range(s):
            v = x[..., min(i, xt - 1), min(j, xs - 1), :]
            parts = [v[..., a:a + ln] for a, ln in runs[i][j]]
            cols.append(jnp.concatenate(parts, axis=-1)
                        if len(parts) > 1 else parts[0])
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def _apply_ts_matmul(x, w):
    """x: [..., t, s, N] (real or complex, t/s broadcastable);
    w: [t, s, N, Q] f32.  Returns [..., t, s, Q], exactly x
    gathered/combined by w."""
    w = jnp.asarray(w, jnp.float32)
    tgt = x.shape[:-3] + (w.shape[0], w.shape[1], x.shape[-1])
    if x.shape != tgt:
        x = jnp.broadcast_to(x, tgt)

    def mm(v):
        return jnp.einsum("...tsn,tsnq->...tsq",
                          v.astype(jnp.float32), w,
                          precision=jax.lax.Precision.HIGHEST)

    if jnp.iscomplexobj(x):
        return jax.lax.complex(mm(jnp.real(x)),
                               mm(jnp.imag(x))).astype(x.dtype)
    return mm(x).astype(x.dtype)


class NearestNeighborInterpolator(BaseChannelInterpolator):
    """Assigns each RE the channel estimate of the nearest pilot
    (Manhattan distance; reference channel_estimation.py:323)."""

    def __init__(self, pilot_pattern):
        super().__init__()
        if pilot_pattern.num_pilot_symbols == 0:
            raise ValueError("The pilot pattern cannot be empty")
        mask = np.array(pilot_pattern.mask)
        mask_shape = mask.shape
        mask_flat = mask.reshape([-1] + list(mask_shape[-2:]))
        pilots = np.asarray(pilot_pattern.pilots)
        pilots = pilots.reshape([-1, pilots.shape[-1]])
        if np.max(np.sum(np.abs(pilots) == 0, -1)) >= pilots.shape[-1]:
            raise ValueError("At least one pilot must be non-zero")

        gather_ind = np.zeros_like(mask_flat, dtype=np.int32)
        for a in range(gather_ind.shape[0]):
            i_p, j_p = np.where(mask_flat[a])
            for i in range(mask_shape[-2]):
                for j in range(mask_shape[-1]):
                    d = np.abs(i - i_p) + np.abs(j - j_p)
                    d = d.astype(np.float64)
                    d[np.abs(pilots[a]) == 0] = np.sum(mask_shape[-2:])
                    gather_ind[a, i, j] = int(np.argmin(d))
        self._gather_ind = gather_ind.reshape(mask_shape)
        n_p = pilots.shape[-1]
        gi3 = self._gather_ind.reshape(mask_shape[0], mask_shape[1],
                                       -1)
        self._runs = _gather_runs(gi3, max_runs=4 * mask_shape[-2])
        self._use_onehot = (self._runs is None
                            and gi3.shape[0] * gi3.shape[1] * n_p
                            * gi3.shape[-1] <= _ONEHOT_BUDGET)
        if self._use_onehot:
            self._onehot = _gather_onehot(gi3, n_p)

    def __call__(self, h_hat, err_var):
        h_hat = jnp.asarray(h_hat)
        # err_var is gathered at its own (possibly batch-less) shape
        # and broadcast only at the end — it is batch-independent for
        # scalar noise, so replicating it BEFORE the interpolation
        # matmul wastes a full batch of MXU work
        err_var = jnp.asarray(err_var)
        err_var = jnp.broadcast_to(
            err_var, err_var.shape[:-3] + h_hat.shape[-3:-1]
            + err_var.shape[-1:])
        gi = self._gather_ind  # [tx, s, sym, eff]
        num_sym, num_eff = gi.shape[-2:]
        if self._runs is not None:
            def gather(x):
                out = _apply_ts_runs(x, self._runs, gi.shape[0],
                                     gi.shape[1])
                return jnp.reshape(out, out.shape[:-1]
                                   + (num_sym, num_eff))
        elif self._use_onehot:
            def gather(x):
                out = _apply_ts_matmul(x, self._onehot)
                return jnp.reshape(out, out.shape[:-1]
                                   + (num_sym, num_eff))
        else:
            idx_full = gi.reshape(
                (1, 1, 1) + gi.shape[:-2] + (num_sym * num_eff,))

            def gather(x):
                # x: [..., tx, s, P] -> [..., tx, s, sym, eff]
                idx = jnp.asarray(
                    idx_full[(0,) * (idx_full.ndim - x.ndim)]
                    if idx_full.ndim > x.ndim else idx_full)
                out = jnp.take_along_axis(x, idx, axis=-1)
                return jnp.reshape(out, out.shape[:-1]
                                   + (num_sym, num_eff))

        h_out = gather(h_hat)
        ev_out = jnp.broadcast_to(gather(err_var), h_out.shape)
        return h_out, ev_out


class LinearInterpolator(BaseChannelInterpolator):
    """Linear interpolation, first across subcarriers then across OFDM
    symbols, expressed as one dense operator matmul
    (reference channel_estimation.py:437)."""

    def __init__(self, pilot_pattern, time_avg=False):
        super().__init__()
        if pilot_pattern.num_pilot_symbols == 0:
            raise ValueError("The pilot pattern cannot be empty")
        mask = np.array(pilot_pattern.mask)
        self._mask_shape = mask.shape
        num_sym, num_eff = mask.shape[-2:]
        mask_flat = mask.reshape([-1, num_sym, num_eff])
        pilots = np.asarray(pilot_pattern.pilots)
        pilots_flat = pilots.reshape([-1, pilots.shape[-1]])

        ops = []
        for a in range(mask_flat.shape[0]):
            ops.append(self._build_operator(
                mask_flat[a], pilots_flat[a], num_sym, num_eff,
                time_avg))
        w = np.stack(ops)  # [A, num_sym*num_eff, P]
        self._w = w.reshape(mask.shape[:-2]
                            + (num_sym * num_eff, pilots.shape[-1]))
        self._num_sym = num_sym
        self._num_eff = num_eff

    @staticmethod
    def _build_operator(mask, pilots, num_sym, num_eff, time_avg):
        """Dense [num_sym*num_eff, P] linear-interpolation operator."""
        p_total = len(pilots)
        i_p, j_p = np.where(mask)  # row-major pilot coords
        valid = np.abs(pilots) != 0
        # frequency interpolation per pilot-carrying symbol
        pilot_syms = np.unique(i_p[valid])
        # freq_op[s_idx, j, p]
        freq_ops = {}
        for si in pilot_syms:
            sel = np.where((i_p == si) & valid)[0]
            js = j_p[sel]
            order = np.argsort(js)
            js, sel = js[order], sel[order]
            op = np.zeros((num_eff, p_total))
            for j in range(num_eff):
                if len(js) == 1:
                    op[j, sel[0]] = 1
                elif j <= js[0]:
                    # linear EXTRAPOLATION from the first two pilots
                    # (reference channel_estimation.py:566-579 keeps
                    # (x0, x1) = first pair below the span)
                    wgt = (j - js[0]) / (js[1] - js[0])
                    op[j, sel[0]] = 1 - wgt
                    op[j, sel[1]] = wgt
                elif j >= js[-1]:
                    wgt = (j - js[-2]) / (js[-1] - js[-2])
                    op[j, sel[-2]] = 1 - wgt
                    op[j, sel[-1]] = wgt
                else:
                    r = int(np.searchsorted(js, j))
                    l = r - 1 if js[min(r, len(js) - 1)] != j else r
                    if js[r] == j:
                        op[j, sel[r]] = 1
                    else:
                        wgt = (j - js[l]) / (js[r] - js[l])
                        op[j, sel[l]] = 1 - wgt
                        op[j, sel[r]] = wgt
            freq_ops[si] = op

        w = np.zeros((num_sym, num_eff, p_total))
        if time_avg:
            avg = np.mean([freq_ops[si] for si in pilot_syms], axis=0)
            w[:] = avg
        else:
            ps = np.asarray(sorted(pilot_syms))
            for t in range(num_sym):
                if len(ps) == 1:
                    w[t] = freq_ops[ps[0]]
                elif t <= ps[0]:
                    # linear extrapolation before the first pilot
                    # symbol (reference channel_estimation.py:620-629)
                    wgt = (t - ps[0]) / (ps[1] - ps[0])
                    w[t] = (1 - wgt) * freq_ops[ps[0]] \
                        + wgt * freq_ops[ps[1]]
                elif t >= ps[-1]:
                    wgt = (t - ps[-2]) / (ps[-1] - ps[-2])
                    w[t] = (1 - wgt) * freq_ops[ps[-2]] \
                        + wgt * freq_ops[ps[-1]]
                else:
                    r = int(np.searchsorted(ps, t))
                    if ps[r] == t:
                        w[t] = freq_ops[ps[r]]
                    else:
                        l = r - 1
                        wgt = (t - ps[l]) / (ps[r] - ps[l])
                        w[t] = (1 - wgt) * freq_ops[ps[l]] \
                            + wgt * freq_ops[ps[r]]
        return w.reshape(num_sym * num_eff, p_total)

    def _apply(self, x):
        # x: [b, rx, rxa, tx, s, P] -> [b, rx, rxa, tx, s, sym, eff]
        w = jnp.asarray(self._w, x.dtype)  # [tx, s, RE, P]
        out = jnp.einsum("...tsp,tsrp->...tsr", x, w)
        return jnp.reshape(out, out.shape[:-1]
                           + (self._num_sym, self._num_eff))

    def __call__(self, h_hat, err_var):
        h_hat = jnp.asarray(h_hat)
        # batch-independent err_var (scalar noise) is interpolated at
        # its own shape and broadcast after (see LS estimator note)
        err_var = jnp.asarray(err_var)
        err_var = jnp.broadcast_to(
            err_var, err_var.shape[:-3] + h_hat.shape[-3:-1]
            + err_var.shape[-1:])
        h_out = self._apply(h_hat)
        # interpolate error variances with the same (real) operator
        err_out = self._apply(err_var.astype(h_hat.dtype))
        err_out = jnp.maximum(jnp.real(err_out), 0.)
        return h_out, jnp.broadcast_to(err_out, h_out.shape)


class LMMSEInterpolator(BaseChannelInterpolator):
    """Ordered per-dimension LMMSE interpolation / smoothing
    (reference channel_estimation.py:1367; fresh JAX implementation
    that, unlike the reference, runs under jit/XLA).

    ``order`` names the 1D passes, e.g. ``"t-f"`` (time then
    frequency), ``"f-t"``, or ``"t-f-s"`` (with spatial smoothing
    across receive antennas).  Each pass is an
    :class:`LMMSEInterpolator1D` (or :class:`SpatialChannelFilter`)
    along that dimension; between passes the estimates are rescaled so
    their variances match what the next pass expects (reference
    channel_estimation.py:1103-1153), mirroring the reference
    algorithm exactly.  Time and frequency passes are mandatory; each
    dimension may appear at most once.
    """

    def __init__(self, pilot_pattern, cov_mat_time, cov_mat_freq,
                 cov_mat_space=None, order="t-f"):
        super().__init__()
        steps = order.split("-")
        if not 2 <= len(steps) <= 3 or len(set(steps)) != len(steps) \
                or any(o not in ("t", "f", "s") for o in steps) \
                or "t" not in steps or "f" not in steps:
            raise ValueError(
                "order must name 't' and 'f' (and optionally 's') "
                "each at most once, e.g. 't-f', 'f-t', 't-f-s'")
        if "s" in steps and cov_mat_space is None:
            raise ValueError("cov_mat_space is required for spatial "
                             "smoothing ('s' in order)")
        self._order = steps

        mask = np.array(pilot_pattern.mask)
        pilots = np.asarray(pilot_pattern.pilots)
        num_tx, num_st, num_sym, num_eff = mask.shape
        self._num_sym, self._num_eff = num_sym, num_eff

        # Pilot mask over the grid: 0=data, 1=pilot, 2=masked
        # (zero-power pilot), plus per-(tx, st) scatter maps from the
        # pilot vector into the flattened grid.
        pilot_mask = np.zeros(mask.shape, np.int64)
        scat_grid, scat_pil = [], []
        for tx in range(num_tx):
            for st in range(num_st):
                pos = np.argwhere(mask[tx, st])       # row-major
                nonzero = np.abs(pilots[tx, st]) > 0.
                pilot_mask[tx, st, pos[:, 0], pos[:, 1]] = \
                    np.where(nonzero, 1, 2)
                flat = pos[:, 0] * num_eff + pos[:, 1]
                scat_grid.append(flat[nonzero].astype(np.int32))
                scat_pil.append(np.where(nonzero)[0].astype(np.int32))
        self._scat_grid = scat_grid
        self._scat_pil = scat_pil

        # One 1D pass per order entry, built against the pilot mask
        # as it evolves (a pass fills every row it touches).
        passes = []
        for i, o in enumerate(steps):
            last = i == len(steps) - 1
            if o == "f":
                interp = LMMSEInterpolator1D(
                    pilot_mask, cov_mat_freq, last_step=last)
                filled = np.any(pilot_mask == 1, axis=-1,
                                keepdims=True)
                pilot_mask = np.where(filled, 1, pilot_mask)
            elif o == "t":
                interp = LMMSEInterpolator1D(
                    np.swapaxes(pilot_mask, -1, -2), cov_mat_time,
                    last_step=last)
                filled = np.any(pilot_mask == 1, axis=-2,
                                keepdims=True)
                pilot_mask = np.where(filled, 1, pilot_mask)
            else:
                interp = SpatialChannelFilter(cov_mat_space,
                                              last_step=last)
            passes.append((o, interp, (pilot_mask == 1)))
        self._passes = passes

    def __call__(self, h_hat, err_var):
        h_hat = jnp.asarray(h_hat)
        err_var = jnp.broadcast_to(
            jnp.asarray(err_var, jnp.real(h_hat).dtype), h_hat.shape)
        lead = h_hat.shape[:-3]  # [batch, num_rx, num_rx_ant]
        num_tx, num_st = h_hat.shape[-3], h_hat.shape[-2]

        # Scatter pilot estimates onto the full resource grid
        grid_shape = lead + (num_tx, num_st,
                             self._num_sym * self._num_eff)
        h = jnp.zeros(grid_shape, h_hat.dtype)
        e = jnp.zeros(grid_shape, err_var.dtype)
        for tx in range(num_tx):
            for st in range(num_st):
                gi = self._scat_grid[tx * num_st + st]
                pi = self._scat_pil[tx * num_st + st]
                h = h.at[..., tx, st, gi].set(
                    h_hat[..., tx, st, pi])
                e = e.at[..., tx, st, gi].set(
                    err_var[..., tx, st, pi])
        h = jnp.reshape(h, grid_shape[:-1]
                        + (self._num_sym, self._num_eff))
        e = jnp.reshape(e, grid_shape[:-1]
                        + (self._num_sym, self._num_eff))

        for o, interp, err_mask in self._passes:
            if o == "f":
                h, e = interp(h, e)
                e = e * jnp.asarray(err_mask, e.dtype)
            elif o == "t":
                h, e = interp(jnp.swapaxes(h, -1, -2),
                              jnp.swapaxes(e, -1, -2))
                h = jnp.swapaxes(h, -1, -2)
                e = jnp.swapaxes(e, -1, -2)
                e = e * jnp.asarray(err_mask, e.dtype)
            else:
                # smooth across receive antennas
                # ([..., rxa, tx, st, sym, sc] -> rxa last)
                h = jnp.moveaxis(h, -5, -1)
                e = jnp.moveaxis(e, -5, -1)
                h, e = interp(h, e)
                h = jnp.moveaxis(h, -1, -5)
                e = jnp.moveaxis(e, -1, -5)
        return h, e


def _load_tdl_pdp(model):
    """Loads the (delays, linear mean powers, los flag) of a TDL
    model from the packaged 38.901 JSON tables."""
    import json
    import os
    if model not in ("A", "B", "C", "D", "E"):
        raise ValueError("Invalid TDL model")
    fname = os.path.join(os.path.dirname(__file__), "..", "channel",
                         "tr38901", "models", f"TDL-{model}.json")
    with open(fname) as f:
        params = json.load(f)
    los = bool(params["los"])
    delays = np.array(params["delays"], np.float64)
    mean_powers = 10.0 ** (np.array(params["powers"],
                                    np.float64) / 10.0)
    return delays, mean_powers, los


def tdl_freq_cov_mat(model, subcarrier_spacing, fft_size,
                     delay_spread, precision=None):
    """Frequency covariance matrix of a TDL channel model:
    R[f1,f2] = sum_p P_p exp(-j2 pi (f1-f2) scs tau_p), with the
    power delay profile loaded from the packaged TDL-{model} table
    (reference channel_estimation.py:1856).  Host-side NumPy;
    returns [fft_size, fft_size] complex."""
    delays, mean_powers, los = _load_tdl_pdp(model)
    delays = delays * delay_spread
    if los:
        # merge the specular + non-specular components of the first
        # path (both at delay 0)
        mean_powers[0] = mean_powers[0] + mean_powers[1]
        mean_powers = np.concatenate(
            [mean_powers[:1], mean_powers[2:]], axis=0)
        delays = delays[1:]
    mean_powers = mean_powers / np.sum(mean_powers)
    n = np.arange(fft_size)
    p = np.exp(1j * (-2. * np.pi * subcarrier_spacing * n)[None]
               * delays[:, None])                   # [P, F]
    cov = np.einsum("p,pi,pj->ij", mean_powers, p, np.conj(p))
    return cov


def tdl_time_cov_mat(model, speed, carrier_frequency,
                     ofdm_symbol_duration, num_ofdm_symbols,
                     los_angle_of_arrival=np.pi / 4., precision=None):
    """Time covariance matrix of a TDL channel model (reference
    channel_estimation.py:1956): Jakes J0 term weighted by the NLoS
    power plus, for LoS models, a complex exponential at the LoS
    Doppler.  Host-side NumPy; returns
    [num_ofdm_symbols, num_ofdm_symbols] complex."""
    from scipy.special import jv
    doppler_spread = 2. * np.pi * speed / SPEED_OF_LIGHT \
        * carrier_frequency
    _, mean_powers, los = _load_tdl_pdp(model)
    mean_powers = mean_powers / np.sum(mean_powers)
    if los:
        los_power = mean_powers[0]
        nlos_power = np.sum(mean_powers[1:])
    else:
        los_power = 0.
        nlos_power = np.sum(mean_powers)
    t = np.arange(num_ofdm_symbols)
    exp = doppler_spread * ofdm_symbol_duration \
        * (t[:, None] - t[None, :])
    cov = jv(0.0, exp) * nlos_power + 0j
    if los:
        cov = cov + los_power * np.exp(
            1j * exp * np.cos(los_angle_of_arrival))
    return cov


class BaseChannelEstimator(Block):
    """Extracts pilots, estimates at pilot positions, interpolates
    (reference channel_estimation.py:20)."""

    def __init__(self, resource_grid, interpolation_type="nn",
                 interpolator=None, precision=None, **kwargs):
        super().__init__(precision=precision, **kwargs)
        if not isinstance(resource_grid, ResourceGrid):
            raise TypeError(
                "You must provide a valid instance of ResourceGrid.")
        self._resource_grid = resource_grid
        self._pilot_pattern = resource_grid.pilot_pattern
        self._remove_nulled_scs = RemoveNulledSubcarriers(
            resource_grid, precision=self.precision)
        if interpolation_type not in ("nn", "lin", "lin_time_avg", None):
            raise ValueError("Unsupported `interpolation_type`")
        self._interpolation_type = interpolation_type
        if interpolator is not None:
            self._interpolator = interpolator
        elif interpolation_type == "nn":
            self._interpolator = NearestNeighborInterpolator(
                self._pilot_pattern)
        elif interpolation_type == "lin":
            self._interpolator = LinearInterpolator(self._pilot_pattern)
        elif interpolation_type == "lin_time_avg":
            self._interpolator = LinearInterpolator(self._pilot_pattern,
                                                    time_avg=True)
        else:
            raise ValueError("You must provide an interpolator")

        # static pilot-position gather indices per (tx, stream):
        # positions in the flattened [sym * eff] grid, row-major
        mask = np.array(self._pilot_pattern.mask)
        num_pilots = self._pilot_pattern.num_pilot_symbols
        mask_flat = mask.reshape(mask.shape[:-2] + (-1,))
        pilot_ind = np.zeros(mask.shape[:2] + (num_pilots,), np.int32)
        for t in range(mask.shape[0]):
            for s in range(mask.shape[1]):
                pilot_ind[t, s] = np.where(mask_flat[t, s])[0]
        self._pilot_ind = pilot_ind
        n_re = mask_flat.shape[-1]
        self._extract_runs = _gather_runs(pilot_ind)
        self._use_onehot = (self._extract_runs is None
                            and pilot_ind.shape[0] * pilot_ind.shape[1]
                            * n_re * num_pilots <= _ONEHOT_BUDGET)
        if self._use_onehot:
            self._extract_onehot = _gather_onehot(pilot_ind, n_re)

    def estimate_at_pilot_locations(self, y_pilots, no):
        raise NotImplementedError

    def call(self, y, no):
        y = jnp.asarray(y, self.cdtype)
        y_eff = self._remove_nulled_scs(y)  # [b, rx, rxa, sym, eff]
        y_flat = flatten_last_dims(y_eff, 2)  # [b, rx, rxa, sym*eff]
        # gather pilots: [b, rx, rxa, tx, s, num_pilots]
        pi = self._pilot_ind  # [tx, s, P]
        if self._extract_runs is not None:
            y_pilots = _apply_ts_runs(
                y_flat[..., None, None, :], self._extract_runs,
                pi.shape[0], pi.shape[1])
        elif self._use_onehot:
            y_pilots = _apply_ts_matmul(
                y_flat[..., None, None, :], self._extract_onehot)
        else:
            idx = jnp.asarray(pi.reshape((1, 1, 1) + pi.shape))
            y_pilots = jnp.take_along_axis(
                y_flat[..., None, None, :], idx, axis=-1)
        no = jnp.asarray(no, self.rdtype)
        h_hat, err_var = self.estimate_at_pilot_locations(y_pilots, no)
        # NN/Linear interpolators gather err_var at its natural
        # (batch-less) shape; other interpolators (ordered LMMSE,
        # custom) get the documented fully-broadcast layout
        if not isinstance(self._interpolator,
                          (NearestNeighborInterpolator,
                           LinearInterpolator)):
            err_var = jnp.broadcast_to(jnp.asarray(err_var),
                                       h_hat.shape)
        h_hat, err_var = self._interpolator(h_hat, err_var)
        return h_hat, err_var


class LSChannelEstimator(BaseChannelEstimator):
    """LS estimation at pilots + interpolation
    (reference channel_estimation.py:175)."""

    def estimate_at_pilot_locations(self, y_pilots, no):
        pilots = jnp.asarray(self._pilot_pattern.pilots, self.cdtype)
        denom = jnp.where(jnp.abs(pilots) == 0,
                          jnp.ones_like(pilots), pilots)
        h_ls = jnp.where(jnp.abs(pilots) == 0,
                         jnp.zeros_like(y_pilots), y_pilots / denom)
        no_b = expand_to_rank(no, h_ls.ndim, -1)
        p2 = jnp.abs(pilots) ** 2
        # err_var stays UNBROADCAST (batch-independent for scalar no):
        # the interpolators gather it at its natural shape — running
        # the [*, num_REs, num_pilots] interpolation matmul on a
        # batch-replicated err_var doubled the estimator's cost at
        # the flagship shapes for bytes that are identical per batch
        err_var = jnp.where(p2 == 0, jnp.zeros_like(p2),
                            no_b / jnp.maximum(p2, 1e-30))
        return h_ls, err_var


class LMMSEInterpolator1D(Object):
    """LMMSE interpolation along the inner dimension of a 2D grid
    (reference channel_estimation.py:736; fresh JAX implementation).

    The per-row interpolation matrix A_n = R Pi_n (Pi_n^T R Pi_n +
    Sigma_n)^{-1} Pi_n^T depends on the call-time error variances, so
    it is computed inside the jitted call as a batch of dense solves
    over statically padded pilot index maps (MXU-friendly; no ragged
    shapes).

    pilot_mask: [num_tx, num_streams_per_tx, N, M] with 0=data,
    1=pilot, 2=unused.  cov_mat: [M, M].  Inputs h_hat/err_var:
    [batch, num_rx, num_rx_ant, num_tx, num_streams_per_tx, N, M].
    """

    def __init__(self, pilot_mask, cov_mat, last_step=True):
        cov_mat = np.asarray(cov_mat)
        precision = "single" if cov_mat.dtype == np.complex64 \
            else "double"
        super().__init__(precision=precision)
        self._cov_mat = cov_mat.astype(self.np_cdtype)
        self._last_step = bool(last_step)

        pilot_mask = np.asarray(pilot_mask)
        num_tx, num_st, n_outer, m_inner = pilot_mask.shape
        # Padded pilot index maps [tx, st, N, K] and validity masks
        max_k = 1
        for tx in range(num_tx):
            for st in range(num_st):
                for n in range(n_outer):
                    max_k = max(max_k, int(np.sum(
                        pilot_mask[tx, st, n] == 1)))
        idx = np.zeros((num_tx, num_st, n_outer, max_k), np.int32)
        valid = np.zeros((num_tx, num_st, n_outer, max_k),
                         self.np_rdtype)
        for tx in range(num_tx):
            for st in range(num_st):
                for n in range(n_outer):
                    p = np.where(pilot_mask[tx, st, n] == 1)[0]
                    idx[tx, st, n, :len(p)] = p
                    valid[tx, st, n, :len(p)] = 1.
        self._pilot_idx = idx
        self._pilot_valid = valid
        self._m_inner = m_inner

    def __call__(self, h_hat, err_var):
        h_hat = jnp.asarray(h_hat, self.cdtype)
        err_var = jnp.broadcast_to(
            jnp.asarray(err_var, self.rdtype), h_hat.shape)
        err_var_old = err_var

        r = jnp.asarray(self._cov_mat)                    # [M, M]
        idx = jnp.asarray(self._pilot_idx)                # [t,s,N,K]
        valid = jnp.asarray(self._pilot_valid, self.rdtype)
        valid_c = valid.astype(self.cdtype)

        # R restricted to pilots: Rp [t,s,N,M,K], Rpp [t,s,N,K,K]
        rp = jnp.take(r, idx, axis=1)                     # [M,t,s,N,K]
        rp = jnp.moveaxis(rp, 0, -2) * valid_c[..., None, :]
        # gather rows then columns -> [t,s,N,K,K]
        rows = jnp.take(r, idx, axis=0)                   # [t,s,N,K,M]
        rpp = jnp.take_along_axis(
            rows, idx[..., None, :].repeat(rows.shape[-2], axis=-2),
            axis=-1)                                      # [t,s,N,K,K]
        pair = valid[..., :, None] * valid[..., None, :]
        eye = jnp.eye(idx.shape[-1], dtype=self.cdtype)
        rpp = rpp * pair.astype(self.cdtype) \
            + (1. - pair).astype(self.cdtype) * eye

        # Error variances at pilots (regularized)
        err_p = jnp.take_along_axis(
            err_var, jnp.broadcast_to(idx, err_var.shape[:-1]
                                      + idx.shape[-1:]), axis=-1)
        err_p = jnp.maximum(err_p, 1e-6) * valid
        a_mat = rpp + jnp.vectorize(
            jnp.diag, signature="(k)->(k,k)")(err_p.astype(self.cdtype))

        # A = Rp (Rpp + Sigma)^{-1} per row: batched solve
        a_t = jnp.linalg.solve(
            jnp.swapaxes(a_mat, -2, -1),
            jnp.swapaxes(jnp.broadcast_to(
                rp, err_p.shape[:-1] + rp.shape[-2:]), -2, -1))
        a = jnp.swapaxes(a_t, -2, -1)                     # [...,M,K]
        a = a * valid_c[..., None, :]

        # Interpolated estimates
        h_p = jnp.take_along_axis(
            h_hat, jnp.broadcast_to(idx, h_hat.shape[:-1]
                                    + idx.shape[-1:]), axis=-1)
        h_p = h_p * valid_c
        h_out = jnp.einsum("...mk,...k->...m", a, h_p)

        # Error variances: diag(R) - Re{sum_k A[m,k] R[idx_k, m]}
        r_pm = jnp.moveaxis(rows, -2, -1)                 # [t,s,N,M,K]
        err_out = (jnp.real(jnp.diagonal(r))
                   - jnp.real(jnp.einsum("...mk,...mk->...m", a,
                                         jnp.broadcast_to(
                                             r_pm,
                                             a.shape))))
        err_out = jnp.maximum(err_out, 0.)

        # Rows without pilots: passthrough
        row_has_pilot = jnp.sum(valid, axis=-1) > 0        # [t,s,N]
        sel = row_has_pilot[..., None]
        h_out = jnp.where(sel, h_out, h_hat)
        err_out = jnp.where(sel, err_out, err_var_old)

        if not self._last_step:
            # Scale so the next step sees the expected variance
            # (reference channel_estimation.py:1103-1153)
            # var1[m] = sum_kl A[m,k] R[idx_k, idx_l] conj(A[m,l])
            var1 = jnp.real(jnp.einsum("...mk,...kl,...ml->...m",
                                       a, rpp, jnp.conj(a)))
            var2 = jnp.sum(jnp.abs(a) ** 2 * err_p[..., None, :],
                           axis=-1)
            h_hat_var = var1 + var2
            h_var = jnp.real(jnp.diagonal(r))
            denom = h_hat_var + h_var - err_out
            s = jnp.where(jnp.abs(denom) > 1e-12,
                          2. * h_var / denom, 0.)
            h_out = jnp.where(sel, s.astype(self.cdtype) * h_out,
                              h_out)
            err_new = s * (s - 1.) * h_hat_var + (1. - s) * h_var \
                + s * err_out
            err_out = jnp.where(sel, jnp.maximum(err_new, 0.),
                                err_out)
        return h_out, err_out


class SpatialChannelFilter(Object):
    """LMMSE smoothing across the receive-antenna dimension
    (reference channel_estimation.py:1157; fresh JAX implementation).

    A = R (R + diag(err_var))^{-1} per resource element, applied along
    the trailing rx-antenna axis of
    h_hat [batch, num_rx, num_tx, num_streams, sym, sc, num_rx_ant].
    """

    def __init__(self, cov_mat, last_step=True):
        cov_mat = np.asarray(cov_mat)
        precision = "single" if cov_mat.dtype == np.complex64 \
            else "double"
        super().__init__(precision=precision)
        self._cov_mat = cov_mat.astype(self.np_cdtype)
        self._last_step = bool(last_step)

    def __call__(self, h_hat, err_var):
        h_hat = jnp.asarray(h_hat, self.cdtype)
        err_var = jnp.broadcast_to(
            jnp.asarray(err_var, self.rdtype), h_hat.shape)
        r = jnp.asarray(self._cov_mat)                     # [M, M]
        m = r.shape[0]

        err_c = jnp.maximum(err_var, 1e-12)
        s_mat = r + jnp.vectorize(
            jnp.diag, signature="(k)->(k,k)")(
                err_c.astype(self.cdtype))
        # A^T = solve(S^T, R^T)  =>  A = R S^{-1}
        a = jnp.swapaxes(jnp.linalg.solve(
            jnp.swapaxes(s_mat, -2, -1),
            jnp.broadcast_to(jnp.swapaxes(r, -2, -1),
                             s_mat.shape)), -2, -1)
        h_out = jnp.einsum("...mk,...k->...m", a, h_hat)
        err_out = jnp.real(jnp.diagonal(r)) \
            - jnp.real(jnp.einsum("...mk,...km->...m", a,
                                  jnp.broadcast_to(r, a.shape)))
        err_out = jnp.maximum(err_out, 0.)

        if not self._last_step:
            var1 = jnp.real(
                jnp.einsum("...mk,kl,...ml->...m", a, r, jnp.conj(a)))
            var2 = jnp.sum(jnp.abs(a) ** 2 * err_c[..., None, :],
                           axis=-1)
            h_hat_var = var1 + var2
            h_var = jnp.real(jnp.diagonal(r))
            denom = h_hat_var + h_var - err_out
            s = jnp.where(jnp.abs(denom) > 1e-12,
                          2. * h_var / denom, 0.)
            h_out = s.astype(self.cdtype) * h_out
            err_out = jnp.maximum(
                s * (s - 1.) * h_hat_var + (1. - s) * h_var
                + s * err_out, 0.)
        return h_out, err_out
