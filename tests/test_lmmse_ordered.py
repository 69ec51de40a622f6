"""Ordered LMMSE interpolation vs an independent NumPy oracle.

The oracle re-implements the reference algorithm
(/root/reference/src/sionna/phy/ofdm/channel_estimation.py:1367):
sequential 1D LMMSE passes with inter-pass variance-matching scaling,
directly from the documented formulas (dense inversion, per-row
matrices), with none of the JAX implementation's structure.
"""

import numpy as np
import pytest

import jax

from sionna_tpu.phy.ofdm import (PilotPattern, LMMSEInterpolator,
                                 tdl_freq_cov_mat, tdl_time_cov_mat)

N_SYM, N_SC = 6, 8


def _setup(with_zero_pilot):
    rng = np.random.default_rng(3)
    mask = np.zeros((1, 1, N_SYM, N_SC), bool)
    mask[0, 0, 1, 0::2] = True
    mask[0, 0, 4, 1::2] = True
    num_p = int(mask.sum())
    pilots = (rng.standard_normal(num_p)
              + 1j * rng.standard_normal(num_p)) / np.sqrt(2)
    if with_zero_pilot:
        pilots[1] = 0.0
    pp = PilotPattern(mask, pilots.reshape(1, 1, -1))
    r_f = tdl_freq_cov_mat("A", 1e6 / N_SC, N_SC, 1e-7)
    r_t = tdl_time_cov_mat("A", 2.5, 3.5e9, 1e-4, N_SYM)
    h_p = (rng.standard_normal((2, 1, 3, 1, 1, num_p))
           + 1j * rng.standard_normal((2, 1, 3, 1, 1, num_p)))
    err_p = rng.uniform(0.01, 0.1, h_p.shape)
    return pp, r_f, r_t, h_p, err_p, mask[0, 0], pilots


def _pass_1d(h, e, pmask, r, last):
    """One LMMSE pass along the last axis of an [..., N, M] grid.

    pmask: [N, M] int (1 = estimate present). Dense-inverse oracle.
    """
    h, e = h.copy(), e.copy()
    n_outer = h.shape[-2]
    diag_r = np.real(np.diag(r))
    for n in range(n_outer):
        idx = np.where(pmask[n] == 1)[0]
        if len(idx) == 0:
            continue
        it = tuple(np.ndindex(h.shape[:-2]))
        for b in it:
            sig = np.maximum(e[b + (n, idx)], 1e-6)
            a = r[:, idx] @ np.linalg.inv(
                r[np.ix_(idx, idx)] + np.diag(sig))
            h1 = a @ h[b + (n, idx)]
            err1 = np.maximum(
                diag_r - np.real(np.einsum(
                    "mk,km->m", a, r[idx, :])), 0.)
            if not last:
                var1 = np.real(np.einsum(
                    "mk,kl,ml->m", a, r[np.ix_(idx, idx)],
                    np.conj(a)))
                var2 = np.sum(np.abs(a) ** 2 * sig, axis=-1)
                hv = var1 + var2
                denom = hv + diag_r - err1
                s = np.where(np.abs(denom) > 1e-12,
                             2 * diag_r / denom, 0.)
                h1 = s * h1
                err1 = np.maximum(
                    s * (s - 1) * hv + (1 - s) * diag_r + s * err1,
                    0.)
            h[b + (n,)] = h1
            e[b + (n,)] = err1
    return h, e


def _oracle(order, pp_mask, pilots, r_f, r_t, h_p, err_p):
    pmask = np.zeros((N_SYM, N_SC), np.int64)
    pos = np.argwhere(pp_mask)
    nonzero = np.abs(pilots) > 0
    pmask[pos[:, 0], pos[:, 1]] = np.where(nonzero, 1, 2)

    lead = h_p.shape[:-1]
    h = np.zeros(lead + (N_SYM, N_SC), complex)
    e = np.zeros(lead + (N_SYM, N_SC), float)
    gi, pi = pos[nonzero], np.where(nonzero)[0]
    h[..., gi[:, 0], gi[:, 1]] = h_p[..., pi]
    e[..., gi[:, 0], gi[:, 1]] = err_p[..., pi]

    steps = order.split("-")
    for i, o in enumerate(steps):
        last = i == len(steps) - 1
        if o == "f":
            h, e = _pass_1d(h, e, pmask, r_f, last)
            filled = np.any(pmask == 1, axis=-1, keepdims=True)
            pmask = np.where(filled, 1, pmask)
        else:
            h, e = _pass_1d(np.swapaxes(h, -1, -2),
                            np.swapaxes(e, -1, -2), pmask.T, r_t,
                            last)
            h, e = np.swapaxes(h, -1, -2), np.swapaxes(e, -1, -2)
            filled = np.any(pmask == 1, axis=-2, keepdims=True)
            pmask = np.where(filled, 1, pmask)
        e = e * (pmask == 1)
    return h, e


@pytest.mark.parametrize("order", ["f-t", "t-f"])
@pytest.mark.parametrize("zero_pilot", [False, True])
def test_ordered_lmmse_matches_numpy_oracle(order, zero_pilot):
    pp, r_f, r_t, h_p, err_p, mask, pilots = _setup(zero_pilot)
    interp = LMMSEInterpolator(pp, r_t, r_f, order=order)
    h_j, e_j = jax.jit(interp.__call__)(h_p, err_p)
    h_o, e_o = _oracle(order, mask, pilots, r_f, r_t, h_p, err_p)
    np.testing.assert_allclose(np.asarray(h_j), h_o, rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_j), e_o, rtol=0, atol=2e-4)


def test_order_validation():
    pp, r_f, r_t, *_ = _setup(False)
    with pytest.raises(ValueError):
        LMMSEInterpolator(pp, r_t, r_f, order="f")
    with pytest.raises(ValueError):
        LMMSEInterpolator(pp, r_t, r_f, order="f-f")
    with pytest.raises(ValueError):
        LMMSEInterpolator(pp, r_t, r_f, order="t-f-s")  # no cov_mat


def test_spatial_smoothing_runs():
    pp, r_f, r_t, h_p, err_p, *_ = _setup(False)
    r_s = np.eye(3) + 0.3 * (np.eye(3, k=1) + np.eye(3, k=-1))
    interp = LMMSEInterpolator(pp, r_t, r_f, cov_mat_space=r_s,
                               order="t-f-s")
    h, e = interp(h_p, err_p)
    assert h.shape == (2, 1, 3, 1, 1, N_SYM, N_SC)
    assert np.all(np.asarray(e) >= 0)
