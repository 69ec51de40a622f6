"""Parity tests for the TPU fast paths (one-hot MXU gathers, plane-
based LMMSE, unrolled small-matrix linalg, lifted boxplus).

Every fast path must be numerically equal (bit-exact where claimed)
to the straightforward gather/linalg formulation it replaces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                 LSChannelEstimator, LMMSEEqualizer,
                                 LinearDetector)
from sionna_tpu.phy.utils.linalg import (small_cholesky, cholesky_solve,
                                         inv_cholesky)
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder


def _crandn(key, shape):
    k1, k2 = jax.random.split(key)
    return jax.lax.complex(jax.random.normal(k1, shape, jnp.float32),
                           jax.random.normal(k2, shape, jnp.float32))


def _rg(num_tx, nstreams, fft, dc=False, guards=(0, 0)):
    return ResourceGrid(num_ofdm_symbols=14, fft_size=fft,
                        subcarrier_spacing=30e3, num_tx=num_tx,
                        num_streams_per_tx=nstreams, dc_null=dc,
                        num_guard_carriers=guards,
                        pilot_pattern="kronecker",
                        pilot_ofdm_symbol_indices=[2, 11])


@pytest.mark.parametrize("num_tx,nstreams,fft,dc,guards", [
    (1, 1, 64, False, (0, 0)),
    (1, 2, 64, False, (0, 0)),
    (2, 2, 76, True, (5, 6)),
])
def test_rg_mapper_onehot_bitexact(num_tx, nstreams, fft, dc, guards):
    rg = _rg(num_tx, nstreams, fft, dc, guards)
    m = ResourceGridMapper(rg)
    assert m._use_onehot
    x = _crandn(jax.random.PRNGKey(0),
                (4, num_tx, nstreams, rg.num_data_symbols))
    fast = m(x)
    m._use_onehot = False
    slow = m(x)
    assert float(jnp.max(jnp.abs(fast - slow))) == 0.0


@pytest.mark.parametrize("num_tx,nstreams,output", [
    (1, 1, "bit"), (1, 2, "bit"), (2, 2, "bit"), (1, 1, "symbol"),
])
def test_detector_extract_onehot_bitexact(num_tx, nstreams, output):
    rg = _rg(num_tx, nstreams, 64)
    sm = StreamManagement(np.ones((1, num_tx), int), nstreams)
    det = LinearDetector("lmmse", output,
                         "app" if output == "bit" else "maxlog",
                         rg, sm, "qam", 2)
    nrx_ant = num_tx * nstreams
    key = jax.random.PRNGKey(5)
    y = _crandn(key, (3, 1, nrx_ant, 14, 64))
    h = _crandn(jax.random.fold_in(key, 1),
                (3, 1, nrx_ant, num_tx, nstreams, 14, 64))
    ev = jnp.full(h.shape, 0.01, jnp.float32)
    no = jnp.asarray(0.1, jnp.float32)
    fast = det(y, h, ev, no)
    det._use_onehot_extract = False
    slow = det(y, h, ev, no)
    assert float(jnp.max(jnp.abs(fast - slow))) == 0.0


@pytest.mark.parametrize("itype", ["nn", "lin"])
@pytest.mark.parametrize("num_tx,nstreams", [(1, 1), (2, 2)])
def test_ls_estimator_onehot_bitexact(itype, num_tx, nstreams):
    rg = _rg(num_tx, nstreams, 64)
    est = LSChannelEstimator(rg, interpolation_type=itype)
    y = _crandn(jax.random.PRNGKey(2), (3, 1, 2, 14, 64))
    no = jnp.asarray(0.1, jnp.float32)
    fast = est(y, no)
    est._use_onehot = False
    if hasattr(est._interpolator, "_use_onehot"):
        est._interpolator._use_onehot = False
    slow = est(y, no)
    assert float(jnp.max(jnp.abs(fast[0] - slow[0]))) == 0.0
    assert float(jnp.max(jnp.abs(fast[1] - slow[1]))) == 0.0


@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_small_linalg_kernels(m):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(50, m, m)) + 1j * rng.normal(size=(50, m, m))
    a = a @ a.conj().transpose(0, 2, 1) + 0.5 * np.eye(m)
    a64 = jnp.asarray(a)  # complex128 under x64
    l_ref = np.linalg.cholesky(a)
    assert np.max(np.abs(np.asarray(small_cholesky(a64)) - l_ref)) < 1e-10
    b = jnp.asarray(rng.normal(size=(50, m, 3)) + 0j)
    x_ref = np.linalg.solve(a, np.asarray(b))
    x = cholesky_solve(small_cholesky(a64), b)
    assert np.max(np.abs(np.asarray(x) - x_ref)) < 1e-9
    li = np.asarray(inv_cholesky(a64))
    assert np.max(np.abs(li @ l_ref - np.eye(m))) < 1e-9


@pytest.mark.parametrize("num_rx,num_tx,nstreams,nrx_ant", [
    (1, 1, 1, 1), (1, 1, 2, 2), (1, 2, 2, 4), (2, 2, 1, 2),
    (1, 1, 4, 4),
])
def test_lmmse_equalizer_plane_path(num_rx, num_tx, nstreams, nrx_ant):
    """Plane-based LMMSE == generic matrix path (f64, tight tol)."""
    from sionna_tpu.phy import config
    old = config.precision
    config.precision = "double"
    try:
        rg = _rg(num_tx, nstreams, 64)
        assoc = np.ones((num_rx, num_tx), int) if num_rx == 1 \
            else np.eye(max(num_rx, num_tx), dtype=int)[:num_rx, :num_tx]
        sm = StreamManagement(assoc, nstreams)
        equ = LMMSEEqualizer(rg, sm)
        rng = np.random.default_rng(11)
        sh_y = (3, num_rx, nrx_ant, 14, 64)
        sh_h = (3, num_rx, nrx_ant, num_tx, nstreams, 14, 64)
        y = jnp.asarray(rng.normal(size=sh_y) + 1j * rng.normal(size=sh_y))
        h = jnp.asarray(rng.normal(size=sh_h) + 1j * rng.normal(size=sh_h))
        ev = jnp.asarray(rng.uniform(0.005, 0.02, size=sh_h))
        no = jnp.asarray(0.1)
        a = equ._call_planes(y, h, ev, no)
        b = LMMSEEqualizer.__mro__[1].call(equ, y, h, ev, no)
        assert float(jnp.max(jnp.abs(a[0] - b[0]))) < 1e-8
        assert float(jnp.max(jnp.abs(a[1] - b[1]))) < 1e-7
    finally:
        config.precision = old


@pytest.mark.parametrize("cn", ["boxplus", "boxplus-phi"])
def test_lifted_boxplus_engines_agree(cn):
    rng = np.random.default_rng(0)
    enc = LDPC5GEncoder(400, 720)
    llr = jnp.asarray(rng.normal(scale=4, size=(8, 720)), jnp.float32)
    outs = {}
    for eng in ("segment", "lifted", "pallas"):
        dec = LDPC5GDecoder(enc, cn_update=cn, num_iter=8,
                            hard_out=False, engine=eng)
        outs[eng] = np.asarray(dec(llr))
    # lifted vs pallas: identical graph, bit-exact
    assert np.max(np.abs(outs["lifted"] - outs["pallas"])) == 0.0
    # segment vs lifted: same SPA algebra, different reduction order
    assert np.max(np.abs(outs["segment"] - outs["lifted"])) < 1e-3
    assert np.mean((outs["segment"] > 0) == (outs["lifted"] > 0)) > 0.999


def test_auto_engine_selects_lifted_for_boxplus():
    enc = LDPC5GEncoder(100, 200)
    dec = LDPC5GDecoder(enc, cn_update="boxplus-phi", num_iter=4)
    assert dec._use_lifted
