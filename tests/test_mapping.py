"""Tests for phy.mapping: constellations, mapper/demapper math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy import config
from sionna_tpu.phy.mapping import (
    qam, pam, pam_gray, Constellation, Mapper, Demapper, SymbolDemapper,
    SymbolLogits2LLRs, LLRs2SymbolLogits, SymbolInds2Bits, QAM2PAM,
    PAM2QAM, BinarySource, QAMSource)


def test_pam_gray_values():
    assert pam_gray(np.array([0])) == 1
    assert pam_gray(np.array([1])) == -1
    # 2-bit Gray PAM: 00->3? per 38.211 recursion
    vals = [pam_gray(np.array(list(np.binary_repr(i, 2)), dtype=int))
            for i in range(4)]
    assert sorted(vals) == [-3, -1, 1, 3]
    # Gray property: adjacent amplitude levels differ in one bit
    order = np.argsort(vals)
    labels = [np.binary_repr(i, 2) for i in range(4)]
    for a, b in zip(order[:-1], order[1:]):
        diff = sum(x != y for x, y in zip(labels[a], labels[b]))
        assert diff == 1


def test_qam_unit_energy():
    for k in (2, 4, 6, 8):
        c = qam(k)
        assert c.shape == (2 ** k,)
        assert np.mean(np.abs(c) ** 2) == pytest.approx(1.0, rel=1e-5)


def test_qpsk_38211():
    # TS 38.211: d(i) = ((1-2b0) + j(1-2b1)) / sqrt(2)
    c = qam(2)
    expected = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
    np.testing.assert_allclose(c, expected, rtol=1e-6)


def test_pam_unit_energy():
    for k in (1, 2, 3):
        c = pam(k)
        assert np.mean(np.abs(c) ** 2) == pytest.approx(1.0, rel=1e-5)


def test_mapper_demapper_roundtrip():
    for k in (2, 4, 6):
        mapper = Mapper("qam", k)
        demapper = Demapper("app", "qam", k, hard_out=True)
        b = BinarySource()([2, 3, 10 * k])
        x = mapper(b)
        assert x.shape == (2, 3, 10)
        llr = demapper(x, 1e-4)
        np.testing.assert_array_equal(np.asarray(llr), np.asarray(b))


def test_mapper_indices():
    mapper = Mapper("qam", 2, return_indices=True)
    b = jnp.asarray([[0., 0., 0., 1., 1., 0., 1., 1.]])
    x, ind = mapper(b)
    np.testing.assert_array_equal(np.asarray(ind), [[0, 1, 2, 3]])


def test_demapper_qpsk_closed_form():
    # For QPSK, LLR(bit0) = -4*a*Re(y)/no with a=1/sqrt(2)
    # (logit convention: bit=1 maps to negative real part)
    demapper = Demapper("app", "qam", 2)
    y = jnp.asarray([0.3 + 0.5j, -0.2 - 0.1j], jnp.complex64)
    no = 0.5
    llr = np.asarray(demapper(y, no))
    a = 1 / np.sqrt(2)
    expected = np.stack([-4 * a * np.real(np.asarray(y)) / no,
                         -4 * a * np.imag(np.asarray(y)) / no],
                        axis=-1).reshape(-1)
    np.testing.assert_allclose(llr.reshape(-1), expected, rtol=1e-4)


def test_app_vs_maxlog():
    demapper_app = Demapper("app", "qam", 4)
    demapper_ml = Demapper("maxlog", "qam", 4)
    key = jax.random.PRNGKey(0)
    y = (jax.random.normal(key, (100,)) +
         1j * jax.random.normal(jax.random.PRNGKey(1), (100,))
         ).astype(jnp.complex64)
    llr_app = np.asarray(demapper_app(y, 0.01))
    llr_ml = np.asarray(demapper_ml(y, 0.01))
    # At high SNR app ~ maxlog
    np.testing.assert_allclose(llr_app, llr_ml, rtol=1e-2, atol=0.5)


def test_demapper_with_prior():
    demapper = Demapper("app", "qam", 2)
    y = jnp.asarray([0.1 + 0.1j])
    # Strong prior toward bit=1 pushes LLR up
    prior = jnp.asarray([5.0, 5.0])
    llr_p = np.asarray(demapper(y, 1.0, prior))
    llr_0 = np.asarray(demapper(y, 1.0))
    assert np.all(llr_p > llr_0)


def test_symbol_demapper():
    sd = SymbolDemapper("qam", 2)
    sd_hard = SymbolDemapper("qam", 2, hard_out=True)
    c = qam(2)
    y = jnp.asarray(c, jnp.complex64)  # noiseless points
    logits = np.asarray(sd(y, 0.1))
    assert logits.shape == (4, 4)
    assert np.all(np.argmax(logits, -1) == np.arange(4))
    hard = np.asarray(sd_hard(y, 0.1))
    np.testing.assert_array_equal(hard, np.arange(4))


def test_llrs2symbollogits_roundtrip():
    s2l = SymbolLogits2LLRs("app", 2)
    l2s = LLRs2SymbolLogits(2)
    logits = jnp.asarray([[1.0, -2.0, 0.5, 3.0]])
    llrs = s2l(logits)
    back = l2s(llrs)
    # argmax preserved
    assert int(jnp.argmax(back[0])) == int(jnp.argmax(logits[0]))


def test_symbol_inds_to_bits():
    s2b = SymbolInds2Bits(2)
    out = np.asarray(s2b(jnp.asarray([0, 1, 2, 3])))
    np.testing.assert_array_equal(
        out, [[0, 0], [0, 1], [1, 0], [1, 1]])


def test_qam2pam_roundtrip():
    k = 4
    q2p = QAM2PAM(k)
    p2q = PAM2QAM(k)
    ind = jnp.arange(16)
    p1, p2 = q2p(ind)
    back = p2q(p1, p2)
    np.testing.assert_array_equal(np.asarray(back), np.arange(16))


def test_binary_source_deterministic():
    config.seed = 7
    b1 = np.asarray(BinarySource()([4, 5]))
    config.seed = 7
    b2 = np.asarray(BinarySource()([4, 5]))
    np.testing.assert_array_equal(b1, b2)
    assert set(np.unique(b1)).issubset({0.0, 1.0})


def test_qam_source():
    src = QAMSource(4, return_indices=True, return_bits=True)
    x, ind, b = src([3, 8])
    assert x.shape == (3, 8)
    assert ind.shape == (3, 8)
    assert b.shape == (3, 32)
    c = qam(4)
    np.testing.assert_allclose(np.asarray(x), c[np.asarray(ind)], rtol=1e-6)


def test_constellation_normalize_center():
    pts = np.array([1 + 1j, 3 - 1j, -2 + 0.5j, 0 - 2j])
    c = Constellation("custom", 2, points=pts, normalize=True, center=True)
    p = np.asarray(c.points)
    assert np.mean(np.abs(p) ** 2) == pytest.approx(1.0, rel=1e-5)
    assert abs(np.mean(p)) < 1e-6


def test_trainable_points_gradient():
    # Gradients flow through call-time points override
    mapper = Mapper("custom", 2, constellation=Constellation(
        "custom", 2, points=qam(2), normalize=True))

    def loss_fn(points):
        b = jnp.asarray([[0., 1., 1., 0.]])
        x = mapper(b, points=points)
        return jnp.sum(jnp.abs(x) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(qam(2), jnp.complex64))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("nbps", [2, 4, 6, 8])
@pytest.mark.parametrize("method", ["app", "maxlog"])
def test_demapper_separable_fast_path_exact(nbps, method):
    # The Gray-QAM I/Q-separable fast path must match the generic
    # full-constellation path to float32 rounding, with and without
    # priors.  Passing points explicitly forces the generic path.
    rng = np.random.default_rng(7)
    d = Demapper(method, "qam", nbps)
    assert d._sep is not None
    y = (rng.standard_normal((3, 40))
         + 1j * rng.standard_normal((3, 40))).astype(np.complex64)
    pts = np.asarray(d.constellation.points)
    prior = (3 * rng.standard_normal(nbps)).astype(np.float32)
    for p in (None, prior):
        fast = np.asarray(d(y, 0.7, p))
        gen = np.asarray(d(y, 0.7, p, points=pts))
        np.testing.assert_allclose(fast, gen, atol=1e-3, rtol=1e-4)


def test_demapper_custom_points_not_separable():
    # A non-Gray custom constellation must fall back to the generic path
    rng = np.random.default_rng(3)
    pts = (rng.standard_normal(16) + 1j * rng.standard_normal(16))
    d = Demapper("app", constellation=Constellation(
        "custom", 4, points=pts))
    assert d._sep is None


def test_constellation_points_host():
    c = Constellation("qam", 4, normalize=True, center=True)
    np.testing.assert_allclose(
        c.points_host, np.asarray(c.points), atol=1e-6)
