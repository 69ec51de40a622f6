"""FEC wave 2 tests: conv/turbo golden vectors, linear/OSD, utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.fec.conv import (ConvEncoder, ViterbiDecoder,
                                     BCJRDecoder, Trellis)
from sionna_tpu.phy.fec.turbo import TurboEncoder, TurboDecoder
from sionna_tpu.phy.fec.linear import LinearEncoder, OSDecoder
from sionna_tpu.phy.fec.utils import (
    load_parity_check_examples, pcm2gm, gm2pcm, verify_gm_pcm,
    GaussianPriorSource, j_fun, j_fun_inv, make_systematic,
    generate_reg_ldpc, int_mod_2, llr2mi, get_exit_analytic)
from sionna_tpu.phy.fec.ldpc import (LDPCBPDecoder, WeightedBPCallback)
from sionna_tpu.phy.utils import ebnodb2no

CONV = "tests/codes/conv/"
TURBO = "tests/codes/turbo/"

_CONV_CASES = [
    (["101", "111"], "conv_rate_half_57_"),
    (["1101", "1111"], "conv_rate_half_6474_"),
    (["101", "111", "111"], "conv_rate_onethird_577_"),
    (["101", "111", "111", "111"], "conv_rate_onefourth_5777_"),
]


@pytest.mark.parametrize("gen_poly,name", _CONV_CASES)
def test_conv_encoder_golden(gen_poly, name):
    u = np.load(CONV + name + "ref_u.npy")
    c_ref = np.load(CONV + name + "ref_x.npy")
    enc = ConvEncoder(gen_poly=gen_poly)
    c = np.asarray(enc(jnp.asarray(u, jnp.float32)))
    np.testing.assert_array_equal(c, c_ref)


@pytest.mark.parametrize("gen_poly,name", _CONV_CASES)
def test_viterbi_decoder_golden(gen_poly, name):
    yref = np.load(CONV + name + "ref_y.npy")
    uhat_ref = np.load(CONV + name + "ref_uhat.npy")
    no = float(ebnodb2no(4.95, num_bits_per_symbol=2, coderate=1.))
    dec = ViterbiDecoder(gen_poly=gen_poly, method="soft_llr")
    uhat = np.asarray(dec(jnp.asarray(2 * yref / no, jnp.float32)))
    np.testing.assert_array_equal(uhat, uhat_ref)


def test_bcjr_matches_viterbi_high_snr():
    gen_poly = ["101", "111"]
    yref = np.load(CONV + "conv_rate_half_57_ref_y.npy")
    uhat_ref = np.load(CONV + "conv_rate_half_57_ref_uhat.npy")
    no = float(ebnodb2no(4.95, num_bits_per_symbol=2, coderate=1.))
    dec = BCJRDecoder(gen_poly=gen_poly)
    uhat = np.asarray(dec(jnp.asarray(2 * yref / no, jnp.float32)))
    np.testing.assert_array_equal(uhat, uhat_ref)


def test_conv_terminated_roundtrip():
    enc = ConvEncoder(rate=1 / 2, constraint_length=5, terminate=True)
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (10, 100)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    assert c.shape[-1] == (100 + 4) * 2
    dec = ViterbiDecoder(gen_poly=enc.gen_poly, terminate=True)
    uhat = np.asarray(dec(jnp.asarray((2 * c - 1) * 5., jnp.float32)))
    np.testing.assert_array_equal(uhat, u)


def test_rsc_conv_roundtrip():
    enc = ConvEncoder(rate=1 / 2, constraint_length=4, rsc=True)
    rng = np.random.default_rng(1)
    u = rng.integers(0, 2, (10, 64)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    dec = BCJRDecoder(gen_poly=enc.gen_poly, rsc=True)
    uhat = np.asarray(dec(jnp.asarray((2 * c - 1) * 5., jnp.float32)))
    np.testing.assert_array_equal(uhat, u)


@pytest.mark.parametrize("k", [40, 112, 168, 432])
def test_turbo_encoder_golden(k):
    u = np.load(TURBO + f"ref_k{k}_u.npy")
    c_ref = np.load(TURBO + f"ref_k{k}_x.npy")
    enc = TurboEncoder(rate=1 / 3, terminate=True, constraint_length=4)
    c = np.asarray(enc(jnp.asarray(u, jnp.float32)))
    np.testing.assert_array_equal(c, c_ref)


@pytest.mark.parametrize("k", [40, 112, 168])
def test_turbo_decoder_golden(k):
    uhat_ref = np.load(TURBO + f"ref_k{k}_uhat.npy")
    yref = np.load(TURBO + f"ref_k{k}_y.npy")
    enc = TurboEncoder(rate=1 / 3, terminate=True, constraint_length=4)
    dec = TurboDecoder(enc, num_iter=10)
    no = 1 / ((1 / 3) * 10 ** (0.0 / 10))
    uhat = np.asarray(dec(jnp.asarray(-4. * yref / no, jnp.float32)))
    np.testing.assert_array_equal(uhat, uhat_ref)


def test_turbo_rate_half():
    enc = TurboEncoder(rate=1 / 2, constraint_length=3,
                       terminate=False)
    rng = np.random.default_rng(2)
    u = rng.integers(0, 2, (10, 100)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    assert c.shape[-1] == 200
    dec = TurboDecoder(enc, num_iter=5)
    uhat = np.asarray(dec(jnp.asarray((2 * c - 1) * 5., jnp.float32)))
    np.testing.assert_array_equal(uhat, u)


def test_linear_encoder_and_osd():
    pcm, k, n, r = load_parity_check_examples(0)
    gm = pcm2gm(pcm)
    assert verify_gm_pcm(gm, pcm)
    enc = LinearEncoder(gm)
    dec = OSDecoder(gm, t=2)
    rng = np.random.default_rng(3)
    b = rng.integers(0, 2, (100, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    # codewords satisfy parity checks
    assert np.sum((c @ pcm.T) % 2) == 0
    c_hat = np.asarray(dec(jnp.asarray((2 * c - 1) * 5., jnp.float32)))
    np.testing.assert_array_equal(c_hat, c)


def test_osd_from_pcm():
    pcm, k, n, r = load_parity_check_examples(1)  # BCH(63,45)
    dec = OSDecoder(pcm, t=1, is_pcm=True)
    enc = LinearEncoder(pcm, is_pcm=True)
    rng = np.random.default_rng(4)
    b = rng.integers(0, 2, (20, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    c_hat = np.asarray(dec(jnp.asarray((2 * c - 1) * 5., jnp.float32)))
    np.testing.assert_array_equal(c_hat, c)


def test_j_fun_inverse():
    mu = jnp.asarray([0.5, 1.0, 4.0, 10.0])
    mi = j_fun(mu)
    mu2 = j_fun_inv(mi)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu),
                               rtol=1e-3)


def test_gaussian_prior_source():
    gps = GaussianPriorSource()
    llr = np.asarray(gps([100000], no=0.5,
                         key=jax.random.PRNGKey(0)))
    # all-zero transmission: mean = -4/no/2 = -mu
    assert llr.mean() == pytest.approx(-4., rel=0.05)
    mi = float(llr2mi(-jnp.asarray(llr)))
    assert 0 < mi <= 1


def test_make_systematic_and_reg_ldpc():
    pcm, k, n, r = generate_reg_ldpc(3, 6, 100, verbose=False)
    assert pcm.shape == (n - k, n)
    assert np.all(pcm.sum(axis=0) <= 3 + 3)  # roughly regular
    gm = pcm2gm(pcm) if np.linalg.matrix_rank(pcm) == n - k else None
    # make_systematic roundtrip on a full-rank example
    pcm0, k0, n0, _ = load_parity_check_examples(0)
    m, perm = make_systematic(np.array(pcm0), is_pcm=True)
    assert m.shape == pcm0.shape


def test_exit_analytic():
    pcm, k, n, r = load_parity_check_examples(3)
    mi_a, mi_ev, mi_ec = get_exit_analytic(pcm, 3.0)
    assert len(mi_a) == len(mi_ev) == len(mi_ec)
    assert np.all(np.diff(mi_ev) >= -1e-6)  # monotone


def test_weighted_bp_callback():
    pcm, k, n, r = load_parity_check_examples(0)
    dec = LDPCBPDecoder(pcm, num_iter=5, hard_out=False)
    cb = WeightedBPCallback(dec.num_edges)

    def loss(w):
        d = LDPCBPDecoder(pcm, num_iter=3, hard_out=False,
                          v2c_callbacks=[cb.with_weights(w)])
        llr = jnp.ones((2, n)) * 2.
        return jnp.mean(d(llr) ** 2)

    g = jax.grad(loss)(cb.weights)
    assert np.all(np.isfinite(np.asarray(g)))
