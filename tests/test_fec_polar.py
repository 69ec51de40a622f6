"""Polar code tests: golden vectors (encoder + SC decoder) and
roundtrips for SCL/BP/5G."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.fec.polar import (
    PolarEncoder, Polar5GEncoder, PolarSCDecoder, PolarSCLDecoder,
    PolarBPDecoder, Polar5GDecoder, generate_5g_ranking,
    generate_polar_transform_mat, generate_rm_code,
    generate_dense_polar)

CODES = "tests/codes/polar"


def test_polar_transform_matches_dense():
    n = 64
    frozen, info = generate_5g_ranking(32, n)
    enc = PolarEncoder(frozen, n)
    rng = np.random.default_rng(0)
    b = rng.integers(0, 2, (10, 32)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    g = generate_polar_transform_mat(6)
    u = np.zeros((10, n))
    u[:, info] = b
    np.testing.assert_array_equal(c, (u @ g) % 2)


@pytest.mark.parametrize("name", ["E45_k30_K41", "E70_k32_K43",
                                  "E127_k29_K40", "E1023_k400_K411",
                                  "E70_k28_K39"])
def test_polar5g_encoder_golden(name):
    u = np.load(f"{CODES}/{name}_u.npy")
    c_ref = np.load(f"{CODES}/{name}_c.npy")
    enc = Polar5GEncoder(u.shape[1], c_ref.shape[1])
    c = np.asarray(enc(jnp.asarray(u, jnp.float32)))
    np.testing.assert_array_equal(c, c_ref)


@pytest.mark.parametrize("name", ["P_128_37", "P_128_110",
                                  "P_256_128"])
def test_polar_sc_decoder_golden(name):
    a_vec = np.load(f"{CODES}/{name}_Avec.npy")
    llr_ch = np.load(f"{CODES}/{name}_Lch.npy")
    u_hat_ref = np.load(f"{CODES}/{name}_uhat.npy")
    frozen_pos = np.array(np.where(a_vec == 0)[0])
    dec = PolarSCDecoder(frozen_pos, len(a_vec))
    u_hat = np.asarray(dec(jnp.asarray(-llr_ch, jnp.float32)))
    np.testing.assert_array_equal(u_hat, u_hat_ref)


def _noisy_llr(c, ebno_db, rate, rng):
    esno = 10 ** (ebno_db / 10) * rate
    sigma2 = 1 / (2 * esno)
    y = (1 - 2 * c) + rng.normal(0, np.sqrt(sigma2), c.shape)
    return -2 * y / sigma2  # logits


def test_scl_outperforms_sc():
    rng = np.random.default_rng(1)
    k, n = 64, 128
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    b = rng.integers(0, 2, (200, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    llr = jnp.asarray(_noisy_llr(c, 2.0, 0.5, rng), jnp.float32)
    sc = PolarSCDecoder(frozen, n)
    scl = PolarSCLDecoder(frozen, n, list_size=8)
    bler_sc = np.mean(np.any(np.asarray(sc(llr)) != b, axis=-1))
    bler_scl = np.mean(np.any(np.asarray(scl(llr)) != b, axis=-1))
    assert bler_scl <= bler_sc


def test_bp_decoder():
    rng = np.random.default_rng(2)
    k, n = 32, 64
    frozen, _ = generate_5g_ranking(k, n)
    enc = PolarEncoder(frozen, n)
    b = rng.integers(0, 2, (50, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    dec = PolarBPDecoder(frozen, n, num_iter=20)
    u = np.asarray(dec(jnp.asarray((2 * c - 1) * 6.0, jnp.float32)))
    np.testing.assert_array_equal(u, b)
    # soft output
    dec_soft = PolarBPDecoder(frozen, n, num_iter=20, hard_out=False)
    llr_out = np.asarray(dec_soft(jnp.asarray((2 * c - 1) * 6.0,
                                              jnp.float32)))
    np.testing.assert_array_equal((llr_out > 0).astype(np.float32), b)


@pytest.mark.parametrize("dec_type", ["SC", "SCL", "BP"])
def test_polar5g_roundtrip(dec_type):
    # sized for the default-tier budget (tests/tier_manifest.py);
    # larger codes are exercised by the slow-tier SC/SCL goldens
    rng = np.random.default_rng(3)
    k, n = 32, 64
    enc = Polar5GEncoder(k, n)
    dec = Polar5GDecoder(enc, dec_type=dec_type, list_size=8)
    b = rng.integers(0, 2, (8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    u = np.asarray(dec(jnp.asarray((2 * c - 1) * 6.0, jnp.float32)))
    np.testing.assert_array_equal(u, b)


def test_polar5g_crc_status():
    rng = np.random.default_rng(4)
    k, n = 32, 64
    enc = Polar5GEncoder(k, n)
    dec = Polar5GDecoder(enc, dec_type="SCL", list_size=4,
                         return_crc_status=True)
    b = rng.integers(0, 2, (8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(b)))
    u, crc = dec(jnp.asarray((2 * c - 1) * 6.0, jnp.float32))
    assert np.all(np.asarray(crc))
    # garbage input: CRC should mostly fail
    u2, crc2 = dec(jnp.asarray(
        rng.normal(size=(8, n)), jnp.float32))
    assert np.mean(np.asarray(crc2)) < 0.5


def test_rm_code():
    frozen, info, n, k, d_min = generate_rm_code(1, 3)
    assert (n, k, d_min) == (8, 4, 4)


def test_dense_polar():
    frozen, _ = generate_5g_ranking(16, 32)
    pcm, gm = generate_dense_polar(frozen, 32, verbose=False)
    assert gm.shape == (16, 32)
    assert pcm.shape == (16, 32)
    assert np.sum((pcm @ gm.T) % 2) == 0


@pytest.mark.slow  # per-bit exactness proofs: vmapped reference decoder, minutes
def test_fast_ssc_matches_per_bit_sc():
    """The pruned-tree SC decoder must reproduce the per-bit SC
    decisions exactly (rate-0/rate-1/rep shortcuts are exact for the
    sign-multiplicative boxplus)."""
    import jax
    import jax.numpy as jnp
    from sionna_tpu.phy.fec.polar.decoding import (
        _fast_sc_decode_batch, _sc_decode_single)
    from sionna_tpu.phy.fec.polar.utils import generate_5g_ranking
    rng = np.random.default_rng(0)
    for (k, n) in [(32, 64), (140, 256)]:
        frozen_pos, _ = generate_5g_ranking(k, n)
        mask = np.zeros(n, np.float32)
        mask[frozen_pos] = 1
        llr = jnp.asarray(rng.normal(scale=2, size=(64, n)) + 1.0,
                          jnp.float32)
        fast = _fast_sc_decode_batch(llr, mask, n)
        naive = jax.vmap(lambda l: _sc_decode_single(l, mask, n))(llr)
        assert float(jnp.mean((fast == naive).astype(jnp.float32))) \
            == 1.0


@pytest.mark.slow  # per-bit exactness proofs: vmapped reference decoder, minutes
def test_scl_unpruned_matches_per_bit_exactly():
    """With node pruning disabled, the tree-recursion SCL decoder
    (including its stage-aware fork permutation, which skips buffers
    that are dead across a fork) must reproduce the per-bit SCL list
    bit-exactly: same best paths, same sorted path metrics."""
    import jax
    import jax.numpy as jnp
    from sionna_tpu.phy.fec.polar.decoding import (
        _fast_scl_decode_batch, _scl_decode_single)
    from sionna_tpu.phy.fec.polar.utils import generate_5g_ranking
    rng = np.random.default_rng(1)
    for k, n, lsz in [(64, 128, 8), (37, 64, 4), (100, 256, 2)]:
        frozen_pos, _ = generate_5g_ranking(k, n)
        mask = np.zeros(n, np.float32)
        mask[frozen_pos] = 1
        llr = jnp.asarray(rng.normal(scale=2, size=(48, n)) + 1.0,
                          jnp.float32)
        uf, pmf = _fast_scl_decode_batch(llr, mask, n, lsz,
                                         use_fast=False)
        un, pmn = jax.vmap(
            lambda l: _scl_decode_single(l, mask, n, lsz))(llr)
        bf = jnp.take_along_axis(
            uf, jnp.argmin(pmf, -1)[:, None, None], 1)[:, 0]
        bn = jnp.take_along_axis(
            un, jnp.argmin(pmn, -1)[:, None, None], 1)[:, 0]
        assert float(jnp.mean((bf == bn).astype(jnp.float32))) == 1.0
        assert float(jnp.max(jnp.abs(jnp.sort(pmf, -1)
                                     - jnp.sort(pmn, -1)))) < 1e-3


@pytest.mark.slow  # per-bit exactness proofs: vmapped reference decoder, minutes
def test_fast_sscl_matches_per_bit_scl():
    """Fast-SSCL (rate-0/rep/rate-1 pruning, Hashemi node metrics)
    produces the same decisions as per-bit SCL on virtually every
    block.  Rate-1 nodes fork the least-reliable bits first, which is
    the exact top-L extension within the node, while per-bit SCL
    prunes mid-node on partial metrics — so the lists may differ on
    rare blocks (either schedule can win); BLER is statistically
    identical (0.0928 vs 0.0925 at 1.5 dB over 4096 blocks,
    P(128,256) L=8)."""
    import jax
    import jax.numpy as jnp
    from sionna_tpu.phy.fec.polar.decoding import (
        _fast_scl_decode_batch, _scl_decode_single)
    from sionna_tpu.phy.fec.polar.utils import generate_5g_ranking
    rng = np.random.default_rng(1)
    k, n, lsz = 64, 128, 8
    frozen_pos, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, np.float32)
    mask[frozen_pos] = 1
    llr = jnp.asarray(rng.normal(scale=2, size=(64, n)) + 1.0,
                      jnp.float32)
    uf, pmf = _fast_scl_decode_batch(llr, mask, n, lsz)
    un, pmn = jax.vmap(
        lambda l: _scl_decode_single(l, mask, n, lsz))(llr)
    bf = jnp.take_along_axis(uf, jnp.argmin(pmf, -1)[:, None, None],
                             1)[:, 0]
    bn = jnp.take_along_axis(un, jnp.argmin(pmn, -1)[:, None, None],
                             1)[:, 0]
    # >=98% identical blocks at this size; metrics of the shared
    # survivors agree to rounding
    assert float(jnp.mean(jnp.all(bf == bn, axis=-1)
                          .astype(jnp.float32))) > 0.98
    # the fast schedule's best path is never materially worse than
    # the per-bit one at this block length
    assert float(jnp.max(jnp.min(pmf, -1) - jnp.min(pmn, -1))) < 1e-3


def test_scl_unsupported_flags_warn():
    import warnings as _w
    from sionna_tpu.phy.fec.polar import PolarSCLDecoder
    from sionna_tpu.phy.fec.polar.utils import generate_5g_ranking
    frozen_pos, _ = generate_5g_ranking(32, 64)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        PolarSCLDecoder(frozen_pos, 64, use_hybrid_sc=True)
    assert any("no effect" in str(r.message) for r in rec)


def test_spc_node_rule_is_node_optimal():
    """The opt-in SSCL-SPC rule returns exactly the L best
    even-parity codewords by exact path metric (brute-force oracle).
    Per-bit SCL is greedy-suboptimal inside SPC nodes, so this rule
    is better-or-equal but not bit-identical to it — which is why it
    is opt-in (use_spc) and the default stays reference-exact."""
    import itertools
    import jax.numpy as jnp
    from sionna_tpu.phy.fec.polar.decoding import \
        _fast_scl_decode_batch
    n, lsz = 8, 4
    mask = np.zeros(n, np.float32)
    mask[0] = 1  # a single SPC node as the whole code
    rng = np.random.default_rng(3)
    llr = jnp.asarray(rng.normal(scale=2, size=(5, n)), jnp.float32)
    _, pmf = _fast_scl_decode_batch(llr, mask, n, lsz, use_spc=True)
    l_np = np.asarray(llr)
    for b in range(l_np.shape[0]):
        cands = []
        for bits in itertools.product([0, 1], repeat=n):
            if sum(bits) % 2:
                continue
            pm = float(np.sum(np.logaddexp(
                0., -(1 - 2 * np.array(bits)) * l_np[b])))
            cands.append(pm)
        best = np.sort(cands)[:lsz]
        np.testing.assert_allclose(np.sort(np.asarray(pmf)[b]), best,
                                   rtol=1e-5)


def test_scl_use_spc_decodes_correctly():
    """SCL with SPC pruning still decodes a moderate-SNR batch with
    BLER comparable to the default schedule."""
    from sionna_tpu.phy.fec.polar import (Polar5GEncoder,
                                          PolarSCLDecoder)
    from sionna_tpu.phy.fec.polar.utils import generate_5g_ranking
    k, n = 32, 64
    frozen_pos, _ = generate_5g_ranking(k, n)
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    from sionna_tpu.phy.fec.polar.encoding import PolarEncoder
    enc = PolarEncoder(frozen_pos, n)
    u = rng.integers(0, 2, (128, k)).astype(np.float32)
    cw = np.asarray(enc(u))
    llr = (1 - 2 * cw) * 3.0 + rng.normal(
        scale=1., size=cw.shape).astype(np.float32)
    for use_spc in (False, True):
        dec = PolarSCLDecoder(frozen_pos, n, list_size=8,
                              use_spc=use_spc)
        u_hat = np.asarray(dec(jnp.asarray(-llr, jnp.float32)))
        bler = np.mean(np.any(u_hat != u, axis=-1))
        assert bler < 0.1, (use_spc, bler)


@pytest.mark.slow   # ~2k-block Monte-Carlo per variant
def test_scl_spc_bler_delta():
    """Quantifies the BLER delta of the (default) SSCL-SPC pruning
    vs the bit-exact per-bit schedule on the CRC-aided 5G decoder:
    node-optimal forking must be statistically better-or-equal.
    This is the certification behind use_spc=True being the
    Polar5GDecoder default."""
    import jax
    import jax.numpy as jnp
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.fec.polar import Polar5GEncoder, Polar5GDecoder
    from sionna_tpu.phy.utils import ebnodb2no

    k, n, ebno_db, n_blocks = 120, 256, 2.0, 4096
    enc = Polar5GEncoder(k, n)
    src = BinarySource()
    mapper, demapper, awgn = Mapper("qam", 2), Demapper("app", "qam",
                                                        2), AWGN()
    no = ebnodb2no(ebno_db, 2, k / n)
    blers = {}
    for use_spc in (False, True):
        dec = Polar5GDecoder(enc, dec_type="SCL", list_size=8,
                             use_spc=use_spc)

        @jax.jit
        def run(key, dec=dec):
            k1, k2 = jax.random.split(key)
            u = src([n_blocks, k], key=k1)
            y = awgn(mapper(enc(u)), no, key=k2)
            u_hat = dec(demapper(y, no))
            return jnp.sum(jnp.any(u != u_hat, axis=-1))

        errs = int(run(jax.random.PRNGKey(5)))
        blers[use_spc] = errs / n_blocks
    # both variants see identical noise (same key) -> paired
    # comparison: SPC may not be materially worse.  Allow 20% slack
    # on the paired estimate for the rare tie-breaking differences.
    assert blers[False] > 0, "SNR point carries no information"
    assert blers[True] <= blers[False] * 1.2 + 2. / n_blocks, blers
