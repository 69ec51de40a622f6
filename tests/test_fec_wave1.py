"""FEC wave 1 tests: CRC (golden vectors), scrambling, interleaving,
5G LDPC encoder/decoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sionna_tpu.phy.fec import (
    CRCEncoder, CRCDecoder, Scrambler, TB5GScrambler, Descrambler,
    RowColumnInterleaver, RandomInterleaver, Deinterleaver,
    Turbo3GPPInterleaver)
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder, \
    LDPCBPDecoder
from sionna_tpu.phy.fec.scrambling import generate_prng_seq
from sionna_tpu.phy.mapping import BinarySource

CODES = "tests/codes"


# ----------------------------------------------------------------------
# CRC
# ----------------------------------------------------------------------
@pytest.mark.parametrize("deg", ["CRC6", "CRC11", "CRC16", "CRC24A",
                                 "CRC24B", "CRC24C"])
def test_crc_golden(deg):
    u = np.load(f"{CODES}/crc/crc_u_{deg}.npy")
    x_ref = np.load(f"{CODES}/crc/crc_x_ref_np_{deg}.npy")
    enc = CRCEncoder(deg)
    x = np.asarray(enc(jnp.asarray(u, jnp.float32))).reshape(-1)
    np.testing.assert_array_equal(x[-enc.crc_length:], x_ref)


def test_crc_roundtrip():
    enc = CRCEncoder("CRC24A")
    dec = CRCDecoder(enc)
    b = BinarySource()([4, 3, 100])
    x = enc(b)
    assert x.shape == (4, 3, 124)
    u, valid = dec(x)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(b))
    assert np.all(np.asarray(valid))
    # flip one bit -> invalid
    x_bad = np.array(x)
    x_bad[0, 0, 5] = 1 - x_bad[0, 0, 5]
    _, valid2 = dec(jnp.asarray(x_bad))
    assert not np.asarray(valid2)[0, 0, 0]
    assert np.asarray(valid2)[1:].all()


# ----------------------------------------------------------------------
# Scrambling
# ----------------------------------------------------------------------
def test_scrambler_involution():
    s = Scrambler(seed=123)
    b = BinarySource()([5, 100])
    x = s(b)
    assert not np.array_equal(np.asarray(x), np.asarray(b))
    y = s(x)  # same seed, keep_state -> involution
    np.testing.assert_array_equal(np.asarray(y), np.asarray(b))


def test_scrambler_llr_domain():
    s = Scrambler(seed=5, binary=False)
    llr = jnp.asarray(np.random.default_rng(0).normal(size=(4, 64)),
                      jnp.float32)
    out = np.asarray(s(llr))
    # magnitudes preserved, signs flipped where sequence is 1
    np.testing.assert_allclose(np.abs(out), np.abs(np.asarray(llr)),
                               rtol=1e-6)


def test_descrambler():
    s = Scrambler(seed=77)
    d = Descrambler(s)
    b = BinarySource()([3, 50])
    np.testing.assert_array_equal(np.asarray(d(s(b))), np.asarray(b))


def test_tb5g_scrambler_involution():
    s = TB5GScrambler(n_rnti=20001, n_id=41)
    b = BinarySource()([4, 96])
    x = s(b)
    assert not np.array_equal(np.asarray(x), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(s(x)), np.asarray(b))


def test_gold_sequence_properties():
    # deterministic, balanced, differs across c_init
    s1 = generate_prng_seq(1000, 1234)
    s2 = generate_prng_seq(1000, 1234)
    s3 = generate_prng_seq(1000, 4321)
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    assert 0.4 < s1.mean() < 0.6


def test_tb5g_multi_stream():
    s = TB5GScrambler(n_rnti=[1, 2], n_id=[3, 4])
    b = BinarySource()([4, 2, 50])
    x = np.asarray(s(b))
    # streams scrambled differently
    b_np = np.asarray(b)
    assert not np.array_equal(x[:, 0] != b_np[:, 0], x[:, 1] != b_np[:, 1])


# ----------------------------------------------------------------------
# Interleaving
# ----------------------------------------------------------------------
def test_row_column_interleaver():
    il = RowColumnInterleaver(row_depth=4)
    x = jnp.arange(12, dtype=jnp.float32)[None]
    y = np.asarray(il(x))[0]
    # write rows of depth 4, read columns: [0,4,8,1,5,9,2,6,10,3,7,11]
    np.testing.assert_array_equal(y, [0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7, 11])
    z = np.asarray(il(il(x), inverse=True))[0]
    np.testing.assert_array_equal(z, np.arange(12))


def test_random_interleaver_roundtrip():
    il = RandomInterleaver(seed=42)
    de = Deinterleaver(il)
    x = BinarySource()([3, 64])
    np.testing.assert_array_equal(np.asarray(de(il(x))), np.asarray(x))
    # explicit seed at call
    y1 = np.asarray(il(x, seed=7))
    y2 = np.asarray(il(x, seed=7))
    np.testing.assert_array_equal(y1, y2)


def test_turbo_interleaver_roundtrip():
    il = Turbo3GPPInterleaver()
    de = Deinterleaver(il)
    for n in (40, 100, 6144):
        x = BinarySource()([2, n])
        np.testing.assert_array_equal(np.asarray(de(il(x))),
                                      np.asarray(x))


# ----------------------------------------------------------------------
# LDPC
# ----------------------------------------------------------------------
@pytest.mark.parametrize("k,n", [(100, 200), (973, 1500), (3824, 5736),
                                 (4000, 6000), (8448, 12672)])
def test_ldpc_encoder_syndrome(k, n):
    enc = LDPC5GEncoder(k, n)
    u = np.asarray(BinarySource()([4, k]))
    u_fill = np.concatenate(
        [u, np.zeros((4, enc.k_ldpc - k), np.float32)], 1)
    c = np.asarray(enc._encode_core(jnp.asarray(u_fill)))
    synd = (c @ enc.pcm.toarray().T) % 2
    assert synd.sum() == 0
    out = enc(jnp.asarray(u))
    assert out.shape == (4, n)


def test_ldpc_encoder_systematic():
    # output starts with punctured systematic part: bits 2z..k
    k, n = 400, 800
    enc = LDPC5GEncoder(k, n)
    u = np.asarray(BinarySource()([2, k]))
    c = np.asarray(enc(jnp.asarray(u)))
    np.testing.assert_array_equal(c[:, :k - 2 * enc.z], u[:, 2 * enc.z:])


@pytest.mark.parametrize("cn", ["boxplus-phi", "minsum", "offset-minsum"])
def test_ldpc_decode_noiseless(cn):
    # sized for the default-tier budget (tests/tier_manifest.py);
    # the larger decode runs are slow-tier (test_ldpc_decode_awgn)
    k, n = 250, 500
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, cn_update=cn, num_iter=10)
    u = np.asarray(BinarySource()([4, k]))
    c = np.asarray(enc(jnp.asarray(u)))
    llr = jnp.asarray((2 * c - 1) * 8.0, jnp.float32)
    u_hat = np.asarray(dec(llr))
    np.testing.assert_array_equal(u_hat, u)


def test_ldpc_decode_awgn():
    # rate-1/2 code at 2 dB decodes error-free for a small batch
    k, n = 1000, 2000
    rng = np.random.default_rng(0)
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, num_iter=20)
    u = rng.integers(0, 2, (8, k)).astype(np.float32)
    c = np.asarray(enc(jnp.asarray(u)))
    ebno = 10 ** (2.0 / 10)
    sigma2 = 1 / (2 * (k / n) * ebno)
    y = (1 - 2 * c) + rng.normal(0, np.sqrt(sigma2), c.shape)
    llr = jnp.asarray(-2 * y / sigma2, jnp.float32)
    u_hat = np.asarray(dec(llr))
    assert np.mean(u_hat != u) == 0.0


def test_ldpc_decoder_soft_output_and_state():
    k, n = 200, 400
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=False, return_state=True,
                        num_iter=5)
    u = np.asarray(BinarySource()([2, k]))
    c = np.asarray(enc(jnp.asarray(u)))
    llr = jnp.asarray((2 * c - 1) * 4.0, jnp.float32)
    soft, state = dec(llr)
    assert soft.shape == (2, k)
    # soft logits decide correctly
    np.testing.assert_array_equal((np.asarray(soft) > 0), u.astype(bool))
    # warm restart from state runs
    soft2, _ = dec(llr, msg_v2c=state)
    assert soft2.shape == (2, k)


def test_ldpc_output_interleaver():
    k, n, q = 400, 800, 4
    enc = LDPC5GEncoder(k, n, num_bits_per_symbol=q)
    enc_ref = LDPC5GEncoder(k, n)
    u = BinarySource()([2, k])
    c_int = np.asarray(enc(u))
    c_ref = np.asarray(enc_ref(u))
    np.testing.assert_array_equal(
        c_int, c_ref[:, np.asarray(enc.out_int)])
    dec = LDPC5GDecoder(enc, num_iter=8)
    llr = jnp.asarray((2 * c_int - 1) * 8.0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(dec(llr)), np.asarray(u))


def test_generic_bp_decoder_hamming():
    # (7,4) Hamming code: exact ML-like behavior on clean input
    pcm = np.array([[1, 0, 1, 0, 1, 0, 1],
                    [0, 1, 1, 0, 0, 1, 1],
                    [0, 0, 0, 1, 1, 1, 1]])
    dec = LDPCBPDecoder(pcm, num_iter=10, hard_out=True)
    c = np.zeros((1, 7), np.float32)  # all-zero codeword
    llr = jnp.asarray((2 * c - 1) * 4.0)
    out = np.asarray(dec(llr))
    np.testing.assert_array_equal(out, c)


def test_ldpc_jit_grad():
    # decoder is differentiable (soft output) and jittable
    k, n = 100, 200
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=False, num_iter=3,
                        cn_update="minsum")

    @jax.jit
    def loss(llr):
        return jnp.mean(dec(llr) ** 2)

    llr = jnp.asarray(np.random.default_rng(0).normal(size=(2, n)),
                      jnp.float32)
    g = jax.grad(loss)(llr)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow  # cross-engine grids: many jit variants, minutes on one CPU
def test_ldpc_decoder_engines_agree():
    """Matmul and segment engines, f32 and bf16 messages, must give
    identical hard decisions at a moderate SNR."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    enc = LDPC5GEncoder(512, 1024, num_bits_per_symbol=2)
    rng = np.random.default_rng(7)
    b = rng.integers(0, 2, (4, 512)).astype(np.float64)
    c = np.asarray(enc(jnp.asarray(b)))
    llr = jnp.asarray((2 * c - 1) * 2. + rng.normal(0, 1., c.shape))
    outs = []
    for eng in ("segment", "matmul"):
        for prec in (None, "bf16"):
            d = LDPC5GDecoder(enc, num_iter=20, cn_update="minsum",
                              engine=eng, internal_precision=prec)
            outs.append(np.asarray(d(llr)))
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])
    np.testing.assert_array_equal(outs[0], b)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        LDPC5GDecoder(enc, engine="cuda")


@pytest.mark.slow  # cross-engine grids: many jit variants, minutes on one CPU
def test_ldpc_layered_schedule():
    """Layered (serial-C) scheduling converges ~2x faster per
    iteration than flooding."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.utils import ebnodb2no
    enc = LDPC5GEncoder(512, 1024, num_bits_per_symbol=2)
    src, mapper = BinarySource(), Mapper("qam", 2)
    dem, awgn = Demapper("app", "qam", 2), AWGN()
    no = float(ebnodb2no(2.5, 2, 0.5))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    b = src([500, 512], key=k1)
    y = awgn(mapper(enc(b)), no, key=k2)
    llr = dem(y, no)

    def ber(d):
        return float(jnp.mean(jnp.abs(d(llr) - b)))

    flood5 = ber(LDPC5GDecoder(enc, num_iter=5,
                               cn_update="boxplus-phi"))
    layer5 = ber(LDPC5GDecoder(enc, num_iter=5,
                               cn_update="boxplus-phi",
                               cn_schedule="layered"))
    layer10 = ber(LDPC5GDecoder(enc, num_iter=10,
                                cn_update="boxplus-phi",
                                cn_schedule="layered"))
    assert layer5 < flood5 / 5     # much faster convergence
    assert layer10 <= 1e-4
    # custom layer partition also accepted
    import numpy as _np
    z = enc.z
    pcm_rows = LDPC5GDecoder(enc).num_cns
    layers = [_np.arange(i, min(i + z, pcm_rows))
              for i in range(0, pcm_rows, z)]
    d_custom = LDPC5GDecoder(enc, num_iter=5,
                             cn_update="boxplus-phi",
                             cn_schedule=layers)
    assert ber(d_custom) == layer5


@pytest.mark.slow  # cross-engine grids: many jit variants, minutes on one CPU
def test_ldpc_pallas_engine_interpret():
    """The experimental fused Pallas engine is bit-exact vs the XLA
    lifted engine (interpreter mode on CPU)."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    enc = LDPC5GEncoder(256, 512)
    rng = np.random.default_rng(11)
    b = rng.integers(0, 2, (4, 256)).astype(np.float64)
    c = np.asarray(enc(jnp.asarray(b)))
    llr = jnp.asarray((2 * c - 1) * 2. + rng.normal(0, 1., c.shape))
    d_l = LDPC5GDecoder(enc, num_iter=5, cn_update="minsum",
                        hard_out=False)
    d_p = LDPC5GDecoder(enc, num_iter=5, cn_update="minsum",
                        hard_out=False, engine="pallas")
    np.testing.assert_array_equal(np.asarray(d_l(llr)),
                                  np.asarray(d_p(llr)))


# ------------------------------------------------------------------ #
# Execution-mode grid: every engine x jit x precision combination
# must produce the same decisions (reference pattern:
# test/unit/fec/test_ldpc_decoding.py:93-119)
# ------------------------------------------------------------------ #

@pytest.mark.slow  # cross-engine grids: many jit variants, minutes on one CPU
@pytest.mark.parametrize("engine", ["segment", "matmul", "lifted"])
@pytest.mark.parametrize("use_jit", [False, True])
@pytest.mark.parametrize("precision", ["single", "double"])
def test_ldpc_decoder_mode_grid(engine, use_jit, precision):
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    k, n, batch = 100, 200, 8
    enc = LDPC5GEncoder(k, n, precision=precision)
    dec = LDPC5GDecoder(enc, hard_out=True, num_iter=10,
                        cn_update="minsum", engine=engine,
                        precision=precision)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.integers(0, 2, (batch, k)).astype(np.float32))
    c = enc(u)
    noise = jnp.asarray(rng.normal(0., 0.8, (batch, n)),
                        jnp.float32)
    llr = (2.0 * c - 1.0) * 4.0 + noise
    fn = dec
    if use_jit:
        fn = jax.jit(lambda x: dec(x))
    u_hat = np.asarray(fn(llr))
    # reference decisions: the default segment engine, eager, single
    enc0 = LDPC5GEncoder(k, n)
    dec0 = LDPC5GDecoder(enc0, hard_out=True, num_iter=10,
                         cn_update="minsum", engine="segment")
    u_ref = np.asarray(dec0(llr))
    np.testing.assert_array_equal(u_hat, u_ref)


@pytest.mark.slow  # cross-engine grids: many jit variants, minutes on one CPU
@pytest.mark.parametrize("cn", ["minsum", "boxplus"])
def test_ldpc_layered_lifted_engines_match_segment(cn):
    """Layered (serial-C) scheduling on the lifted and Pallas engines
    is bit-identical to the segment layered engine."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    k, n, batch = 400, 800, 16
    enc = LDPC5GEncoder(k, n)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.integers(0, 2, (batch, k)).astype(np.float32))
    c = np.asarray(enc(u))
    llr = jnp.asarray((2 * c - 1) * 2.0
                      + rng.normal(0., 1.1, (batch, n)), jnp.float32)
    outs = {}
    for engine in ("segment", "lifted", "pallas"):
        dec = LDPC5GDecoder(enc, num_iter=8, cn_update=cn,
                            engine=engine, cn_schedule="layered",
                            hard_out=True)
        outs[engine] = np.asarray(dec(llr))
    np.testing.assert_array_equal(outs["segment"], outs["lifted"])
    np.testing.assert_array_equal(outs["lifted"], outs["pallas"])
    # layered converges at least as fast as flooding at equal iters
    dec_f = LDPC5GDecoder(enc, num_iter=8, cn_update=cn,
                          engine="lifted", hard_out=True)
    ber_l = float(np.mean(np.abs(outs["lifted"] - np.asarray(u))))
    ber_f = float(jnp.mean(jnp.abs(dec_f(llr) - u)))
    assert ber_l <= ber_f + 1e-9


def test_row_column_interleaver_fast_path_matches_perm():
    # The divisible/last-axis transpose fast path must equal the
    # gather-based permutation path exactly (and roundtrip).
    for n, rd in [(12, 4), (30, 5), (13, 4), (12, 5)]:
        il = RowColumnInterleaver(row_depth=rd)
        x = jnp.arange(2 * n, dtype=jnp.float32).reshape(2, n)
        perm, perm_inv = il._perms(n)
        np.testing.assert_array_equal(
            np.asarray(il(x)), np.asarray(jnp.take(x, perm, axis=-1)))
        np.testing.assert_array_equal(
            np.asarray(il(il(x), inverse=True)), np.asarray(x))


def test_ldpc_identity_updates_and_int_aliases():
    # identity CN/VN updates (debug hooks, reference decoding.py:585,
    # 644) run end-to-end; TF-era alias names resolve to the jnp
    # variants
    from sionna_tpu.phy.fec.ldpc import LDPCBPDecoder
    from sionna_tpu.phy.fec.utils import (bin2int_tf, int2bin_tf,
                                          bin2int_jnp, int2bin_jnp)
    pcm = np.array([[1, 1, 0, 1, 0, 0], [0, 1, 1, 0, 1, 0],
                    [1, 0, 1, 0, 0, 1]], np.int32)
    dec = LDPCBPDecoder(pcm, cn_update="identity",
                        vn_update="identity", hard_out=False,
                        num_iter=2)
    llr = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6)),
                      jnp.float32)
    assert np.all(np.isfinite(np.asarray(dec(llr))))
    assert bin2int_tf is bin2int_jnp and int2bin_tf is int2bin_jnp
    v = int2bin_tf(jnp.asarray([5, 2]), 4)
    np.testing.assert_array_equal(np.asarray(v),
                                  [[0, 1, 0, 1], [0, 0, 1, 0]])
    np.testing.assert_array_equal(np.asarray(bin2int_tf(v)), [5, 2])
