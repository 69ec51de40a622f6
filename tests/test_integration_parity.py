"""Reference-anchored integration parity tests.

Two layers:

1. BLER parity vs reference-generated curves (the 0.1 dB north
   star).  The shipped ``sionna_tpu/sys/bler_tables/*.json`` are
   byte-identical copies of the reference's tables, which the
   reference produced by Monte-Carlo simulation of ITS OWN LDPC
   coded-AWGN stack (reference sys/phy_abstraction.py:993,
   nr/utils.py:860).  Regenerating points with the Sionna-TPU stack
   and comparing equivalent-SNR offsets is an end-to-end parity check
   of encoder + rate matching + mapping + demapping + BP decoding.
   See tools/bler_parity.py for the measurement methodology and the
   wider offline sweep.

2. Ported reference integration suite (test/integration/
   test_fec_5G.py): the same encoder/decoder matrix simulated
   end-to-end over AWGN with consistency checks.
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))
import bler_parity  # noqa: E402


# --------------------------------------------------------------- #
# 1. BLER parity vs reference tables
# --------------------------------------------------------------- #

def test_bler_parity_mcs5_cbs100():
    """BG2 code, QPSK-class MCS: within 0.1 dB of the reference
    curve (~2000 blocks; noise floor ~0.03 dB)."""
    off, detail = bler_parity.run_config(5, 100, batch_size=1000,
                                         max_mc_iter=2, verbose=False)
    assert off < 0.1, detail


@pytest.mark.slow
@pytest.mark.parametrize("category,index,mcs,cbs",
                         bler_parity.FULL_SET)
def test_bler_parity_full(category, index, mcs, cbs):
    # enough Monte-Carlo depth that the estimator noise (~0.03 dB at
    # 6k blocks for the smallest CBS) stays well inside the 0.1 dB
    # budget
    off, detail = bler_parity.run_config(mcs, cbs, category=category,
                                         index=index,
                                         batch_size=2000,
                                         max_mc_iter=10,
                                         verbose=False)
    assert off < 0.1, detail


@pytest.mark.slow
@pytest.mark.parametrize("category,index,mcs,n_re",
                         bler_parity.TB_SET)
def test_bler_parity_multi_cb_tb(category, index, mcs, n_re):
    """Multi-code-block transport block through TBEncoder/TBDecoder
    vs the per-CB table anchor (see bler_parity.run_tb_config)."""
    off, detail = bler_parity.run_tb_config(
        mcs, n_re, category=category, index=index, batch_size=200,
        max_mc_iter=5, verbose=False)
    assert off < 0.1, detail


def test_bler_tables_match_reference_bytes():
    """The shipped tables must stay byte-identical to the reference's
    (they are the parity anchor)."""
    import hashlib
    import sionna_tpu.sys as sys_pkg
    path = os.path.join(os.path.dirname(sys_pkg.__file__),
                        "bler_tables", "PUSCH_table1.json")
    with open(path, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    assert digest == "192b30da818dfa5d30f68ba349fd666d"


# --------------------------------------------------------------- #
# 2. Ported reference integration suite (test_fec_5G.py)
# --------------------------------------------------------------- #

def _awgn_system(k, n, nbps, enc, dec):
    from sionna_tpu.phy import BinarySource, Mapper, Demapper, AWGN
    from sionna_tpu.phy.utils import ebnodb2no
    src = BinarySource()
    mapper = Mapper("qam", nbps)
    demapper = Demapper("app", "qam", nbps)
    awgn = AWGN()

    def mc_fun(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, nbps, k / n)
        u = src([batch_size, k], key=k1)
        y = awgn(mapper(enc(u)), no, key=k2)
        return u, dec(demapper(y, no))

    return mc_fun


def _codes_under_test(k, n):
    """The reference's short-code matrix
    (test/integration/test_fec_5G.py:120)."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy.fec.polar import (PolarEncoder, Polar5GEncoder,
                                          PolarSCLDecoder,
                                          Polar5GDecoder)
    from sionna_tpu.phy.fec.polar.utils import generate_rm_code
    from sionna_tpu.phy.fec.conv import ConvEncoder, ViterbiDecoder

    out = []
    enc = LDPC5GEncoder(k=k, n=n)
    out.append((enc, LDPC5GDecoder(enc, num_iter=20), "LDPC BP-20"))
    enc = Polar5GEncoder(k=k, n=n)
    out.append((enc, Polar5GDecoder(enc, dec_type="SC"), "Polar SC"))
    enc = Polar5GEncoder(k=k, n=n)
    out.append((enc, Polar5GDecoder(enc, dec_type="SCL", list_size=8),
                "Polar SCL-8 UL"))
    enc = Polar5GEncoder(k=k, n=n, channel_type="downlink")
    out.append((enc, Polar5GDecoder(enc, dec_type="SCL", list_size=8),
                "Polar SCL-8 DL"))
    f, _, _, _, _ = generate_rm_code(3, 7)
    out.append((PolarEncoder(f, n), PolarSCLDecoder(f, n, list_size=8),
                "RM(3,7) SCL-8"))
    enc = ConvEncoder(rate=0.5, constraint_length=8)
    out.append((enc, ViterbiDecoder(gen_poly=enc.gen_poly,
                                    method="soft_llr"),
                "Conv K=8 Viterbi"))
    return out


def test_short_codes_integration():
    """Each coding scheme decodes end-to-end without NaNs, improves
    with SNR, and is near-error-free at high SNR."""
    from sionna_tpu.phy.utils import sim_ber

    k, n = 64, 128
    for enc, dec, name in _codes_under_test(k, n):
        mc = _awgn_system(k, n, 2, enc, dec)
        ber, bler = sim_ber(mc, [0.0, 8.0], batch_size=64,
                            max_mc_iter=2, early_stop=False,
                            verbose=False)
        ber = np.asarray(ber)
        assert not np.isnan(ber).any(), name
        assert ber[1] <= ber[0], (name, ber)
        assert ber[1] < 1e-2, (name, ber)


def test_different_length_ldpc_integration():
    """Reference test_different_length_ldpc at reduced scale."""
    from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
    from sionna_tpu.phy.utils import sim_ber

    for n in (128, 512, 2000):
        k = n // 2
        enc = LDPC5GEncoder(k=k, n=n)
        dec = LDPC5GDecoder(enc, num_iter=20)
        mc = _awgn_system(k, n, 2, enc, dec)
        ber, _ = sim_ber(mc, [1.0, 5.0], batch_size=32,
                         max_mc_iter=2, early_stop=False,
                         verbose=False)
        ber = np.asarray(ber)
        assert not np.isnan(ber).any(), n
        assert ber[1] < ber[0], (n, ber)
