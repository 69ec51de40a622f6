"""Ported reference integration suite: every OFDM detector in bit and
symbol output mode over a CDL MIMO channel at near-zero noise
(reference test/integration/test_mimo_ofdm_detectors.py, QPSK at CI
scale).  With perfect CSI and no ~ 1e-4 all detectors except the
matched filter must recover exactly; MF only has to stay sane."""

import numpy as np
import pytest

# Monte-Carlo integration matrix: minutes on one CPU -> slow
# tier (detector integration matrix); unit-level coverage of the same blocks runs in the
# default tier.
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from sionna_tpu.phy import BinarySource, Mapper
from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.ofdm import (
    ResourceGrid, ResourceGridMapper, LinearDetector,
    MaximumLikelihoodDetector, KBestDetector, EPDetector,
    MMSEPICDetector)
from sionna_tpu.phy.channel import OFDMChannel
from sionna_tpu.phy.channel.tr38901 import CDL, AntennaArray
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.utils import compute_ber

NBPS = 2          # QPSK keeps the exact-ML search CI-sized
NUM_TX_ANT, NUM_RX_ANT = 4, 8


def _build(detector_name, output):
    sm = StreamManagement(np.array([[1]]), NUM_TX_ANT)
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=12,
                      subcarrier_spacing=15e3, num_tx=1,
                      num_streams_per_tx=NUM_TX_ANT)
    n = int(rg.num_data_symbols) * NBPS
    k = n // 2
    fc = 2.6e9
    ut = AntennaArray(num_rows=1, num_cols=NUM_TX_ANT // 2,
                      polarization="dual", polarization_type="cross",
                      antenna_pattern="38.901", carrier_frequency=fc)
    bs = AntennaArray(num_rows=1, num_cols=NUM_RX_ANT // 2,
                      polarization="dual", polarization_type="cross",
                      antenna_pattern="38.901", carrier_frequency=fc)
    cdl = CDL("A", 100e-9, fc, ut, bs, "uplink", min_speed=3.)
    channel = OFDMChannel(cdl, rg, normalize_channel=True,
                          return_channel=True)
    hard_out = output == "symbol"
    if detector_name in ("mf", "zf", "lmmse"):
        det = LinearDetector(detector_name, output, "maxlog", rg, sm,
                             "qam", NBPS, hard_out=hard_out)
    elif detector_name == "ep":
        det = EPDetector(output, rg, sm, NBPS, hard_out=hard_out)
    elif detector_name == "kbest":
        det = KBestDetector(output, NUM_TX_ANT, 16, rg, sm, "qam",
                            NBPS, hard_out=hard_out)
    elif detector_name == "ml":
        det = MaximumLikelihoodDetector(output, "maxlog", rg, sm,
                                        "qam", NBPS,
                                        hard_out=hard_out)
    elif detector_name == "mmse-pic":
        det = MMSEPICDetector(output, rg, sm, num_iter=3,
                              constellation_type="qam",
                              num_bits_per_symbol=NBPS,
                              hard_out=hard_out)
    enc = LDPC5GEncoder(k, n)
    dec = LDPC5GDecoder(enc, hard_out=True)
    src = BinarySource()
    mapper = Mapper("qam", NBPS, return_indices=True)
    rg_mapper = ResourceGridMapper(rg)

    def run(batch_size, key):
        k1, k2 = jax.random.split(key)
        b = src([batch_size, 1, NUM_TX_ANT, k], key=k1)
        c = enc(b)
        x, x_ind = mapper(c)
        x_rg = rg_mapper(x)
        no = jnp.asarray(1e-4, jnp.float32)
        y, h = channel(x_rg, no, key=k2)
        err_var = jnp.asarray(0., jnp.float32)
        if detector_name == "mmse-pic":
            # soft-input detector: no prior on the first pass
            # (reference signature (y, h_hat, prior, err_var, no))
            out = det(y, h, None, err_var, no)
        else:
            out = det(y, h, err_var, no)
        if output == "symbol":
            return x_ind, out
        return b, dec(out)

    return run


_DETECTORS = ["mf", "lmmse", "zf", "ep", "kbest", "ml", "mmse-pic"]


@pytest.mark.parametrize("output", ["bit", "symbol"])
@pytest.mark.parametrize("detector", _DETECTORS)
def test_all_detectors_both_outputs(detector, output):
    if detector == "mmse-pic" and output == "symbol":
        pytest.skip("soft-symbol PIC output is not index-valued")
    run = _build(detector, output)
    run_j = jax.jit(lambda key: run(2, key))
    a, b_ = run_j(jax.random.PRNGKey(11))
    ber = float(compute_ber(jnp.asarray(a, jnp.int32),
                            jnp.asarray(b_, jnp.int32)))
    assert not np.isnan(ber)
    if detector == "mf":
        assert ber < 1.          # interference-limited, sanity only
    else:
        assert ber == 0., (detector, output, ber)
