"""BASELINE config 3: 4x4 MIMO-OFDM link over a 3GPP CDL channel.

LS channel estimation + LMMSE detection + 5G LDPC decoding, the full
receive chain of the flagship link. Also shows the distribute= option
(data-parallel Monte-Carlo over a device mesh).

Usage:  python examples/03_mimo_ofdm_cdl.py
"""

import os
import sys

if "--cpu" in sys.argv or os.environ.get("SIONNA_TPU_EXAMPLES_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax

from sionna_tpu.phy import config, BinarySource, Mapper
from sionna_tpu.phy.mimo import StreamManagement
from sionna_tpu.phy.ofdm import (ResourceGrid, ResourceGridMapper,
                                 LSChannelEstimator, LinearDetector)
from sionna_tpu.phy.channel import OFDMChannel
from sionna_tpu.phy.channel.tr38901 import CDL, Antenna, AntennaArray
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.utils import ebnodb2no, sim_ber

FAST = bool(os.environ.get("SIONNA_TPU_EXAMPLES_FAST"))
NBPS, CODERATE, NUM_STREAMS = 4, 0.5, 4


def main():
    config.seed = 42
    fft_size = 32 if FAST else 128
    rg = ResourceGrid(num_ofdm_symbols=14, fft_size=fft_size,
                      subcarrier_spacing=30e3, num_tx=1,
                      num_streams_per_tx=NUM_STREAMS,
                      pilot_pattern="kronecker",
                      pilot_ofdm_symbol_indices=[2, 11])
    sm = StreamManagement(np.array([[1]]), NUM_STREAMS)
    n = int(rg.num_data_symbols) * NBPS
    k = int(n * CODERATE)

    ut_array = AntennaArray(num_rows=1, num_cols=2,
                            polarization="dual",
                            polarization_type="cross",
                            antenna_pattern="38.901",
                            carrier_frequency=3.5e9)
    bs_array = AntennaArray(num_rows=1, num_cols=2,
                            polarization="dual",
                            polarization_type="cross",
                            antenna_pattern="38.901",
                            carrier_frequency=3.5e9)
    cdl = CDL("B", 100e-9, 3.5e9, ut_array, bs_array, "uplink",
              min_speed=3.)

    src = BinarySource()
    enc = LDPC5GEncoder(k, n)
    mapper = Mapper("qam", NBPS)
    rg_mapper = ResourceGridMapper(rg)
    channel = OFDMChannel(cdl, rg, normalize_channel=True)
    est = LSChannelEstimator(rg, interpolation_type="lin")
    det = LinearDetector("lmmse", "bit", "app", rg, sm, "qam", NBPS)
    dec = LDPC5GDecoder(enc, num_iter=12, cn_update="minsum")

    def mc_fun(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, NBPS, CODERATE, rg)
        b = src([batch_size, 1, NUM_STREAMS, k], key=k1)
        x_rg = rg_mapper(mapper(enc(b)))
        y = channel(x_rg, no, key=k2)
        h_hat, err_var = est(y, no)
        llr = det(y, h_hat, err_var, no)
        return b, dec(llr)

    ebno_dbs = [2., 6., 10.] if FAST else np.arange(0., 14., 2.)
    distribute = "all" if len(jax.devices()) > 1 else None
    sim_ber(mc_fun, ebno_dbs, batch_size=16 if FAST else 64,
            max_mc_iter=2 if FAST else 20,
            num_target_block_errors=None if FAST else 100,
            verbose=True, distribute=distribute)


if __name__ == "__main__":
    main()
