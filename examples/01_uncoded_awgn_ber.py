"""BASELINE config 1: uncoded 16-QAM over AWGN BER sweep.

Mapper -> AWGN -> Demapper, swept with the Monte-Carlo driver and
checked against the closed-form QAM BER. Runs on CPU in under a
minute; on TPU identical code applies (jit is the default posture).

Usage:  python examples/01_uncoded_awgn_ber.py
"""

import os
import sys

if "--cpu" in sys.argv or os.environ.get("SIONNA_TPU_EXAMPLES_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
from scipy.special import erfc

import jax

from sionna_tpu.phy import config, BinarySource, Mapper, Demapper, AWGN
from sionna_tpu.phy.utils import ebnodb2no, sim_ber

NBPS = 4  # 16-QAM


def theoretical_ber_16qam(ebno_db):
    """Gray-labeled 16-QAM BER over AWGN:
    Pb ~= (3/8) erfc(sqrt(0.4 Eb/N0))."""
    ebno = 10 ** (np.asarray(ebno_db) / 10)
    return 3 / 8 * erfc(np.sqrt(0.4 * ebno))


def main():
    config.seed = 42
    src = BinarySource()
    mapper = Mapper("qam", NBPS)
    demapper = Demapper("app", "qam", NBPS, hard_out=True)
    channel = AWGN()

    def mc_fun(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, NBPS, 1.0)
        b = src([batch_size, 2048], key=k1)
        y = channel(mapper(b), no, key=k2)
        return b, demapper(y, no)

    ebno_dbs = np.arange(0., 14., 2.)
    ber, bler = sim_ber(mc_fun, ebno_dbs, batch_size=4096,
                        max_mc_iter=50, num_target_bit_errors=2000,
                        verbose=True)

    print("\nEb/No [dB] | measured BER | closed form")
    for e, b in zip(ebno_dbs, np.asarray(ber)):
        print(f"{e:10.1f} | {b:12.3e} | {theoretical_ber_16qam(e):.3e}")


if __name__ == "__main__":
    main()
