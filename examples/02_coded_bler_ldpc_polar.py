"""BASELINE config 2: 5G NR LDPC and Polar coded BLER over AWGN.

QPSK, 5G LDPC BP-20 min-sum (lifted block-circulant engine; the same
construction runs the fused Pallas kernel on TPU via engine='pallas')
and 5G Polar SC / SCL-8 decoding with CRC-aided selection.

Usage:  python examples/02_coded_bler_ldpc_polar.py
"""

import os
import sys

if "--cpu" in sys.argv or os.environ.get("SIONNA_TPU_EXAMPLES_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax

from sionna_tpu.phy import config, BinarySource, Mapper, Demapper, AWGN
from sionna_tpu.phy.fec.ldpc import LDPC5GEncoder, LDPC5GDecoder
from sionna_tpu.phy.fec.polar import Polar5GEncoder, Polar5GDecoder
from sionna_tpu.phy.utils import ebnodb2no, sim_ber

FAST = bool(os.environ.get("SIONNA_TPU_EXAMPLES_FAST"))


def make_mc_fun(k, n, enc, dec):
    src = BinarySource()
    mapper = Mapper("qam", 2)
    demapper = Demapper("app", "qam", 2)
    channel = AWGN()

    def mc_fun(batch_size, ebno_db, key=None):
        k1, k2 = jax.random.split(key)
        no = ebnodb2no(ebno_db, 2, k / n)
        u = src([batch_size, k], key=k1)
        y = channel(mapper(enc(u)), no, key=k2)
        return u, dec(demapper(y, no))

    return mc_fun


def main():
    config.seed = 42
    k, n = (120, 240) if FAST else (400, 800)
    ebno_dbs = np.arange(1.0, 4.0, 0.5)
    batch = 256 if FAST else 1024
    max_iter = 4 if FAST else 20

    codes = [("5G LDPC BP-20 minsum",
              lambda: (lambda e: (e, LDPC5GDecoder(
                  e, num_iter=20, cn_update="minsum")))(
                      LDPC5GEncoder(k, n)))]
    kp, np_ = (32, 64) if FAST else (64, 128)
    codes.append(("5G Polar SCL-8+CRC",
                  lambda: (lambda e: (e, Polar5GDecoder(
                      e, dec_type="SCL", list_size=8)))(
                          Polar5GEncoder(kp, np_))))

    for name, make in codes:
        enc, dec = make()
        kk, nn = enc.k, enc.n
        print(f"\n=== {name} (k={kk}, n={nn}) ===")
        mc_fun = make_mc_fun(kk, nn, enc, dec)
        sim_ber(mc_fun, ebno_dbs, batch_size=batch,
                max_mc_iter=max_iter, num_target_block_errors=100,
                verbose=True)


if __name__ == "__main__":
    main()
