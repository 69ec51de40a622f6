"""Multi-host data-parallel sim_ber: 2 processes x 4 CPU devices.

Each subprocess initializes the JAX distributed runtime against a
shared coordinator, runs the same QPSK/AWGN sweep with
``distribute='multihost'`` (global 8-device mesh, psum-reduced
counters over the process boundary), and checks the closed-form BER.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
from sionna_tpu.phy.utils import init_multihost
init_multihost(coordinator_address={coord!r}, num_processes=2,
               process_id={pid})
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
from sionna_tpu.phy import config, BinarySource, Mapper, Demapper, AWGN
from sionna_tpu.phy.utils import ebnodb2no, sim_ber
config.seed = 42
src, mp = BinarySource(), Mapper("qam", 2)
dm, ch = Demapper("app", "qam", 2, hard_out=True), AWGN()

def mc_fun(batch_size, ebno_db, key=None):
    k1, k2 = jax.random.split(key)
    no = ebnodb2no(ebno_db, 2, 1.0)
    b = src([batch_size, 256], key=k1)
    y = ch(mp(b), no, key=k2)
    return b, dm(y, no)

ber, bler = sim_ber(mc_fun, [4.0], batch_size=1024, max_mc_iter=8,
                    verbose=False, distribute="multihost")
b = float(ber[0])
# QPSK @ EbNo 4 dB: BER = Q(sqrt(2*10^0.4)) ~ 1.25e-2
assert 0.9e-2 < b < 1.7e-2, b
print("MULTIHOST_OK", {pid}, b)
"""


def test_two_process_multihost_sweep():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO

    procs = [subprocess.Popen(
        [sys.executable, "-c",
         WORKER.format(repo=REPO, coord=coord, pid=pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} rc={p.returncode}\n{out[-1500:]}\n"
            f"{err[-3000:]}")
        assert f"MULTIHOST_OK {pid}" in out, out[-500:]
