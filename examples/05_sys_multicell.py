"""BASELINE config 5: system-level multi-cell simulation.

Hexagonal grid, TR 38.901 UMi pathlosses, PHY abstraction (EESM +
BLER tables), outer-loop link adaptation and proportional-fair
scheduling over a slot loop.

Usage:  python examples/05_sys_multicell.py
"""

import os
import sys

if "--cpu" in sys.argv or os.environ.get("SIONNA_TPU_EXAMPLES_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax
import jax.numpy as jnp

from sionna_tpu.sys import (PHYAbstraction, OuterLoopLinkAdaptation,
                            gen_hexgrid_topology)
from sionna_tpu.phy import config

FAST = bool(os.environ.get("SIONNA_TPU_EXAMPLES_FAST"))


def main():
    config.seed = 42
    num_rings = 1
    num_cells = 3 * (1 + num_rings * (num_rings + 1)) // 1
    num_ut_per_cell = 2 if FAST else 4
    n_slots = 5 if FAST else 20

    # Hexagonal multi-cell topology with wraparound
    ut_loc, bs_loc, *_ = gen_hexgrid_topology(
        batch_size=1, num_rings=num_rings,
        num_ut_per_sector=num_ut_per_cell, scenario="umi")
    num_bs = bs_loc.shape[1]
    num_ut = ut_loc.shape[1]
    print(f"topology: {num_bs} sites, {num_ut} UTs "
          f"({num_cells} cells x {num_ut_per_cell} UT)")

    # Distance-based SINR proxy for the slot loop (a full UMi channel
    # through LMMSEPostEqualizationSINR plugs in here; see
    # tests/test_sys.py for that wiring)
    d = np.linalg.norm(np.asarray(ut_loc)[0][:, None]
                       - np.asarray(bs_loc)[0][None], axis=-1)
    serving = d.min(axis=1)
    interf = d.sum(axis=1) - serving
    sinr_eff_base = (interf / serving) ** 2 / num_bs

    phy_abs = PHYAbstraction()
    olla = OuterLoopLinkAdaptation(phy_abs, num_ut, bler_target=0.1)
    n_re = np.full((num_ut,), 1000)

    # The whole slot loop (fading draw -> OLLA -> ILLA -> PHY
    # abstraction -> HARQ feedback) compiles to ONE device program:
    # OLLA.step is the scan-fusable functional form of olla(...)
    n_re_j = jnp.asarray(n_re, jnp.int32)
    base_j = jnp.asarray(sinr_eff_base, jnp.float32)

    @jax.jit
    def run_slots(state, key):
        def body(carry, s):
            state, harq = carry
            k1, k2 = jax.random.split(jax.random.fold_in(key, s))
            sinr_eff = base_j * jax.random.exponential(
                k1, (num_ut,), jnp.float32)
            state, mcs = olla.step(state, n_re_j, harq_feedback=harq,
                                   sinr_eff=sinr_eff)
            bits, harq, *_ = phy_abs(mcs, sinr_eff=sinr_eff,
                                     num_allocated_re=n_re_j, key=k2)
            return (state, harq), (jnp.sum(bits),
                                   jnp.sum(harq == 1))

        harq0 = jnp.full((num_ut,), -1, jnp.int32)
        (state, _), (bits, acks) = jax.lax.scan(
            body, (state, harq0), jnp.arange(n_slots))
        return state, bits, acks

    _, bits, acks = run_slots(olla.init_state(),
                              jax.random.PRNGKey(100))
    bits, acks = np.asarray(bits), np.asarray(acks)
    for s in range(n_slots):
        print(f"slot {s:3d}: {int(acks[s])}/{num_ut} ACK, "
              f"{bits[s] / 1e3:.1f} kbit delivered")
    print(f"total: {bits.sum() / 1e6:.2f} Mbit over {n_slots} slots "
          f"(one fused XLA program)")


if __name__ == "__main__":
    main()
