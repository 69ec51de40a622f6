"""Stage-level wall profile of the city benchmark solve.

Times (a) the shoot-and-bounce trace+dedupe program, (b) the fused
specular image-method evaluation, and (c) host Paths assembly, each
post-warmup, so regressions can be attributed to a stage instead of
re-bisecting commits.  Run alone on a quiet box (see
docs/PERFORMANCE.md benchmark protocol).
"""
import os
import sys
import time

import numpy as np
import jax

# sys.path[0] is tools/ when invoked as `python tools/profile_city.py`;
# the repo root holds bench.py and sionna_tpu/
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: F401,E402  (enables the persistent compile cache)
from sionna_tpu.rt import (make_city, Transmitter, Receiver,
                           PlanarArray, PathSolver)
from sionna_tpu.rt.geometry import TRACE_UNIQUE_JIT, tri_normals
from sionna_tpu.rt.accel import build_accel
from sionna_tpu.rt.geometry import fibonacci_sphere
import jax.numpy as jnp


def main():
    city = make_city(10, 10, subdiv=10)
    city.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.add(Transmitter("tx", [0., 0., 30.]))
    city.add(Receiver("rx", [0., 32., 1.5]))
    samples, depth = 100_000, 2
    print(f"triangles={city.num_triangles}")

    solver = PathSolver()
    t0 = time.perf_counter()
    solver(city, max_depth=depth, samples_per_src=samples)
    print(f"solve cold      {time.perf_counter() - t0:8.2f} s")
    for i in range(3):
        t0 = time.perf_counter()
        paths = solver(city, max_depth=depth, samples_per_src=samples)
        np.asarray(paths.tau)
        dt = time.perf_counter() - t0
        print(f"solve warm[{i}]   {dt:8.2f} s  "
              f"({samples * (depth + 1) / dt / 1e3:.1f} krays/s)")

    # stage A: trace + on-device dedupe
    tri = jnp.asarray(city.triangles.astype(np.float32))
    normals = tri_normals(tri)
    accel = build_accel(city.triangles.astype(np.float32))
    dirs = jnp.asarray(fibonacci_sphere(samples).astype(np.float32))
    orig = jnp.broadcast_to(jnp.asarray([0., 0., 30.],
                                        jnp.float32), dirs.shape)
    cap = min(100_000, samples)
    out = TRACE_UNIQUE_JIT(tri, normals, orig, dirs, depth, cap, accel)
    jax.block_until_ready(out)
    for i in range(3):
        t0 = time.perf_counter()
        out = TRACE_UNIQUE_JIT(tri, normals, orig, dirs, depth, cap,
                               accel)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        # same (depth + 1) ray-segment convention as the warm-solve
        # lines and bench.py's city metric, so the numbers compare
        print(f"trace+dedupe[{i}] {dt:8.2f} s  "
              f"({samples * (depth + 1) / dt / 1e3:.1f} krays/s "
              f"trace-only)")
    counts = np.asarray(out[1])
    print(f"unique prefixes per depth: {counts}")


if __name__ == "__main__":
    main()
