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


def main_extra():
    """Extended attribution: refraction on/off, gain-only output
    (skips Paths assembly), and trace k_max sensitivity."""
    city = make_city(10, 10, subdiv=10)
    city.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    city.add(Transmitter("tx", [0., 0., 30.]))
    city.add(Receiver("rx", [0., 32., 1.5]))
    samples, depth = 100_000, 2
    solver = PathSolver()

    for tag, kw in (("refr=True ", {}),
                    ("refr=False", dict(refraction=False))):
        solver(city, max_depth=depth, samples_per_src=samples, **kw)
        for i in range(2):
            t0 = time.perf_counter()
            paths = solver(city, max_depth=depth,
                           samples_per_src=samples, **kw)
            np.asarray(paths.tau)
            dt = time.perf_counter() - t0
            print(f"solve {tag}[{i}] {dt:8.2f} s "
                  f"({samples * (depth + 1) / dt / 1e3:.1f} krays/s)",
                  flush=True)

    # trace-only k_max sensitivity
    tri = jnp.asarray(city.triangles.astype(np.float32))
    normals = tri_normals(tri)
    accel = build_accel(city.triangles.astype(np.float32))
    dirs = jnp.asarray(fibonacci_sphere(samples).astype(np.float32))
    orig = jnp.broadcast_to(jnp.asarray([0., 0., 30.], jnp.float32),
                            dirs.shape)
    from sionna_tpu.rt import geometry as G
    from sionna_tpu.rt import accel as A

    for km in (64, 32, 16):
        # scalar fetch per call = host sync (block_until_ready is
        # unreliable through the tunnel)
        f = jax.jit(lambda o, d, km=km: jnp.sum(A.nearest_hit_accel(
            o, d, accel, k_max=km)[1]))
        int(f(orig, dirs))
        int(f(orig, dirs))
        t0 = time.perf_counter()
        for _ in range(3):
            int(f(orig, dirs))
        dt = (time.perf_counter() - t0) / 3
        print(f"nearest_hit k_max={km:3d} {dt*1e3:8.1f} ms "
              f"({samples / dt / 1e3:.0f} kqueries/s)", flush=True)





def main_groups():
    """k_max x group sweep for the accel nearest-hit (city)."""
    city = make_city(10, 10, subdiv=10)
    accel = build_accel(city.triangles.astype(np.float32))
    samples = 100_000
    dirs = jnp.asarray(fibonacci_sphere(samples).astype(np.float32))
    orig = jnp.broadcast_to(jnp.asarray([0., 0., 30.], jnp.float32),
                            dirs.shape)
    from sionna_tpu.rt import accel as A
    for km, g in ((32, 16), (32, 32), (32, 8), (24, 24), (48, 16)):
        f = jax.jit(lambda o, d, km=km, g=g: jnp.sum(
            A.nearest_hit_accel(o, d, accel, k_max=km, group=g)[1]))
        int(f(orig, dirs)); int(f(orig, dirs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(f(orig, dirs))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        print(f"k_max={km:3d} group={g:3d} {dt*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    if "--groups" in sys.argv:
        main_groups()
    elif "--extra" in sys.argv:
        main_extra()
    else:
        main()
