"""Radio-map stage attribution (bench config).  Run ALONE."""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

import bench  # noqa: F401
from sionna_tpu.rt import (load_scene, Transmitter, PlanarArray,
                           RadioMapSolver)


def median_time(fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    scene = load_scene("simple_street_canyon", frequency=3.5e9)
    scene.tx_array = PlanarArray(1, 1, pattern="iso",
                                 polarization="V")
    scene.rx_array = PlanarArray(1, 1, pattern="iso",
                                 polarization="V")
    scene.add(Transmitter("tx", [-20., 0., 10.]))
    rm_solver = RadioMapSolver()
    cells = 200 * 200

    for tag, kw in (("refr=True  los=True ", {}),
                    ("refr=False los=True ", dict(refraction=False)),
                    ("refr=True  los=False", dict(los=False)),
                    ("spec=False          ",
                     dict(specular_reflection=False)),
                    ("samples=25k         ",
                     dict(samples_per_src=25_000))):
        kw.setdefault("samples_per_src", 100_000)

        def solve(kw=kw):
            rm = rm_solver(scene, cell_size=(1., 1.),
                           size=(200, 200), center=(0., 0., 1.5),
                           max_depth=2, **kw)
            np.asarray(rm.path_gain)

        dt = median_time(solve)
        print(f"{tag} {dt*1e3:8.1f} ms  ({cells/dt/1e3:6.1f} "
              f"kcells/s)", flush=True)


if __name__ == "__main__":
    main()
