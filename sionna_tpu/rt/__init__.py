"""Ray tracing (RT) package — TPU-native re-implementation of the
out-of-tree sionna.rt API surface (SURVEY.md 2.12).

The compute path (ray-triangle intersection, image-method refinement,
polarized field transfer) is dense batched JAX that jits onto TPU;
scene assembly and candidate-sequence bookkeeping run host-side."""

from .scene import (Scene, Transmitter, Receiver, Camera, load_scene,
                    scene, make_city)
from .diffraction import extract_wedges
from .antenna_array import PlanarArray, antenna_pattern
from .radio_materials import RadioMaterial, ITU_MATERIALS
from .scattering_pattern import (ScatteringPattern, LambertianPattern,
                                 DirectivePattern,
                                 BackscatteringPattern)
from .solver import PathSolver, Paths
from .radio_map import RadioMapSolver, RadioMap
from .render import render
from .mitsuba_loader import (load_ply, load_mitsuba_xml,
                             export_mitsuba_xml)
