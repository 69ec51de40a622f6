"""Mitsuba-XML + PLY scene loading (upstream asset-format parity,
SURVEY.md 2.12: the munich/etoile/simple_street_canyon scenes ship as
Mitsuba XML + binary PLY; every upstream RT tutorial starts at
load_scene(<scene>)).

The committed fixture (tests/data/mitsuba_fixture/) was exported from
the procedural simple_street_canyon scene via export_mitsuba_xml; the
solver must produce bit-identical paths on both."""

import os

import numpy as np
import pytest

from sionna_tpu.rt import (load_scene, PathSolver, Transmitter,
                           Receiver, PlanarArray, export_mitsuba_xml)
from sionna_tpu.rt.mitsuba_loader import (load_ply, load_mitsuba_xml,
                                          _write_ply)

FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                       "mitsuba_fixture", "street_canyon.xml")


def _setup_devices(sc):
    sc.tx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.rx_array = PlanarArray(1, 1, pattern="iso", polarization="V")
    sc.add(Transmitter("tx", [-20., 0., 10.]))
    sc.add(Receiver("rx", [20., 5., 1.5]))


def test_fixture_loads_with_materials():
    sc = load_scene(FIXTURE, frequency=3.5e9)
    assert sc.num_triangles == 22
    mats = {m.name for m in sc.triangle_materials}
    assert mats == {"itu_concrete", "itu_medium_dry_ground"}


def test_fixture_matches_procedural_twin_exactly():
    ref = load_scene("simple_street_canyon")
    sc = load_scene(FIXTURE)
    # exporter groups by material in first-appearance order and the
    # canyon's order already is material-contiguous -> same order;
    # PLY stores float32 but every canyon coordinate is f32-exact
    assert np.array_equal(ref.triangles, sc.triangles)
    assert [m.name for m in ref.triangle_materials] \
        == [m.name for m in sc.triangle_materials]


def test_fixture_solves_bit_identically_to_procedural():
    ref = load_scene("simple_street_canyon", frequency=3.5e9)
    sc = load_scene(FIXTURE, frequency=3.5e9)
    _setup_devices(ref)
    _setup_devices(sc)
    solver = PathSolver()
    p_ref = solver(ref, max_depth=2, samples_per_src=2000)
    p_fix = solver(sc, max_depth=2, samples_per_src=2000)
    assert np.array_equal(np.asarray(p_ref.valid),
                          np.asarray(p_fix.valid))
    assert np.array_equal(np.asarray(p_ref.tau),
                          np.asarray(p_fix.tau))
    assert np.array_equal(np.asarray(p_ref.a), np.asarray(p_fix.a))


def test_ply_ascii_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    verts = rng.normal(size=(17, 3)).astype(np.float32)
    faces = rng.integers(0, 17, size=(9, 3)).astype(np.int64)
    bpath = tmp_path / "m.ply"
    _write_ply(str(bpath), verts, faces)
    v2, f2 = load_ply(str(bpath))
    assert np.allclose(v2, verts.astype(np.float64))
    assert np.array_equal(f2, faces)
    # ascii variant with extra vertex properties and an n-gon face
    apath = tmp_path / "a.ply"
    with open(apath, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write("element vertex 4\n")
        f.write("property float x\nproperty float y\n"
                "property float z\nproperty float nx\n")
        f.write("element face 1\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        f.write("0 0 0 1\n1 0 0 1\n1 1 0 1\n0 1 0 1\n")
        f.write("4 0 1 2 3\n")
    v3, f3 = load_ply(str(apath))
    assert v3.shape == (4, 3)
    # quad fan-triangulated into two triangles
    assert np.array_equal(f3, [[0, 1, 2], [0, 2, 3]])


def test_to_world_transforms(tmp_path):
    verts = np.asarray([[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]],
                       np.float32)
    faces = np.asarray([[0, 1, 2]], np.int64)
    _write_ply(str(tmp_path / "t.ply"), verts, faces)
    xml = tmp_path / "s.xml"
    xml.write_text("""<?xml version="1.0"?>
<scene version="2.1.0">
  <bsdf type="twosided" id="mat-itu_metal"/>
  <shape type="ply" id="mesh-itu_metal">
    <string name="filename" value="t.ply"/>
    <transform name="to_world">
      <scale value="2"/>
      <rotate z="1" angle="90"/>
      <translate x="10" y="-5" z="1"/>
    </transform>
    <ref id="mat-itu_metal" name="bsdf"/>
  </shape>
</scene>""")
    tris, mats = load_mitsuba_xml(str(xml))
    assert mats == ["itu_metal"]
    # applied in document order: scale then rotate then translate
    expect = np.asarray([[10., -3., 1.],     # (1,0,0)->(2,0,0)->(0,2,0)
                         [8., -5., 1.],      # (0,1,0)->(0,2,0)->(-2,0,0)
                         [10., -5., 3.]])    # (0,0,1)->(0,0,2)
    assert np.allclose(tris[0], expect, atol=1e-6)


def test_matrix_transform_and_inline_bsdf(tmp_path):
    verts = np.asarray([[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]],
                       np.float32)
    faces = np.asarray([[0, 1, 2]], np.int64)
    _write_ply(str(tmp_path / "t.ply"), verts, faces)
    xml = tmp_path / "s.xml"
    xml.write_text("""<?xml version="1.0"?>
<scene version="2.1.0">
  <shape type="ply">
    <string name="filename" value="t.ply"/>
    <transform name="to_world">
      <matrix value="1 0 0 5  0 1 0 0  0 0 1 0  0 0 0 1"/>
    </transform>
    <bsdf type="twosided" id="mat-itu_glass"/>
  </shape>
</scene>""")
    tris, mats = load_mitsuba_xml(str(xml))
    assert mats == ["itu_glass"]
    assert np.allclose(tris[0], verts + np.asarray([5., 0., 0.]))


def test_export_reimport_custom_scene(tmp_path):
    sc = load_scene("box")
    path = export_mitsuba_xml(sc, str(tmp_path / "box.xml"))
    sc2 = load_scene(path)
    assert sc2.num_triangles == sc.num_triangles
    canon = lambda t: sorted(
        tuple(np.round(np.asarray(x, np.float64), 6).ravel())
        for x in t)
    assert canon(sc.triangles) == canon(sc2.triangles)
