"""PLY loader tests: bunny parse + ASCII/binary round trips."""

import os

import numpy as np
import pytest

from rtjax.scene.mesh import Mesh, load_ply, save_ply

from conftest import BUNNY_PLY


def test_bunny_header_counts():
    mesh = load_ply(BUNNY_PLY)
    # counts from the PLY header (SURVEY.md §0)
    assert mesh.vertices.shape == (35947, 3)
    assert mesh.faces.shape == (69451, 3)
    assert mesh.faces.min() >= 0 and mesh.faces.max() < 35947
    # sane bunny bounds (model is ~0.15 units tall)
    ext = mesh.vertices.max(0) - mesh.vertices.min(0)
    assert (ext > 0.1).all() and (ext < 0.25).all()


def test_ascii_roundtrip(tmp_path, rng):
    v = rng.uniform(-1, 1, (10, 3))
    f = rng.integers(0, 10, (5, 3))
    path = tmp_path / "t.ply"
    save_ply(path, Mesh(vertices=v, faces=f))
    m = load_ply(path)
    np.testing.assert_allclose(m.vertices, v.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(m.faces, f)


@pytest.mark.parametrize("endian,fmt", [("<", "binary_little_endian"),
                                        (">", "binary_big_endian")])
def test_binary_roundtrip(tmp_path, rng, endian, fmt):
    v = rng.uniform(-1, 1, (7, 3)).astype(np.float32)
    f = rng.integers(0, 7, (4, 3)).astype(np.int32)
    path = tmp_path / "b.ply"
    with open(path, "wb") as fh:
        fh.write((f"ply\nformat {fmt} 1.0\n"
                  f"element vertex 7\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  "element face 4\n"
                  "property list uchar int vertex_indices\nend_header\n"
                  ).encode())
        fh.write(v.astype(endian + "f4").tobytes())
        for row in f:
            fh.write(np.uint8(3).tobytes())
            fh.write(row.astype(endian + "i4").tobytes())
    m = load_ply(path)
    np.testing.assert_allclose(m.vertices, v, rtol=1e-6)
    np.testing.assert_array_equal(m.faces, f)


def test_polygon_fan_triangulation(tmp_path):
    with open(tmp_path / "q.ply", "w") as fh:
        fh.write("ply\nformat ascii 1.0\n"
                 "element vertex 4\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "element face 1\n"
                 "property list uchar int vertex_indices\nend_header\n"
                 "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
                 "4 0 1 2 3\n")
    m = load_ply(tmp_path / "q.ply")
    assert m.faces.shape == (2, 3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


def test_save_ply_binary_roundtrip(tmp_path):
    """Binary LE write (the bun_zipper.ply format) round-trips exactly."""
    from rtjax.scene.mesh import Mesh, load_ply, save_ply

    v = np.array([[0.5, -1.25, 2.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    p = tmp_path / "out_bin.ply"
    save_ply(p, Mesh(vertices=v, faces=f), binary=True)
    m = load_ply(p)
    np.testing.assert_array_equal(np.asarray(m.vertices, np.float32), v)
    np.testing.assert_array_equal(m.faces, f)
