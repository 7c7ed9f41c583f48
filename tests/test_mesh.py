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


# ---------------------------------------------------- generic PLY surface
# happly.h's general element/property access (happly.h:123-1232) and the
# full three-format write surface (happly.h:1724-1733).

import pytest as _pytest


@_pytest.mark.parametrize("fmt", ["ascii", "binary_little_endian",
                                  "binary_big_endian"])
def test_generic_ply_roundtrip(tmp_path, rng, fmt):
    from rtjax.scene.mesh import PlyData, load_ply_data, save_ply_data

    v = rng.random((5, 3)).astype(np.float32)
    quality = rng.random(5).astype(np.float32)
    label = np.arange(5, dtype=np.int64)
    faces = [np.array([0, 1, 2]), np.array([0, 2, 3, 4])]

    data = PlyData(comments=["comment made by rtjax"])
    data.add_element("vertex", {
        "x": v[:, 0], "y": v[:, 1], "z": v[:, 2],
        "quality": quality, "label": label,
    }, dtypes={"label": "i4"})
    data.add_element("face", {"vertex_indices": faces})

    p = tmp_path / "generic.ply"
    save_ply_data(p, data, fmt=fmt)
    back = load_ply_data(p)

    assert any("rtjax" in c for c in back.comments)
    assert set(back.elements) == {"vertex", "face"}
    bv = back.elements["vertex"]
    np.testing.assert_allclose(bv["x"], v[:, 0], rtol=1e-6)
    np.testing.assert_allclose(bv["quality"], quality, rtol=1e-6)
    np.testing.assert_array_equal(bv["label"].astype(np.int64), label)
    bf = back.elements["face"]["vertex_indices"]
    assert len(bf) == 2
    np.testing.assert_array_equal(bf[0], faces[0])
    np.testing.assert_array_equal(bf[1], faces[1])
    # declared on-disk types survive the round trip
    assert back.dtypes["vertex"]["label"] == "i4"
    assert back.dtypes["face"]["vertex_indices"] == ("u1", "i4")


@_pytest.mark.parametrize("fmt", ["ascii", "binary_little_endian"])
def test_generic_ply_mixed_list_scalar_element(tmp_path, fmt):
    """An element mixing scalar and list properties (the case the binary
    reader used to reject) round-trips through the generic writer."""
    from rtjax.scene.mesh import PlyData, load_ply_data, save_ply_data

    data = PlyData()
    data.add_element("patch", {
        "area": np.array([1.5, 2.5], np.float64),
        "ring": [np.array([1, 2, 3]), np.array([4, 5])],
        "weight": np.array([0.25, 0.75], np.float64),
    })
    p = tmp_path / "mixed.ply"
    save_ply_data(p, data, fmt=fmt)
    back = load_ply_data(p)
    bp = back.elements["patch"]
    np.testing.assert_allclose(bp["area"], [1.5, 2.5], rtol=1e-6)
    np.testing.assert_allclose(bp["weight"], [0.25, 0.75], rtol=1e-6)
    np.testing.assert_array_equal(bp["ring"][0], [1, 2, 3])
    np.testing.assert_array_equal(bp["ring"][1], [4, 5])


def test_save_ply_big_endian_roundtrip(tmp_path, rng):
    from rtjax.scene.mesh import Mesh, load_ply, save_ply

    v = rng.random((6, 3)).astype(np.float32).astype(np.float64)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    p = tmp_path / "be.ply"
    save_ply(p, Mesh(vertices=v, faces=f), binary=True, big_endian=True)
    assert b"binary_big_endian" in p.read_bytes()[:120]
    m = load_ply(p)
    np.testing.assert_allclose(m.vertices, v, rtol=1e-6)
    np.testing.assert_array_equal(m.faces, f)
