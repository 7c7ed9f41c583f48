"""PLY mesh loading.

Replaces the reference's vendored ``happly.h`` (2,017 LoC, /root/reference/
happly.h).  The reference only uses two accessors — ``getVertexPositions``
(happly.h:1451) and ``getFaceIndices`` (happly.h:1498, via main.cu:60-62) —
so this module implements a compact reader for exactly that surface: vertex
positions and triangulated face indices, for ASCII and binary (LE/BE) PLY,
with NumPy fast paths instead of happly's per-element C++ parsing.
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


@dataclasses.dataclass
class _Property:
    name: str
    dtype: str             # numpy dtype char code, e.g. "f4"
    is_list: bool = False
    count_dtype: str = ""  # for list properties


@dataclasses.dataclass
class _Element:
    name: str
    count: int
    properties: list


@dataclasses.dataclass
class Mesh:
    """A triangle mesh: float64 positions (matching happly's double output)
    and int64 face indices, already triangulated (fan) for polygons."""

    vertices: np.ndarray  # [V, 3] float64
    faces: np.ndarray     # [F, 3] int64


def _parse_header(f) -> tuple[str, list]:
    magic = f.readline().strip()
    if magic not in (b"ply", b"ply\r"):
        raise ValueError("not a PLY file")
    fmt = None
    elements: list[_Element] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        tokens = line.decode("ascii", "replace").split()
        if not tokens or tokens[0] == "comment" or tokens[0] == "obj_info":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append(_Element(tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if tokens[1] == "list":
                prop = _Property(tokens[4], _PLY_DTYPES[tokens[3]], True,
                                 _PLY_DTYPES[tokens[2]])
            else:
                prop = _Property(tokens[2], _PLY_DTYPES[tokens[1]])
            elements[-1].properties.append(prop)
        elif tokens[0] == "end_header":
            break
    if fmt not in ("ascii", "binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format: {fmt}")
    return fmt, elements


def _read_ascii(f, elements):
    """Read all element data from an ASCII body."""
    tokens = f.read().split()
    pos = 0
    data = {}
    for elem in elements:
        has_list = any(p.is_list for p in elem.properties)
        if not has_list:
            width = len(elem.properties)
            flat = np.array(tokens[pos:pos + elem.count * width], dtype=np.float64)
            pos += elem.count * width
            cols = {p.name: flat.reshape(elem.count, width)[:, i]
                    for i, p in enumerate(elem.properties)}
            data[elem.name] = cols
        else:
            # General row-wise parse (lists may vary in length).
            rows = {p.name: [] for p in elem.properties}
            for _ in range(elem.count):
                for p in elem.properties:
                    if p.is_list:
                        n = int(tokens[pos]); pos += 1
                        rows[p.name].append(
                            np.array(tokens[pos:pos + n], dtype=np.int64))
                        pos += n
                    else:
                        rows[p.name].append(float(tokens[pos])); pos += 1
            data[elem.name] = rows
    return data


def _read_binary(f, elements, endian):
    buf = f.read()
    off = 0
    data = {}
    for elem in elements:
        has_list = any(p.is_list for p in elem.properties)
        if not has_list:
            dt = np.dtype([(p.name, endian + p.dtype) for p in elem.properties])
            arr = np.frombuffer(buf, dtype=dt, count=elem.count, offset=off)
            off += dt.itemsize * elem.count
            data[elem.name] = {p.name: arr[p.name].astype(np.float64)
                               for p in elem.properties}
        elif len(elem.properties) == 1:
            p = elem.properties[0]
            cdt = np.dtype(endian + p.count_dtype)
            idt = np.dtype(endian + p.dtype)
            # Fast path: uniform list length (true for triangulated meshes).
            first_n = int(np.frombuffer(buf, cdt, 1, off)[0])
            stride = cdt.itemsize + first_n * idt.itemsize
            end = off + stride * elem.count
            if len(buf) >= end:
                block = np.frombuffer(buf, np.uint8, stride * elem.count, off)
                counts = block.reshape(elem.count, stride)[:, :cdt.itemsize]
                counts = counts.copy().view(cdt).ravel()
                if np.all(counts == first_n):
                    idx = block.reshape(elem.count, stride)[:, cdt.itemsize:]
                    idx = idx.copy().view(idt).reshape(elem.count, first_n)
                    data[elem.name] = {p.name: [row for row in idx.astype(np.int64)]}
                    off = end
                    continue
            # Slow path: ragged lists.
            rows = []
            for _ in range(elem.count):
                n = int(np.frombuffer(buf, cdt, 1, off)[0]); off += cdt.itemsize
                rows.append(np.frombuffer(buf, idt, n, off).astype(np.int64))
                off += n * idt.itemsize
            data[elem.name] = {p.name: rows}
        else:
            raise ValueError(
                f"mixed list/scalar binary element '{elem.name}' not supported")
    return data


def _triangulate(faces) -> np.ndarray:
    """Fan-triangulate polygon faces into an [F, 3] int64 array."""
    if len(faces) == 0:
        return np.zeros((0, 3), np.int64)
    lens = np.array([len(fc) for fc in faces])
    if np.all(lens == 3):
        return np.asarray(np.stack(faces), np.int64)
    tris = []
    for fc in faces:
        for k in range(1, len(fc) - 1):
            tris.append((fc[0], fc[k], fc[k + 1]))
    return np.array(tris, np.int64)


def load_ply(path) -> Mesh:
    """Load vertex positions + triangulated face indices from a PLY file."""
    with open(path, "rb") as f:
        fmt, elements = _parse_header(f)
        if fmt == "ascii":
            data = _read_ascii(io.TextIOWrapper(f, "ascii"), elements)
        else:
            endian = "<" if fmt == "binary_little_endian" else ">"
            data = _read_binary(f, elements, endian)

    velem = next(e for e in elements if e.name == "vertex")
    vdata = data["vertex"]
    vertices = np.stack([np.asarray(vdata["x"]), np.asarray(vdata["y"]),
                         np.asarray(vdata["z"])], axis=1).astype(np.float64)

    faces = np.zeros((0, 3), np.int64)
    if "face" in data:
        fdata = data["face"]
        key = "vertex_indices" if "vertex_indices" in fdata else "vertex_index"
        faces = _triangulate(fdata[key])
    return Mesh(vertices=vertices, faces=faces)


def save_ply(path, mesh: Mesh, binary: bool = False) -> None:
    """Write a PLY file (round-trip/debugging utility).

    ``binary=True`` writes binary_little_endian 1.0 — the format of
    bun_zipper.ply and the other happly.h write surface (happly.h supports
    ASCII + binary LE/BE write; we cover the two formats actually used).
    """
    fmt = "binary_little_endian" if binary else "ascii"
    header = ("ply\n"
              f"format {fmt} 1.0\n"
              f"element vertex {len(mesh.vertices)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              f"element face {len(mesh.faces)}\n"
              "property list uchar int vertex_indices\nend_header\n")
    if not binary:
        with open(path, "w") as f:
            f.write(header)
            for v in mesh.vertices:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for fc in mesh.faces:
                f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
        return
    verts = np.asarray(mesh.vertices, "<f4")
    faces = np.asarray(mesh.faces, "<i4")
    # face rows: uchar count 3 + three int32 indices, packed per row
    frow = np.zeros(len(faces), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
    frow["n"] = 3
    frow["idx"] = faces
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(verts.tobytes())
        f.write(frow.tobytes())
