"""PLY mesh loading.

Replaces the reference's vendored ``happly.h`` (2,017 LoC, /root/reference/
happly.h).  The reference only uses two accessors — ``getVertexPositions``
(happly.h:1451) and ``getFaceIndices`` (happly.h:1498, via main.cu:60-62) —
served by :func:`load_ply`/:class:`Mesh`; happly's *general* surface
(arbitrary element/property access, happly.h:123-1232, and ASCII + binary
LE/BE read/write) is covered by :func:`load_ply_data` /
:func:`save_ply_data` / :class:`PlyData`, with NumPy fast paths instead of
happly's per-element C++ parsing.
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


def _parse_header(f) -> tuple[str, list, list]:
    magic = f.readline().strip()
    if magic not in (b"ply", b"ply\r"):
        raise ValueError("not a PLY file")
    fmt = None
    elements: list[_Element] = []
    comments: list[str] = []
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        text = line.decode("ascii", "replace")
        tokens = text.split()
        if not tokens:
            continue
        if tokens[0] in ("comment", "obj_info"):
            comments.append(text.strip())
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
    return fmt, elements, comments


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
            # mixed list/scalar properties: general row-wise parse
            # (happly.h handles this case; rare in practice, so no fast
            # path — O(rows x props) python loop)
            rows = {p.name: [] for p in elem.properties}
            for _ in range(elem.count):
                for p in elem.properties:
                    if p.is_list:
                        cdt = np.dtype(endian + p.count_dtype)
                        idt = np.dtype(endian + p.dtype)
                        n = int(np.frombuffer(buf, cdt, 1, off)[0])
                        off += cdt.itemsize
                        rows[p.name].append(
                            np.frombuffer(buf, idt, n, off).astype(np.int64))
                        off += n * idt.itemsize
                    else:
                        sdt = np.dtype(endian + p.dtype)
                        rows[p.name].append(
                            float(np.frombuffer(buf, sdt, 1, off)[0]))
                        off += sdt.itemsize
            data[elem.name] = {k: (v if elem.properties[i].is_list
                                   else np.asarray(v, np.float64))
                               for i, (k, v) in enumerate(rows.items())}
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


def _read_file(path):
    with open(path, "rb") as f:
        fmt, elements, comments = _parse_header(f)
        if fmt == "ascii":
            data = _read_ascii(io.TextIOWrapper(f, "ascii"), elements)
        else:
            endian = "<" if fmt == "binary_little_endian" else ">"
            data = _read_binary(f, elements, endian)
    return fmt, elements, comments, data


def load_ply(path) -> Mesh:
    """Load vertex positions + triangulated face indices from a PLY file."""
    fmt, elements, _, data = _read_file(path)

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


def save_ply(path, mesh: Mesh, binary: bool = False,
             big_endian: bool = False) -> None:
    """Write a triangle-mesh PLY file (round-trip/debugging utility).

    ``binary=True`` writes binary 1.0, little-endian by default;
    ``big_endian=True`` selects binary_big_endian (the remaining happly.h
    write format, happly.h:1730).
    """
    # values stay float64 here; the declared type is float32, so ASCII
    # writes keep full digits while binary writes narrow at pack time
    # (matching the previous writer's behavior in both formats)
    data = PlyData(comments=[])
    data.add_element("vertex", {
        "x": np.asarray(mesh.vertices[:, 0], np.float64),
        "y": np.asarray(mesh.vertices[:, 1], np.float64),
        "z": np.asarray(mesh.vertices[:, 2], np.float64)})
    data.add_element("face", {
        "vertex_indices": [np.asarray(fc, np.int64) for fc in mesh.faces]})
    fmt = ("binary_big_endian" if big_endian else "binary_little_endian") \
        if binary else "ascii"
    save_ply_data(path, data, fmt=fmt)


# ===================================================== generic PLY access
# happly.h's general surface (happly.h:123-1232): arbitrary elements and
# properties, not just vertex positions + faces.


@dataclasses.dataclass
class PlyData:
    """Generic PLY contents: ``elements[element][property]`` is a float64
    ``[count]`` array for scalar properties or a list of int64 arrays for
    list properties (happly's getElement/getProperty surface).
    ``dtypes[element][property]`` records the declared on-disk type
    (numpy char codes; ``(count_dtype, dtype)`` for lists) so writes
    round-trip the original declarations.
    """

    comments: list = dataclasses.field(default_factory=list)
    elements: dict = dataclasses.field(default_factory=dict)
    dtypes: dict = dataclasses.field(default_factory=dict)

    def add_element(self, name: str, props: dict, dtypes: dict | None = None):
        """Register an element from {prop: array-or-list-of-arrays}.
        Declared types default to float32 scalars / (uchar, int) lists."""
        self.elements[name] = props
        dts = dict(dtypes or {})
        for pname, val in props.items():
            if pname not in dts:
                dts[pname] = ("u1", "i4") if _is_list_prop(val) else "f4"
        self.dtypes[name] = dts
        return self

    def counts(self, name: str) -> int:
        props = self.elements[name]
        first = next(iter(props.values()))
        return len(first)


def _is_list_prop(val) -> bool:
    return isinstance(val, list) or (
        isinstance(val, np.ndarray) and val.dtype == object)


def load_ply_data(path) -> PlyData:
    """Read a PLY file's FULL contents: every element, every property
    (scalars as float64 arrays, lists as lists of int64 arrays), plus
    header comments — happly.h's general accessor surface."""
    fmt, elements, comments, data = _read_file(path)
    out = PlyData(comments=comments)
    for elem in elements:
        props = {}
        dts = {}
        for p in elem.properties:
            val = data[elem.name][p.name]
            if p.is_list:
                dts[p.name] = (p.count_dtype, p.dtype)
                props[p.name] = list(val)
            else:
                dts[p.name] = p.dtype
                props[p.name] = np.asarray(val, np.float64)
        out.elements[elem.name] = props
        out.dtypes[elem.name] = dts
    return out


_DTYPE_NAMES = {
    "i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
    "i4": "int", "u4": "uint", "f4": "float", "f8": "double",
}


def save_ply_data(path, data: PlyData, fmt: str = "ascii") -> None:
    """Write a :class:`PlyData` in any of the three PLY formats
    (``ascii``, ``binary_little_endian``, ``binary_big_endian``) —
    happly.h's full write surface (happly.h:1724-1733)."""
    if fmt not in ("ascii", "binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format: {fmt}")
    lines = ["ply", f"format {fmt} 1.0"]
    lines += [c if c.startswith(("comment", "obj_info")) else f"comment {c}"
              for c in data.comments]
    for ename, props in data.elements.items():
        lines.append(f"element {ename} {data.counts(ename)}")
        for pname, val in props.items():
            dt = data.dtypes[ename][pname]
            if _is_list_prop(val):
                cdt, idt = dt
                lines.append(f"property list {_DTYPE_NAMES[cdt]} "
                             f"{_DTYPE_NAMES[idt]} {pname}")
            else:
                lines.append(f"property {_DTYPE_NAMES[dt]} {pname}")
    lines.append("end_header")
    header = "\n".join(lines) + "\n"

    if fmt == "ascii":
        with open(path, "w") as f:
            f.write(header)
            for ename, props in data.elements.items():
                names = list(props)
                for i in range(data.counts(ename)):
                    parts = []
                    for pname in names:
                        val = props[pname]
                        if _is_list_prop(val):
                            row = np.asarray(val[i])
                            parts.append(" ".join(
                                [str(len(row))] + [_fmt_ascii(x, data.dtypes[
                                    ename][pname][1]) for x in row]))
                        else:
                            parts.append(_fmt_ascii(val[i],
                                                    data.dtypes[ename][pname]))
                    f.write(" ".join(parts) + "\n")
        return

    endian = "<" if fmt == "binary_little_endian" else ">"
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        for ename, props in data.elements.items():
            names = list(props)
            has_list = any(_is_list_prop(props[p]) for p in names)
            if not has_list:
                dt = np.dtype([(p, endian + data.dtypes[ename][p])
                               for p in names])
                arr = np.zeros(data.counts(ename), dt)
                for p in names:
                    arr[p] = props[p]
                f.write(arr.tobytes())
                continue
            for i in range(data.counts(ename)):
                for pname in names:
                    val = props[pname]
                    if _is_list_prop(val):
                        cdt, idt = data.dtypes[ename][pname]
                        row = np.asarray(val[i])
                        f.write(np.asarray([len(row)],
                                           endian + cdt).tobytes())
                        f.write(np.asarray(row, endian + idt).tobytes())
                    else:
                        f.write(np.asarray(
                            [val[i]],
                            endian + data.dtypes[ename][pname]).tobytes())


def _fmt_ascii(x, dtype_code: str) -> str:
    if dtype_code.startswith(("i", "u")):
        return str(int(x))
    return repr(float(x))
