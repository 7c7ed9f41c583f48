"""Film: framebuffer -> image conversion and PPM output.

Equivalent of the reference's post-process + PPM writer
(/root/reference/render.cuh:330-338, main.cu:177-192).  Gamma-2 correction
(``sqrt(mean)``) is applied inside :func:`rtjax.render.render_frame`; here we
quantize with the reference's exact rule ``clamp(int(256 * c), 0, 255)``
(note 256, not 255.999 — main.cu:186-188).
"""

from __future__ import annotations

import numpy as np


def to_u8(framebuffer, width: int, height: int) -> np.ndarray:
    """Quantize a ``[H*W, 3]`` (or ``[H, W, 3]``) float framebuffer to uint8."""
    fb = np.asarray(framebuffer, np.float32).reshape(height, width, 3)
    return np.clip((256.0 * fb).astype(np.int32), 0, 255).astype(np.uint8)


def write_ppm(path, framebuffer, width: int, height: int,
              binary: bool = False) -> None:
    """PPM writer, row-major top-to-bottom like main.cu:177-192.

    ASCII P3 by default (exactly the reference's format); ``binary=True``
    writes P6 (3 bytes/pixel).
    """
    img = to_u8(framebuffer, width, height)
    if binary:
        with open(path, "wb") as f:
            f.write(f"P6\n{width} {height}\n255\n".encode())
            f.write(img.tobytes())
        return
    with open(path, "w") as f:
        f.write(f"P3\n{width} {height}\n255\n")
        flat = img.reshape(-1, 3)
        f.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
        f.write("\n")


def read_ppm(path) -> np.ndarray:
    """Read a P3 or P6 PPM into a ``[H, W, 3]`` uint8 array (test helper)."""
    with open(path, "rb") as f:
        magic = f.read(2)
        if magic == b"P6":
            header = []
            while len(header) < 3:
                line = f.readline()
                if line.startswith(b"#"):
                    continue
                header.extend(line.split())
            w, h, maxv = (int(x) for x in header)
            assert maxv == 255
            data = np.frombuffer(f.read(w * h * 3), np.uint8)
            return data.reshape(h, w, 3).copy()
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxv == 255
    data = np.array(tokens[4:4 + w * h * 3], np.int32)
    return data.reshape(h, w, 3).astype(np.uint8)
