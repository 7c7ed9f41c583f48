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


def write_ppm(path, framebuffer, width: int, height: int) -> None:
    """ASCII PPM (P3), row-major top-to-bottom like main.cu:177-192."""
    img = to_u8(framebuffer, width, height)
    with open(path, "w") as f:
        f.write(f"P3\n{width} {height}\n255\n")
        flat = img.reshape(-1, 3)
        f.write("\n".join(f"{r} {g} {b}" for r, g, b in flat))
        f.write("\n")


def read_ppm(path) -> np.ndarray:
    """Read an ASCII P3 PPM into a ``[H, W, 3]`` uint8 array (test helper)."""
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "P3"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    assert maxv == 255
    data = np.array(tokens[4:4 + w * h * 3], np.int32)
    return data.reshape(h, w, 3).astype(np.uint8)
