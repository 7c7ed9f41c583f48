"""The reference demo, reproduced end to end.

Equivalent of /root/reference/main.cu:39-195: Stanford bunny (matte brown)
in a Cornell box with a 2-triangle area light (L = 15), rendered at
600x600 @ 10 spp, max 10 bounces, written as ASCII PPM.

Run:  python examples/cornell_bunny.py [out.ppm]
"""

import sys

import jax
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rtjax import RenderConfig
from rtjax.render import render_frame, write_ppm
from rtjax.scenes import cornell_bunny
from rtjax.utils.profiler import profiler


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "image.ppm"

    with profiler.phase("Building scene (PLY + transform + BVH)"):
        scene, camera = cornell_bunny()
    print(f"{scene.tris.num} triangles, {scene.bvh.num_nodes} BVH nodes, "
          f"{scene.num_lights} lights")

    cfg = RenderConfig(width=600, height=600, num_samples=10, max_bounces=10,
                       num_working_paths=1 << 17)
    with profiler.phase("Rendering"):
        fb, stats = render_frame(scene, camera, cfg, jax.random.key(cfg.seed))
        fb = np.asarray(fb)
    rays = float(np.asarray(stats["rays_traced"]))
    print(f"{int(np.asarray(stats['iterations']))} iterations, "
          f"{rays:.4g} rays")

    with profiler.phase("Writing image"):
        write_ppm(out, fb, cfg.width, cfg.height)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
