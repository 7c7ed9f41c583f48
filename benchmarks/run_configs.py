"""Run the BASELINE.json eval configs on the current device and report.

Usage: python benchmarks/run_configs.py [--quick] [--configs 1,2,3,4]

Writes one line per config with resolution/spp/rays/Mrays-per-s and appends
a markdown row block to benchmarks/RESULTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def run_config(name, scene, camera, cfg, key):
    import numpy as np
    from rtjax.render import render_frame
    fb, stats = render_frame(scene, camera, cfg, key)
    fb.block_until_ready()
    dt = float("inf")
    for _ in range(2):  # min over reps: the remote tunnel can hiccup
        t0 = time.time()
        fb, stats = render_frame(scene, camera, cfg, key)
        mean = float(np.asarray(fb).mean())  # host fetch = hard sync
        dt = min(dt, time.time() - t0)
    rays = float(np.asarray(stats["rays_traced"]))
    mrays = rays / dt / 1e6
    print(f"{name}: {cfg.width}x{cfg.height}@{cfg.num_samples}spp "
          f"{dt:.2f}s {rays:.4g} rays -> {mrays:.2f} Mrays/s "
          f"(mean {mean:.4f})")
    return dict(name=name, width=cfg.width, height=cfg.height,
                spp=cfg.num_samples, seconds=dt, rays=rays, mrays=mrays)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced resolutions/spp for smoke runs")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--sort-key", default=None,
                    choices=["morton", "morton_pos", "prim", "prim_pos"],
                    # None -> RenderConfig default (morton_pos)
                    help="bounce-ray sort key (coherence experiment)")
    args = ap.parse_args()
    which = set(int(x) for x in args.configs.split(","))
    sk = {} if args.sort_key is None else {"sort_key": args.sort_key}

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np
    from rtjax import Camera, RenderConfig, SceneBuilder, Transform
    from rtjax.scene.transform import rotate, scale, translate
    from rtjax.scenes import cornell_bunny, cornell_planes, BUNNY_PLY
    from rtjax.scene.mesh import load_ply

    q = args.quick
    key = jax.random.key(1)
    results = []

    if 1 in which:
        # config 1: bunny matte, 256^2 @ 16 spp
        scene, cam = cornell_bunny()
        cfg = RenderConfig(width=256, height=256, num_samples=4 if q else 16,
                           max_bounces=10, num_working_paths=args.pool, **sk)
        results.append(run_config("config1_bunny_matte", scene, cam, cfg, key))

    if 2 in which:
        # config 2: Cornell planes + area light NEE, 512^2 @ 64 spp
        scene, cam = cornell_planes()
        cfg = RenderConfig(width=512, height=512, num_samples=8 if q else 64,
                           max_bounces=10, num_working_paths=args.pool, **sk)
        results.append(run_config("config2_cornell_nee", scene, cam, cfg, key))

    if 3 in which:
        # config 3 as specified (BASELINE.md:26): METAL + DIELECTRIC —
        # glass bunny standing on a mirror floor, 8-bounce RR
        scene, cam = cornell_bunny(bunny_material="glass", floor="mirror")
        cfg = RenderConfig(width=256, height=256, num_samples=4 if q else 16,
                           max_bounces=8, num_working_paths=args.pool, **sk)
        results.append(run_config("config3_metal_glass_bunny", scene, cam,
                                  cfg, key))

    if 4 in which:
        # config 4: instanced multi-mesh >= 1M tris, two-level BVH
        mesh = load_ply(BUNNY_PLY)
        b = SceneBuilder()
        white = b.make_matte((0.73, 0.73, 0.73))
        brown = b.make_matte((0.62, 0.57, 0.54))
        red = b.make_matte((0.65, 0.05, 0.05))
        b.add_triangles([-4, 0, 4], [4, 0, 4], [4, 0, -4], white)
        b.add_triangles([-4, 0, 4], [-4, 0, -4], [4, 0, -4], white)
        b.add_area_light((-1, 3.0, -1), (1, 3.0, -1), (1, 3.0, 1),
                         (40, 40, 40), white)
        mid = b.register_mesh(mesh.vertices, mesh.faces)
        n_inst = 4 if q else 16  # 16 x 69451 = 1.11M effective triangles
        rng = np.random.default_rng(3)
        for i in range(n_inst):
            t = Transform(translate(0.0946899, -0.0329874, -0.0587997))
            t.composite(scale(4.0, 4.0, 4.0))
            t.composite(rotate([0, 1, 0], rng.uniform(0, 6.28)))
            t.composite(translate((i % 4) * 1.6 - 2.4, 0.0,
                                  (i // 4) * 1.6 - 2.4))
            b.add_instance(mid, brown if i % 2 else red, t)
        scene = b.build()
        cam = Camera.make((0, 4.5, 7.5), (0, 0.6, 0), (0, 1, 0), 40, 1.0)
        cfg = RenderConfig(width=256, height=256, num_samples=2 if q else 8,
                           max_bounces=5, num_working_paths=args.pool, **sk)
        eff = n_inst * len(mesh.faces)
        res = run_config(f"config4_instanced_{eff//1000}k_tris", scene, cam,
                         cfg, key)
        results.append(res)

    if 5 in which:
        # config 5 as specified (BASELINE.md:26): 1920x1080 @ 1024 spp full
        # wavefront with sorted batches + compaction.  The full frame is
        # 2.1e9 camera rays (> int32 ray-id range for one call), so it runs
        # via render_checkpointed in spp batches and reports the SUSTAINED
        # whole-frame rate.  --quick keeps the old 4-spp stand-in.
        scene, cam = cornell_bunny()
        if q:
            cfg = RenderConfig(width=1920, height=1080, num_samples=1,
                               max_bounces=10, num_working_paths=args.pool, **sk)
            results.append(run_config("config5_1080p_quick", scene, cam, cfg,
                                      key))
        else:
            from rtjax.render.checkpoint import render_checkpointed
            spp = 1024
            cfg = RenderConfig(width=1920, height=1080, num_samples=spp,
                               max_bounces=10, num_working_paths=args.pool, **sk)
            ckpt = "/tmp/rtjax_config5.npz"
            if os.path.exists(ckpt):
                os.remove(ckpt)
            # rays/sample measured on a 4-spp probe, then scaled: counting
            # rays exactly would need stats plumbing through checkpoint
            probe_cfg = RenderConfig(width=1920, height=1080, num_samples=4,
                                     max_bounces=10,
                                     num_working_paths=args.pool, **sk)
            r = run_config("config5_probe_4spp", scene, cam, probe_cfg, key)
            rays_per_spp = r["rays"] / 4
            t0 = time.time()
            render_checkpointed(scene, cam, cfg, ckpt, batch_spp=16,
                                save_every=16, verbose=False)
            dt = time.time() - t0
            rays = rays_per_spp * spp
            mrays = rays / dt / 1e6
            print(f"config5_1080p_1024spp: 1920x1080@{spp}spp {dt:.1f}s "
                  f"~{rays:.4g} rays -> {mrays:.2f} Mrays/s sustained")
            results.append(dict(name="config5_1080p_1024spp", width=1920,
                                height=1080, spp=spp, seconds=dt, rays=rays,
                                mrays=mrays))

    out = os.path.join(os.path.dirname(__file__), "RESULTS.md")
    import datetime
    with open(out, "a") as f:
        f.write(f"\n## {datetime.datetime.now().isoformat(timespec='seconds')}"
                f" ({jax.devices()[0].device_kind})\n\n")
        f.write("| config | res | spp | seconds | rays | Mrays/s |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['name']} | {r['width']}x{r['height']} | "
                    f"{r['spp']} | {r['seconds']:.2f} | {r['rays']:.4g} | "
                    f"{r['mrays']:.2f} |\n")
    print(f"appended results to {out}")


if __name__ == "__main__":
    main()
