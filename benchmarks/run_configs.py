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


def parity_check(n=8192, seed=0):
    """On-hardware kernel parity gate (round-4 verdict #4).

    8k mixed-coherence rays on the bunny scene: the Mosaic-lowered packet
    AND lane kernels must agree EXACTLY with the XLA traversal oracle on
    (hit, prim) for closest hits and on occlusion for any-hit.  Interpret-
    mode tests cannot see Mosaic lowering bugs (the round-3 NaN-poisoned
    drain tail was exactly that class); this runs on the real chip before
    every bench session and fails the run loudly.  Returns a result dict;
    raises SystemExit(1) on any mismatch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rtjax.kernels.pallas_lane import lane_traverse_closest
    from rtjax.kernels.pallas_wide import (wide_traverse_anyhit,
                                           wide_traverse_closest)
    from rtjax.kernels.traversal import traverse_anyhit, traverse_closest
    from rtjax.scenes import cornell_bunny

    scene, cam = cornell_bunny()
    tables, bvh, tris = scene.tables, scene.bvh, scene.tris
    rng = np.random.default_rng(seed)

    # half coherent camera rays, half incoherent box rays — one batch
    side = int(np.sqrt(n // 2))
    u = ((np.arange(side * side) % side) + 0.5) / side
    v = ((np.arange(side * side) // side) + 0.5) / side
    oc, dc = cam.get_rays(jnp.asarray(u, jnp.float32),
                          jnp.asarray(v, jnp.float32))
    m = n - side * side
    o_i = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    o_i[:, 1] += 1.0
    d_i = rng.standard_normal((m, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)
    o = jnp.concatenate([jnp.asarray(oc), jnp.asarray(o_i)])
    d = jnp.concatenate([jnp.asarray(dc), jnp.asarray(d_i)])
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    excl = jnp.full(n, -1, jnp.int32)

    ref = traverse_closest(bvh, tris, o, d, tmax, act,
                           stack_size=max(32, bvh.max_depth + 1))
    rhit, rt, rprim = (np.asarray(ref[0]), np.asarray(ref[1]),
                       np.asarray(ref[4]))
    rocc = np.asarray(traverse_anyhit(bvh, tris, o, d, tmax, excl, act,
                                      stack_size=max(32, bvh.max_depth + 1)))

    fails = []

    def check_closest(name, out):
        hit, t, prim = np.asarray(out[0]), np.asarray(out[1]), \
            np.asarray(out[2])
        if not (hit == rhit).all():
            fails.append(f"{name}: hit mask mismatch "
                         f"({int((hit != rhit).sum())} rays)")
        # prim may legally differ only where two triangles tie at exactly
        # the same t; require t to match bitwise everywhere that hits
        sel = hit & rhit
        if not (t[sel] == rt[sel]).all():
            fails.append(f"{name}: t mismatch "
                         f"({int((t[sel] != rt[sel]).sum())} rays)")
        tie = sel & (prim != rprim)
        if tie.any() and not (t[tie] == rt[tie]).all():
            fails.append(f"{name}: prim mismatch beyond t-ties")

    check_closest("packet", wide_traverse_closest(tables, o, d, tmax, act))
    check_closest("lane", lane_traverse_closest(tables, o, d, tmax, act))
    pocc = np.asarray(wide_traverse_anyhit(tables, o, d, tmax, excl, act))
    if not (pocc == rocc).all():
        fails.append(f"packet anyhit: occlusion mismatch "
                     f"({int((pocc != rocc).sum())} rays)")

    if fails:
        for f in fails:
            print(f"PARITY FAIL: {f}", file=sys.stderr)
        raise SystemExit(1)
    print(f"parity: OK ({n} mixed-coherence rays, packet+lane+anyhit vs "
          f"XLA oracle, backend={jax.default_backend()})")
    return dict(n=n, ok=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced resolutions/spp for smoke runs")
    ap.add_argument("--parity", action="store_true",
                    help="run ONLY the on-hardware kernel parity gate")
    ap.add_argument("--no-parity", action="store_true",
                    help="skip the parity gate that precedes bench runs")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--sort-key", default=None,
                    choices=["morton", "morton_pos", "prim", "prim_pos"],
                    # None -> RenderConfig default (morton_pos)
                    help="bounce-ray sort key (coherence experiment)")
    ap.add_argument("--walker", default=None,
                    choices=["auto", "packet", "lane"],
                    # None -> RenderConfig default (auto)
                    help="closest-hit traversal engine (A/B experiment)")
    ap.add_argument("--sort-every", type=int, default=None,
                    help="sort/gen/flush every k-th iteration (A/B)")
    ap.add_argument("--two-level", default=None,
                    choices=["auto", "kernel", "repass"],
                    help="instanced traversal strategy (config 4 A/B)")
    args = ap.parse_args()
    which = set(int(x) for x in args.configs.split(","))
    sk = {} if args.sort_key is None else {"sort_key": args.sort_key}
    if args.walker is not None:
        sk["walker"] = args.walker
    if args.sort_every is not None:
        sk["sort_every"] = args.sort_every
    if args.two_level is not None:
        sk["two_level"] = args.two_level

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/tmp/rtjax-jit-cache-tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    parity = None
    if not args.no_parity:
        parity = parity_check()
        if args.parity:
            return
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
        if parity is not None:
            f.write(f"parity gate: OK ({parity['n']} rays, packet+lane+"
                    "anyhit vs XLA oracle, on hardware)\n\n")
        f.write("| config | res | spp | seconds | rays | Mrays/s |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in results:
            f.write(f"| {r['name']} | {r['width']}x{r['height']} | "
                    f"{r['spp']} | {r['seconds']:.2f} | {r['rays']:.4g} | "
                    f"{r['mrays']:.2f} |\n")
    print(f"appended results to {out}")


if __name__ == "__main__":
    main()
