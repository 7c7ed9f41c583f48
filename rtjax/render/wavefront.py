"""The wavefront path-tracing engine.

TPU-native rebuild of /root/reference/render.cuh — the reference's core.
The CUDA design is a persistent pool of NUM_WORKING_PATHS slots driven by a
host loop: ``init`` routes slots, CUB compacts pending queues (with two
device->host count copies per bounce), then ``mat``/``gen`` shade and refill,
and ``ah``/``ch`` traverse (SURVEY.md §2.1).

Here the whole frame is ONE ``lax.while_loop`` on device:
- queues + CUB compaction (render.cuh:348-364) are replaced by masks over the
  full pool width — every stage is a batched masked function, and "compacted"
  work simply rides predication (the TPU analog of wavefront compaction;
  regeneration ranks come from a ``cumsum`` over the dead mask);
- framebuffer atomics (vec3.cuh:149-153) become deterministic scatter-adds;
- the two host sync points per bounce (render.cuh:433-434,444-445) disappear:
  the loop condition is computed on device.

Deliberate behavioral deviations from the reference (all documented against
file:line, none visible statistically):
1. A path that *misses* is regenerated immediately instead of idling until
   its bounce counter exceeds max_bounces (render.cuh:128-136 routes a miss
   to neither queue); radiance is unaffected, slot utilization is better.
2. Russian-roulette termination actually kills the path (standard RR).  The
   reference only drops the slot from the mat queue for one iteration — the
   payload keeps ``hit=true`` (render.cuh:117-119), so a "killed" path is
   re-rolled every following iteration until it survives or exceeds
   max_bounces, a mild upward-bias quirk we do not replicate.
3. The BSDF-sampling MIS shadow ray requires its closest hit to be the
   *picked light's* triangle.  The reference stores the triangle the path is
   standing on instead (render.cuh:236), which silently zeroes nearly the
   whole BSDF-MIS channel; that is a bug, fixed here.
4. ``power_heuristic`` takes float pdfs (utility.cuh:53 truncates one to int).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..constants import DEAD_BOUNCES, INVALID_INDEX
from ..core import rng, vec
from ..core.geometry import intersect_triangle, spawn_offset_ray
from ..core.sampling import power_heuristic
from .trace import (gather_hit_geometry, resolve_mode, trace_anyhit,
                    trace_closest)
from ..scene.camera import Camera
from ..scene.light import is_delta, pdf_li, sample_li
from ..scene.material import get_f, is_specular, sample_f
from ..scene.scene import Scene
from .sorting import ray_sort_keys, ray_sort_keys_prim, sort_permutation

# RNG draw-site ids (one threefry sweep per site per iteration)
_S_RR = 0
_S_BSDF1 = 1        # 1,2,3
_S_LIGHT_PICK = 4
_S_LIGHT_UV = 5     # 5,6
_S_BSDF2 = 7        # 7,8,9
_S_GEN = 10         # 10,11
NUM_RNG_SITES = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PathState:
    """SoA path-ray payload (render.cuh:10-18), one entry per pool slot."""

    pixel: jax.Array    # [N] int32
    ray_o: jax.Array    # [N, 3] float32
    ray_d: jax.Array    # [N, 3] float32
    hit: jax.Array      # [N] bool
    u: jax.Array        # [N] float32 (barycentric)
    v: jax.Array        # [N] float32
    prim: jax.Array     # [N] int32 (triangle index within src, -1 = none)
    src: jax.Array      # [N] int32 hit source: 0 = base scene, k = instance
    bounces: jax.Array  # [N] int32
    beta: jax.Array     # [N, 3] float32 throughput
    acc: jax.Array      # [N, 3] float32 radiance accumulated for the slot's
                        # CURRENT pixel; flushed to the framebuffer when the
                        # slot regenerates (one scatter-add per iteration
                        # instead of three, replacing per-contribution
                        # atomics, vec3.cuh:149-153)


def make_initial_state(n: int) -> PathState:
    """Fresh pool: every slot dead so iteration 0 routes all to gen
    (render.cuh:75-82 uses bounces=INT_MAX for the same purpose)."""
    return PathState(
        pixel=jnp.zeros(n, jnp.int32),
        ray_o=jnp.zeros((n, 3), jnp.float32),
        ray_d=jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1)),
        hit=jnp.zeros(n, bool),
        u=jnp.zeros(n, jnp.float32),
        v=jnp.zeros(n, jnp.float32),
        prim=jnp.full(n, INVALID_INDEX, jnp.int32),
        src=jnp.zeros(n, jnp.int32),
        bounces=jnp.full(n, DEAD_BOUNCES, jnp.int32),
        beta=jnp.ones((n, 3), jnp.float32),
        acc=jnp.zeros((n, 3), jnp.float32),
    )


def _accum(acc, value, mask):
    """Per-slot radiance accumulation.

    Non-finite contributions are dropped: degenerate samples (e.g. a cosine
    sample that cancels the normal, material.cuh:65, pdf -> 0) produce the
    occasional inf/NaN in any float path tracer; the reference would write
    them into the framebuffer via atomics, we refuse.
    """
    ok = mask & jnp.all(jnp.isfinite(value), axis=-1)
    return acc + jnp.where(ok[:, None], value, 0.0)


def wavefront_step(scene: Scene, camera: Camera, cfg: RenderConfig, key,
                   carry):
    """One wavefront iteration == one bounce for all in-flight paths
    (the body of the host loop at render.cuh:428-449)."""
    state, fb, cam_start, it, _, rays_traced, occ_sum = carry
    n = state.pixel.shape[0]
    num_lights = scene.num_lights
    cam_end = cfg.total_camera_rays

    # traversal backend: "pallas" packet kernels (TPU fast path; interpreted
    # on CPU), "xla" gather-based while_loop, or "auto"
    mode, interp = resolve_mode(scene, cfg)
    t_closest = partial(trace_closest, scene, cfg, mode, interp)
    t_anyhit = partial(trace_anyhit, scene, cfg, mode, interp)

    # all RNG sites of this iteration in one threefry sweep
    _uniforms = rng.uniform_block(key, it, NUM_RNG_SITES, n)
    draw = lambda site: _uniforms[site]

    # ---- init: emission, Russian roulette, routing (render.cuh:84-137) ----
    prim_safe = jnp.clip(state.prim, 0, scene.tris.num - 1)
    # instanced prims are never emissive (lights live in the base scene)
    light_idx = jnp.where(state.src == 0, scene.prim_light[prim_safe],
                          INVALID_INDEX)
    emit0 = state.hit & (light_idx >= 0) & (state.bounces == 0)
    emit_val = scene.lights.emit[jnp.maximum(light_idx, 0)]
    acc = _accum(state.acc, emit_val, emit0)

    # constant environment light on miss (the reference's unimplemented
    # TODO at render.cuh:105): pure BSDF-sampled channel, never sampled by
    # NEE, so no MIS weighting is needed
    env_mask = ~state.hit & (state.bounces <= cfg.max_bounces)
    acc = _accum(acc, state.beta * scene.env_radiance, env_mask)

    alive = state.bounces < cfg.max_bounces
    beta = state.beta
    beta_max = vec.vmax(beta)
    rr_cand = alive & state.hit & (state.bounces > cfg.rr_start) & \
        (beta_max < cfg.rr_threshold)
    p_term = jnp.maximum(0.05, 1.0 - beta_max)
    rr_kill = rr_cand & (draw(_S_RR) < p_term)
    beta = jnp.where((rr_cand & ~rr_kill)[:, None],
                     beta / (1.0 - p_term)[:, None], beta)

    bounces = state.bounces + 1
    mat_mask = alive & state.hit & ~rr_kill
    gen_mask = ~mat_mask

    # ---- mat: shading (render.cuh:139-248) --------------------------------
    tp0, te1, te2, tn, mtype, albedo, ior = gather_hit_geometry(
        scene, state.src, state.prim)
    multiplier = beta * num_lights
    # p(u, v) = p0 - u*e1 + v*e2 (triangle.cuh:15)
    p = tp0 - state.u[:, None] * te1 + state.v[:, None] * te2
    n_g = -vec.normalize(tn)  # geometric normal convention (render.cuh:153)
    wo = state.ray_d

    # (1) BSDF-sample the next path ray (render.cuh:158-171)
    f1, wi1, pdf1, n1 = sample_f(mtype, albedo, ior, wo, n_g,
                                 draw(_S_BSDF1), draw(_S_BSDF1 + 1),
                                 draw(_S_BSDF1 + 2))
    next_o, next_d, _ = spawn_offset_ray(p, n1, wi1)
    next_beta = beta * f1 * (vec.dot(wi1, n1) / pdf1)[:, None]
    # degenerate sample (pdf ~ 0) -> zero throughput; RR then kills the path
    next_beta = jnp.where(jnp.all(jnp.isfinite(next_beta), -1)[:, None],
                          next_beta, 0.0)

    if num_lights > 0:
        # uniform light pick (render.cuh:178-180)
        pick = jnp.minimum((draw(_S_LIGHT_PICK) * num_lights).astype(jnp.int32),
                           num_lights - 1)
        delta = is_delta(scene.lights.ltype[pick])

        # (2) light-sampling MIS -> AH shadow ray (render.cuh:183-210)
        wi_l, li, light_t, light_pdf, ltri = sample_li(
            scene.lights, scene.tris, pick, p,
            draw(_S_LIGHT_UV), draw(_S_LIGHT_UV + 1))
        n_l = jnp.where(vec.dot(n_g, wi_l)[:, None] > 0.0, n_g, -n_g)
        got_f, f_l, scat_pdf = get_f(mtype, albedo, wo, wi_l, n_l)
        f_lc = f_l * vec.dot(wi_l, n_l)[:, None]
        w_l = jnp.where(delta, 1.0, power_heuristic(light_pdf, scat_pdf))
        ah_L = multiplier * f_lc * li * (w_l / light_pdf)[:, None]
        ah_o, ah_d, ah_tmax = spawn_offset_ray(p, n_l, wi_l, light_t)
        ah_mask = mat_mask & got_f

        # (3) BSDF-sampling MIS -> CH shadow ray (render.cuh:213-245)
        f2, wi2, pdf2, n2 = sample_f(mtype, albedo, ior, wo, n_g,
                                     draw(_S_BSDF2), draw(_S_BSDF2 + 1),
                                     draw(_S_BSDF2 + 2))
        f2c = f2 * vec.dot(wi2, n2)[:, None]
        spec = is_specular(mtype)
        lpdf2 = pdf_li(scene.lights, scene.tris, pick, p, wi2)
        w2 = jnp.where(spec, 1.0, power_heuristic(pdf2, lpdf2))
        chs_mask = mat_mask & ~delta & (spec | (lpdf2 > 0.0))
        chs_L = multiplier * f2c * scene.lights.emit[pick] * \
            (w2 / pdf2)[:, None]
        chs_o, chs_d, _ = spawn_offset_ray(p, n2, wi2)
        # "closest hit == the picked light's triangle" (render.cuh:321, with
        # the target fixed to the light, see deviation 3)  <=>  the ray hits
        # that triangle at t_l AND nothing else hits with t <= t_l.  One
        # direct MT test + an any-hit query replaces the expensive
        # closest-hit traversal.
        ltri_g = scene.tris.gather(jnp.maximum(ltri, 0))
        chs_hit_l, chs_t, _, _ = intersect_triangle(
            chs_o, chs_d, jnp.inf, ltri_g.p0, ltri_g.e1, ltri_g.e2, ltri_g.n)
        chs_mask = chs_mask & chs_hit_l

    # ---- gen: refill dead slots with camera rays (render.cuh:250-275) -----
    gen_rank = jnp.cumsum(gen_mask) - gen_mask  # exclusive prefix sum
    cam_id = cam_start + gen_rank.astype(jnp.int32)
    got_ray = gen_mask & (cam_id < cam_end)
    pix_new = cam_id // cfg.num_samples  # pixel-major sample ids
    ci = (pix_new % cfg.width).astype(jnp.float32)
    cj = (pix_new // cfg.width).astype(jnp.float32)
    cam_o, cam_d = camera.get_rays((ci + draw(_S_GEN)) / cfg.width,
                                   (cj + draw(_S_GEN + 1)) / cfg.height)
    num_gen = jnp.sum(gen_mask).astype(jnp.int32)

    # flush the radiance accumulators of slots leaving their pixel: ONE
    # deterministic scatter-add per iteration (replaces the reference's
    # three atomic-add channels, render.cuh:102,292,322)
    flush = jnp.where(gen_mask[:, None], acc, 0.0)
    fb = fb.at[state.pixel].add(flush, mode="drop")
    acc = jnp.where(gen_mask[:, None], 0.0, acc)

    # merge mat-continued and regenerated rays into the path-ray pool
    m = mat_mask[:, None]
    g = got_ray[:, None]
    ray_o = jnp.where(m, next_o, jnp.where(g, cam_o, state.ray_o))
    ray_d = jnp.where(m, next_d, jnp.where(g, cam_d, state.ray_d))
    pixel = jnp.where(got_ray, pix_new, state.pixel)
    beta = jnp.where(m, next_beta, jnp.where(g, 1.0, beta))
    bounces = jnp.where(got_ray, 0, jnp.where(gen_mask, DEAD_BOUNCES, bounces))

    # ---- traversal (render.cuh:278-328) ------------------------------------
    # rays sorted by (direction octant, origin Morton) so packet tiles stay
    # coherent and dead lanes cluster into tiles that exit immediately — the
    # packet-era equivalent of CUB compaction (render.cuh:348-364).  The
    # shadow rays reuse the path-ray permutation: they share its origins
    # (the current hit points), so one argsort covers all three traversals.
    trace_mask = mat_mask | got_ray
    inf = jnp.full(n, jnp.inf, jnp.float32)
    do_sort = cfg.sort_rays and mode == "pallas"
    if do_sort:
        if cfg.sort_key == "prim":
            src_prim = jnp.where(mat_mask, state.prim, -1)
            keys = ray_sort_keys_prim(src_prim, ray_d, trace_mask)
        else:
            root_lo, root_hi = scene.bvh.bmin[0], scene.bvh.bmax[0]
            keys = ray_sort_keys(ray_o, ray_d, root_lo, root_hi, trace_mask)
        perm, invp = sort_permutation(keys)
        hit, _, hu, hv, hprim, hsrc = t_closest(ray_o[perm], ray_d[perm], inf,
                                                trace_mask[perm])
        hit, hu, hv, hprim, hsrc = (hit[invp], hu[invp], hv[invp],
                                    hprim[invp], hsrc[invp])
    else:
        hit, _, hu, hv, hprim, hsrc = t_closest(ray_o, ray_d, inf, trace_mask)

    traced = jnp.sum(trace_mask, dtype=jnp.float32)
    if num_lights > 0:
        if do_sort:
            occluded = t_anyhit(ah_o[perm], ah_d[perm], ah_tmax[perm],
                                ltri[perm], ah_mask[perm])[invp]
        else:
            occluded = t_anyhit(ah_o, ah_d, ah_tmax, ltri, ah_mask)
        acc = _accum(acc, ah_L, ah_mask & ~occluded)

        if do_sort:
            blocked = t_anyhit(chs_o[perm], chs_d[perm], chs_t[perm],
                               ltri[perm], chs_mask[perm])[invp]
        else:
            blocked = t_anyhit(chs_o, chs_d, chs_t, ltri, chs_mask)
        acc = _accum(acc, chs_L, chs_mask & ~blocked)
        traced = traced + jnp.sum(ah_mask, dtype=jnp.float32) + \
            jnp.sum(chs_mask, dtype=jnp.float32)

    new_state = PathState(pixel=pixel, ray_o=ray_o, ray_d=ray_d, hit=hit,
                          u=hu, v=hv, prim=hprim, src=hsrc, bounces=bounces,
                          beta=beta, acc=acc)
    work_left = jnp.any(trace_mask)
    occupancy = jnp.sum(trace_mask, dtype=jnp.float32) / n
    return (new_state, fb, cam_start + num_gen, it + 1, work_left,
            rays_traced + traced, occ_sum + occupancy)


def render_frame_linear(scene: Scene, camera: Camera, cfg: RenderConfig, key):
    """Render a frame, returning the LINEAR sample-sum framebuffer.

    The per-pixel values are sums of per-sample radiance (not yet divided by
    spp, no gamma).  Multi-chip rendering psums these linear buffers across
    the mesh before normalizing once (rtjax.parallel.sharding).
    """
    n = cfg.num_working_paths
    state = make_initial_state(n)
    fb = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    carry = (state, fb, jnp.int32(0), jnp.int32(0), jnp.bool_(False),
             jnp.float32(0), jnp.float32(0))

    def cond(carry):
        cam_start, it, work_left = carry[2], carry[3], carry[4]
        more = work_left | (cam_start < cfg.total_camera_rays)
        if cfg.max_iterations is not None:
            more = more & (it < cfg.max_iterations)
        return more

    step = partial(wavefront_step, scene, camera, cfg, key)
    state, fb, _, it, _, rays, occ = jax.lax.while_loop(cond, step, carry)
    # avg path-slot occupancy per iteration: the compaction-quality metric
    # the reference never had (SURVEY.md §5 observability)
    return fb, {"iterations": it, "rays_traced": rays,
                "avg_occupancy": occ / jnp.maximum(it, 1)}


@partial(jax.jit, static_argnames=("cfg",))
def render_frame(scene: Scene, camera: Camera, cfg: RenderConfig, key):
    """Render a full frame; returns ``(framebuffer [H*W, 3], stats)``.

    The equivalent of ``render()`` at render.cuh:366-457: initializes the
    pool, iterates the wavefront until every camera ray is consumed and every
    path has died (render.cuh:436's termination rule), then applies the
    sqrt(mean) gamma-2 post-process (render.cuh:330-338).
    """
    fb, stats = render_frame_linear(scene, camera, cfg, key)
    fb = jnp.sqrt(fb / cfg.num_samples)  # gamma 2.0 (render.cuh:330-338)
    return fb, stats
