"""Render configuration.

The reference has compile-time constants only (/root/reference/constant.hpp
plus literals in main.cu:159-170); this dataclass exposes the same knobs with
the same defaults, per render call.
"""

from __future__ import annotations

import dataclasses

from . import constants


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 600
    height: int = 600
    num_samples: int = 10          # spp (main.cu:169)
    max_bounces: int = 10          # (main.cu:170)
    # pool size: the reference uses a fixed 2^20 (constant.hpp:8).  None
    # (default) adapts to the workload: small frames measure fastest at
    # 2^17 (per-iteration stage math scales with the pool), big sample
    # counts at 2^19 (more rays per iteration amortize the per-iteration
    # fixed costs) — see pool_size.
    num_working_paths: int | None = None
    rr_start: int = constants.RR_START
    rr_threshold: float = constants.RR_THRESHOLD
    seed: int = constants.RAND_SEED
    stack_size: int = constants.BVH_MAX_DEPTH
    # traversal kernel: "pallas" (packet kernels, TPU fast path), "xla"
    # (gather-based vmapped while_loop), or "auto" (pallas on TPU)
    traversal: str = "auto"
    # closest-hit walk schedule on the pallas path: "packet" (one shared
    # traversal cursor per 2048-ray tile, kernels/pallas_wide.py) or "lane"
    # (16 independent per-sublane walkers per tile, kernels/pallas_lane.py
    # — cuts tile-union divergence and drains up to 16 leaf rows per vector
    # pass).  "auto" picks lane whenever the scene is eligible (unpacked
    # node rows, VMEM-resident leaf table, build depth within the lane
    # stack).  Any-hit always stays on the packet kernel: shadow rays
    # early-out at tile level and the lane schedule's per-sublane visit
    # duplication measured 1.8x slower there (benchmarks/lane_vs_packet.py).
    walker: str = "auto"
    # any-hit (shadow/occlusion) walk schedule: "packet" (tile-level
    # early-out, kernels/pallas_wide.py) or "persist" (barrier-free
    # per-sublane walkers with per-walker occlusion early-out,
    # kernels/pallas_lane_persist.py).  "auto" resolves per the round-5
    # on-hardware A/B (benchmarks/anyhit_ab.py; see render/trace.py).
    anyhit_walker: str = "auto"
    # scenes whose base (or BLAS) triangle count is at or below this skip
    # the BVH kernels for that launch: an unrolled all-triangles MT loop
    # in plain XLA fuses into the iteration with zero pallas launches
    # (render/trace.py::_direct_closest).  0 disables.  Round-5 engine
    # floor diet: config2's 14-tri scene pays 3 pool-width kernel
    # launches/iteration for a 2-leaf-row tree.
    direct_max_tris: int = 64
    # sort rays by (octant, origin Morton) before packet traversal
    sort_rays: bool = True
    # run the sort/gen/flush block only on every k-th iteration: in between,
    # continuing paths keep their (one-iteration-stale, still packet-
    # coherent) slots and dead slots idle instead of refilling; an
    # occupancy guard (< 3/4 pool live) forces a refill iteration so the
    # frame tail never starves.  Saves the sort (~1.3 ms at 2^18) + flush +
    # camera-gen cost on skipped iterations; only active on the compact
    # sorted bundle (non-parity).
    # 0 = auto: k=2 on trivial-BVH scenes (<= 1024 prims, floor-dominated:
    # config2 97.75 vs 91.6 Mrays/s), k=1 where traversal dominates and
    # stale packet grouping costs walk rounds (config1 16.42 vs 15.07;
    # RESULTS.md 2026-08-20 A/B).
    sort_every: int = 0
    # two-level (instanced) traversal strategy on the pallas path:
    # "kernel" = single-launch in-kernel instance loop (each packet tile
    # walks the tile-union of overlapping instances, nearest first);
    # "repass" = multi-pass re-dispatch (each pass, every ray picks its
    # nearest unwalked candidate instance and all rays walk that mesh's
    # BLAS in one coherent single-level launch; passes repeat until no
    # candidates remain).  "auto" selects per measurement (see
    # render/trace.py).  Ignored for non-instanced scenes.
    two_level: str = "auto"
    # two-level strategy for the ANY-HIT (shadow/occlusion) channel
    # specifically: "auto" follows the measured default (see
    # render/trace.py), "repass"/"kernel" force.  Shadow rays early-out
    # on first hit, so the in-kernel tile-union walk and the multi-pass
    # re-dispatch trade off differently than for closest-hit.
    two_level_anyhit: str = "auto"
    # sort key: "morton" (octant-major origin cell), "morton_pos"
    # (position-major origin cell), "prim" (octant-major origin triangle),
    # "prim_pos" (position-major origin triangle), "normal_pos"
    # (position-major, NORMAL-octant tie-break: the sort runs before the
    # next direction is sampled, and matte bounces scatter around the
    # normal), or "adaptive" (position-major shallow / normal-octant-major
    # deep rays).  morton_pos measured fastest on bounce-heavy scenes
    # (config 1: 9.76 vs 8.66 Mrays/s): bounce packets from one surface
    # patch share BVH paths regardless of direction, so position-major
    # packs them into one tile.
    sort_key: str = "morton_pos"
    # camera-ray generation order: "blocked" hands regenerated slots sample
    # ids in 16x16-pixel screen blocks, so primary-ray packet tiles cover
    # compact screen areas instead of full-width scanline bands; "scan"
    # keeps raw pixel-major order.  "auto" picks blocked when one 2048-ray
    # tile spans >= 256 pixels (spp <= 8; measured: 16spp bunny scan 9.75
    # vs blocked 9.29 Mrays/s) — at higher spp tiles are
    # sub-block already and the rank->pixel gather (~1 ms/iteration at
    # pool width) outweighs the locality win.  Image expectation is
    # identical either way — only the sample->slot schedule changes.
    camera_order: str = "auto"
    # upper bound on wavefront iterations (safety net for the while_loop);
    # None derives it from the workload.
    max_iterations: int | None = None
    # prefix-windowed shading: the per-iteration sort packs continuing
    # (shading) lanes into a contiguous prefix, so the mat stage runs as a
    # fori_loop over pool/shade_chunks-wide chunks with a TRACED trip count
    # ceil(num_mat/chunk) — end-of-frame and bounce-tail iterations skip the
    # dead suffix entirely (in-window lanes compute bitwise-identically).
    # 1 disables; requires sort_rays and the pallas path.  "auto" picks 1
    # when the frame refills the pool >= 16 times (occupancy stays high for
    # most iterations, and the chunk loop's slice/update overhead costs more
    # than the skipped suffix saves: config2 at 64 refills measured 87.8 at
    # 1 vs 85.1 at 8; the 64spp headline at 16 refills 21.93 vs 21.62) and
    # 8 otherwise (few-refill frames spend most iterations in the bounce
    # tail: config1 at 8 refills measured 16.17 at 8 vs 16.03 at 1).
    shade_chunks: int | str = "auto"

    @property
    def shade_chunks_effective(self) -> int:
        if self.shade_chunks == "auto":
            return 1 if self.total_camera_rays >= 16 * self.pool_size else 8
        return self.shade_chunks
    # one-sample MIS: reuse the path-continuation BSDF sample for the
    # BSDF-side MIS light channel (the standard single-sample estimator,
    # e.g. PBRT); the channel's "closest hit == picked light triangle"
    # test is answered by the path ray's own closest-hit record, so the
    # second BSDF draw, the direct light MT test, and the CH half of the
    # 2N any-hit launch all disappear.  Identical expectation to the
    # default two-sample form (the reference's structure,
    # render.cuh:213-245, minus its target bug); slightly higher variance
    # from the path/MIS sample correlation.  Measured FRAME-NEUTRAL on the
    # bunny bench (12.19 vs 12.21 Mrays/s): the CH channel's traversal was
    # already gated by the direct light test (lpdf2 > 0 only when the BSDF
    # ray points at the light, ~0.3% of lanes), so there was little
    # traversal to save.  Kept as a standard estimator option.
    # Incompatible with reference_parity.
    one_sample_mis: bool = False
    # collect extended observability counters (SURVEY.md §5): per-depth
    # bounce histogram plus traversal node-step / leaf-visit counters from
    # the kernels.  Off by default — the histogram scatter and counter
    # plumbing cost a few percent per iteration.
    detailed_stats: bool = False
    # replicate the reference's three estimator-visible quirks (all fixed by
    # default, see render/wavefront.py docstring): the int-truncated
    # power_heuristic g_pdf (utility.cuh:53), the Russian-roulette re-roll
    # limbo (render.cuh:117-119,128-136), and the BSDF-MIS shadow ray
    # targeting the surface's own triangle (render.cuh:236).  Used to
    # quantify the fixed estimator's delta vs the CUDA binary's output.
    reference_parity: bool = False

    def __post_init__(self):
        # negative k would silently alias the auto branch (the engine tests
        # sort_every > 0) — reject it up front (ADVICE r4 #3)
        if self.sort_every < 0:
            raise ValueError(
                f"sort_every must be >= 0 (0 = auto), got {self.sort_every}")

    @property
    def pool_size(self) -> int:
        """Effective wavefront pool width.

        Explicit ``num_working_paths`` wins; otherwise the largest power
        of two with at least ~16 pool refills, clamped to [2^17, 2^19].
        (Round-3 sweep on v5e: the 64spp bunny runs 12.2 at 2^18 vs 11.3
        at 2^17 — the round-2 stage-math penalty for wide pools is gone
        after the floor diet — but a 16spp frame with only 4 refills of
        2^18 drops to 9.4; ~16 refills is the measured crossover.)
        """
        if self.num_working_paths is not None:
            return self.num_working_paths
        n = 1 << 17
        while n < (1 << 19) and n * 16 < self.total_camera_rays:
            n <<= 1
        return n

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    @property
    def total_camera_rays(self) -> int:
        n = self.num_pixels * self.num_samples
        # camera-ray ids are int32 on device (wavefront.py cam_id); bigger
        # renders must batch spp via render.checkpoint.render_checkpointed
        # (which also keeps single while_loop programs short enough for the
        # remote-TPU watchdog — docs/DEV_NOTES.md)
        assert n < 2**31, (
            f"{n} camera rays overflow int32 ray ids; render in spp batches "
            "with rtjax.render.checkpoint.render_checkpointed")
        return n
