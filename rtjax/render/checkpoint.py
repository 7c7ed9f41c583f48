"""Checkpoint / resume for long renders.

The reference has none (SURVEY.md §5): a render runs start-to-finish.  Here
the whole state between sample batches is (linear framebuffer, samples done,
seed), so long renders — e.g. the 1024-spp north-star — run as a sequence of
spp batches with an ``.npz`` checkpoint after each; a killed job resumes from
the last batch.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import RenderConfig
import dataclasses


def render_checkpointed(scene, camera, cfg: RenderConfig, path: str,
                        batch_spp: int | None = None, verbose: bool = True):
    """Render ``cfg.num_samples`` spp in batches with checkpointing.

    Returns the finished (gamma-corrected) framebuffer ``[H*W, 3]``.
    """
    import jax.numpy as jnp
    from .wavefront import render_frame_linear

    batch_spp = batch_spp or max(1, min(cfg.num_samples, 64))
    assert cfg.num_samples % batch_spp == 0, "batch must divide num_samples"
    n_batches = cfg.num_samples // batch_spp
    batch_cfg = dataclasses.replace(cfg, num_samples=batch_spp)

    fb = np.zeros((cfg.num_pixels, 3), np.float32)
    start = 0
    if path and os.path.exists(path):
        ck = np.load(path)
        if (int(ck["seed"]) == cfg.seed and int(ck["batch_spp"]) == batch_spp
                and ck["fb"].shape == fb.shape):
            fb = ck["fb"]
            start = int(ck["batches_done"])
            if verbose:
                print(f"resuming from {path}: {start}/{n_batches} batches")

    base_key = jax.random.key(cfg.seed)
    step = jax.jit(lambda key: render_frame_linear(scene, camera, batch_cfg,
                                                   key))
    for b in range(start, n_batches):
        key = jax.random.fold_in(base_key, b)
        fb_b, stats = step(key)
        fb = fb + np.asarray(fb_b)
        if path:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, fb=fb, batches_done=b + 1, seed=cfg.seed,
                         batch_spp=batch_spp)
            os.replace(tmp, path)
        if verbose:
            print(f"batch {b + 1}/{n_batches} done "
                  f"({float(np.asarray(stats['rays_traced'])):.3g} rays)")

    return np.sqrt(fb / cfg.num_samples)
