"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import pytest
import jax
import numpy as np

from rtjax import RenderConfig
from rtjax.parallel import make_mesh, render_frame_sharded
from rtjax.render import render_frame
from rtjax.utils.compare import mse

from scenes import cornell, default_camera


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matches_single_device():
    scene, _ = cornell(light_size=0.5, light_l=(4.0, 4.0, 4.0))
    cam = default_camera()
    cfg = RenderConfig(width=32, height=32, num_samples=64, max_bounces=4,
                       num_working_paths=2048)
    fb_s, stats = render_frame_sharded(scene, cam, cfg, jax.random.key(1))
    fb_1, _ = render_frame(scene, cam, cfg, jax.random.key(1))
    img_s = np.asarray(fb_s).reshape(32, 32, 3)
    img_1 = np.asarray(fb_1).reshape(32, 32, 3)
    # different sample partitioning -> agree to within noise
    assert abs(img_s.mean() - img_1.mean()) < 0.01
    assert mse(img_s, img_1) < 0.004
    # all 8 chips trace: total rays ~ 8 x single-chip count at 8x fewer spp
    assert float(stats["rays_traced"]) > 0


@pytest.mark.slow
def test_sharded_deterministic():
    scene, _ = cornell(light_size=0.5, light_l=(4.0, 4.0, 4.0))
    cam = default_camera()
    cfg = RenderConfig(width=16, height=16, num_samples=16, max_bounces=2,
                       num_working_paths=1024)
    fb1, _ = render_frame_sharded(scene, cam, cfg, jax.random.key(5))
    fb2, _ = render_frame_sharded(scene, cam, cfg, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(fb1), np.asarray(fb2))
