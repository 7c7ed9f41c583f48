"""Two-level lane walker (pallas_lane_inst) vs the packet instanced kernel:
bitwise hit agreement on random rays over an instanced scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtjax import SceneBuilder, Transform
from rtjax.kernels.pallas_lane_inst import (lane_traverse_anyhit_inst,
                                            lane_traverse_closest_inst)
from rtjax.kernels.pallas_wide import (wide_traverse_anyhit_inst,
                                       wide_traverse_closest_inst)
from rtjax.scene.transform import rotate, scale, translate


@pytest.fixture(scope="module")
def inst_scene():
    b = SceneBuilder()
    white = b.make_matte((0.7, 0.7, 0.7))
    red = b.make_matte((0.6, 0.1, 0.1))
    b.add_triangles([-5, 0, 5], [5, 0, 5], [5, 0, -5], white)
    b.add_triangles([-5, 0, 5], [-5, 0, -5], [5, 0, -5], white)
    b.add_area_light([-1, 4, -1], [1, 4, -1], [1, 4, 1], (5, 5, 5), white)
    # a little tetra mesh instanced 5 times with rotation + overlap
    v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, 0.4, 1]], float)
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    mid = b.register_mesh(v, f)
    r = np.random.default_rng(5)
    for i in range(5):
        t = Transform(scale(1.5, 1.5, 1.5))
        t.composite(rotate([0, 1, 0], float(r.uniform(0, 6.28))))
        t.composite(translate(i * 0.8 - 1.6, 0.2, -0.5))
        b.add_instance(mid, red, t)
    scene = b.build()
    assert scene.inst_tables is not None
    return scene


def _rays(n, seed):
    r = np.random.default_rng(seed)
    o = r.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] += 2.0
    d = r.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_lane_inst_closest_matches_packet(inst_scene):
    tabs = inst_scene.inst_tables
    n = 4096
    o, d = _rays(n, 3)
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    out_l = lane_traverse_closest_inst(tabs, o, d, tmax, act,
                                       interpret=True, with_stats=True)
    out_p = wide_traverse_closest_inst(tabs, o, d, tmax, act,
                                       interpret=True, with_stats=True)
    for name, a, b in zip(("hit", "t", "prim", "inst"), out_l[:4], out_p[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    np.testing.assert_array_equal(np.asarray(out_l[4]), np.asarray(out_p[4]))
    rounds, visits, drounds = (int(np.asarray(x)) for x in out_l[5])
    assert rounds > 0 and visits > 0
    assert visits / 16 <= drounds <= visits


def test_lane_inst_anyhit_matches_packet(inst_scene):
    tabs = inst_scene.inst_tables
    n = 4096
    o, d = _rays(n, 4)
    tmax = jnp.full(n, jnp.inf)
    act = jnp.ones(n, bool)
    excl = jnp.full(n, -1, jnp.int32)
    occ_l = lane_traverse_anyhit_inst(tabs, o, d, tmax, excl, act,
                                      interpret=True)
    occ_p = wide_traverse_anyhit_inst(tabs, o, d, tmax, excl, act,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_l), np.asarray(occ_p))


def test_lane_inst_anyhit_base_exclusion(inst_scene):
    # exclusion must act only within the base scene: a ray whose sole
    # occluder is base prim k is unoccluded when k is excluded
    tabs = inst_scene.inst_tables
    o = jnp.asarray([[0.0, 3.0, 3.0]] * 2, jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]] * 2, jnp.float32)
    tmax = jnp.full(2, jnp.inf)
    act = jnp.ones(2, bool)
    hit, t, prim, inst, _ = wide_traverse_closest_inst(
        tabs, o, d, tmax, act, interpret=True)
    assert bool(hit[0]) and int(inst[0]) == 0
    excl = jnp.asarray([int(prim[0]), -1], jnp.int32)
    occ = lane_traverse_anyhit_inst(tabs, o, d, t, excl, act, interpret=True)
    assert not bool(occ[0])
