"""Persistent lane walker (tile-barrier-free per-sublane traversal):
parity vs the XLA oracle and the tile-mode lane walker, interpret mode.

The persistent walker changes ONLY the schedule (walkers advance to
their row of the next tile instead of waiting at the tile barrier), so
hit masks, t, prim and normals must agree bitwise with the other
kernels except for tie-breaks between exactly-equal t.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtjax.kernels import traverse_anyhit, traverse_closest
from rtjax.kernels.pallas_lane import (lane_traverse_anyhit,
                                       lane_traverse_closest)
from rtjax.kernels.pallas_lane_persist import (persist_traverse_anyhit,
                                               persist_traverse_closest)

from test_pallas_lane import _pack, _rays


@pytest.fixture(scope="module", params=[
    8, pytest.param(16, marks=pytest.mark.slow)], ids=["w8", "w16"])
def persist_scene(request):
    return _pack(width=request.param)


def test_persist_closest_matches_xla(persist_scene):
    res, ptris, tables = persist_scene
    bvh = res.to_device()
    n = 3 * 2048 + 300  # several tiles + ragged remainder: staggered
    # transitions and the parked-walker end-game
    o, d = _rays(n)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.asarray(np.random.default_rng(5).random(n) > 0.1)

    hp, tp, pp, np_ = persist_traverse_closest(tables, o, d, tmax, active,
                                               interpret=True)
    hx, tx, _, _, px, nx_ = traverse_closest(bvh, ptris, o, d, tmax, active)
    m = np.asarray(hx)
    np.testing.assert_array_equal(np.asarray(hp), m)
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(tx)[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pp)[m], np.asarray(px)[m])
    np.testing.assert_array_equal(np.asarray(np_)[m], np.asarray(nx_)[m])


@pytest.mark.slow
def test_persist_closest_matches_lane(persist_scene):
    """Bitwise agreement with the tile-mode lane walker, plus the stats
    contract: same popped-visit class, and the persistent schedule must
    not do MORE lockstep walk rounds than the tile-barrier one."""
    _, _, tables = persist_scene
    n = 4096
    o, d = _rays(n, seed=9)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)

    out_p = persist_traverse_closest(tables, o, d, tmax, active,
                                     interpret=True, with_stats=True)
    out_l = lane_traverse_closest(tables, o, d, tmax, active,
                                  interpret=True, with_stats=True)
    for a, b in zip(out_p[:3], out_l[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out_p[3]), np.asarray(out_l[3]))
    r_p, v_p, d_p = (int(np.asarray(x)) for x in out_p[4])
    r_l, v_l, d_l = (int(np.asarray(x)) for x in out_l[4])
    assert r_p > 0 and v_p > 0 and d_p > 0
    assert r_p <= r_l  # no tile barrier -> never more lockstep rounds
    assert v_p / 16 <= d_p <= v_p


@pytest.mark.slow
def test_persist_inactive_dead_rows_and_finite_tmax(persist_scene):
    """Whole-dead rows (a walker pops its fresh row for free), inactive
    lanes, and finite tmax all match the oracle."""
    res, ptris, tables = persist_scene
    bvh = res.to_device()
    n = 2 * 2048
    o, d = _rays(n, seed=13)
    tmax = jnp.full(n, 0.7)
    act = np.random.default_rng(2).random(n) > 0.5
    act[128 * 3:128 * 5] = False   # two fully-dead rows
    act[-2048:] = False            # a fully-dead trailing tile
    active = jnp.asarray(act)

    hp, tp, pp, _ = persist_traverse_closest(tables, o, d, tmax, active,
                                             interpret=True)
    hx, tx, _, _, px, _ = traverse_closest(bvh, ptris, o, d, tmax, active)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))
    assert not np.asarray(hp)[~act].any()
    m = np.asarray(hx)
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(tx)[m],
                               rtol=1e-5, atol=1e-6)


def test_persist_anyhit_matches_xla(persist_scene):
    """Any-hit with per-lane exclusion: exact occlusion agreement with the
    XLA oracle (occlusion is schedule-invariant — a boolean), including
    inactive lanes and finite tmax."""
    res, ptris, tables = persist_scene
    bvh = res.to_device()
    n = 3 * 2048 + 300
    o, d = _rays(n, seed=21)
    rng = np.random.default_rng(5)
    active = jnp.asarray(rng.random(n) > 0.1)
    ex = jnp.asarray(np.where(rng.random(n) > 0.5,
                              rng.integers(0, 300, n), -1).astype(np.int32))
    for tm in (jnp.full(n, jnp.inf), jnp.full(n, 0.7)):
        occ_p = persist_traverse_anyhit(tables, o, d, tm, ex, active,
                                        interpret=True)
        occ_x = traverse_anyhit(bvh, ptris, o, d, tm, ex, active)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))
        assert not np.asarray(occ_p)[~np.asarray(active)].any()


@pytest.mark.slow
def test_persist_anyhit_matches_lane_and_stats(persist_scene):
    """Same occlusion as the tile-mode lane any-hit walker; the persistent
    schedule's early-out must never do MORE lockstep walk rounds."""
    _, _, tables = persist_scene
    n = 4096
    o, d = _rays(n, seed=9)
    tmax = jnp.full(n, jnp.inf)
    active = jnp.ones(n, bool)
    ex = jnp.full(n, -1, jnp.int32)

    occ_p, st_p = persist_traverse_anyhit(tables, o, d, tmax, ex, active,
                                          interpret=True, with_stats=True)
    occ_l, st_l = lane_traverse_anyhit(tables, o, d, tmax, ex, active,
                                       interpret=True, with_stats=True)
    np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_l))
    r_p = int(np.asarray(st_p[0]))
    r_l = int(np.asarray(st_l[0]))
    assert r_p > 0
    assert r_p <= r_l
