"""NDT map construction vs the single-thread NumPy oracle (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.config import GridConfig, NDTMapConfig
from ndtpu.ndt import grid as g
from ndtpu.reference_impl import ndt_numpy
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick

GRID = GridConfig(x0=-8.0, y0=-8.0, cell=1.0, nx=16, ny=16, overlap=4)
CFG = NDTMapConfig()


def make_points(n=500, seed=0):
    key = jax.random.PRNGKey(seed)
    pts = jax.random.uniform(key, (n, 2), jnp.float64, -9.0, 9.0)
    mask = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n,)) > 0.1
    return pts, mask


def test_stats_match_oracle():
    pts, mask = make_points()
    stats = g.build_stats(pts, mask, GRID)
    om = ndt_numpy.NumpyNDTMap(GRID.x0, GRID.y0, GRID.cell, GRID.nx, GRID.ny,
                               GRID.overlap)
    om.add_points(np.asarray(pts), np.asarray(mask))
    np.testing.assert_allclose(np.asarray(stats.n), om.n, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stats.s), om.s, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stats.ss), om.ss, atol=1e-9)


def test_finalize_matches_oracle():
    pts, mask = make_points(800, seed=3)
    stats = g.build_stats(pts, mask, GRID)
    m = g.finalize(stats, CFG)
    om = ndt_numpy.build_map(np.asarray(pts), np.asarray(mask), GRID.x0,
                             GRID.y0, GRID.cell, GRID.nx, GRID.ny,
                             GRID.overlap, min_pts=CFG.min_pts,
                             eig_ratio=CFG.eig_ratio,
                             eig_abs_min=CFG.eig_abs_min)
    np.testing.assert_allclose(np.asarray(m.valid), om.valid.astype(float),
                               atol=0)
    sel = om.valid
    np.testing.assert_allclose(np.asarray(m.mean)[sel], om.mean[sel],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.icov)[sel], om.icov[sel],
                               atol=1e-6, rtol=1e-6)


def test_incremental_equals_batch():
    pts, mask = make_points(600, seed=5)
    s_batch = g.build_stats(pts, mask, GRID)
    s_inc = g.empty_stats(GRID, jnp.float64)
    for i in range(0, 600, 100):
        s_inc = g.add_points(s_inc, pts[i:i + 100], mask[i:i + 100], GRID)
    for a, b in zip(s_batch, s_inc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_out_of_bounds_points_ignored():
    pts = jnp.asarray([[100.0, 100.0], [-50.0, 0.0], [0.5, 0.5]], jnp.float64)
    mask = jnp.ones(3, bool)
    stats = g.build_stats(pts, mask, GRID)
    assert float(jnp.sum(stats.n)) == GRID.overlap  # only the in-bounds point


def test_lookup_gathers_correct_cells():
    pts, mask = make_points(400, seed=9)
    stats = g.build_stats(pts, mask, GRID)
    m = g.finalize(stats, CFG)
    om = ndt_numpy.build_map(np.asarray(pts), np.asarray(mask), GRID.x0,
                             GRID.y0, GRID.cell, GRID.nx, GRID.ny,
                             GRID.overlap)
    q = jnp.asarray([[0.3, 0.4], [-3.2, 5.1], [7.9, -7.9], [50.0, 0.0]],
                    jnp.float64)
    mean, icov, w = g.lookup(m, q, GRID)
    for gi in range(GRID.overlap):
        for pi, p in enumerate(np.asarray(q)):
            ci = om.cell_index(p, gi)
            if ci < 0:
                assert w[gi, pi] == 0.0
            elif om.valid[gi, ci]:
                assert w[gi, pi] == 1.0
                np.testing.assert_allclose(np.asarray(mean)[gi, pi],
                                           om.mean[gi, ci], atol=1e-9)
            else:
                assert w[gi, pi] == 0.0


def test_quad_table_matches_reference_lookup():
    """pack_quad/lookup_quad must reproduce lookup()'s per-grid Gaussians
    (the quad table is a precomputed reindexing of the same map)."""
    pts, mask = make_points(500, seed=11)
    stats = g.build_stats(pts, mask, GRID)
    m = g.finalize(stats, CFG)
    table = g.pack_quad(m, GRID)

    # Query points spread across the map including edges/margins.
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-8.6, 8.6, (300, 2)), jnp.float64)
    mean, icov, w = g.lookup(m, q, GRID)                  # [G, P, ...]
    rows, inb = g.lookup_quad(table, q[:, 0], q[:, 1], GRID)  # [P, G*8]

    for gi in range(GRID.overlap):
        blk = np.asarray(rows[:, gi * 8: gi * 8 + 6])
        w_ref = np.asarray(w[gi])
        w_quad = blk[:, 5] * np.asarray(inb, float)
        np.testing.assert_array_equal(w_quad, w_ref)
        sel = w_ref > 0
        np.testing.assert_allclose(blk[sel, 0], np.asarray(mean)[gi, sel, 0],
                                   rtol=1e-12)
        np.testing.assert_allclose(blk[sel, 1], np.asarray(mean)[gi, sel, 1],
                                   rtol=1e-12)
        np.testing.assert_allclose(blk[sel, 2],
                                   np.asarray(icov)[gi, sel, 0, 0], rtol=1e-12)
        np.testing.assert_allclose(blk[sel, 3],
                                   np.asarray(icov)[gi, sel, 0, 1], rtol=1e-12)
        np.testing.assert_allclose(blk[sel, 4],
                                   np.asarray(icov)[gi, sel, 1, 1], rtol=1e-12)


def test_quad_table_overlap1():
    grid1 = GridConfig(x0=GRID.x0, y0=GRID.y0, cell=GRID.cell,
                         nx=GRID.nx, ny=GRID.ny, overlap=1)
    pts, mask = make_points(300, seed=12)
    stats = g.build_stats(pts, mask, grid1)
    m = g.finalize(stats, CFG)
    table = g.pack_quad(m, grid1)
    q = jnp.asarray(np.random.default_rng(5).uniform(-8.5, 8.5, (100, 2)),
                    jnp.float64)
    mean, icov, w = g.lookup(m, q, grid1)
    rows, inb = g.lookup_quad(table, q[:, 0], q[:, 1], grid1)
    np.testing.assert_array_equal(
        np.asarray(rows[:, 5] * inb.astype(rows.dtype)), np.asarray(w[0]))
    sel = np.asarray(w[0]) > 0
    np.testing.assert_allclose(np.asarray(rows)[sel, 0],
                               np.asarray(mean)[0, sel, 0], rtol=1e-12)
