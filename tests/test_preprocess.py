"""Voxel downsampling (SURVEY.md §3.1 scan preprocessing 'optional
downsample') and the TORO loader (§3.2 dataset loaders)."""

import numpy as np

import jax
import jax.numpy as jnp

from ndtpu.data import g2o
from ndtpu.data.preprocess import voxel_downsample
import pytest

# Quick tier (SURVEY.md §5 item 5 / VERDICT r5 task 9): core-math and
# solver tests fast enough for per-commit runs (`pytest -m quick`).
pytestmark = pytest.mark.quick


def test_voxel_downsample_one_per_cell():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-5, 5, (400, 2)), jnp.float32)
    mask = jnp.asarray(rng.random(400) > 0.1)
    keep = voxel_downsample(pts, mask, 0.5)

    keep_np = np.asarray(keep)
    mask_np = np.asarray(mask)
    assert not np.any(keep_np & ~mask_np), "kept an invalid point"

    ids = np.floor(np.asarray(pts) / 0.5).astype(int)
    ids = ids[:, 0] * 10**6 + ids[:, 1]
    # at most one survivor per voxel
    kept_ids = ids[keep_np]
    assert len(kept_ids) == len(set(kept_ids.tolist()))
    # every occupied voxel keeps exactly one, and it is the lowest index
    for vid in set(ids[mask_np].tolist()):
        members = np.nonzero(mask_np & (ids == vid))[0]
        winners = members[keep_np[members]]
        assert len(winners) == 1 and winners[0] == members[0]


def test_voxel_downsample_batched_and_jittable():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-3, 3, (4, 128, 2)), jnp.float32)
    mask = jnp.ones((4, 128), bool)
    f = jax.jit(lambda p, m: voxel_downsample(p, m, 0.25))
    keep = f(pts, mask)
    assert keep.shape == (4, 128)
    single = voxel_downsample(pts[2], mask[2], 0.25)
    np.testing.assert_array_equal(np.asarray(keep[2]), np.asarray(single))


def test_voxel_downsample_coarse_cell_thins():
    # A dense line of points in one voxel collapses to a single survivor.
    pts = jnp.stack([jnp.linspace(0.0, 0.09, 50),
                     jnp.zeros(50)], axis=-1).astype(jnp.float32)
    keep = voxel_downsample(pts, jnp.ones(50, bool), 1.0)
    assert int(jnp.sum(keep)) == 1 and bool(keep[0])


def test_read_toro_roundtrip(tmp_path):
    # TORO info order I00 I01 I11 I22 I02 I12 -> full matrix.
    p = tmp_path / "g.graph"
    p.write_text(
        "VERTEX2 0 0 0 0\n"
        "VERTEX2 1 1.0 0.1 0.05\n"
        "EDGE2 0 1 1.0 0.1 0.05 4.0 0.1 5.0 6.0 0.2 0.3\n")
    data = g2o.read_toro(str(p))
    assert data.poses.shape == (2, 3)
    np.testing.assert_allclose(data.poses[1], [1.0, 0.1, 0.05])
    info = data.edges_info[0]
    expect = np.array([[4.0, 0.1, 0.2],
                       [0.1, 5.0, 0.3],
                       [0.2, 0.3, 6.0]])
    np.testing.assert_allclose(info, expect)
    np.testing.assert_allclose(info, info.T)
    # loads into a solvable graph
    graph = g2o.to_graph(data)
    from ndtpu.graph import factors as fct
    assert float(fct.chi2(graph)) < 1e-9
