"""Pallas kernels vs their XLA references (interpret mode on CPU; the TPU
compile path is exercised by the bench/driver on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndtpu.config import GridConfig, MatchConfig, NDTMapConfig
from ndtpu.kernels import point_terms_pallas
from ndtpu.ndt import grid as ndt_grid
from ndtpu.ndt import match as ndt_match


def _setup(n=180, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    grid = GridConfig(x0=-8.0, y0=-8.0, cell=1.0, nx=16, ny=16, overlap=4)
    pts = jax.random.uniform(key, (400, 2), dtype, -7.0, 7.0)
    stats = ndt_grid.build_stats(pts, jnp.ones((400,), bool), grid)
    m = ndt_grid.finalize(stats, NDTMapConfig())
    scan = jax.random.uniform(jax.random.PRNGKey(1), (n, 2), dtype, -6.0, 6.0)
    mask = jnp.ones((n,), bool)
    pose = jnp.asarray([0.3, -0.2, 0.1], dtype)
    xw, dxdphi = ndt_match.transform_terms(pose, scan)
    mean, icov, w0 = ndt_grid.lookup(m, xw, grid)
    w0 = w0 * mask.astype(dtype)[None]
    return pose, xw, dxdphi, mean, icov, w0


def test_point_terms_kernel_matches_reference():
    pose, xw, dxdphi, mean, icov, w0 = _setup()
    cfg = MatchConfig()
    ref = ndt_match.point_terms(pose, xw, dxdphi, mean, icov, w0, cfg)
    got = point_terms_pallas(pose, xw, dxdphi, mean, icov, w0, cfg,
                             interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=1e-4)


def test_point_terms_kernel_nonaligned_n():
    """N not a lane multiple: padding must not perturb the sums."""
    pose, xw, dxdphi, mean, icov, w0 = _setup(n=137)
    cfg = MatchConfig()
    ref = ndt_match.point_terms(pose, xw, dxdphi, mean, icov, w0, cfg)
    got = point_terms_pallas(pose, xw, dxdphi, mean, icov, w0, cfg,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=2e-5, atol=1e-4)
