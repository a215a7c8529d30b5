"""Pallas TPU kernel: fused NDT per-point score/gradient/Hessian reduction.

The matcher's inner loop (SURVEY.md §4.2, the hot path of the scans/s
metric) evaluates, for every (overlap-grid, point) pair, the weighted NDT
terms and reduces them to 11 scalars: ``wsum, w0sum, g[3], H[6 unique]``.
In plain XLA this is ~30 elementwise/reduce HLOs whose intermediates round-
trip through HBM between fusions; this kernel computes the whole chain in
one VMEM-resident pass (one read of the gathered inputs, one 8x128 output
tile), following the guide's reduction pattern.

The gather feeding it stays in XLA (TPU Pallas has no per-lane gather
primitive; the packed single-gather in ndtpu.ndt.grid.pack_map covers that
side). The kernel is numerically identical to
:func:`ndtpu.ndt.match.point_terms` (unit-tested in interpret mode; TPU
compile covered by the gated test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ndtpu.config import MatchConfig

__all__ = ["point_terms_pallas"]

_LANES = 128


def _kernel(params_ref, xwx, xwy, dpx, dpy, mx, my, i00, i01, i11, w0,
            out_ref):
    """One scan: inputs ``[G, Np]`` planes, output ``[8, 128]`` (row 0 holds
    the 11 sums)."""
    d2 = params_ref[0, 0]
    clip = params_ref[0, 1]
    tx = params_ref[0, 2]
    ty = params_ref[0, 3]

    dx = xwx[:] - mx[:]
    dy = xwy[:] - my[:]
    qx = i00[:] * dx + i01[:] * dy
    qy = i01[:] * dx + i11[:] * dy
    l2 = jnp.maximum(dx * qx + dy * qy, 0.0)
    e = jnp.exp(-0.5 * d2 * jnp.minimum(l2, clip))
    w = w0[:] * e

    a3 = qx * dpx[:] + qy * dpy[:]
    # gradient: d2 * sum w * [qx, qy, a3]
    g0 = jnp.sum(w * qx)
    g1 = jnp.sum(w * qy)
    g2 = jnp.sum(w * a3)

    ldx = i00[:] * dpx[:] + i01[:] * dpy[:]
    ldy = i01[:] * dpx[:] + i11[:] * dpy[:]
    j33 = dpx[:] * ldx + dpy[:] * ldy
    hpp = -(qx * (xwx[:] - tx) + qy * (xwy[:] - ty))

    h00 = jnp.sum(w * (i00[:] - d2 * qx * qx))
    h01 = jnp.sum(w * (i01[:] - d2 * qx * qy))
    h02 = jnp.sum(w * (ldx - d2 * qx * a3))
    h11 = jnp.sum(w * (i11[:] - d2 * qy * qy))
    h12 = jnp.sum(w * (ldy - d2 * qy * a3))
    h22 = jnp.sum(w * (j33 + hpp - d2 * a3 * a3))

    wsum = jnp.sum(w)
    w0sum = jnp.sum(w0[:])

    row = jnp.stack([wsum, w0sum, g0, g1, g2,
                     h00, h01, h02, h11, h12, h22])
    out = jnp.zeros((8, _LANES), row.dtype)
    out_ref[:] = out.at[0, :11].set(row)


@functools.partial(jax.jit, static_argnames=("d2", "exp_clip", "interpret"))
def _call(params, planes, d2, exp_clip, interpret):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, _LANES), planes[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(planes),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, *planes)


def point_terms_pallas(pose, xw, dxdphi, mean, icov, w0, cfg: MatchConfig,
                       interpret: bool = False):
    """Drop-in replacement for :func:`ndtpu.ndt.match.point_terms`.

    Same inputs/outputs: returns ``(f, g [3], H [3,3], wsum, w0sum)``.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU test
    path).
    """
    dt = xw.dtype
    g_dim, n = w0.shape
    pad = (-n) % _LANES
    padded = lambda a: jnp.pad(a, ((0, 0), (0, pad)))

    bcast = lambda a: jnp.broadcast_to(a, (g_dim, n))
    planes = (
        padded(bcast(xw[:, 0][None])), padded(bcast(xw[:, 1][None])),
        padded(bcast(dxdphi[:, 0][None])), padded(bcast(dxdphi[:, 1][None])),
        padded(mean[..., 0]), padded(mean[..., 1]),
        padded(icov[..., 0, 0]), padded(icov[..., 0, 1]),
        padded(icov[..., 1, 1]),
        padded(w0),
    )
    params = jnp.asarray(
        [[cfg.d2, cfg.exp_clip, 0.0, 0.0]], dt
    ).at[0, 2].set(pose[0]).at[0, 3].set(pose[1])

    out = _call(params, planes, float(cfg.d2), float(cfg.exp_clip),
                interpret)
    row = out[0]
    wsum, w0sum = row[0], row[1]
    d2 = jnp.asarray(cfg.d2, dt)
    g_vec = d2 * row[2:5]
    h00, h01, h02, h11, h12, h22 = (row[5], row[6], row[7], row[8], row[9],
                                    row[10])
    h = d2 * jnp.stack([
        jnp.stack([h00, h01, h02]),
        jnp.stack([h01, h11, h12]),
        jnp.stack([h02, h12, h22]),
    ])
    return -wsum, g_vec, h, wsum, w0sum
