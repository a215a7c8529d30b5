"""Micro-timing of the stacked smoother's parts on the serving-shaped flat
graph (S=8 sessions x 512-pose capacity = 4096 poses, 2x capacity factors).

Splits the 6.65 ms/window smoother (bench_serving_ablate C-B marginal)
into linearize / chi / gradient / PCG(12) to rank the levers.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from ndtpu.config import SolverConfig
from ndtpu.graph import factors as fct
from ndtpu.graph import solve as slv

S, V = 8, 512
F = 2 * V
PRI = 4


def make_flat_graph(rng):
    n = S * V
    poses = jnp.asarray(rng.normal(0, 3.0, (n, 3)), jnp.float32)
    live = jnp.arange(n) % V < 300
    bi = []
    bj = []
    for s in range(S):
        i = np.arange(F)
        # chain + random loops within the session
        jj = np.where(i < 299, i + 1, rng.integers(0, 300, F))
        ii = np.where(i < 299, i, rng.integers(0, 300, F))
        bi.append(ii + s * V)
        bj.append(jj + s * V)
    bet_i = jnp.asarray(np.concatenate(bi), jnp.int32)
    bet_j = jnp.asarray(np.concatenate(bj), jnp.int32)
    bmask = jnp.tile(jnp.arange(F) < 450, S)
    z = jnp.asarray(rng.normal(0, 0.1, (S * F, 3)), jnp.float32)
    sq = jnp.broadcast_to(10.0 * jnp.eye(3, dtype=jnp.float32),
                          (S * F, 3, 3))
    pidx = jnp.asarray(np.concatenate(
        [[s * V] * PRI for s in range(S)]), jnp.int32)
    pz = jnp.zeros((S * PRI, 3), jnp.float32)
    psq = jnp.broadcast_to(100.0 * jnp.eye(3, dtype=jnp.float32),
                           (S * PRI, 3, 3))
    pmask = jnp.tile(jnp.arange(PRI) < 1, S)
    return fct.PoseGraph(
        poses=poses, pose_mask=live, prior_idx=pidx, prior_z=pz,
        prior_sqrt_info=psq, prior_mask=pmask, bet_i=bet_i, bet_j=bet_j,
        bet_z=z, bet_sqrt_info=sq, bet_mask=bmask,
        n_poses=jnp.asarray(S * V, jnp.int32),
        n_priors=jnp.asarray(S * PRI, jnp.int32),
        n_between=jnp.asarray(S * F, jnp.int32))


def timeit(name, fn, *args, reps=30):
    o = fn(*args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{name:40s} {med:7.3f} ms", flush=True)
    return med


def main():
    rng = np.random.default_rng(0)
    g = make_flat_graph(rng)
    scfg = SolverConfig(pcg_max_iter=12, inc_iters=1)
    huber = 1.0

    lin_f = jax.jit(lambda g: fct.linearize(g, huber))
    timeit("linearize", lin_f, g)

    lin = lin_f(g)

    def chi(g):
        (_, _, r), (_, rp) = fct.linearize(g, huber)
        return jnp.sum(r ** 2) + jnp.sum(rp ** 2)

    timeit("chi (linearize+sum)", jax.jit(chi), g)
    grad_f = jax.jit(lambda g, lin: slv.gradient(g, lin))
    timeit("gradient", grad_f, g, lin)

    lam = jnp.full((S * V, 1), 1e-3, jnp.float32)

    def pcg(g, lin):
        rhs = -slv.gradient(g, lin)
        return slv.pcg_rhs(g, lin, rhs, lam, scfg)[0]

    timeit("gradient+pcg(12)", jax.jit(pcg), g, lin)

    for it in (6, 8, 20):
        sc = SolverConfig(pcg_max_iter=it, inc_iters=1)

        def pcg_n(g, lin, sc=sc):
            rhs = -slv.gradient(g, lin)
            return slv.pcg_rhs(g, lin, rhs, lam, sc)[0]

        timeit(f"gradient+pcg({it})", jax.jit(pcg_n), g, lin)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def parts():
    rng = np.random.default_rng(0)
    g = make_flat_graph(rng)
    huber = 1.0
    lin = jax.jit(lambda g: fct.linearize(g, huber))(g)
    lam = jnp.full((S * V, 1), 1e-3, jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (S * V, 3)), jnp.float32)

    timeit("hessian_matvec", jax.jit(
        lambda g, lin, x: slv.hessian_matvec(g, lin, x)), g, lin, x)
    timeit("block_diag_hessian", jax.jit(
        lambda g, lin: slv.block_diag_hessian(g, lin)), g, lin)

    def pcg_fori(g, lin, n):
        dblocks = slv.block_diag_hessian(g, lin)
        dt = x.dtype
        eye = jnp.eye(3, dtype=dt)
        dd = jnp.abs(jnp.diagonal(dblocks, axis1=-2, axis2=-1))
        damp = lam * jnp.maximum(dd, 1e-8) + (
            1.0 - g.pose_mask.astype(dt))[:, None]
        minv = slv._inv3(dblocks + damp[..., None] * eye)
        rhs = -slv.gradient(g, lin)

        def amul(v_):
            return slv.hessian_matvec(g, lin, v_) + damp * v_

        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = jnp.einsum("vab,vb->va", minv, r0)

        def body(_, c):
            xx, r, z, p, rz = c
            ap = amul(p)
            alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-30)
            xx = xx + alpha * p
            r = r - alpha * ap
            z = jnp.einsum("vab,vb->va", minv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return xx, r, z, p, rz_new

        c = jax.lax.fori_loop(0, n, body,
                              (x0, r0, z0, z0, jnp.sum(r0 * z0)))
        return c[0]

    timeit("pcg_fori(12)", jax.jit(lambda g, lin: pcg_fori(g, lin, 12)),
           g, lin)
    timeit("pcg_fori(1)", jax.jit(lambda g, lin: pcg_fori(g, lin, 1)),
           g, lin)


if __name__ == "__main__" and "parts" in sys.argv:
    parts()


def parts2():
    rng = np.random.default_rng(0)
    g = make_flat_graph(rng)
    huber = 1.0
    lin = jax.jit(lambda g: fct.linearize(g, huber))(g)
    lam = jnp.full((S * V, 1), 1e-3, jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (S * V, 3)), jnp.float32)

    def precond(g, lin):
        dblocks = slv.block_diag_hessian(g, lin)
        eye = jnp.eye(3, dtype=x.dtype)
        dd = jnp.abs(jnp.diagonal(dblocks, axis1=-2, axis2=-1))
        damp = lam * jnp.maximum(dd, 1e-8) + (
            1.0 - g.pose_mask.astype(x.dtype))[:, None]
        minv = slv._inv3(dblocks + damp[..., None] * eye)
        return minv, damp

    timeit("precond (bdh+inv3)", jax.jit(precond), g, lin)
    minv, damp = jax.jit(precond)(g, lin)
    timeit("minv apply einsum", jax.jit(
        lambda m, v: jnp.einsum("vab,vb->va", m, v)), minv, x)

    def one_iter(g, lin, minv, damp, p, rz, r, xx, z):
        ap = slv.hessian_matvec(g, lin, p) + damp * p
        alpha = rz / jnp.maximum(jnp.sum(p * ap), 1e-30)
        xx = xx + alpha * p
        r = r - alpha * ap
        z = jnp.einsum("vab,vb->va", minv, r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return xx, r, z, p, rz_new

    rz0 = jnp.asarray(1.0, jnp.float32)
    timeit("one PCG iter (no loop)", jax.jit(one_iter), g, lin, minv, damp,
           x, rz0, x, x, x)

    def loop_only(g, lin, minv, damp):
        rhs = -slv.gradient(g, lin)
        x0 = jnp.zeros_like(rhs)
        z0 = jnp.einsum("vab,vb->va", minv, rhs)

        def body(_, c):
            xx, r, z, p, rz = c
            return one_iter(g, lin, minv, damp, p, rz, r, xx, z)[:5]

        c = jax.lax.fori_loop(0, 12, body,
                              (x0, rhs, z0, z0, jnp.sum(rhs * z0)))
        return c[0]

    timeit("fori(12) precomputed precond", jax.jit(loop_only), g, lin,
           minv, damp)


if __name__ == "__main__" and "parts2" in sys.argv:
    parts2()
