"""Is the matcher's random row-gather byte-bound or transaction-bound?

Times the same 184k-row random gather at different row widths/dtypes:
f32x32 (current, 128 B), f32x16 (64 B), f32x8 (32 B), bf16x32 (64 B).
If time scales with bytes -> a bf16 table is a ~2x win. If time is flat ->
the gather is transaction-bound and row packing is already optimal.

All timings amortize the relay dispatch latency over 20 pipelined reps with
VARIED indices (shifted each rep so no execution dedup can hide work).
"""

from __future__ import annotations

import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ndtpu_jax_cache")
    dev = jax.devices()[0]
    log(f"device: {dev}")

    r, n = 66049, 256 * 720
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, r, n, dtype=np.int32))
    tab32 = jnp.asarray(rng.normal(size=(r, 32)).astype(np.float32))

    def bench(tag, table, width_bytes):
        f = jax.jit(lambda t, i: jnp.sum(
            t[i].astype(jnp.float32), axis=-1))
        out = f(table, idx0)
        jax.block_until_ready(out)
        reps = 20
        idxs = [(idx0 + k) % r for k in range(reps)]
        for v in idxs:
            v.block_until_ready()
        t0 = time.perf_counter()
        for k in range(reps):
            out = f(table, idxs[k])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        gbps = n * width_bytes / dt / 2**30
        log(f"{tag}: {dt*1e6:.0f} us  ({gbps:.1f} GB/s, "
            f"{n/dt/1e6:.0f} M rows/s)")
        return dt

    bench("f32 x32 (128B)", tab32, 128)
    bench("f32 x16 ( 64B)", tab32[:, :16], 64)
    bench("f32 x8  ( 32B)", tab32[:, :8], 32)
    bench("bf16x32 ( 64B)", tab32.astype(jnp.bfloat16), 64)
    bench("bf16x16 ( 32B)", tab32[:, :16].astype(jnp.bfloat16), 32)

    # Contiguous-stream ceiling for reference: plain sum of the same bytes.
    big = jnp.asarray(rng.normal(size=(n * 32,)).astype(np.float32))
    f = jax.jit(lambda x, s: jnp.sum(x) + s)
    f(big, 0.0).block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for k in range(reps):
        out = f(big, float(k))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    log(f"stream-sum same bytes: {dt*1e6:.0f} us "
        f"({n*128/dt/2**30:.0f} GB/s)")


if __name__ == "__main__":
    main()
