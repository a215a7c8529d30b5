"""Pallas TPU kernels — intentionally empty (round 3).

The round-2 prototype kernel (fused NDT score/grad/Hessian reduction) was
deleted rather than integrated: direct measurement showed the matcher's hot
loop is bound by the GATHER's per-index issue rate (~79M rows/s), which a
Pallas kernel cannot improve on this stack — Mosaic fails to compile
vectorized dynamic gathers from large VMEM tables in every formulation
tried, and the non-gather FLOP block it did accelerate is not the
bottleneck (halving gathered bytes changes per-iteration time by <1%).
Full evidence: docs/PERF.md §3. If a future Mosaic gains big-table
``dynamic_gather``, this package is where the VMEM-resident quad-table
matcher kernel goes.
"""

__all__: list = []
