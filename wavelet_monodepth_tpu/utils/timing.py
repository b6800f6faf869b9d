"""Slope-method device timing — THE measurement discipline for the
remote-attached TPU (PERF.md: block_until_ready does not await
execution and every synchronous fetch pays a variable relay round
trip, so naive timings are garbage).

One jit of K serialized evaluations (fori_loop with a carry
dependency), fetched once; per-eval seconds = (t(K1)-t(K0))/(K1-K0).
Validated against jax.profiler device traces to ~2% (PERF.md
"TRACED"). Shared by bench.py, tools/bench_grid.py and
tools/sparsity_sweep.py so the subtle parts (warmup of BOTH K's,
min-of-reps, tenancy retry) cannot drift apart.
"""

from __future__ import annotations

import time


def slope_time(call, k0: int, k1: int, reps: int = 2,
               retries: int = 3) -> float:
    """Seconds per chained eval: warm both K's, then min-of-reps
    difference quotient. Shared-tenancy swings can exceed the K-delta
    mid-window (PERF.md landmine #4); a non-positive slope is
    re-measured with doubled reps, and the last estimate is returned
    regardless so callers can flag it (e.g. `latency_unreliable`)."""
    float(call(k0))
    float(call(k1))

    s = float("nan")
    for attempt in range(retries):
        def t(k):
            ts = []
            for _ in range(reps * (attempt + 1)):
                t0 = time.perf_counter()
                float(call(k))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        s = (t(k1) - t(k0)) / (k1 - k0)
        if s > 0:
            return s
    return s
