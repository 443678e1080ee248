"""True device-execution timing via the chained-K marginal method.

Why this exists: `jax.block_until_ready` is only guaranteed to await
completed device work on directly-attached PJRT backends. On relay-tunneled
rigs (the axon transport this framework is benchmarked on) it acks the
ENQUEUE — a dispatch loop then measures submission rate, exactly like the
reference's async CUDA.jl/OpenCV/MATLAB timing loops (SURVEY.md §2.4.4,
/root/reference/benchmarks/cuda/benchmark.jl:160-164). Measured proof: wall
time of a dispatch is flat whether the compiled program applies an op 100 or
1000 times in-graph (benchmarks/tuning/sync_probe.py).

Method: compile one program that applies the op K times inside a
`lax.fori_loop`, force completion by fetching ONE element of the result
(a D2H read that PJRT cannot satisfy before execution finishes), and take
the marginal over two K values:

    t_exec = (T(K2) - T(K1)) / (K2 - K1)

The fixed enqueue + sync round-trip (~30 ms on the relay) cancels in the
difference. Since the round-2 shape-preserving kernel scheme
(ops/pallas/window.py) every op maps the padded layout to itself, so
chains compose DIRECTLY — no per-iteration copy contaminates the
marginal. The banded path below remains for any future shape-changing op
(detected via jax.eval_shape in session.execution_table): such a chain
re-inserts the output with a TILE-ALIGNED `dynamic_update_slice` at row 0
(an unaligned row offset would cost ~450 us/pass of sublane shuffling,
benchmarks/tuning/kernel_lab3.py), and its cost is then reported via a
`Passthrough` row so readers can subtract it (measured ~8 us on the
round-1 banded kernels).

Chained values drift from real op outputs (op composition, clipped halos) —
that is fine: only shapes and op code paths matter for timing, and output
correctness is established separately by the harness's `--verify`.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

import jax
from jax import lax


def _chain_direct(op: Callable, k: int, x: jax.Array):
    """Shape-preserving op: y = op(y), k times in-graph."""
    return jax.jit(
        lambda v: lax.fori_loop(0, k, lambda i, u: op(u), v)
    ).lower(x).compile()


def _chain_banded(op: Callable, k: int, x: jax.Array):
    """Banded-output op: re-insert at row 0 (tile-aligned) each iteration."""
    def body(i, v):
        out = op(v)
        return lax.dynamic_update_slice(v, out.astype(v.dtype), (0, 0, 0))
    return jax.jit(
        lambda v: lax.fori_loop(0, k, body, v)
    ).lower(x).compile()


def _t_delta(f1: Callable, f2: Callable, x: jax.Array,
             samples: int) -> float:
    """Median of T(f2)-T(f1) over INTERLEAVED sync pairs.

    Relay congestion waves last seconds, so timing all of f1's samples and
    then all of f2's lets one wave inflate a whole window and bias the
    marginal (observed: 30-40 us ghosts on sub-us small-image ops).
    Running each pair back-to-back puts both legs inside the same weather
    and the difference cancels it; the median then only has to reject
    single-call spikes."""
    def force(y):
        # One element of the FIRST leaf: pytree-general (the wide session's
        # chains carry strip lists), and never a whole-buffer D2H.
        leaf = jax.tree_util.tree_leaves(y)[0]
        np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)

    ds = []
    for _ in range(samples):
        t0 = time.perf_counter()
        force(f1(x))
        t1 = time.perf_counter()
        force(f2(x))
        ds.append((time.perf_counter() - t1) - (t1 - t0))
    return float(np.median(ds))


# The sync round-trip on relay-tunneled rigs jitters at the ~ms scale even
# after taking the median of `samples`; a marginal whose chain separation
# T(K2)-T(K1) is below this floor is reading noise (observed: sub-10 us ops
# on a 528x393 image print 0 at the default K). Auto-scaling multiplies both
# K values by 10 until the separation itself resolves.
RESOLVE_FLOOR_S = 2e-3


def execution_time(op: Callable, x: jax.Array, banded: bool = False,
                   k1: int = 30, k2: int = 300, samples: int = 5,
                   auto_scale: bool = False, max_k2: int = 30000) -> float:
    """Seconds of device execution for one application of `op` on `x`.

    With `auto_scale` (opt-in: the measurement surfaces pass it, tests and
    labs with hand-picked K do not), K grows tenfold until the chain
    separation T(K2)-T(K1) clears RESOLVE_FLOOR_S or K2 reaches `max_k2`,
    so fast ops on small images stay measurable instead of clamping to 0.
    """
    chain = _chain_banded if banded else _chain_direct
    compiled = {}  # k -> compiled chain; a x10 rescale reuses K2 as K1

    def get(k):
        if k not in compiled:
            compiled[k] = chain(op, k, x)
        return compiled[k]

    while True:
        f1, f2 = get(k1), get(k2)
        delta = _t_delta(f1, f2, x, samples)
        if not auto_scale or delta >= RESOLVE_FLOOR_S or k2 * 10 > max_k2:
            return max(0.0, delta / (k2 - k1))
        k1, k2 = k1 * 10, k2 * 10
