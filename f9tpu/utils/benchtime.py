"""Trustworthy device timing over asynchronous/remote runtimes.

On this environment the TPU is reached through a tunnel whose
``block_until_ready`` resolves before execution finishes, and every dispatch
pays a large HTTP round trip — naive wall-clock timing measures neither.
Two fixes, both used by `measure_op`:

1. every timed region ends by *downloading* a scalar (forces real completion);
2. the op runs ``n`` times inside ONE dispatch (`lax.fori_loop` with an
   iteration-dependent input perturbation so nothing hoists/CSEs), and the
   per-op time is the slope between an n=1 and an n=N run — the round-trip
   cancels.

The perturbation multiply and the full-output probe reduction run inside the
timed loop, so measurements conservatively OVERSTATE the op's own time by one
input pass + one output pass per iteration — negligible for the compute-heavy
graphs this measures, and errs in the honest direction for throughput claims.

The probe is NONLINEAR (sum of squares), and the input perturbation feeds the
running probe accumulator back in.  Both are load-bearing for LINEAR ops —
i.e. most of this framework:

- a linear probe invites XLA's algebraic simplifier to factor the reduction
  through the op: ``sum(A @ B) == rowsum(A) @ colsum(B)`` collapses a matmul
  to two cheap reductions *within one iteration* (observed live: the banded
  varispeed einsum "measured" 0.04 ms — 625 TFLOP/s implied — the moment its
  output became a plain dot the rewrite could see; docs/PERF.md round 3c).
  ``sum((A @ B)**2)`` has no such factorisation.
- the accumulator feedback (``acc * 1e-38`` folded into the perturbation)
  makes iteration i's input data-depend on iteration i-1's output, so no
  loop-invariant-code-motion or distributivity rewrite can hoist the op out
  of the loop even in principle (scalar multiplies DO commute through dots).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["measure_op"]


def _runner(op: Callable):
    @jax.jit
    def run(x, seed, n):
        def body(i, carry):
            acc, s = carry
            # iteration-dependent input WITH probe feedback: the op cannot be
            # hoisted (input depends on last iteration's output) and scalar
            # factoring through linear ops buys the simplifier nothing
            eps = (s + i).astype(jnp.float32) * 1e-12 + acc * 1e-38
            y = op(x * (1.0 + eps))
            leaves = jax.tree_util.tree_leaves(y)
            # consume EVERY output element NONLINEARLY: a partial probe lets
            # XLA dead-code-eliminate elementwise tails, and a LINEAR probe
            # lets it factor the reduction through a matmul
            # (sum(A@B) == rowsum(A) @ colsum(B)) — sum of squares survives
            probe = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves)
            return acc + probe, s
        # traced trip count: ONE compiled program serves both the n=1 and
        # n=N runs (compiles are minutes over the remote tunnel)
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), seed))
        return acc
    return run


def measure_op(
    op: Callable,
    x: jax.Array,
    n: int = 16,
    repeats: int = 3,
) -> float:
    """Median per-op device seconds for ``op(x)`` (shape-preserving input)."""
    run = _runner(op)
    one = jnp.int32(1)
    many = jnp.int32(n + 1)
    # warmup/compile (single program: trip count is traced)
    float(run(x, jnp.int32(0), one))
    samples = []
    for r in range(repeats):
        s = jnp.int32(r + 1)
        t0 = time.time()
        float(run(x, s, one))
        t1 = time.time() - t0
        t0 = time.time()
        float(run(x, s, many))
        tn = time.time() - t0
        slope = (tn - t1) / n
        if slope > 0:
            samples.append(slope)
        # a non-positive slope (dispatch-latency noise swamped n ops) is an
        # INVALID sample, not a 1e-9 s one — clamping would let two noisy
        # repeats claim ~4e11x realtime with no warning
    if not samples:
        raise RuntimeError(
            "measure_op: every slope sample was non-positive — dispatch "
            "round-trip variance exceeded the op time; re-run with larger n")
    samples.sort()
    mid = len(samples) // 2
    if len(samples) % 2 == 0:
        return 0.5 * (samples[mid - 1] + samples[mid])  # true median
    return samples[mid]
