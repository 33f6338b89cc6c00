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
            # iteration-dependent input: defeats loop-invariant hoisting
            y = op(x * (1.0 + (s + i).astype(jnp.float32) * 1e-12))
            leaves = jax.tree_util.tree_leaves(y)
            # consume EVERY output element: a partial probe (e.g. one lane)
            # lets XLA dead-code-eliminate elementwise tails of the op
            probe = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
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
        samples.append(max(1e-9, (tn - t1) / n))
    samples.sort()
    mid = len(samples) // 2
    if len(samples) % 2 == 0:
        return 0.5 * (samples[mid - 1] + samples[mid])  # true median
    return samples[mid]
