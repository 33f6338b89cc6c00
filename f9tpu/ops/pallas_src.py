"""Pallas TPU kernel for the polyphase cycle resampler.

The XLA strided-conv path (`f9tpu.ops.resample.resample`) materialises im2col
patches in HBM for large strides (M ~ 147-640), costing ~3x the signal
bandwidth.  This kernel streams the input once, as cycle rows of width ``M``:
each grid step holds ``TQ`` cycles in VMEM plus an ``R``-row overlap from the
next tile (``R = ceil((K-1)/M)``), and accumulates the output tile as R+1
sublane-shifted MXU matmuls against the resident cycle matrix:

    out (TQ, L) = sum_r  span[r : r+TQ, :] @ G[r*M : (r+1)*M, :]

Sublane shifts are cheap VMEM relayouts; no lane-dim restructuring happens on
the TPU (the (bc, T) -> (bc, rows, M) reshape is done once by XLA in HBM).
Tile-to-tile overlap is fed through a second *non-overlapping* view of the
same buffer (block index qt+1), so Pallas' automatic grid pipeline keeps the
double-buffering (guide: Grid/BlockSpec pipelining) without manual DMA.

Applicability: R must be small — true for every downsampling ratio and the
whole 44.1<->48 k family.  For tiny M (pure upsampling, stride ~ 1) the XLA
conv is already MXU-shaped, so `resample_auto` dispatches per bank.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.filters import CycleBank
from .resample import cycle_matrix_f32, resample

__all__ = [
    "pallas_applicable",
    "resample_pallas",
    "resample_auto",
    "resample_rows",
    "resample_rows_pre",
    "rows_marshal_plan",
    "stacked_bank_f32",
]

#: Max overlap rows (extra input blocks) the kernel supports efficiently.
_MAX_R = 8
#: Sublane granularity of the overlap operand's block.
_ROW_ALIGN = 8


def _plan(bank: CycleBank, total_cycles: int) -> tuple[int, int, int]:
    """Choose (TQ cycles/tile, R overlap rows, n_tiles)."""
    M, L, K = bank.M, bank.L, bank.taps_per_phase
    R = max(1, -(-(K - 1) // M))
    # VMEM per tile ~ TQ*(Mpad + L) floats with M padded to the 128-lane tile.
    # Tight budget: the span concat + per-shift slice relayouts roughly triple
    # the live copies of an x tile, and Pallas double-buffers every operand.
    m_pad = -(-M // 128) * 128
    per_cycle = m_pad + L
    budget = (1024 * 1024) // 4
    tq = max(_ROW_ALIGN, min(1024, budget // max(per_cycle, 1)))
    tq -= tq % (_ROW_ALIGN * max(1, R))   # row-aligned AND divisible by R
    tq = max(tq, _ROW_ALIGN * max(1, R))
    return tq, R, -(-total_cycles // tq)


def pallas_applicable(bank: CycleBank) -> bool:
    M, K = bank.M, bank.taps_per_phase
    R = max(1, -(-(K - 1) // M))
    return bank.dense_ok and R <= _MAX_R and bank.L >= 8 and M >= 16


def rows_pre_applicable(bank: CycleBank) -> bool:
    """Is host-rows marshalling + `resample_rows_pre` worthwhile?  Degenerate
    tilings (tiny L or M) and varispeed banks without a dense matrix fall
    back to the flat paths."""
    M, K = bank.M, bank.taps_per_phase
    R = max(1, -(-(K - 1) // M))
    return bank.dense_ok and R <= _MAX_R and bank.L >= 8 and M >= 8


@functools.lru_cache(maxsize=64)
def _stacked_bank_cached(bank: CycleBank) -> np.ndarray:
    L, M, W = bank.L, bank.M, bank.W
    R = max(1, -(-(bank.taps_per_phase - 1) // M))
    g = np.zeros(((R + 1) * M, L), np.float32)
    g[:W] = cycle_matrix_f32(bank)
    # row-block transposes stacked on the OUTPUT dim: gs[r*L + p, m] = G[r*M + m, p]
    return np.ascontiguousarray(
        np.concatenate([g[r * M : (r + 1) * M].T for r in range(R + 1)], axis=0))


def stacked_bank_f32(bank: CycleBank) -> np.ndarray:
    """The cycle bank restructured for the shift-after-dot rows form:
    ``((R+1)*L, M)`` where block r holds ``G[r*M:(r+1)*M].T``."""
    return _stacked_bank_cached(bank)


def rows_marshal_plan(bank: CycleBank, frames: int) -> tuple[int, int]:
    """(n_rows, pad_front) for host-side rows marshalling of a ``frames``-long
    signal: the host writes samples at flat offset ``pad_front`` of a
    zero-initialised ``(n_rows, M)`` buffer (a plain memcpy — rows are
    contiguous), so the device never performs the flat->rows retiling."""
    L, M = bank.L, bank.M
    R = max(1, -(-(bank.taps_per_phase - 1) // M))
    n_out = -(-bank.out_len(frames) // L)
    return n_out + R, bank.pad_front


def resample_rows_pre(xp3: jax.Array, bank: CycleBank,
                      precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """SRC on an already rows-marshalled input: ``xp3`` (..., n_rows, M) ->
    ``(..., n_rows - R, L)``.

    This is the fastest TPU form found (docs/PERF.md round 2): one plain
    matmul against the stacked bank plus R fused row-shifted adds —
    ``out[q] = sum_r (xp3 @ G_r)[q + r]`` — because the cycle shift commutes
    with the matmul.  No strided conv, no im2col, and critically no
    device-side flat->(rows, M) retiling: an HBM materialisation whose last
    dim is not 128-lane aligned costs 3-4 ms at this scale (measured), which
    is why the rows layout must arrive from the host (or stay on device
    end-to-end).
    """
    L, M = bank.L, bank.M
    R = max(1, -(-(bank.taps_per_phase - 1) // M))
    if xp3.shape[-1] != M:
        raise ValueError(f"rows width {xp3.shape[-1]} != M {M}")
    n_rows = xp3.shape[-2]
    n_out = n_rows - R
    if n_out <= 0:
        raise ValueError(f"need more than R={R} rows, got {n_rows}")
    gs = jnp.asarray(stacked_bank_f32(bank))          # ((R+1)*L, M)
    P = jnp.einsum("...qm,lm->...ql", xp3, gs, precision=precision)
    y = P[..., :n_out, :L]
    for r in range(1, R + 1):
        y = y + P[..., r : r + n_out, r * L : (r + 1) * L]
    return y


def _kernel(x_ref, tail_ref, g_ref, o_ref, *, tq: int, r: int, m: int, ell: int):
    # x_ref: (1, tq, m); tail_ref: (1, r_rows>=r, m); g_ref: ((r+1)*m, ell)
    a = x_ref[0]
    span = jnp.concatenate([a, tail_ref[0, :r, :]], axis=0)   # (tq + r, m)
    acc = jnp.zeros((tq, ell), jnp.float32)
    for shift in range(r + 1):
        acc += jax.lax.dot_general(
            span[shift : shift + tq, :],
            g_ref[shift * m : (shift + 1) * m, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    o_ref[0] = acc


def resample_pallas(
    x: jax.Array,
    bank: CycleBank,
    out_len: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in equivalent of `resample` via the Pallas kernel (flat output).

    Thin wrapper over `resample_rows` + a device-side flat reshape.  NOTE the
    flat reshape of an L-wide rows array is expensive when L is not
    128-aligned (docs/PERF.md); prefer `resample_rows` when downstream stages
    can work in the rows tiling.
    """
    T = x.shape[-1]
    if out_len is None:
        out_len = bank.out_len(T)
    if T == 0 or out_len == 0:
        return jnp.zeros((*x.shape[:-1], out_len), dtype=x.dtype)
    y, _ = resample_rows(x, bank, out_len=out_len, interpret=interpret)
    lead = x.shape[:-1]
    bc = int(np.prod(lead)) if lead else 1
    return y.reshape(bc, -1)[:, :out_len].reshape(*lead, out_len)


def resample_auto(x: jax.Array, bank: CycleBank, out_len: int | None = None) -> jax.Array:
    """Pick the fastest correct path for this bank (Pallas kernel when its
    overlap plan applies, XLA conv otherwise)."""
    if pallas_applicable(bank):
        return resample_pallas(x, bank, out_len=out_len)
    return resample(x, bank, out_len=out_len)


def _kernel_roll(x_ref, tail_ref, g_ref, o_ref, *, tq: int, m: int, ell: int):
    # R == 1 fast path: shift-by-one-row expressed as a cyclic sublane roll of
    # the second dot plus a one-row fix from the next tile — no VMEM concat or
    # slice copies at all.
    a = x_ref[0]
    dn = (((1,), (0,)), ((), ()))
    d0 = jax.lax.dot_general(a, g_ref[:m, :], dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    d1 = jax.lax.dot_general(a, g_ref[m : 2 * m, :], dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    rolled = pltpu.roll(d1, shift=tq - 1, axis=0)
    fix = jax.lax.dot_general(tail_ref[0, :1, :], g_ref[m : 2 * m, :], dn,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, ell), 0)
    o_ref[0] = jnp.where(rows == (tq - 1), d0 + fix, d0 + rolled)


def resample_rows(
    x: jax.Array,
    bank: CycleBank,
    out_len: int | None = None,
    interpret: bool | None = None,
) -> tuple[jax.Array, int]:
    """Resample WITHOUT the device-side flat reshape: returns
    ``(y (..., n_rows, L), out_len)`` where the logical output sample ``t``
    lives at ``y[..., t // L, t % L]`` and ``n_rows * L >= out_len``.

    Rationale: flattening a (rows, L) tiled array on device costs ~10x the
    resampler itself when L is not 128-aligned (misaligned tile gather); the
    rows layout keeps every downstream elementwise stage full speed, and a
    host-side reshape after D2H is free.  Uses the roll kernel when the
    overlap is a single row, the shift kernel otherwise, and the conv path
    (transposed, unflattened) when Pallas does not apply.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, M, W = bank.L, bank.M, bank.W
    T = x.shape[-1]
    if out_len is None:
        out_len = bank.out_len(T)
    lead = x.shape[:-1]
    if T == 0 or out_len == 0:
        return jnp.zeros((*lead, 0, L), dtype=x.dtype), out_len
    if not pallas_applicable(bank):
        y = resample(x, bank, out_len=out_len)
        pad = (-out_len) % L
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
        return y.reshape(*lead, -1, L), out_len

    Q = -(-out_len // L)
    tq, R, n_tiles = _plan(bank, Q)
    r_rows = -(-R // _ROW_ALIGN) * _ROW_ALIGN
    bc = int(np.prod(lead)) if lead else 1
    xf = x.reshape(bc, T)
    n_rows = n_tiles * tq + r_rows
    total = n_rows * M
    pad_front = bank.pad_front
    xp = jnp.pad(xf, ((0, 0), (pad_front, max(0, total - pad_front - T))))[:, :total]
    xp3 = xp.reshape(bc, n_rows, M)
    g = np.zeros(((R + 1) * M, L), np.float32)
    g[:W, :] = cycle_matrix_f32(bank)
    shift_blocks = tq // r_rows

    if R == 1:
        kern = functools.partial(_kernel_roll, tq=tq, m=M, ell=L)
    else:
        kern = functools.partial(_kernel, tq=tq, r=R, m=M, ell=L)
    out = pl.pallas_call(
        kern,
        grid=(bc, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tq, M), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_rows, M),
                         lambda b, q: (b, (q + 1) * shift_blocks, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((R + 1) * M, L), lambda b, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, L), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bc, n_tiles * tq, L), jnp.float32),
        interpret=interpret,
    )(xp3, xp3, jnp.asarray(g))
    return out.reshape(*lead, n_tiles * tq, L), out_len
