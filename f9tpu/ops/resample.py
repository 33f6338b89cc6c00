"""Rational sample-rate conversion as a single strided matmul on TPU.

The reference app's "resampling" is an analog hardware loop driven by a
real-time callback (reference: Services/AudioProcessingService.swift:339-536);
here it becomes a software SRC core.  The whole rational resampler — polyphase
windowed-sinc or Lagrange — is folded at design time into one dense cycle
matrix ``G`` of shape ``(W, L)`` (see `f9tpu.models.filters.design_cycle_bank`)
so the per-sample inner loops of a CPU interpolator become

    y[b, q*L : (q+1)*L] = x_padded[b, q*M : q*M + W] @ G

which XLA lowers to an MXU-tiled strided convolution.  Layout is
``(batch*channels, frames)`` — the reference's per-channel loops
(CAAudioBridge.swift:555-624) become the conv batch dimension.

No data-dependent shapes: output length is a static function of input length,
so each (in_len, ratio, quality) triple compiles once and is cached by jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.filters import CycleBank, design_cycle_bank

__all__ = ["resample", "resample_rates", "cycle_matrix_f32"]


@functools.lru_cache(maxsize=64)
def _g_f32_cached(bank: CycleBank) -> np.ndarray:
    return np.ascontiguousarray(bank.G, dtype=np.float32)


def cycle_matrix_f32(bank: CycleBank) -> np.ndarray:
    """The bank's cycle matrix as float32 (cached)."""
    return _g_f32_cached(bank)


def resample_presliced(xp: jax.Array, bank: CycleBank, num_cycles: int) -> jax.Array:
    """Core cycle conv on an *already padded/haloed* signal: no implicit padding.

    ``xp``: (..., T_padded) with T_padded >= (num_cycles-1)*M + W; returns
    (..., num_cycles * L).  Used directly by the frames-sharded overlap-save
    path (`f9tpu.parallel.sharding`), where halos arrive via ppermute instead
    of zero padding.
    """
    L, M, W = bank.L, bank.M, bank.W
    need = (num_cycles - 1) * M + W
    if xp.shape[-1] < need:
        raise ValueError(f"padded input too short: {xp.shape[-1]} < {need}")
    lead = xp.shape[:-1]
    xb = xp.reshape(-1, 1, xp.shape[-1])
    g = jnp.asarray(cycle_matrix_f32(bank))
    rhs = g.T.reshape(L, 1, W)
    y = jax.lax.conv_general_dilated(
        xb[..., : need],
        rhs,
        window_strides=(M,),
        padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.transpose(y, (0, 2, 1)).reshape(*lead, num_cycles * L)


def resample(x: jax.Array, bank: CycleBank, out_len: int | None = None) -> jax.Array:
    """Resample the last axis of ``x`` by the rational ratio of ``bank``.

    ``x``: float32 array, shape ``(..., T)``.  Returns ``(..., out_len)`` where
    ``out_len`` defaults to ``ceil(T * L / M)``.  Output sample ``n`` estimates
    the input at position ``n*M/L`` — zero overall delay (group-delay
    compensation is folded into the cycle matrix, mirroring the reference's
    latency-compensation contract, _Swift Docs/LATENCY_TRIMMING_FIX.md).
    """
    L, M, W = bank.L, bank.M, bank.W
    T = x.shape[-1]
    if out_len is None:
        out_len = bank.out_len(T)
    if T == 0 or out_len == 0:
        return jnp.zeros((*x.shape[:-1], out_len), dtype=x.dtype)
    Q = -(-out_len // L)  # cycles
    padded = (Q - 1) * M + W
    pad_front = bank.pad_front
    # When out_len is smaller than the natural length, trim the input so the
    # conv emits exactly Q cycles — extra cycles would corrupt the (B, Q*L)
    # reshape (mixing rows across batch entries) or fail outright.
    keep_T = min(T, max(0, padded - pad_front))
    x = x[..., :keep_T]
    pad_back = padded - pad_front - keep_T

    lead = x.shape[:-1]
    xb = x.reshape(-1, 1, keep_T)  # (B, C=1, T) for conv
    g = jnp.asarray(cycle_matrix_f32(bank))          # (W, L)
    rhs = g.T.reshape(L, 1, W)                       # (out_feat=L, in_feat=1, W)
    y = jax.lax.conv_general_dilated(
        xb,
        rhs,
        window_strides=(M,),
        padding=((pad_front, pad_back),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        # TPU fp32 convs default to single-pass bf16 on the MXU (~-50 dB error);
        # HIGHEST uses enough passes for true fp32 — required for the -120 dB
        # parity target (BASELINE.md) and still far from the bottleneck here.
        precision=jax.lax.Precision.HIGHEST,
    )                                                # (B, L, Q)
    y = jnp.transpose(y, (0, 2, 1)).reshape(-1, Q * L)[:, :out_len]
    return y.reshape(*lead, out_len)


@functools.partial(jax.jit, static_argnames=("rate_in", "rate_out", "quality", "kind", "out_len"))
def resample_rates(
    x: jax.Array,
    rate_in: int,
    rate_out: int,
    quality: str = "high",
    kind: str = "sinc",
    out_len: int | None = None,
) -> jax.Array:
    """Jitted convenience wrapper: design (host, cached) + resample (device),
    dispatched to the fastest applicable path (Pallas kernel / XLA conv)."""
    from .pallas_src import resample_auto  # local import: avoids a cycle

    bank = design_cycle_bank(rate_in, rate_out, quality=quality, kind=kind)
    return resample_auto(x, bank, out_len=out_len)
