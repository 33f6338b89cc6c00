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

__all__ = ["resample", "resample_banded", "resample_gather",
           "resample_rates", "cycle_matrix_f32", "banded_rows_applicable",
           "banded_rows_plan", "resample_banded_rows_pre"]


@functools.lru_cache(maxsize=64)
def _g_f32_cached(bank: CycleBank) -> np.ndarray:
    if bank.G is None:
        raise RuntimeError(
            f"dense cycle matrix disabled for ratio {bank.L}/{bank.M} "
            f"(would be {bank.W}x{bank.L}); this bank runs via the banded "
            "path (resample_banded / resample_banded_rows_pre, dispatched "
            "automatically by resample / resample_auto)")
    return np.ascontiguousarray(bank.G, dtype=np.float32)


def cycle_matrix_f32(bank: CycleBank) -> np.ndarray:
    """The bank's cycle matrix as float32 (cached)."""
    return _g_f32_cached(bank)


@functools.lru_cache(maxsize=64)
def _h_rev_f32_cached(bank: CycleBank) -> np.ndarray:
    """Phase bank with the tap axis reversed, float32 (L, K): tap k of the
    gather path multiplies x_padded[base + k]."""
    return np.ascontiguousarray(bank.H[:, ::-1], dtype=np.float32)


def _cycle_budget(T: int, bank: CycleBank, out_len: int | None):
    """The one place the whole-signal padding math lives: resolve out_len,
    the cycle count Q, how much input to keep, and the front/back zero pads
    reaching exactly ``(Q-1)*M + W`` total.  Every entry point — the dense
    conv (`resample`, which applies the pads inside the conv), the gather
    and banded varispeed forms (which apply them via jnp.pad) — derives its
    numbers here."""
    L, M, W = bank.L, bank.M, bank.W
    if out_len is None:
        out_len = bank.out_len(T)
    Q = -(-out_len // L)
    padded = (Q - 1) * M + W
    pad_front = bank.pad_front
    keep_T = min(T, max(0, padded - pad_front))
    pad_back = padded - pad_front - keep_T
    return out_len, Q, keep_T, pad_front, pad_back


def _pad_for_cycles(x: jax.Array, bank: CycleBank, out_len: int | None):
    """`_cycle_budget` + the explicit jnp.pad: returns ``(out_len, padded)``
    — ``padded`` is None for empty in/out."""
    T = x.shape[-1]
    out_len, _Q, keep_T, pad_front, pad_back = _cycle_budget(T, bank, out_len)
    if T == 0 or out_len == 0:
        return out_len, None
    xp = jnp.pad(x[..., :keep_T],
                 [(0, 0)] * (x.ndim - 1) + [(pad_front, pad_back)])
    return out_len, xp


def _gather_core(xp: jax.Array, bank: CycleBank, n_out: int) -> jax.Array:
    """Phase-table resampling of an already-padded signal: no dense matrix.

    ``y[n] = sum_k Hrev[ph(n), k] * xp[base(n) + k]`` where, with
    ``r = delay_upsamples %% L``:  ``u = (n %% L)*M + r``,
    ``base(n) = (n // L)*M + u // L``, ``ph(n) = u %% L`` — identical output
    to the dense cycle-matrix contract (same design, same index math), but
    the tables are only (L, K), so varispeed ratios like 44100->44056
    (L/M = 11014/11025, dense matrix ~0.5 GB) stay cheap.  All index math is
    exact int32: requires L*M + L < 2^31 (guaranteed by resolve_ratio's
    max_denominator of 2^16).

    TPU note: this is a VPU gather path (no MXU) — K fused gather+FMA
    passes over the output.  TPU per-element gathers are effectively serial:
    measured 15x realtime at quality=high (K=130) vs the banded MXU form's
    ~49,000x (docs/PERF.md), which is why `_banded_core` is the production
    dispatch and this form exists as the independent numerical cross-check.
    """
    L, M, K = bank.L, bank.M, bank.taps_per_phase
    if L * M + L >= 2**31:
        raise ValueError(
            f"ratio {bank.L}/{bank.M} too fine for int32 gather index math")
    if xp.shape[-1] >= 2**31 or n_out >= 2**31:
        # the signal-length-scaled indices (base, arange) are int32 too;
        # beyond this they would silently wrap and gather garbage
        raise ValueError(
            f"signal too long for int32 gather index math "
            f"({xp.shape[-1]} in / {n_out} out frames)")
    lead = xp.shape[:-1]
    T_pad = xp.shape[-1]
    xf = xp.reshape(-1, T_pad)
    hrev = jnp.asarray(_h_rev_f32_cached(bank))            # (L, K)
    n = jnp.arange(n_out, dtype=jnp.int32)
    a, b = jnp.divmod(n, jnp.int32(L))
    u = b * jnp.int32(M) + jnp.int32(bank.delay_upsamples % L)
    base = a * jnp.int32(M) + u // jnp.int32(L)            # (n_out,)
    ph = u % jnp.int32(L)
    y = jnp.zeros((xf.shape[0], n_out), jnp.float32)
    for k in range(K):
        w_k = jnp.take(hrev[:, k], ph, axis=0)             # (n_out,)
        x_k = jnp.take(xf, jnp.minimum(base + k, T_pad - 1), axis=-1)
        y = y + x_k * w_k
    return y.reshape(*lead, n_out)


def resample_gather(x: jax.Array, bank: CycleBank,
                    out_len: int | None = None) -> jax.Array:
    """Drop-in equivalent of `resample` via the phase-table gather path.

    Kept as the independent cross-check of the varispeed index contract;
    production varispeed dispatch uses `resample_banded` (TPU per-element
    gathers measured ~3000x slower than the banded matmul form: 15x vs
    49,000x realtime on the NTSC pull-down — docs/PERF.md)."""
    out_len, xp = _pad_for_cycles(x, bank, out_len)
    if xp is None:
        return jnp.zeros((*x.shape[:-1], out_len), dtype=x.dtype)
    return _gather_core(xp, bank, out_len)


#: Outputs per banded segment (one MXU lane tile).
_BAND_SEG = 128
#: HBM lane-tile granularity: segment input offsets are aligned DOWN to this
#: (the sub-tile shift is folded into zero rows at the top of the segment's
#: matrix), so every window slice starts on a lane-tile boundary.
_LANE = 128


@functools.lru_cache(maxsize=16)
def _banded_plan(bank: CycleBank):
    """Per-bank banded decomposition (host, cached).

    The cycle matrix's nonzero band is a monotone staircase: outputs
    p..p+127 of a cycle read only inputs [off(p), off(p+127)+K) — a window of
    w ~ 128*M/L + K samples.  Splitting each cycle into S overlapping
    128-output segments gives S small dense (w, 128) matrices (total
    S*w*128 floats ~ 10-15 MB even for L ~ 11k) evaluated as one batched MXU
    einsum over statically-sliced input windows — no gathers, no 0.5 GB
    dense matrix.  This is PERF.md 'Headroom' item 3 made real, and the
    production path for varispeed ratios.

    Window offsets are LANE-ALIGNED: each segment's start is rounded down to
    a 128-lane boundary and the sub-tile shift becomes zero rows at the top
    of its matrix (w widens by up to 127; in practice the staircase drift is
    a few lanes).  Aligned starts make every window slice a tile-boundary
    copy, and — because the flat path (`_banded_core`) and the marshalled
    rows path (`resample_banded_rows_pre`) then contract the *identical*
    (w,) windows against the *identical* matrices in the same order — the
    two paths produce bitwise-identical floats.
    """
    from ..models.filters import _cycle_tables

    L, M, K = bank.L, bank.M, bank.taps_per_phase
    seg = min(_BAND_SEG, L)
    off, ph = _cycle_tables(L, M, bank.delay_upsamples % L)
    hrev = _h_rev_f32_cached(bank)   # shared with the gather path
    S = max(1, -(-L // seg))
    p0s = [s * seg for s in range(S - 1)] + [L - seg]
    raw0 = [int(off[p0]) for p0 in p0s]
    in0 = [a - (a % _LANE) for a in raw0]          # lane-aligned starts
    w = int(max(int(off[p0 + seg - 1]) + K - in0[s]
                for s, p0 in enumerate(p0s)))
    w = -(-w // 8) * 8                             # sublane-granular contraction
    G = np.zeros((S, w, seg), np.float32)
    for s, p0 in enumerate(p0s):
        for c in range(seg):
            pp = p0 + c
            row = int(off[pp] - in0[s])
            G[s, row: row + K, c] = hrev[ph[pp]]
    # widest input coordinate any segment's fixed-w slice touches (may exceed
    # the bank's W for early segments, whose G rows there are zero)
    w_rows = int(max(in0)) + w
    return tuple(int(v) for v in in0), w, seg, w_rows, G


def _banded_eval_rows(rows: jax.Array, bank: CycleBank) -> jax.Array:
    """Segment windows + batched MXU einsum + head/tail reassembly on cycle
    rows ``(..., Q, w_rows)`` -> ``(..., Q, L)``.  The ONE evaluation both
    banded entry points trace, so the flat and marshalled-rows forms are
    bitwise-identical by construction."""
    L = bank.L
    in0, w, seg, w_rows, G = _banded_plan(bank)
    S = len(in0)
    if rows.shape[-1] != w_rows:
        raise ValueError(f"cycle-row width {rows.shape[-1]} != plan {w_rows}")
    # One dot PER SEGMENT, each consuming a lane-aligned slice of ``rows``
    # directly: stacking the windows into a (Q, S, w) tensor first (the
    # round-3 form) materialises ~3x the band bytes and costs a write+read
    # HBM pass — measured 2253 -> 893 MB bytes-accessed and 3.5 -> 2.1 ms
    # on the NTSC bench shape (docs/PERF.md round 3c).  Slices fuse into the
    # dots; the only materialised intermediates are the outputs themselves.
    gs = jnp.asarray(G)                                      # (S, w, seg)
    ys = [jnp.einsum("...qw,wl->...ql", rows[..., a: a + w], gs[s],
                     precision=jax.lax.Precision.HIGHEST)
          for s, a in enumerate(in0)]
    if S == 1:
        return ys[0][..., (seg - L):]
    tail = ys[-1][..., (S * seg - L):]
    return jnp.concatenate(ys[:-1] + [tail], axis=-1)        # (..., Q, L)


def _banded_core(xp: jax.Array, bank: CycleBank, n_out: int) -> jax.Array:
    """Banded evaluation of an already-front-padded signal ``xp``; reads
    input coordinates [0, (Q-1)*M + W) and pads anything beyond."""
    L, M = bank.L, bank.M
    in0, w, seg, w_rows, G = _banded_plan(bank)
    Q = -(-n_out // L)
    nblk = -(-w_rows // M)
    need = (Q + nblk - 1) * M            # block i reads xp[i*M : (Q+i)*M]
    lead = xp.shape[:-1]
    if xp.shape[-1] < need:
        xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1)
                     + [(0, need - xp.shape[-1])])
    # overlapped (Q, w_rows) cycle rows from nblk shifted contiguous reshapes
    blocks = [xp[..., i * M:(Q + i) * M].reshape(*lead, Q, M)
              for i in range(nblk)]
    rows = jnp.concatenate(blocks, axis=-1)[..., :w_rows]   # (..., Q, w_rows)
    y_cyc = _banded_eval_rows(rows, bank)
    return y_cyc.reshape(*lead, Q * L)[..., :n_out]


def banded_rows_applicable(bank: CycleBank) -> bool:
    """Can this bank run the host-marshalled banded rows fast path?  Meant
    for varispeed banks (no dense matrix); dense banks already have the
    faster `resample_rows_pre` form."""
    return bank.G is None and bank.L >= 8 and bank.L * bank.M < 2**31


def banded_rows_plan(bank: CycleBank, frames: int) -> tuple[int, int, int]:
    """``(n_rows, row_width, pad_front)`` for host-side marshalling of a
    ``frames``-long signal into overlapping cycle rows: row ``q`` holds
    ``padded[q*M : q*M + row_width]`` of the zero-padded signal (zeros
    outside ``[pad_front, pad_front + frames)``), e.g. via a strided
    window view of a flat staging buffer.  Feeding the result to
    `resample_banded_rows_pre` skips the device-side cycle retiling that
    costs ~4x the whole resampler (docs/PERF.md round 3: 15.0 -> 3.2 ms on
    the NTSC pull-down bench shape)."""
    _in0, _w, _seg, w_rows, _G = _banded_plan(bank)
    n_out = bank.out_len(frames)
    return -(-n_out // bank.L), w_rows, bank.pad_front


def marshal_banded_rows(flat: np.ndarray, bank: CycleBank,
                        n_rows: int | None = None) -> np.ndarray:
    """Overlapping cycle rows from zero-padded flat staging ``(..., total)``:
    one strided window view + one contiguous copy — the host side of
    `resample_banded_rows_pre` (rows overlap by ``row_width - M``, ~1%
    duplicate bytes).  ``flat`` must already hold the signal at offset
    ``pad_front`` (see `banded_rows_plan`); ``n_rows`` caps the row count
    when the staging carries extra tail room.  The one shared marshal for
    the batch scheduler, both streaming loops, and the bench."""
    w_rows = _banded_plan(bank)[3]
    v = np.lib.stride_tricks.sliding_window_view(
        flat, w_rows, axis=-1)[..., ::bank.M, :]
    if n_rows is not None:
        v = v[..., :n_rows, :]
    return np.ascontiguousarray(v)


def resample_banded_rows_pre(xrows: jax.Array, bank: CycleBank) -> jax.Array:
    """Banded SRC on already rows-marshalled input: ``(..., Q, row_width)``
    -> ``(..., Q, L)`` cycle rows (logical output sample ``t`` lives at
    ``[..., t // L, t % L]``; the host flatten after D2H is free).  The
    varispeed twin of `resample_rows_pre`: bitwise-identical floats to
    `resample_banded` (shared `_banded_eval_rows`), ~4.7x faster than the
    device-resident flat form at bench scale because the misaligned
    flat->cycle-rows retiling happens on the host as strided memcpys."""
    return _banded_eval_rows(xrows, bank)


def resample_banded(x: jax.Array, bank: CycleBank,
                    out_len: int | None = None) -> jax.Array:
    """MXU-banded resampler — the production path for varispeed banks
    (``bank.G is None``); numerically the same design/contract as `resample`."""
    out_len, xp = _pad_for_cycles(x, bank, out_len)
    if xp is None:
        return jnp.zeros((*x.shape[:-1], out_len), dtype=x.dtype)
    return _banded_core(xp, bank, out_len)


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
    if bank.G is None:      # varispeed bank: banded MXU path
        return _banded_core(xp, bank, num_cycles * L)
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
    if bank.G is None:      # varispeed bank: banded MXU path
        return resample_banded(x, bank, out_len=out_len)
    L, M, W = bank.L, bank.M, bank.W
    T = x.shape[-1]
    # When out_len is smaller than the natural length, keep_T trims the input
    # so the conv emits exactly Q cycles — extra cycles would corrupt the
    # (B, Q*L) reshape (mixing rows across batch entries) or fail outright.
    out_len, Q, keep_T, pad_front, pad_back = _cycle_budget(T, bank, out_len)
    if T == 0 or out_len == 0:
        return jnp.zeros((*x.shape[:-1], out_len), dtype=x.dtype)
    x = x[..., :keep_T]

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
