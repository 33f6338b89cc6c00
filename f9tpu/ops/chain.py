"""Pluggable on-device effect chain — the TPU-native *insert loop*.

The reference app's entire purpose is an insert loop: audio plays out through
external processors and is re-captured (claude.md:18;
Services/AudioProcessingService.swift:339-536).  The SRC graph replaces the
analog transport; a :class:`Chain` re-introduces the *processor*: a
user-supplied stack of in-graph stages applied to the resampled signal at the
output rate, before latency trimming.  A chain has real group delay and real
ring-out, which makes the surrounding machinery load-bearing exactly as in
the reference:

- calibration measures the chain's true delay with an impulse
  (Services/LatencyMeasurementService.swift:57-171),
- latency trim removes exactly that delay
  (AudioProcessingService.swift:681-703),
- capture head-room scales with the chain's ring-out up to the 60 s cap
  (Source/AppState.h:240-243; AudioProcessingService.swift:449-452),
- reverb-mode tails genuinely extend past the source and terminate at the
  noise floor (REVERB_MODE_IMPLEMENTATION.md:59-73).

Stages are built from host numpy data and embedded as XLA constants; a chain
is hashable by a content signature so it can ride through ``jax.jit`` as a
static argument (a changed IR is a changed chain — same invalidation
semantics as the reference's settings key,
Models/ProcessingSettings.swift:60-65).

TPU notes: the FIR insert lowers to the same MXU-tiled strided conv as the
SRC core (precision=HIGHEST — TPU fp32 convs default to bf16 passes);
long convolutions (reverb IRs) use uniform-partitioned overlap-save FFT
convolution with a frequency-domain delay line carried through ``lax.scan``,
so memory stays O(K·N) regardless of capture length.
"""

from __future__ import annotations

import functools
import zlib

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Chain",
    "Gain",
    "Delay",
    "FIRInsert",
    "Biquad",
    "ConvolutionReverb",
    "fft_convolve",
]


def _array_sig(a: np.ndarray) -> tuple:
    """Content signature of a host array: shape + CRC of the raw bytes."""
    a = np.ascontiguousarray(a)
    return (a.shape, zlib.crc32(a.tobytes()))


def _direct_convolve(x: jax.Array, taps: np.ndarray) -> jax.Array:
    """Causal direct-form convolution along the last axis, same length:
    ``out[n] = sum_k taps[k] * x[n-k]`` (XLA conv is correlation, so the taps
    are flipped; front padding keeps it causal)."""
    W = int(taps.shape[-1])
    lead, T = x.shape[:-1], x.shape[-1]
    xb = x.reshape(-1, 1, T)
    rhs = jnp.asarray(taps[::-1].copy(), jnp.float32).reshape(1, 1, W)
    y = jax.lax.conv_general_dilated(
        xb, rhs, window_strides=(1,), padding=((W - 1, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(*lead, T)


@functools.partial(jax.jit, static_argnames=("B",))
def _upols(xb: jax.Array, h_re: jax.Array, h_im: jax.Array, B: int) -> jax.Array:
    """Jitted uniform-partitioned overlap-save core: ``xb`` (R, T) real,
    ``h_re``/``h_im`` (K, N//2+1) the partitioned IR spectrum as split
    real/imag planes.  Complex values exist only as on-device intermediates —
    the axon TPU tunnel cannot transfer complex64 buffers (no complex H2D
    upload, no eager complex constants), so the whole pipeline runs under one
    jit with real-typed boundaries.
    """
    N = 2 * B
    Nf = N // 2 + 1
    R, T = xb.shape
    K = h_re.shape[0]
    H = jax.lax.complex(h_re, h_im)

    nb = max(1, -(-T // B))
    xp = jnp.pad(xb, ((0, 0), (0, nb * B - T)))
    blk = xp.reshape(R, nb, B)
    prev = jnp.pad(blk, ((0, 0), (1, 0), (0, 0)))[:, :nb]
    win = jnp.concatenate([prev, blk], axis=-1)              # (R, nb, N)

    def step(fdl, wi):                     # fdl (K, R, Nf); wi (R, N)
        Xi = jnp.fft.rfft(wi, n=N, axis=-1)
        fdl = jnp.concatenate([Xi[None], fdl[:-1]], axis=0)
        Y = jnp.sum(fdl * H[:, None, :], axis=0)
        yb = jnp.fft.irfft(Y, n=N, axis=-1)[:, B:]           # (R, B)
        return fdl, yb

    init = jnp.zeros((K, R, Nf), jnp.complex64)
    _, ys = jax.lax.scan(step, init, jnp.swapaxes(win, 0, 1))
    return jnp.swapaxes(ys, 0, 1).reshape(R, nb * B)[:, :T]


def _partition_ir(ir: np.ndarray, B: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side IR partitioning: (K, N//2+1) float32 real/imag planes."""
    ir_len = int(ir.shape[0])
    N = 2 * B
    K = -(-ir_len // B)
    irp = np.pad(ir.astype(np.float64), (0, K * B - ir_len)).reshape(K, B)
    H = np.fft.rfft(irp, n=N, axis=-1)
    return (np.ascontiguousarray(H.real, np.float32),
            np.ascontiguousarray(H.imag, np.float32))


def fft_convolve(x: jax.Array, ir: np.ndarray, block: int = 4096) -> jax.Array:
    """Causal convolution of the last axis with a long IR, truncated to x's
    length (the capture window supplies tail room upstream).

    Uniform-partitioned overlap-save: the IR is split into K blocks of B,
    each input step FFTs one 2B window (hop B), and a K-deep frequency-domain
    delay line (the ``lax.scan`` carry) accumulates ``sum_k X[i-k] * H[k]``;
    the second half of each inverse FFT is alias-free output.  Work is
    O(T/B · K · N log N) and carry memory O(K·N) — independent of capture
    length, unlike a single whole-signal FFT.
    """
    ir = np.asarray(ir, np.float32).reshape(-1)
    ir_len = int(ir.shape[0])
    if ir_len == 0:
        return jnp.zeros_like(x)
    B = int(block)
    while ir_len > 64 * B:  # bound the delay-line depth
        B *= 2
    h_re, h_im = _partition_ir(ir, B)
    lead, T = x.shape[:-1], x.shape[-1]
    y = _upols(x.reshape(-1, T), jnp.asarray(h_re), jnp.asarray(h_im), B)
    return y.reshape(*lead, T).astype(x.dtype)


class Gain:
    """Scalar gain stage (an external processor's make-up gain)."""

    def __init__(self, db: float):
        self.db = float(db)

    def signature(self) -> tuple:
        return ("gain", round(self.db, 9))

    def tail_frames(self, rate: int) -> int:
        return 0

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        return y * np.float32(10.0 ** (self.db / 20.0))


class Delay:
    """Pure delay (models an external processor's transport latency — what
    the reference's round-trip calibration exists to measure)."""

    def __init__(self, seconds: float):
        if seconds < 0:
            raise ValueError("delay must be non-negative")
        self.seconds = float(seconds)

    def frames(self, rate: int) -> int:
        return int(round(self.seconds * rate))

    def signature(self) -> tuple:
        return ("delay", round(self.seconds, 9))

    def tail_frames(self, rate: int) -> int:
        return self.frames(rate)

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        d = self.frames(rate)
        if d == 0:
            return y
        T = y.shape[-1]
        pad = [(0, 0)] * (y.ndim - 1) + [(d, 0)]
        return jnp.pad(y, pad)[..., :T]


class FIRInsert:
    """A causal FIR processor (EQ / filter insert) with its *uncompensated*
    group delay — e.g. a linear-phase FIR delays by (W-1)/2 frames, which
    calibration must measure and trim (LATENCY_TRIMMING_FIX.md contract)."""

    #: above this tap count the MXU direct form loses to FFT convolution
    DIRECT_MAX = 8192

    def __init__(self, taps):
        self.taps = np.asarray(taps, np.float32).reshape(-1)
        if self.taps.size == 0:
            raise ValueError("FIR needs at least one tap")

    def signature(self) -> tuple:
        return ("fir", _array_sig(self.taps))

    def tail_frames(self, rate: int) -> int:
        return int(self.taps.shape[0]) - 1

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        if self.taps.shape[0] <= self.DIRECT_MAX:
            return _direct_convolve(y, self.taps)
        return fft_convolve(y, self.taps)


class Biquad:
    """A second-order IIR EQ section (RBJ audio-EQ-cookbook forms), realised
    TPU-natively as a truncated impulse response driven through the same MXU
    FIR machinery — a per-sample recurrence would serialise the TPU, while a
    stable biquad's IR decays geometrically, so truncating at the float32
    noise floor is exact to well below the -120 dB budget.

    The IR is sampled at chain-apply time for the *actual* session rate (the
    design is rate-dependent), so one Biquad object serves any output rate.
    """

    TYPES = ("lowpass", "highpass", "peaking", "lowshelf", "highshelf")

    def __init__(self, kind: str, freq_hz: float, q: float = 0.70710678,
                 gain_db: float = 0.0, max_ir_seconds: float = 2.0):
        if kind not in self.TYPES:
            raise ValueError(f"kind must be one of {self.TYPES}, got {kind!r}")
        if freq_hz <= 0 or q <= 0:
            raise ValueError("freq_hz and q must be positive")
        self.kind = kind
        self.freq_hz = float(freq_hz)
        self.q = float(q)
        self.gain_db = float(gain_db)
        self.max_ir_seconds = float(max_ir_seconds)
        self._ir_cache: dict[int, np.ndarray] = {}

    def signature(self) -> tuple:
        return ("biquad", self.kind, round(self.freq_hz, 6), round(self.q, 9),
                round(self.gain_db, 9), round(self.max_ir_seconds, 6))

    def coefficients(self, rate: int) -> tuple[np.ndarray, np.ndarray]:
        """Normalised (b, a) with a[0] == 1 (RBJ audio EQ cookbook)."""
        A = 10.0 ** (self.gain_db / 40.0)
        w0 = 2.0 * np.pi * min(self.freq_hz, 0.49 * rate) / rate
        cw, sw = np.cos(w0), np.sin(w0)
        alpha = sw / (2.0 * self.q)
        k = self.kind
        if k == "lowpass":
            b = np.array([(1 - cw) / 2, 1 - cw, (1 - cw) / 2])
            a = np.array([1 + alpha, -2 * cw, 1 - alpha])
        elif k == "highpass":
            b = np.array([(1 + cw) / 2, -(1 + cw), (1 + cw) / 2])
            a = np.array([1 + alpha, -2 * cw, 1 - alpha])
        elif k == "peaking":
            b = np.array([1 + alpha * A, -2 * cw, 1 - alpha * A])
            a = np.array([1 + alpha / A, -2 * cw, 1 - alpha / A])
        elif k == "lowshelf":
            s = 2.0 * np.sqrt(A) * alpha
            b = A * np.array([(A + 1) - (A - 1) * cw + s,
                              2 * ((A - 1) - (A + 1) * cw),
                              (A + 1) - (A - 1) * cw - s])
            a = np.array([(A + 1) + (A - 1) * cw + s,
                          -2 * ((A - 1) + (A + 1) * cw),
                          (A + 1) + (A - 1) * cw - s])
        else:  # highshelf
            s = 2.0 * np.sqrt(A) * alpha
            b = A * np.array([(A + 1) + (A - 1) * cw + s,
                              -2 * ((A - 1) + (A + 1) * cw),
                              (A + 1) + (A - 1) * cw - s])
            a = np.array([(A + 1) - (A - 1) * cw + s,
                          2 * ((A - 1) - (A + 1) * cw),
                          (A + 1) - (A - 1) * cw - s])
        return (b / a[0]).astype(np.float64), (a / a[0]).astype(np.float64)

    def impulse_response(self, rate: int) -> np.ndarray:
        """float64 IR truncated where the remaining tail is below the float32
        quantum (geometric-decay bound from the pole radius)."""
        cached = self._ir_cache.get(rate)
        if cached is not None:
            return cached
        b, a = self.coefficients(rate)
        n_max = max(16, int(self.max_ir_seconds * rate))
        # direct-form recursion in float64 (host, exact)
        h = np.zeros(n_max)
        x1 = x2 = y1 = y2 = 0.0
        for n in range(n_max):
            xn = 1.0 if n == 0 else 0.0
            yn = b[0] * xn + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2
            h[n] = yn
            x2, x1 = x1, xn
            y2, y1 = y1, yn
            if n > 8 and abs(yn) < 1e-10 and abs(y1) < 1e-10:
                h = h[: n + 1]
                break
        self._ir_cache[rate] = h
        return h

    def tail_frames(self, rate: int) -> int:
        return int(self.impulse_response(rate).shape[0]) - 1

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        h = self.impulse_response(rate).astype(np.float32)
        if h.shape[0] <= FIRInsert.DIRECT_MAX:
            return _direct_convolve(y, h)
        return fft_convolve(y, h)


class ConvolutionReverb:
    """Convolution with a measured impulse response (the 'reverb unit in the
    loop' scenario, REVERB_MODE_IMPLEMENTATION.md): ``out = dry*y + wet*(y*ir)``.

    ``ir``: (ir_len,) mono (shared across channels) or (channels, ir_len)
    true-stereo/multichannel, matched positionally to the signal's channels.
    """

    def __init__(self, ir, wet: float = 1.0, dry: float = 0.0):
        ir = np.asarray(ir, np.float32)
        if ir.ndim == 1:
            ir = ir[None]
        if ir.ndim != 2 or ir.shape[-1] == 0:
            raise ValueError("ir must be (ir_len,) or (channels, ir_len)")
        self.ir = ir
        self.wet = float(wet)
        self.dry = float(dry)

    def signature(self) -> tuple:
        return ("convreverb", _array_sig(self.ir),
                round(self.wet, 9), round(self.dry, 9))

    def tail_frames(self, rate: int) -> int:
        return int(self.ir.shape[-1]) - 1

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        n_ir = self.ir.shape[0]
        if n_ir == 1:
            wet = fft_convolve(y, self.ir[0])
        else:
            if y.ndim < 2 or y.shape[-2] != n_ir:
                raise ValueError(
                    f"multichannel IR has {n_ir} channels but the signal's "
                    f"channel axis is {y.shape[-2] if y.ndim > 1 else 1}")
            wet = jnp.stack(
                [fft_convolve(y[..., c, :], self.ir[c]) for c in range(n_ir)],
                axis=-2)
        out = np.float32(self.wet) * wet
        if self.dry:
            out = out + np.float32(self.dry) * y
        return out


class Chain:
    """An ordered stack of stages, hashable by content so it can be a
    ``jax.jit`` static argument and a calibration-cache key component."""

    def __init__(self, *stages):
        for s in stages:
            for attr in ("signature", "tail_frames", "apply"):
                if not callable(getattr(s, attr, None)):
                    raise TypeError(
                        f"stage {s!r} lacks required method {attr}()")
        self.stages = tuple(stages)
        self._sig = tuple(s.signature() for s in self.stages)

    def signature(self) -> tuple:
        return self._sig

    def sig_str(self) -> str:
        """Compact signature for persistent cache keys."""
        return format(zlib.crc32(repr(self._sig).encode()), "08x")

    def tail_frames(self, rate: int) -> int:
        """Worst-case ring-out of the whole chain at ``rate`` (delays and
        convolution tails accumulate through the stack)."""
        return sum(s.tail_frames(rate) for s in self.stages)

    def apply(self, y: jax.Array, rate: int) -> jax.Array:
        for s in self.stages:
            y = s.apply(y, rate)
        return y

    def __hash__(self):
        return hash(self._sig)

    def __eq__(self, other):
        return isinstance(other, Chain) and self._sig == other._sig

    def __repr__(self):
        return f"Chain({', '.join(type(s).__name__ for s in self.stages)})"
