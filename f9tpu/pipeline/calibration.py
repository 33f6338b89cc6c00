"""Latency calibration: impulse -> chain -> peak find, with cached results.

The reference measures round-trip latency by sending a 0.9-amplitude single-
sample impulse through the hardware loop and locating the returned peak
(Services/LatencyMeasurementService.swift:57-171; C++ flow
Source/MainComponent.cpp:636-650,264-294), storing the measured latency plus
the capture noise floor, and auto-re-measuring when invalidated by settings
changes (MainViewModel.swift:195-206; Models/ProcessingSettings.swift:60-65).

Here the "loop" is the SRC/effect chain on device.  The chain is group-delay
compensated by construction, so the measured latency is ~0 — and measuring it
*is* the calibration test (any nonzero result means a chain stage introduced
uncompensated delay, e.g. a user FIR).  The same cache/invalidation semantics
apply: results are keyed by the full chain signature and re-measured when the
key changes.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading

import jax.numpy as jnp
import numpy as np

from ..ops.resample import resample_rates
from ..ops.signal import IMPULSE_AMP, impulse

__all__ = ["CalibrationResult", "CalibrationCache", "measure_latency"]

#: Reference peak threshold (LatencyMeasurementService.swift:130-149); the
#: 0.9 impulse amplitude lives with the generator (ops.signal.IMPULSE_AMP).
PEAK_THRESHOLD = 0.1
CAPTURE_FRAMES = 1 << 16   # ~1.4 s @ 48k; reference captures >= 100k samples


@dataclasses.dataclass(frozen=True)
class CalibrationResult:
    latency_frames: int        # chain delay at the OUTPUT rate, in frames
    noise_floor_db: float      # RMS dB of the response away from the peak
    peak_amplitude: float      # detected peak (must exceed PEAK_THRESHOLD)

    @property
    def detected(self) -> bool:
        return self.peak_amplitude > PEAK_THRESHOLD


def measure_latency(
    rate_in: int,
    rate_out: int,
    quality: str = "high",
    kind: str = "sinc",
    chain_fn=None,
    capture_frames: int = CAPTURE_FRAMES,
    ringout_frames: int = 0,
) -> CalibrationResult:
    """Measure the group delay of the processing chain in output frames.

    ``chain_fn(x) -> y`` defaults to the bare resampler; pass a custom chain to
    measure user effect stacks.  The impulse is placed mid-buffer so acausal
    (negative-delay) chains are measurable too.  ``ringout_frames`` (output
    rate) excludes the chain's known decay span after the peak from the noise
    floor estimate — a reverb IR's tail is signal, not noise.
    """
    pos = capture_frames // 2
    x = impulse(capture_frames, amp=IMPULSE_AMP, position=pos)
    if chain_fn is None:
        y = resample_rates(x, rate_in, rate_out, quality=quality, kind=kind)
    else:
        y = chain_fn(x)
    # one D2H transfer: chain captures run to millions of frames (3x a
    # reverb ring-out), so device argmax + scalar fetch + two more
    # np.asarray conversions would move the array repeatedly
    yn = np.asarray(jnp.asarray(y))
    ya = np.abs(yn)
    peak_idx = int(ya.argmax())
    peak_amp = float(ya[peak_idx])
    # Sub-sample peak refinement (parabolic fit on |y| around the maximum):
    # the raw argmax lands on whichever output sample carries the largest
    # interpolation weight, which for short kernels (Lagrange) can sit 1-2
    # samples off the true zero-delay position and would then be *applied* as
    # a bogus trim.  The reference's integer peak is fine for its hardware
    # loop (delays are whole buffers); a compensated FIR chain needs the
    # fractional estimate rounded, not the argmax.
    if 0 < peak_idx < len(ya) - 1:
        a, b, c = ya[peak_idx - 1], ya[peak_idx], ya[peak_idx + 1]
        denom = a - 2 * b + c
        frac = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
        refined = peak_idx + float(np.clip(frac, -0.5, 0.5))
    else:
        refined = float(peak_idx)
    # Expected zero-delay landing position of the impulse at the output rate.
    from ..models.filters import resolve_ratio

    L, M = resolve_ratio(rate_in, rate_out)
    expected_f = pos * L / M
    latency = int(round(refined - expected_f))
    # Noise floor: RMS away from the impulse response's main lobe
    # (calculateNoiseFloor, LatencyMeasurementService.swift:173-181).  The
    # ring span is excluded on BOTH sides of the peak: a linear-phase chain
    # (e.g. a user FIR) pre-rings symmetrically, and counting that pre-ring
    # as noise would inflate the floor — which the scheduler then adopts as
    # the reverb tail-detection threshold.
    guard = 4096
    mask = np.ones(len(yn), bool)
    mask[max(0, peak_idx - guard - int(ringout_frames)):
         peak_idx + guard + int(ringout_frames)] = False
    tail = yn[mask]
    rms = float(np.sqrt(np.mean(tail**2))) if tail.size else 0.0
    nf_db = 20.0 * np.log10(max(rms, 1e-30)) if rms > 0 else -200.0
    return CalibrationResult(
        latency_frames=int(latency),
        noise_floor_db=nf_db,
        peak_amplitude=peak_amp,
    )


class CalibrationCache:
    """Persistent {chain-signature -> CalibrationResult} with the reference's
    invalidation semantics: a changed signature simply misses the cache
    (needsLatencyRemeasurement, Models/ProcessingSettings.swift:60-65)."""

    def __init__(self, path: str | None = None):
        self._path = path
        self._lock = threading.Lock()
        self._data: dict[str, CalibrationResult] = {}
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    raw = json.load(f)
                self._data = {k: CalibrationResult(**v) for k, v in raw.items()}
            except (json.JSONDecodeError, TypeError, AttributeError, KeyError):
                self._data = {}  # corrupt cache self-heals (re-measured)

    @staticmethod
    def key(rate_in: int, rate_out: int, quality: str, kind: str, chain_sig: str = "") -> str:
        return f"{rate_in}->{rate_out}:{kind}:{quality}:{chain_sig}"

    def get_or_measure(
        self, rate_in: int, rate_out: int, quality: str = "high", kind: str = "sinc",
        chain_fn=None, chain_sig: str = "",
        capture_frames: int = CAPTURE_FRAMES, ringout_frames: int = 0,
    ) -> CalibrationResult:
        # an un-signed custom chain cannot share the bare-SRC cache slot (it
        # would serve a stale latency for a chain that was never measured) —
        # measure it uncached instead
        k = (self.key(rate_in, rate_out, quality, kind, chain_sig)
             if (chain_fn is None or chain_sig) else None)
        if k is not None:
            with self._lock:
                if k in self._data:
                    return self._data[k]
        res = measure_latency(rate_in, rate_out, quality=quality, kind=kind,
                              chain_fn=chain_fn, capture_frames=capture_frames,
                              ringout_frames=ringout_frames)
        if k is not None:
            with self._lock:
                self._data[k] = res
                self._save_locked()
        return res

    def invalidate(self, prefix: str | None = None) -> None:
        """Drop entries whose key starts with ``prefix``; ``None`` clears all
        (the settings-changed invalidation, Models/ProcessingSettings.swift:60-65)."""
        with self._lock:
            if prefix is None:
                self._data = {}
            else:
                # match only at a ':' field boundary (or the exact key):
                # '44100->48000' must not sweep up '44100->480000:...'
                pat = prefix if prefix.endswith(":") else prefix + ":"
                self._data = {k: v for k, v in self._data.items()
                              if not (k == prefix or k.startswith(pat))}
            self._save_locked()

    def _save_locked(self) -> None:
        if not self._path:
            return
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: dataclasses.asdict(v) for k, v in self._data.items()}, f, indent=1)
        os.replace(tmp, self._path)
