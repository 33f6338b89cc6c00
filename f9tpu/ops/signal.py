"""Test-signal generators: sine, impulse, sweeps.

Host-side equivalents of the reference's generators:
- ``generateSineWave`` — phase-accumulating 1 kHz sine used by the hardware
  loop test (Source/MainComponent.cpp:907-930; Services/SineWaveGenerator.swift:35-59)
- ``generateImpulse`` — single-sample 0.9-amplitude impulse used for latency
  measurement (Source/MainComponent.cpp:932-945;
  Services/LatencyMeasurementService.swift:130-145)

Phase math runs in float64 NumPy on the host: a float32 unwrapped phase
accumulator loses ~0.03 rad of resolution by minute three of a 48 kHz tone
(-42 dB distortion), far above the framework's parity bar.  These are
test-signal utilities, not hot-path ops — host generation is free.
The phase-accumulator semantics (wrap, continuity across blocks) are
preserved via an initial phase and returned final phase.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["sine", "impulse", "log_sweep"]

#: Reference defaults (HardwareLoopTestService / LatencyMeasurementService).
DEFAULT_TEST_FREQ = 1000.0
DEFAULT_TEST_AMP = 0.5
IMPULSE_AMP = 0.9


def sine(
    frames: int,
    rate: int,
    freq: float = DEFAULT_TEST_FREQ,
    amp: float = DEFAULT_TEST_AMP,
    phase0: float = 0.0,
) -> tuple[jax.Array, float]:
    """Return ``(samples (frames,) float32, final_phase)``; phase in radians.

    Matches the phase-accumulating generator of SineWaveGenerator.swift:35-59
    (continuity across blocks via phase0/final_phase), exact for arbitrarily
    long buffers (float64 phase, reduced modulo 2*pi per sample index).
    """
    two_pi = 2.0 * np.pi
    n = np.arange(frames, dtype=np.float64)
    # reduce cycle count per-sample before scaling to radians: n*freq/rate can
    # safely reach ~2^53 before float64 loses the fraction
    cycles = np.mod(float(phase0) / two_pi + n * (freq / rate), 1.0)
    samples = (amp * np.sin(two_pi * cycles)).astype(np.float32)
    final = float(np.mod(float(phase0) + two_pi * frames * (freq / rate), two_pi))
    return jnp.asarray(samples), final


def impulse(frames: int, amp: float = IMPULSE_AMP, position: int = 0) -> jax.Array:
    """Single-sample impulse of ``amp`` at ``position``
    (LatencyMeasurementService.swift:130-145: 0.9 then silence)."""
    x = np.zeros(frames, np.float32)
    x[position] = np.float32(amp)
    return jnp.asarray(x)


def log_sweep(
    frames: int,
    rate: int,
    f0: float = 20.0,
    f1: float = 20000.0,
    amp: float = 0.5,
) -> jax.Array:
    """Exponential sine sweep (for SRC quality measurement; not in the reference
    UI but standard practice for verifying the replacement DSP core)."""
    t = np.arange(frames, dtype=np.float64) / rate
    dur = frames / rate
    k = np.log(f1 / f0)
    phase = 2.0 * np.pi * f0 * dur / k * (np.exp(t / dur * k) - 1.0)
    return jnp.asarray((amp * np.sin(np.mod(phase, 2.0 * np.pi))).astype(np.float32))
