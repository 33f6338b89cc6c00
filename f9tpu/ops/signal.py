"""Test-signal generators: sine, impulse, sweeps.

Device-side equivalents of the reference's generators:
- ``generateSineWave`` — phase-accumulating 1 kHz sine used by the hardware
  loop test (Source/MainComponent.cpp:907-930; Services/SineWaveGenerator.swift:35-59)
- ``generateImpulse`` — single-sample 0.9-amplitude impulse used for latency
  measurement (Source/MainComponent.cpp:932-945;
  Services/LatencyMeasurementService.swift:130-145)

Vectorised closed forms replace the sample loops; the phase-accumulator
semantics (phase wraps, continuous across blocks) are preserved by taking an
initial phase and returning the final phase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["sine", "impulse", "log_sweep"]

#: Reference defaults (HardwareLoopTestService / LatencyMeasurementService).
DEFAULT_TEST_FREQ = 1000.0
DEFAULT_TEST_AMP = 0.5
IMPULSE_AMP = 0.9


@functools.partial(jax.jit, static_argnames=("frames", "rate"))
def sine(
    frames: int,
    rate: int,
    freq: float = DEFAULT_TEST_FREQ,
    amp: float = DEFAULT_TEST_AMP,
    phase0: jax.Array | float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Return ``(samples (frames,), final_phase)``; phase in radians, wrapped.

    Matches the phase-accumulating generator of SineWaveGenerator.swift:35-59
    (continuity across blocks via phase0/final_phase).
    """
    two_pi = 2.0 * jnp.pi
    inc = two_pi * freq / rate
    n = jnp.arange(frames, dtype=jnp.float32)
    phase = jnp.asarray(phase0, jnp.float32) + n * inc
    samples = amp * jnp.sin(phase)
    final = jnp.mod(jnp.asarray(phase0, jnp.float32) + frames * inc, two_pi)
    return samples.astype(jnp.float32), final


@functools.partial(jax.jit, static_argnames=("frames",))
def impulse(frames: int, amp: float = IMPULSE_AMP, position: int = 0) -> jax.Array:
    """Single-sample impulse of ``amp`` at ``position``
    (LatencyMeasurementService.swift:130-145: 0.9 then silence)."""
    return (jnp.zeros(frames, jnp.float32)
            .at[position].set(jnp.float32(amp)))


@functools.partial(jax.jit, static_argnames=("frames", "rate"))
def log_sweep(
    frames: int,
    rate: int,
    f0: float = 20.0,
    f1: float = 20000.0,
    amp: float = 0.5,
) -> jax.Array:
    """Exponential sine sweep (for SRC quality measurement; not in the reference
    UI but standard practice for verifying the replacement DSP core)."""
    t = jnp.arange(frames, dtype=jnp.float32) / rate
    dur = frames / rate
    k = jnp.log(f1 / f0)
    phase = 2.0 * jnp.pi * f0 * dur / k * (jnp.exp(t / dur * k) - 1.0)
    return (amp * jnp.sin(phase)).astype(jnp.float32)
