"""Channel routing, fan-out, and interleave conversions.

The reference routes audio between arbitrary device channels: stereo-pair
selection (Source/AppState.h:328-373 — odd/even pair enumeration), per-stream
channel targeting in the HAL bridge (CAAudioBridge.swift:555-624), mono->stereo
fan-out on file load (Source/MainComponent.cpp:727-739), dual-render monitoring
to channels 1+2 (AudioProcessingService.swift:604-627), and MCFX-style 8/16
discrete-channel buses (Docs/MultiChannel MCFX with JUCE.md:85-163).

Layout here is planar ``(..., channels, frames)``; a routing map is a gather
over the channel axis, which shards cleanly (channel-axis sharding across
cores, SURVEY.md section 2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "stereo_pairs",
    "route_channels",
    "fan_out_mono",
    "mixdown_monitor",
    "interleave",
    "deinterleave",
]


def stereo_pairs(num_channels: int) -> list[tuple[int, int]]:
    """Odd/even (0-indexed) channel pair enumeration, mirroring the device-pair
    pickers (Source/AppState.h:328-373; Models/AudioDevice.swift:33-44)."""
    return [(c, c + 1) for c in range(0, num_channels - 1, 2)]


def route_channels(x: jax.Array, routing: np.ndarray | list[int], num_out: int | None = None) -> jax.Array:
    """Gather/scatter channels: ``routing[i]`` is the source channel for output
    channel ``i`` (-1 = silence).  ``x``: (..., channels, frames).

    Replaces the bridge's per-channel scratch marshalling
    (CAAudioBridge.swift:555-624) with one gather over the channel axis.
    """
    routing = np.asarray(routing, dtype=np.int32)
    if num_out is None:
        num_out = len(routing)
    if num_out != len(routing):
        # honour the requested output bus width: extra channels are silence,
        # extra map entries are dropped
        padded = np.full(num_out, -1, np.int32)
        padded[: min(num_out, len(routing))] = routing[:num_out]
        routing = padded
    c_in = int(x.shape[-2])
    if routing.size and int(routing.max()) >= c_in:
        # validate at trace time: jnp.take's out-of-range fill would write
        # NaN rows into the output audio with no error
        raise ValueError(
            f"routing entry {int(routing.max())} out of range for a "
            f"{c_in}-channel input")
    src = jnp.asarray(np.where(routing < 0, 0, routing))
    out = jnp.take(x, src, axis=-2)
    silent = jnp.asarray((routing < 0).reshape(-1, 1))
    return jnp.where(silent, 0.0, out)


def fan_out_mono(x: jax.Array, num_channels: int) -> jax.Array:
    """Mono (..., frames) -> (..., num_channels, frames) duplication
    (mono->stereo read path, Source/MainComponent.cpp:727-739)."""
    return jnp.broadcast_to(
        x[..., None, :], (*x.shape[:-1], num_channels, x.shape[-1])
    )


def mixdown_monitor(x: jax.Array) -> jax.Array:
    """(..., channels, frames) -> (..., 2, frames) monitoring feed on channels
    1+2 (the preview dual-render path, AudioProcessingService.swift:604-627):
    first two channels pass through; >2 channels are averaged in pairs onto L/R."""
    c = x.shape[-2]
    if c == 1:
        return fan_out_mono(x[..., 0, :], 2)
    if c == 2:
        return x
    left = jnp.mean(x[..., 0::2, :], axis=-2)
    right = jnp.mean(x[..., 1::2, :], axis=-2)
    return jnp.stack([left, right], axis=-2)


def interleave(x: jax.Array) -> jax.Array:
    """(..., channels, frames) -> (..., frames*channels) interleaved, the wire
    format of the reference's callbacks (CAAudioBridge.swift:555-624)."""
    moved = jnp.swapaxes(x, -1, -2)  # (..., frames, channels)
    return moved.reshape(*x.shape[:-2], x.shape[-1] * x.shape[-2])


def deinterleave(x: jax.Array, num_channels: int) -> jax.Array:
    """Inverse of :func:`interleave`."""
    if x.shape[-1] % num_channels:
        # a torn/partial interleaved buffer must raise, not silently drop
        # its trailing samples
        raise ValueError(
            f"interleaved length {x.shape[-1]} is not a multiple of "
            f"{num_channels} channels")
    frames = x.shape[-1] // num_channels
    return jnp.swapaxes(x.reshape(*x.shape[:-1], frames, num_channels), -1, -2)
