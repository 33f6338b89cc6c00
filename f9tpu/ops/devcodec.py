"""On-device PCM codec: raw container bytes <-> float32, inside the XLA graph.

The host<->HBM streaming pipeline is the real "communication backend" of this
workload (SURVEY.md section 5): uploading decoded float32 costs 4 bytes per
sample and downloading int32 codes another 4, while the container holds 2-3.
These ops move the sample conversion onto the device so the host only parses
headers and fwrites payloads:

  upload   raw 16/24-bit interleaved PCM bytes (as uint8)
  unpack   -> planar float32 on device        (`unpack_pcm_interleaved`)
  ...fused SRC/dither/quantize graph...
  pack     planar int32 codes -> interleaved 24-bit bytes (`pack24_interleaved`)
  download uint8 payload, host writes header + payload

Byte order matches the WAV wire format (little-endian, frame-major
interleaving) so payloads concatenate directly into `data` chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["unpack_pcm_interleaved", "pack24_interleaved",
           "pack16_interleaved", "pack_interleaved", "bytes_per_frame"]


def bytes_per_frame(channels: int, bits: int) -> int:
    return channels * (bits // 8)


def unpack_pcm_interleaved(raw: jax.Array, channels: int, bits: int,
                           big_endian: bool = False) -> jax.Array:
    """uint8 ``(..., frames*channels*bits//8)`` -> float32 ``(..., channels, frames)``.

    Interleaved integer PCM, 16 or 24 bit.  Little-endian is the WAV wire
    format (the reference's input, Source/MainComponent.cpp:718-742);
    ``big_endian=True`` decodes AIFF "NONE" payloads — same bit math with
    the byte lanes reversed, zero extra cost.
    """
    nbytes = bits // 8
    lead = raw.shape[:-1]
    total = raw.shape[-1]
    frames = total // (channels * nbytes)
    # drop a trailing partial frame (truncated payload) like the host decoder
    raw = raw[..., : frames * channels * nbytes]
    b = raw.reshape(*lead, frames, channels, nbytes).astype(jnp.int32)
    lo, mid, hi = ((nbytes - 1, 1, 0) if big_endian else (0, 1, nbytes - 1))
    if bits == 16:
        v = b[..., lo] | (b[..., hi] << 8)
        v = (v << 16) >> 16  # sign extend
        x = v.astype(jnp.float32) * (1.0 / 32768.0)
    elif bits == 24:
        v = b[..., lo] | (b[..., mid] << 8) | (b[..., hi] << 16)
        v = (v << 8) >> 8
        x = v.astype(jnp.float32) * (1.0 / 8388608.0)
    else:
        raise ValueError(f"unsupported on-device bit depth {bits}")
    return jnp.swapaxes(x, -1, -2)  # (..., channels, frames)


def pack24_interleaved(codes: jax.Array) -> jax.Array:
    """int32 codes ``(..., channels, frames)`` -> uint8
    ``(..., frames*channels*3)`` little-endian interleaved 24-bit payload."""
    inter = jnp.swapaxes(codes, -1, -2)          # (..., frames, channels)
    v = inter.astype(jnp.uint32)
    b = jnp.stack(
        [
            (v & 0xFF).astype(jnp.uint8),
            ((v >> 8) & 0xFF).astype(jnp.uint8),
            ((v >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )                                            # (..., frames, channels, 3)
    lead = codes.shape[:-2]
    frames, channels = inter.shape[-2], inter.shape[-1]
    return b.reshape(*lead, frames * channels * 3)


def pack16_interleaved(codes: jax.Array) -> jax.Array:
    """int32 codes ``(..., channels, frames)`` -> uint8
    ``(..., frames*channels*2)`` little-endian interleaved 16-bit payload —
    the 16-bit twin of :func:`pack24_interleaved` (2 bytes/sample on the
    link instead of int32's 4; the WAV data-chunk byte layout, so the host
    writes header + payload)."""
    inter = jnp.swapaxes(codes, -1, -2)          # (..., frames, channels)
    v = inter.astype(jnp.uint32)
    b = jnp.stack(
        [
            (v & 0xFF).astype(jnp.uint8),
            ((v >> 8) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )                                            # (..., frames, channels, 2)
    lead = codes.shape[:-2]
    frames, channels = inter.shape[-2], inter.shape[-1]
    return b.reshape(*lead, frames * channels * 2)


def pack_interleaved(codes: jax.Array, bits: int) -> jax.Array:
    """Dispatch to the 16- or 24-bit on-device payload packer."""
    if bits == 24:
        return pack24_interleaved(codes)
    if bits == 16:
        return pack16_interleaved(codes)
    raise ValueError(f"no on-device payload packer for {bits}-bit output")
