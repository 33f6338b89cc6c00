"""Sharded execution paths: files-axis data parallelism and frames-axis
overlap-save sequence parallelism with ICI halo exchange.

The reference's concurrency is a single RT audio thread against a message
thread (SURVEY.md section 2.4); its TPU replacements:

- **files axis (DP)**: a batch ``(files, channels, frames)`` sharded over
  chips; the fused graph (`f9tpu.pipeline.graph`) is pure data parallel —
  XLA inserts no collectives beyond the metric all-gathers.

- **frames axis (SP)**: one huge file split across chips as contiguous frame
  chunks.  FIR resampling needs only a local halo (pad_front frames from the
  left neighbour, W-M-pad_front from the right), exchanged with a single
  ``ppermute`` each way per step (SURVEY.md section 5 'long-context':
  overlap-save with halo = taps/2 instead of ring attention).

- **channels axis (TP analog)**: MCFX 8/16-channel buses sharded over chips;
  routing gathers stay local because routing maps are per-bus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.filters import CycleBank, design_cycle_bank
from ..ops.resample import resample, resample_presliced

__all__ = [
    "process_files_sharded",
    "resample_frames_sharded",
    "required_frames_padding",
    "shard_halos",
]


def process_files_sharded(mesh: Mesh, fn, x, *args):
    """Run ``fn(x, *args)`` with ``x`` (files, channels, frames) sharded over
    the mesh's ``files`` axis; other args replicated.

    Pure data parallelism: files are independent
    (the 'embarrassingly parallel' row of SURVEY.md section 2.4).
    """
    xs = jax.device_put(x, NamedSharding(mesh, P("files", None, None)))
    return jax.jit(fn)(xs, *args)


def shard_halos(bank: CycleBank) -> tuple[int, int]:
    """(halo_left, halo_right) in input frames for overlap-save sharding."""
    halo_left = bank.pad_front
    halo_right = max(0, bank.W - bank.M - halo_left)
    return halo_left, halo_right


def required_frames_padding(in_len: int, bank: CycleBank, n_shards: int) -> int:
    """Pad so the input splits into ``n_shards`` equal chunks of whole cycles
    that are each at least one filter halo long (the minimum
    `resample_frames_sharded` accepts)."""
    unit = n_shards * bank.M
    min_chunk_cycles = -(-max(shard_halos(bank)) // bank.M)
    min_len = n_shards * max(1, min_chunk_cycles) * bank.M
    padded = max(min_len, in_len + ((-in_len) % unit))
    return padded - in_len


@functools.partial(
    jax.jit, static_argnames=("rate_in", "rate_out", "quality", "kind", "mesh")
)
def resample_frames_sharded(
    x: jax.Array,
    rate_in: int,
    rate_out: int,
    mesh: Mesh,
    quality: str = "high",
    kind: str = "sinc",
) -> jax.Array:
    """Resample ``x`` (..., frames) with the frames axis sharded over the
    mesh's ``frames`` axis (overlap-save + ppermute halo exchange).

    The frames length must already be a multiple of n_shards * M (use
    `required_frames_padding`).  Output length is frames * L / M (exact).
    """
    bank = design_cycle_bank(rate_in, rate_out, quality=quality, kind=kind)
    L, M, W = bank.L, bank.M, bank.W
    n = mesh.shape["frames"]
    T = x.shape[-1]
    if T % (n * M):
        raise ValueError(f"frames {T} not a multiple of shards*M = {n * M}")
    # halo_right is clamped at 0: for heavy downsampling (small taps vs M,
    # e.g. lagrange beyond ~3x) W - M - halo_left goes negative, and an
    # unclamped value would ppermute nearly a whole chunk of useless frames.
    halo_left, halo_right = shard_halos(bank)
    chunk = T // n
    if max(halo_left, halo_right) > chunk:
        # resample_presliced's length check would reject this anyway (the
        # clipped halo slices leave xp shorter than one tile needs); raise
        # here with an actionable message instead of a shape error
        raise ValueError(
            f"per-shard chunk of {chunk} frames is smaller than the filter "
            f"halo ({max(halo_left, halo_right)}); use fewer frames shards "
            f"or pad the input (see required_frames_padding)")

    def local(xc):
        # xc: (..., T/n) local chunk.  Fetch halos from neighbours.
        axis = "frames"
        nsh = jax.lax.axis_size(axis)
        # left halo: my leading `halo_left` frames come from the left
        # neighbour's tail -> shift tails one step to the RIGHT.
        send_right = [(i, i + 1) for i in range(nsh - 1)]
        left_halo = jax.lax.ppermute(
            xc[..., -halo_left:], axis, send_right) if halo_left else None
        # right halo: my trailing lookahead comes from the right neighbour's
        # head -> shift heads one step to the LEFT.
        send_left = [(i + 1, i) for i in range(nsh - 1)]
        right_halo = jax.lax.ppermute(
            xc[..., :halo_right], axis, send_left) if halo_right else None
        parts = []
        if left_halo is not None:
            parts.append(left_halo)  # ppermute fills missing sources with 0
        parts.append(xc)
        if right_halo is not None:
            parts.append(right_halo)
        xp = jnp.concatenate(parts, axis=-1)
        cycles = xc.shape[-1] // M
        return resample_presliced(xp, bank, cycles)

    spec = P(*([None] * (x.ndim - 1) + ["frames"]))
    return shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
