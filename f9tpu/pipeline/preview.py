"""Preview engine: gapless playlist rendering with monitoring mixdown.

Offline-render form of the reference's preview path
(AudioProcessingService.swift:539-647): per file decode -> expand to the
selected output channel count -> concatenate with ``silenceBetweenFilesMs`` of
zeros between items (and wrap-around looping handled by the caller), rendered
simultaneously to the *selected output channels* and — when monitoring is on —
mixed down to channels 1+2 (the dual-render design,
_Swift Docs/Swift_claude.md:226-276; PreviewPlaybackContext.renderToChannels
AudioProcessingService.swift:742-876).

Instead of streaming through an RT callback, the whole playlist is produced as
one planar array (or written to a WAV), with per-item start offsets returned
so a UI can track progress.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io import codec
from ..ops.routing import stereo_pairs  # noqa: F401  (re-export convenience)

__all__ = ["PlaylistItem", "render_playlist"]


@dataclasses.dataclass
class PlaylistItem:
    path: str
    start_frame: int
    num_frames: int


def _expand_channels(x: np.ndarray, num_out: int) -> np.ndarray:
    """Mono -> N duplication; otherwise pad/truncate channel count
    (AudioProcessingService.swift:554-588)."""
    c = x.shape[0]
    if c == num_out:
        return x
    if c == 1:
        return np.broadcast_to(x, (num_out, x.shape[1])).copy()
    if c > num_out:
        return x[:num_out]
    out = np.zeros((num_out, x.shape[1]), x.dtype)
    out[:c] = x
    return out


def render_playlist(
    files: list[str],
    rate: int,
    silence_ms: int = 150,
    output_channels: int = 2,
    monitor: bool = False,
    loops: int = 1,
    target_channels: list[int] | None = None,
    monitor_channels: tuple[int, int] = (0, 1),
    quality: str = "high",
    kind: str = "sinc",
) -> tuple[np.ndarray, np.ndarray | None, list[PlaylistItem]]:
    """Render ``files`` into one gapless (channels, frames) array.

    Files not matching ``rate`` are resampled on device first (the TPU twist:
    preview of a mixed-rate library is exact, where the reference requires
    pre-matched rates).  ``loops`` renders the playlist wrap-around that many
    times with the silence gap between passes (the reference's looping
    playback, AudioProcessingService.swift:798-875).

    ``target_channels`` selects *which* channels of the ``output_channels``-
    wide bus receive the programme — the reference renders into the user's
    selected device channels, not always 0..N-1
    (PreviewPlaybackContext.renderToChannels,
    AudioProcessingService.swift:604-627,742-876).  Content is expanded to
    ``len(target_channels)`` and scattered onto those rows; unselected rows
    stay silent.  With ``monitor=True`` a stereo mixdown of the programme is
    returned separately, and — in bus-render mode (``target_channels`` set) —
    additionally *accumulated* onto ``monitor_channels`` of the same bus (the
    dual-render design — both renders share one output stream).  In plain
    mode there is no in-bus placement: ``main`` is the bare programme and
    non-default ``monitor_channels`` raise.  Returns
    (main, monitor_stereo|None, items).
    """
    from ..ops.resample import resample_rates
    from ..ops.routing import mixdown_monitor

    if target_channels is not None:
        tc = list(target_channels)
        if not tc:
            raise ValueError("target_channels must not be empty")
        if len(set(tc)) != len(tc):
            raise ValueError(f"duplicate target channels: {tc}")
        bad = [c for c in tc if not 0 <= c < output_channels]
        if bad:
            raise ValueError(
                f"target channels {bad} outside the {output_channels}-channel bus")
    else:
        tc = None
    if monitor:
        if len(tuple(monitor_channels)) != 2:
            raise ValueError("monitor_channels must be exactly two channels")
        if monitor_channels[0] == monitor_channels[1]:
            # numpy fancy-index accumulation with duplicate indices applies
            # only the LAST row (the left monitor send would silently vanish)
            raise ValueError("monitor_channels must be two DISTINCT channels")
        ml, mr = monitor_channels
        if not (0 <= ml < output_channels and 0 <= mr < output_channels):
            raise ValueError(
                f"monitor channels {monitor_channels} outside the "
                f"{output_channels}-channel bus")
        if tc is None and tuple(monitor_channels) != (0, 1):
            # in-bus monitor placement only exists in bus-render mode; the
            # plain mode returns the mixdown separately and leaves main alone
            raise ValueError(
                "monitor_channels placement requires target_channels "
                "(bus-render mode); plain previews return the mixdown "
                "separately")

    content_ch = len(tc) if tc is not None else output_channels
    silence = int(round(silence_ms * rate / 1000.0))
    rendered: list[np.ndarray] = []
    items: list[PlaylistItem] = []
    cursor = 0
    playlist = [p for _ in range(max(1, loops)) for p in files]
    decoded: dict[str, np.ndarray] = {}
    for i, path in enumerate(playlist):
        if path not in decoded:
            x, r = codec.read_audio(path)
            if r != rate:
                x = np.asarray(resample_rates(x, r, rate,
                                              quality=quality,
                                              kind=kind))
            decoded[path] = _expand_channels(x, content_ch)
        x = decoded[path]
        items.append(PlaylistItem(path=path, start_frame=cursor, num_frames=x.shape[1]))
        rendered.append(x)
        cursor += x.shape[1]
        if i != len(playlist) - 1 and silence > 0:
            rendered.append(np.zeros((content_ch, silence), np.float32))
            cursor += silence
    if not rendered:
        return np.zeros((output_channels, 0), np.float32), None, []
    programme = np.concatenate(rendered, axis=1)

    mon = None
    if monitor:
        import jax.numpy as jnp

        mon = np.asarray(mixdown_monitor(jnp.asarray(programme)))

    if tc is None:
        main = programme
    else:
        main = np.zeros((output_channels, programme.shape[1]), np.float32)
        main[tc] = programme
        if monitor:
            # dual render into the same stream: the mixdown accumulates onto
            # the monitoring channels (they may coincide with targets)
            main[list(monitor_channels)] += mon
    return main, mon, items
