"""MPEG audio (MP3/MP2/MP1) decoder — spec-complete, from scratch.

The reference's Swift shell reads anything ``AVAudioFile`` accepts
(`/root/reference/_Swift Code/F9-Batch-Resampler/Models/AudioFile.swift:38`),
which includes MPEG Layer I/II/III sources; the JUCE shell's drop-zone
filter likewise lists the OS-decodable formats
(Source/FileListAndLogComponent.cpp:150-181).  This module closes that
input-surface gap the way `io/vorbis.py` and `io/alac.py` did: a readable
pure-Python/numpy decoder that IS the spec oracle, cross-checked against
libmpg123 and libavcodec in tests (test-only bindings — the product never
touches those libraries), with the serial integer front half mirrored by
a bit-identical native C++ twin (`f9native.cpp`).

Scope: MPEG-1, MPEG-2 and MPEG-2.5, Layers I, II and III, mono and all
stereo modes (MS + both intensity-stereo flavours), the bit reservoir,
free-format streams, ID3v2/ID3v1/APE tag skipping, and Xing/LAME/Info
gapless trim (encoder delay + padding), so decoded lengths are
sample-exact for tagged files.  MPEG output formats stay rejected
(`io/codec.py`): perceptual-lossy deliverables are pointless in a
mastering pipeline; these are *inputs*.

Constant tables live in `mp3tables.py` (published ISO data; see its
docstring).  All spectral math is float64 until the final float32 cast.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .mp3tables import (ALIAS_CA, ALIAS_CS, BAND_LONG, BAND_SHORT, BITRATES,
                        HUFF_SELECT, HUFF_TABLES, L2_BITS, L2_STEPS,
                        LSF_NSFB, PRETAB, QUAD_A, QUAD_B, SAMPLE_RATES,
                        SCALEFACTORS, SLEN, SYNTH_MATRIX, SYNTH_WINDOW,
                        l2_table)

__all__ = ["Mp3Error", "probe_mp3", "read_mp3", "Mp3Reader"]


class Mp3Error(ValueError):
    pass


# --------------------------------------------------------------------------
# bit reader (MSB first)


class _Bits:
    __slots__ = ("d", "pos")

    def __init__(self, data, pos_bits: int = 0):
        self.d = data
        self.pos = pos_bits

    def read(self, k: int) -> int:
        p = self.pos
        self.pos = p + k
        v = 0
        d = self.d
        while k > 0:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = avail if avail < k else k
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
            k -= take
        return v

    def read1(self) -> int:
        p = self.pos
        self.pos = p + 1
        return (self.d[p >> 3] >> (7 - (p & 7))) & 1


# --------------------------------------------------------------------------
# frame headers


@dataclass(frozen=True)
class FrameHeader:
    version: int          # 3 = MPEG-1, 2 = MPEG-2, 0 = MPEG-2.5
    layer: int            # 1 | 2 | 3
    crc: bool
    bitrate: int          # bits/s; 0 = free format
    rate: int
    padding: int
    mode: int             # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext: int

    @property
    def lsf(self) -> bool:
        return self.version != 3

    @property
    def channels(self) -> int:
        return 1 if self.mode == 3 else 2

    @property
    def samples(self) -> int:
        if self.layer == 1:
            return 384
        if self.layer == 2:
            return 1152
        return 576 if self.lsf else 1152

    def frame_bytes(self) -> int:
        """Frame length including header; 0 for free format (resolved by
        the scanner from the next sync)."""
        if self.bitrate == 0:
            return 0
        if self.layer == 1:
            return 4 * (12 * self.bitrate // self.rate + self.padding)
        per = 72 if (self.layer == 3 and self.lsf) else 144
        return per * self.bitrate // self.rate + self.padding

    def compatible(self, other: "FrameHeader") -> bool:
        # mode may legally vary frame to frame (stereo <-> joint in VBR
        # streams; the Xing tag frame often differs from the audio frames)
        # but the channel COUNT, version, layer and rate are stream-fixed.
        return (self.version == other.version and self.layer == other.layer
                and self.rate == other.rate
                and self.channels == other.channels)


def _parse_header(b, off: int):
    if off + 4 > len(b) or b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
        return None
    version = (b[off + 1] >> 3) & 3
    if version == 1:
        return None
    layer_code = (b[off + 1] >> 1) & 3
    if layer_code == 0:
        return None
    layer = 4 - layer_code
    if version == 0 and layer != 3:
        return None                      # MPEG-2.5 defines Layer III only
    br_idx = (b[off + 2] >> 4) & 15
    if br_idx == 15:
        return None
    sr_idx = (b[off + 2] >> 2) & 3
    if sr_idx == 3:
        return None
    rate = SAMPLE_RATES[version][sr_idx]
    mpeg1 = version == 3
    bitrate = 0
    if br_idx:
        bitrate = BITRATES[(mpeg1, layer)][br_idx - 1] * 1000
    return FrameHeader(
        version=version, layer=layer, crc=not ((b[off + 1]) & 1),
        bitrate=bitrate, rate=rate, padding=(b[off + 2] >> 1) & 1,
        mode=(b[off + 3] >> 6) & 3, mode_ext=(b[off + 3] >> 4) & 3)


def _skip_id3v2(b, off: int) -> int:
    while (off + 10 <= len(b) and b[off:off + 3] == b"ID3"
           and b[off + 3] != 0xFF and b[off + 4] != 0xFF):
        size = ((b[off + 6] & 0x7F) << 21) | ((b[off + 7] & 0x7F) << 14) \
            | ((b[off + 8] & 0x7F) << 7) | (b[off + 9] & 0x7F)
        off += 10 + size + (10 if b[off + 5] & 0x10 else 0)
    return off


def _data_end(b) -> int:
    """File end minus trailing ID3v1 / APEv2 tags."""
    end = len(b)
    if end >= 128 and b[end - 128:end - 125] == b"TAG":
        end -= 128
    if end >= 32:
        idx = b.rfind(b"APETAGEX", max(0, end - (1 << 20)), end)
        if idx >= 0:
            size = int.from_bytes(b[idx + 12:idx + 16], "little")
            has_hdr = b[idx + 23] & 0x80
            start = idx - (32 if has_hdr else 0) if idx + 32 - 8 else idx
            tag_start = idx + 32 + size - 8 - size  # footer covers size
            # APE size covers items+footer; header (32) extra if flagged
            tag_start = idx + 32 - size - (32 if has_hdr else 0) + size - 32
            # conservative: only trim when the tag runs to the end
            total = size + (32 if has_hdr else 0)
            if idx + 32 >= end - 4:      # footer at file end
                end = max(0, end - total)
    return end


def _scan_frames(b, path: str):
    """Walk the stream: returns (frames [(offset, header, nbytes)], or
    raises).  Free-format sizes are resolved from the first inter-sync
    distance.  False syncs are rejected by requiring the next header to
    parse and be field-compatible."""
    off = _skip_id3v2(b, 0)
    end = _data_end(b)
    frames = []
    ref = None
    free_size = 0
    while off + 4 <= end:
        h = _parse_header(b, off)
        if h is None or (ref is not None and not ref.compatible(h)):
            if ref is None:
                off += 1
                continue
            off += 1
            continue
        nbytes = h.frame_bytes()
        if nbytes == 0:                  # free format
            if free_size == 0:
                nxt = off + 4
                while nxt + 4 <= end:
                    h2 = _parse_header(b, nxt)
                    if h2 is not None and h.compatible(h2):
                        break
                    nxt += 1
                if nxt + 4 > end:
                    raise Mp3Error(f"{path}: free-format stream with a "
                                   "single frame")
                free_size = nxt - off - h.padding * (4 if h.layer == 1 else 1)
            nbytes = free_size + h.padding * (4 if h.layer == 1 else 1)
        if ref is None:
            # validate the sync: the next frame must also parse
            nxt_off = off + nbytes
            if nxt_off + 4 <= end:
                h2 = _parse_header(b, nxt_off)
                if h2 is None or not h.compatible(h2):
                    off += 1
                    continue
            ref = h
        if off + nbytes > end:
            break                        # truncated final frame: drop
        frames.append((off, h, nbytes))
        off += nbytes
    if not frames:
        raise Mp3Error(f"{path}: no MPEG audio frames found")
    return frames


# --------------------------------------------------------------------------
# Xing / LAME / VBRI gapless info


@dataclass
class _StreamInfo:
    tag_frame: bool = False      # first frame is a Xing/Info/VBRI header
    delay: int = 0               # encoder delay (samples)
    padding: int = 0             # encoder padding (samples)
    frames: int = 0              # frame count claimed by the tag (0 = none)


def _parse_tag(b, off: int, h: FrameHeader, nbytes: int) -> _StreamInfo:
    si = _StreamInfo()
    side = (9 if h.channels == 1 else 17) if h.lsf else \
        (17 if h.channels == 1 else 32)
    p = off + 4 + (2 if h.crc else 0) + side
    if b[p:p + 4] in (b"Xing", b"Info"):
        si.tag_frame = True
        flags = int.from_bytes(b[p + 4:p + 8], "big")
        q = p + 8
        if flags & 1:
            si.frames = int.from_bytes(b[q:q + 4], "big")
            q += 4
        if flags & 2:
            q += 4
        if flags & 4:
            q += 100
        if flags & 8:
            q += 4
        # LAME/Lavc extension: 9-byte encoder string, then delay/padding
        # packed in 3 bytes at offset 21 of the extension block
        lame = b[q:q + 36]
        if len(lame) >= 24:
            delay = (lame[21] << 4) | (lame[22] >> 4)
            pad = ((lame[22] & 15) << 8) | lame[23]
            if delay <= 4095 and pad <= 4095 and (delay or pad):
                si.delay, si.padding = delay, pad
    elif b[off + 4 + (2 if h.crc else 0) + 32:
           off + 4 + (2 if h.crc else 0) + 36] == b"VBRI":
        si.tag_frame = True
        v = off + 4 + (2 if h.crc else 0) + 32
        si.frames = int.from_bytes(b[v + 14:v + 18], "big")
    return si


# --------------------------------------------------------------------------
# synthesis filterbank (shared by all three layers)


_SYNTH_DA = SYNTH_WINDOW.reshape(8, 64)[:, :32].copy()    # (8, 32)
_SYNTH_DB = SYNTH_WINDOW.reshape(8, 64)[:, 32:].copy()
_SYNTH_ROWS: dict = {}


def _synth_rows(T: int):
    """Gather-row indices (8, T) for the windowed shift structure."""
    r = _SYNTH_ROWS.get(T)
    if r is None:
        b = np.arange(8)[:, None]
        t = np.arange(T)[None, :]
        r = ((15 - 2 * b) + t, (14 - 2 * b) + t)
        _SYNTH_ROWS[T] = r
    return r


class _Synth:
    """Polyphase synthesis (ISO 11172-3 2.4.3.2), vectorised over a whole
    granule of subband steps.  State: the last 15 matrixed V blocks.
    One gather + two reductions replace the 8-tap shift loop:
    U[64b + j] = V_{t-2b}[j], U[64b + 32 + j] = V_{t-2b-1}[32 + j]."""

    def __init__(self, channels: int):
        self.v = np.zeros((channels, 15, 64))

    def run(self, ch: int, S: np.ndarray) -> np.ndarray:
        """S: (T, 32) subband samples -> (T*32,) PCM."""
        T = S.shape[0]
        V = np.concatenate([self.v[ch], S @ SYNTH_MATRIX.T], axis=0)
        self.v[ch] = V[-15:]
        ra, rb = _synth_rows(T)
        out = (V[ra, :32] * _SYNTH_DA[:, None, :]).sum(0)
        out += (V[rb, 32:] * _SYNTH_DB[:, None, :]).sum(0)
        return out.reshape(-1)


# --------------------------------------------------------------------------
# Layer III


def _imdct_mats():
    n = np.arange(36)[:, None]
    k = np.arange(18)[None, :]
    m36 = np.cos(np.pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1))
    n = np.arange(12)[:, None]
    k = np.arange(6)[None, :]
    m12 = np.cos(np.pi / 24.0 * (2 * n + 1 + 6) * (2 * k + 1))
    return m36, m12


_M36, _M12 = _imdct_mats()
_WIN_NORM = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))
_WIN_SHORT = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))
_WIN_START = _WIN_NORM.copy()
_WIN_START[18:24] = 1.0
_WIN_START[24:30] = np.sin(np.pi / 12.0 * (np.arange(24, 30) - 18 + 0.5))
_WIN_START[30:] = 0.0
_WIN_STOP = _WIN_NORM.copy()
_WIN_STOP[:6] = 0.0
_WIN_STOP[6:12] = np.sin(np.pi / 12.0 * (np.arange(6, 12) - 6 + 0.5))
_WIN_STOP[12:18] = 1.0
_BT_WINDOWS = {0: _WIN_NORM, 1: _WIN_START, 3: _WIN_STOP}

# frequency inversion mask for one granule: (32 subbands, 18 samples)
_FREQINV = np.ones((32, 18))
_FREQINV[1::2, 1::2] = -1.0


@dataclass
class _Granule:
    part2_3_length: int = 0
    big_values: int = 0
    global_gain: int = 0
    scalefac_compress: int = 0
    window_switching: bool = False
    block_type: int = 0
    mixed: bool = False
    table_select: tuple = (0, 0, 0)
    subblock_gain: tuple = (0, 0, 0)
    region0_count: int = 0
    region1_count: int = 0
    preflag: int = 0
    scalefac_scale: int = 0
    count1table: int = 0


def _parse_side_mpeg1(br: _Bits, channels: int):
    main_data_begin = br.read(9)
    br.read(5 if channels == 1 else 3)
    scfsi = [[br.read1() for _ in range(4)] for _ in range(channels)]
    grs = []
    for _gr in range(2):
        row = []
        for _ch in range(channels):
            g = _Granule()
            g.part2_3_length = br.read(12)
            g.big_values = br.read(9)
            g.global_gain = br.read(8)
            g.scalefac_compress = br.read(4)
            g.window_switching = bool(br.read1())
            if g.window_switching:
                g.block_type = br.read(2)
                g.mixed = bool(br.read1())
                g.table_select = (br.read(5), br.read(5), 0)
                g.subblock_gain = (br.read(3), br.read(3), br.read(3))
                g.region0_count = 8 if (g.block_type == 2 and not g.mixed) \
                    else 7
                g.region1_count = 20          # region2 empty
            else:
                g.table_select = (br.read(5), br.read(5), br.read(5))
                g.region0_count = br.read(4)
                g.region1_count = br.read(3)
            g.preflag = br.read1()
            g.scalefac_scale = br.read1()
            g.count1table = br.read1()
            row.append(g)
        grs.append(row)
    return main_data_begin, scfsi, grs


def _parse_side_lsf(br: _Bits, channels: int):
    main_data_begin = br.read(8)
    br.read(1 if channels == 1 else 2)
    row = []
    for _ch in range(channels):
        g = _Granule()
        g.part2_3_length = br.read(12)
        g.big_values = br.read(9)
        g.global_gain = br.read(8)
        g.scalefac_compress = br.read(9)
        g.window_switching = bool(br.read1())
        if g.window_switching:
            g.block_type = br.read(2)
            g.mixed = bool(br.read1())
            g.table_select = (br.read(5), br.read(5), 0)
            g.subblock_gain = (br.read(3), br.read(3), br.read(3))
            g.region0_count = 8 if (g.block_type == 2 and not g.mixed) else 7
            g.region1_count = 20
        else:
            g.table_select = (br.read(5), br.read(5), br.read(5))
            g.region0_count = br.read(4)
            g.region1_count = br.read(3)
        g.scalefac_scale = br.read1()
        g.count1table = br.read1()
        row.append(g)
    return main_data_begin, [[0, 0, 0, 0] for _ in range(channels)], [row]


def _read_scalefacs_mpeg1(br: _Bits, g: _Granule, scfsi, prev, gr: int):
    """Returns (sf_long[22], sf_short[13][3], part2_bits)."""
    slen1, slen2 = SLEN[g.scalefac_compress]
    sfl = np.zeros(22, np.int32)
    sfs = np.zeros((13, 3), np.int32)
    bits = 0
    if g.window_switching and g.block_type == 2:
        if g.mixed:
            for sfb in range(8):
                sfl[sfb] = br.read(slen1)
            bits += 8 * slen1
            for sfb in range(3, 6):
                for w in range(3):
                    sfs[sfb, w] = br.read(slen1)
            bits += 9 * slen1
        else:
            for sfb in range(6):
                for w in range(3):
                    sfs[sfb, w] = br.read(slen1)
            bits += 18 * slen1
        for sfb in range(6, 12):
            for w in range(3):
                sfs[sfb, w] = br.read(slen2)
        bits += 18 * slen2
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2),
                  (16, 21, slen2)]
        for gi, (a, b, sl) in enumerate(groups):
            if gr == 1 and scfsi[gi]:
                sfl[a:b] = prev[a:b]
            else:
                for sfb in range(a, b):
                    sfl[sfb] = br.read(sl)
                bits += (b - a) * sl
    return sfl, sfs, bits


def _lsf_slens(g: _Granule, intensity: bool):
    """ISO 13818-3 2.4.3.2: -> (slen[4], nsfb-table row, preflag)."""
    sc = g.scalefac_compress
    if not intensity:
        if sc < 400:
            slen = ((sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3)
            btn, pre = 0, 0
        elif sc < 500:
            c = sc - 400
            slen = ((c >> 2) // 5, (c >> 2) % 5, c & 3, 0)
            btn, pre = 1, 0
        else:
            c = sc - 500
            slen = (c // 3, c % 3, 0, 0)
            btn, pre = 2, 1
    else:
        isc = sc >> 1
        if isc < 180:
            slen = (isc // 36, (isc % 36) // 6, isc % 6, 0)
            btn, pre = 3, 0
        elif isc < 244:
            c = isc - 180
            slen = ((c & 63) >> 4, (c & 15) >> 2, c & 3, 0)
            btn, pre = 4, 0
        else:
            c = isc - 244
            slen = (c // 3, c % 3, 0, 0)
            btn, pre = 5, 0
    arr = 0 if not (g.window_switching and g.block_type == 2) else \
        (2 if g.mixed else 1)
    return slen, LSF_NSFB[btn][arr], pre


def _read_scalefacs_lsf(br: _Bits, g: _Granule, intensity: bool):
    """-> (sf_long[22], sf_short[13][3], part2_bits, illegal[4] markers)."""
    slen, nsfb, pre = _lsf_slens(g, intensity)
    g.preflag = pre
    vals = []
    groups = []
    bits = 0
    for gi in range(4):
        for _ in range(nsfb[gi]):
            vals.append(br.read(slen[gi]) if slen[gi] else 0)
            groups.append(gi)
        bits += nsfb[gi] * slen[gi]
    illegal = [(1 << slen[gi]) - 1 if slen[gi] else -1 for gi in range(4)]
    sfl = np.zeros(22, np.int32)
    sfs = np.zeros((13, 3), np.int32)
    gl = np.zeros(22, np.int32)
    gs = np.zeros((13, 3), np.int32)
    i = 0
    if g.window_switching and g.block_type == 2:
        if g.mixed:
            for sfb in range(6):
                sfl[sfb] = vals[i]; gl[sfb] = groups[i]; i += 1
            for sfb in range(3, 12):
                for w in range(3):
                    sfs[sfb, w] = vals[i]; gs[sfb, w] = groups[i]; i += 1
        else:
            for sfb in range(12):
                for w in range(3):
                    sfs[sfb, w] = vals[i]; gs[sfb, w] = groups[i]; i += 1
    else:
        for sfb in range(min(21, len(vals))):
            sfl[sfb] = vals[i]; gl[sfb] = groups[i]; i += 1
    return sfl, sfs, bits, (illegal, gl, gs)


def _hregions(g: _Granule, hdr: FrameHeader):
    """Big-values region line boundaries -> (big_end, r1, r2), clamped.

    For window-switching granules the split is implicit (ISO 2.4.2.7 /
    13818-3), in terms of the ACTUAL band tables: pure short granules end
    region0 after the first three short scalefactor bands (x3 windows);
    start/stop and mixed granules end it after long band 8.  Both give
    the familiar 36 at MPEG-1 rates; at LSF rates they differ (54; and
    72/108 at MPEG-2.5 8 kHz) — verified against libavcodec on 8 kHz
    streams, where a fixed 36 misparses the Huffman stream entirely."""
    bounds = np.cumsum([0] + BAND_LONG[hdr.rate])
    big_end = min(2 * g.big_values, 576)
    if g.window_switching:
        if g.block_type == 2 and not g.mixed:
            bs = BAND_SHORT[hdr.rate]
            r1 = 3 * (bs[0] + bs[1] + bs[2])
        else:
            r1 = int(bounds[8])
        r2 = 576
    else:
        r1 = int(bounds[min(g.region0_count + 1, 22)])
        r2 = int(bounds[min(g.region0_count + g.region1_count + 2, 22)])
    return big_end, min(r1, big_end), min(r2, big_end)


_NATIVE = None


def _native_mod():
    """The native C++ twin of `_huffman_decode` (f9native.cpp
    f9_mp3_huffman — bit-identical by construction, dual-path tested), or
    None when the toolchain is unavailable."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from f9tpu import native

            _NATIVE = native if native.mp3_huff_available() else False
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def _huffman_eval(data, pos: int, end: int, g: _Granule, hdr: FrameHeader):
    """Dispatch one granule-channel Huffman walk to the native twin when
    available, else the Python oracle below.  Same (is_, rzero, pos)
    triple, same Mp3Error conditions, on both paths."""
    nat = _native_mod()
    if nat is None:
        return _huffman_decode(data, pos, end, g, hdr)
    big_end, r1, r2 = _hregions(g, hdr)
    tids = []
    linbs = []
    for t in g.table_select:
        tbl, lb = HUFF_SELECT[t]
        tids.append(-1 if tbl is None else tbl)
        linbs.append(lb)
    try:
        return nat.mp3_huffman_native(data, pos, end, big_end, r1, r2,
                                      tids, linbs, g.count1table)
    except ValueError:
        raise Mp3Error("bad Huffman code") from None


def _huffman_decode(data, pos: int, end: int, g: _Granule, hdr: FrameHeader):
    """Decode big-values + count1 regions -> (is_[576] int32, rzero, pos)."""
    is_ = np.zeros(576, np.int32)
    big_end, r1, r2 = _hregions(g, hdr)
    regions = [(0, r1, g.table_select[0]), (r1, r2, g.table_select[1]),
               (r2, big_end, g.table_select[2])]
    d = data
    for start, stop, tsel in regions:
        if stop <= start:
            continue
        tbl_id, linbits = HUFF_SELECT[tsel]
        if tbl_id is None:
            raise Mp3Error("reserved Huffman table in frame")
        if tbl_id == 0:
            continue                     # table 0: all zeros
        table = HUFF_TABLES[tbl_id]
        for line in range(start, stop, 2):
            code = 0
            length = 0
            while True:
                code = (code << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1)
                pos += 1
                length += 1
                hit = table.get((length, code))
                if hit is not None:
                    break
                if length > 19 or pos >= end + 19:
                    raise Mp3Error("bad Huffman code")
            x, y = hit
            if x == 15 and linbits:
                ext = 0
                for _ in range(linbits):
                    ext = (ext << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1)
                    pos += 1
                x += ext
            if x:
                if (d[pos >> 3] >> (7 - (pos & 7))) & 1:
                    x = -x
                pos += 1
            is_[line] = x
            if y == 15 and linbits:
                ext = 0
                for _ in range(linbits):
                    ext = (ext << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1)
                    pos += 1
                y += ext
            if y:
                if (d[pos >> 3] >> (7 - (pos & 7))) & 1:
                    y = -y
                pos += 1
            is_[line + 1] = y
    # count1 region
    table = QUAD_B if g.count1table else QUAD_A
    line = big_end
    while pos < end and line < 576:
        code = 0
        length = 0
        start_pos = pos
        v = None
        while length < 7:
            code = (code << 1) | ((d[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
            length += 1
            v = table.get((length, code))
            if v is not None:
                break
        if v is None:
            raise Mp3Error("bad count1 code")
        quad = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
        for k, q in enumerate(quad):
            if q:
                if (d[pos >> 3] >> (7 - (pos & 7))) & 1:
                    q = -q
                pos += 1
            if line + k < 576:
                is_[line + k] = q
        if pos > end:
            # the final quad overran part2_3_length: discard it (the
            # encoder's padding bits happened to look like a codeword)
            is_[line:line + 4] = 0
            pos = start_pos
            break
        line += 4
    rzero = min(line, 576)
    while rzero > 0 and is_[rzero - 1] == 0:
        rzero -= 1
    return is_, rzero, pos


# |is_| <= 15 + 2^13 - 1 (linbits cap); x^(4/3) and 2^(q/4) as lookups —
# same numpy ops at table-build time, so values are bitwise what the
# elementwise forms produced
_POW43 = np.arange(8207, dtype=np.float64) ** (4.0 / 3.0)
_EXP2Q_OFF = 512
_EXP2Q = np.exp2(np.arange(-_EXP2Q_OFF, 64) / 4.0)

_REQ_LONG: dict = {}      # rate -> (576,) long sfb index per line
_REQ_SHORT: dict = {}     # (rate, mixed) -> (TGT, SRC, SFB, WIN, nlong)


def _req_long_idx(rate: int) -> np.ndarray:
    m = _REQ_LONG.get(rate)
    if m is None:
        m = np.repeat(np.arange(22), BAND_LONG[rate])
        _REQ_LONG[rate] = m
    return m


def _req_short_maps(rate: int, mixed: bool):
    key = (rate, mixed)
    m = _REQ_SHORT.get(key)
    if m is None:
        widths = BAND_SHORT[rate]
        bs = np.cumsum([0] + widths)
        tgt, src_i, sfb_i, win_i = [], [], [], []
        src = 36 if mixed else 0
        for sfb in range(3 if mixed else 0, 13):
            w = widths[sfb]
            base3 = 3 * int(bs[sfb])
            for win in range(3):
                for line in range(w):
                    tgt.append(base3 + 3 * line + win)
                    src_i.append(src + line)
                    sfb_i.append(sfb)
                    win_i.append(win)
                src += w
            if src >= 576:
                break
        m = (np.asarray(tgt), np.asarray(src_i), np.asarray(sfb_i),
             np.asarray(win_i), 36 if mixed else 0)
        _REQ_SHORT[key] = m
    return m


def _requantize(is_: np.ndarray, g: _Granule, hdr: FrameHeader,
                sfl: np.ndarray, sfs: np.ndarray):
    """ISO 2.4.3.4 requantization + short-block reordering -> xr[576]."""
    shift = 2 * (1 + g.scalefac_scale)
    sgn = np.sign(is_).astype(np.float64)
    mag = _POW43[np.abs(is_)]
    base = g.global_gain - 210
    pre = PRETAB * g.preflag
    if g.window_switching and g.block_type == 2:
        tgt, src, sfb_i, win_i, nlong = _req_short_maps(hdr.rate, g.mixed)
        xr = np.zeros(576)
        if nlong:
            # first two subbands (36 lines) stay long in mixed blocks
            lidx = _req_long_idx(hdr.rate)[:nlong]
            q = base - shift * (sfl[lidx] + pre[lidx])
            xr[:nlong] = sgn[:nlong] * mag[:nlong] \
                * _EXP2Q[q + _EXP2Q_OFF]
        # short region with reorder: decoded order is sfb-major,
        # window-major; target interleaves the three windows per line
        sbg = np.asarray(g.subblock_gain, np.int64)
        qmat = base - 8 * sbg[None, :] - shift * sfs.astype(np.int64)
        q = np.clip(qmat[sfb_i, win_i], -_EXP2Q_OFF, 63)
        xr[tgt] = sgn[src] * mag[src] * _EXP2Q[q + _EXP2Q_OFF]
        return xr
    lidx = _req_long_idx(hdr.rate)
    sfv = sfl.astype(np.int64).copy()
    sfv[21] = 0                   # lines of sfb 21 carry no scalefactor
    q = np.clip(base - shift * (sfv + pre)[lidx], -_EXP2Q_OFF, 63)
    return sgn * mag * _EXP2Q[q + _EXP2Q_OFF]


_IS_RATIO = np.tan(np.arange(7) * np.pi / 12.0)


def _stereo(xr, rzero_r, grs, hdr: FrameHeader, sf_r, lsf_extra):
    """Mid/side + intensity stereo (both flavours), in place on
    xr[2][576]."""
    ms = bool(hdr.mode_ext & 2)
    intensity = bool(hdr.mode_ext & 1)
    g = grs[1]
    band_long = BAND_LONG[hdr.rate]
    band_short = BAND_SHORT[hdr.rate]
    bl = np.cumsum([0] + band_long)
    bs = np.cumsum([0] + list(band_short))
    inten_mask = np.zeros(576, bool)
    if intensity:
        sfl_r, sfs_r = sf_r
        short = g.window_switching and g.block_type == 2
        if hdr.lsf:
            illegal, gl_r, gs_r = lsf_extra
            io = 2.0 ** (-0.25) if (g.scalefac_compress & 1) else \
                2.0 ** (-0.5)
        if short:
            # per (sfb, window): process bands whose start (in reordered
            # line space) lies at/above the right channel's zero part
            widths = np.asarray(band_short)
            first_sfb = 3 if g.mixed else 0
            for sfb in range(12, first_sfb - 1, -1):
                w = int(widths[sfb])
                base3 = 3 * int(bs[sfb])
                if base3 + 3 * w <= rzero_r:
                    break
                for win in range(3):
                    seg = slice(base3 + win, base3 + 3 * w + win, 3)
                    pos = int(sfs_r[sfb, win])
                    if hdr.lsf:
                        ill = illegal[int(gs_r[sfb, win])]
                        if pos == ill:
                            if ms:
                                _ms_band(xr, seg)
                            continue
                        k0, k1 = _lsf_k(pos, io)
                        v = xr[0][seg].copy()
                        xr[0][seg] = k0 * v
                        xr[1][seg] = k1 * v
                    else:
                        if pos == 7:
                            if ms:
                                _ms_band(xr, seg)
                            continue
                        t = _IS_RATIO[pos]
                        v = xr[0][seg].copy()
                        xr[0][seg] = v * (t / (1.0 + t))
                        xr[1][seg] = v * (1.0 / (1.0 + t))
                    inten_mask[seg] = True
        else:
            for sfb in range(21, -1, -1):
                a, b = int(bl[sfb]), int(bl[sfb + 1])
                if b <= rzero_r:
                    break
                seg = slice(a, b)
                pos = int(sfl_r[sfb]) if sfb < 21 else int(sfl_r[20])
                if hdr.lsf:
                    ill = illegal[int(gl_r[min(sfb, 21)])] if sfb < 21 else -1
                    if pos == ill:
                        if ms:
                            _ms_band(xr, seg)
                        continue
                    k0, k1 = _lsf_k(pos, io)
                    v = xr[0][seg].copy()
                    xr[0][seg] = k0 * v
                    xr[1][seg] = k1 * v
                else:
                    if pos == 7:
                        if ms:
                            _ms_band(xr, seg)
                        continue
                    t = _IS_RATIO[pos]
                    v = xr[0][seg].copy()
                    xr[0][seg] = v * (t / (1.0 + t))
                    xr[1][seg] = v * (1.0 / (1.0 + t))
                inten_mask[seg] = True
    if ms:
        rest = ~inten_mask
        m = xr[0][rest]
        s = xr[1][rest]
        inv = 1.0 / np.sqrt(2.0)
        xr[0][rest] = (m + s) * inv
        xr[1][rest] = (m - s) * inv


def _ms_band(xr, seg):
    m = xr[0][seg].copy()
    s = xr[1][seg].copy()
    inv = 1.0 / np.sqrt(2.0)
    xr[0][seg] = (m + s) * inv
    xr[1][seg] = (m - s) * inv


def _lsf_k(pos: int, io: float):
    if pos == 0:
        return 1.0, 1.0
    if pos & 1:
        return io ** ((pos + 1) >> 1), 1.0
    return 1.0, io ** (pos >> 1)


def _alias_reduce(xr: np.ndarray, n_boundaries: int):
    # all boundaries at once: rows = subbands; the butterfly couples the
    # top 8 lines of subband b with the bottom 8 of b+1 (reversed order)
    X = xr[:18 * (n_boundaries + 1)].reshape(n_boundaries + 1, 18)
    a = X[:-1, 17:9:-1].copy()          # lines 17..10 of the lower band
    c = X[1:, :8].copy()                # lines 18..25 (0..7 of the upper)
    X[:-1, 17:9:-1] = a * ALIAS_CS - c * ALIAS_CA
    X[1:, :8] = c * ALIAS_CS + a * ALIAS_CA


def _hybrid(xr: np.ndarray, g: _Granule, overlap: np.ndarray) -> np.ndarray:
    """Alias reduction + IMDCT + windowing + overlap-add + frequency
    inversion for one granule-channel.  xr: (576,), overlap: (32, 18)
    updated in place.  Returns (18, 32) time-major subband samples."""
    short = g.window_switching and g.block_type == 2
    if short:
        n_alias = 1 if g.mixed else 0
    else:
        n_alias = 31
    if n_alias:
        _alias_reduce(xr, n_alias)
    X = xr.reshape(32, 18)
    out = np.empty((32, 18))
    if short:
        n_long_sb = 2 if g.mixed else 0
        if n_long_sb:
            wlong = _BT_WINDOWS[0]
            y = X[:n_long_sb] @ _M36.T
            y *= wlong
            out[:n_long_sb] = y[:, :18] + overlap[:n_long_sb]
            overlap[:n_long_sb] = y[:, 18:]
        sb = X[n_long_sb:]
        # three 12-point IMDCTs per subband at offsets 6/12/18
        z = sb.reshape(-1, 6, 3)                 # (nsb, line, window)
        z = np.swapaxes(z, 1, 2)                 # (nsb, window, line)
        y12 = z @ _M12.T                         # (nsb, 3, 12)
        y12 = y12 * _WIN_SHORT
        y = np.zeros((sb.shape[0], 36))
        for w in range(3):
            y[:, 6 + 6 * w:18 + 6 * w] += y12[:, w]
        out[n_long_sb:] = y[:, :18] + overlap[n_long_sb:]
        overlap[n_long_sb:] = y[:, 18:]
    else:
        w = _BT_WINDOWS[g.block_type]
        y = X @ _M36.T
        y *= w
        out[:] = y[:, :18] + overlap
        overlap[:] = y[:, 18:]
    out *= _FREQINV
    return out.T                                  # (18 steps, 32 subbands)


class _L3Decoder:
    def __init__(self, hdr: FrameHeader):
        self.channels = hdr.channels
        self.rate = hdr.rate
        self.overlap = np.zeros((self.channels, 32, 18))
        self.synth = _Synth(self.channels)
        self.res = b""
        self.prev_sf = [np.zeros(22, np.int32) for _ in range(2)]

    def reset(self):
        self.overlap[:] = 0.0
        self.synth.v[:] = 0.0
        self.res = b""

    def decode(self, b, off: int, nbytes: int,
               hdr: FrameHeader) -> np.ndarray:
        """Decode one frame -> (channels, samples) float64."""
        ch = hdr.channels
        side_len = (9 if ch == 1 else 17) if hdr.lsf else \
            (17 if ch == 1 else 32)
        p = off + 4 + (2 if hdr.crc else 0)
        if p + side_len > len(b):
            raise Mp3Error("truncated frame")
        br = _Bits(b, p * 8)
        if hdr.lsf:
            mdb, scfsi, grs = _parse_side_lsf(br, ch)
        else:
            mdb, scfsi, grs = _parse_side_mpeg1(br, ch)
        main = bytes(b[p + side_len:off + nbytes])
        ngr = len(grs)
        out = np.zeros((ch, ngr * 576))
        if mdb > len(self.res):
            # reservoir shortfall (stream start / after a seek): mute the
            # frame but keep feeding overlap/synthesis/reservoir state
            self.res = (self.res + main)[-511:]
            z = _Granule()
            for gr in range(ngr):
                for c in range(ch):
                    steps = _hybrid(np.zeros(576), z, self.overlap[c])
                    out[c, gr * 576:(gr + 1) * 576] = self.synth.run(c, steps)
            return out
        # 80 zero pad bytes bound every legal overrun past
        # part2_3_length: the <=19-bit Huffman lookup slack plus
        # linbits+signs (<64 bits), and the scalefactor reads of a
        # hostile granule that declares part2_3_length shorter than its
        # slen sums (<=216 bits).  With the per-granule end guard below,
        # neither the Python nor the native path ever reads out of the
        # buffer.
        data = (self.res[len(self.res) - mdb:] if mdb else b"") + main \
            + b"\x00" * 80
        self.res = (self.res + main)[-511:]
        pos = 0
        for gr in range(ngr):
            xr = np.zeros((ch, 576))
            rzero_r = 576
            sf_r = None
            lsf_extra = None
            for c in range(ch):
                g = grs[gr][c]
                start = pos
                if start + g.part2_3_length + 576 > 8 * len(data):
                    raise Mp3Error("truncated main data")
                if hdr.lsf:
                    intensity = bool(hdr.mode_ext & 1) and c == 1 \
                        and hdr.mode == 1
                    brm = _Bits(data, pos)
                    sfl, sfs, p2, lsf_extra_c = _read_scalefacs_lsf(
                        brm, g, intensity)
                else:
                    brm = _Bits(data, pos)
                    sfl, sfs, p2 = _read_scalefacs_mpeg1(
                        brm, g, scfsi[c], self.prev_sf[c], gr)
                    self.prev_sf[c] = sfl.copy()
                    lsf_extra_c = None
                end = start + g.part2_3_length
                is_, rzero, _ = _huffman_eval(data, start + p2, end, g, hdr)
                pos = end
                xr[c] = _requantize(is_, g, hdr, sfl, sfs)
                if c == 1:
                    rzero_r = rzero
                    sf_r = (sfl, sfs)
                    lsf_extra = lsf_extra_c
            if ch == 2 and hdr.mode == 1 and hdr.mode_ext:
                _stereo(xr, rzero_r, grs[gr], hdr, sf_r, lsf_extra)
            for c in range(ch):
                steps = _hybrid(xr[c], grs[gr][c], self.overlap[c])
                out[c, gr * 576:(gr + 1) * 576] = self.synth.run(c, steps)
        return out


# --------------------------------------------------------------------------
# Layers I and II


class _L12Decoder:
    def __init__(self, hdr: FrameHeader):
        self.channels = hdr.channels
        self.synth = _Synth(self.channels)

    def reset(self):
        self.synth.v[:] = 0.0

    def decode(self, b, off: int, nbytes: int, hdr: FrameHeader):
        # decode from a padded copy of the frame: a corrupt allocation
        # pattern can demand more bits than the frame carries (worst case
        # < 47 kbit for Layer II); zero-fill keeps the output finite and
        # the reads in bounds instead of crashing on hostile files
        buf = bytes(b[off:off + nbytes]) + b"\x00" * 6000
        br = _Bits(buf, (4 + (2 if hdr.crc else 0)) * 8)
        if hdr.layer == 1:
            return self._layer1(br, hdr)
        return self._layer2(br, hdr)

    def _layer1(self, br: _Bits, hdr: FrameHeader):
        ch = hdr.channels
        joint = hdr.mode == 1
        bound = (hdr.mode_ext + 1) * 4 if joint else 32
        alloc = np.zeros((ch, 32), np.int32)
        for sb in range(32):
            if sb < bound:
                for c in range(ch):
                    alloc[c, sb] = br.read(4)
            else:
                a = br.read(4)
                alloc[:, sb] = a
        scf = np.zeros((ch, 32), np.int32)
        for sb in range(32):
            for c in range(ch):
                if alloc[c, sb]:
                    scf[c, sb] = br.read(6)
        S = np.zeros((ch, 12, 32))
        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for c in range(ch):
                        if alloc[c, sb]:
                            nb = alloc[c, sb] + 1
                            code = br.read(nb)
                            S[c, s, sb] = _l1_requant(code, nb) \
                                * SCALEFACTORS[scf[c, sb]]
                else:
                    if alloc[0, sb]:
                        nb = alloc[0, sb] + 1
                        code = br.read(nb)
                        v = _l1_requant(code, nb)
                        for c in range(ch):
                            S[c, s, sb] = v * SCALEFACTORS[scf[c, sb]]
        out = np.zeros((ch, 384))
        for c in range(ch):
            out[c] = self.synth.run(c, S[c])
        return out

    def _layer2(self, br: _Bits, hdr: FrameHeader):
        ch = hdr.channels
        table, sblimit = l2_table(hdr.bitrate // 1000 if hdr.bitrate else 192,
                                  ch, hdr.rate, hdr.lsf)
        joint = hdr.mode == 1
        bound = min((hdr.mode_ext + 1) * 4, sblimit) if joint else sblimit
        alloc = np.zeros((ch, sblimit), np.int32)
        for sb in range(sblimit):
            nbal = table[sb][0]
            if sb < bound:
                for c in range(ch):
                    alloc[c, sb] = br.read(nbal)
            else:
                a = br.read(nbal)
                alloc[:, sb] = a
        scfsi = np.zeros((ch, sblimit), np.int32)
        for sb in range(sblimit):
            for c in range(ch):
                if alloc[c, sb]:
                    scfsi[c, sb] = br.read(2)
        scf = np.zeros((ch, sblimit, 3), np.int32)
        for sb in range(sblimit):
            for c in range(ch):
                if alloc[c, sb]:
                    si = scfsi[c, sb]
                    if si == 0:
                        scf[c, sb] = [br.read(6), br.read(6), br.read(6)]
                    elif si == 1:
                        a = br.read(6); bq = br.read(6)
                        scf[c, sb] = [a, a, bq]
                    elif si == 2:
                        a = br.read(6)
                        scf[c, sb] = [a, a, a]
                    else:
                        a = br.read(6); bq = br.read(6)
                        scf[c, sb] = [a, bq, bq]
        # --- sample section, vectorised: every group reads the same
        # field template (widths depend only on the allocation), so all
        # 12 x E fields extract in one shot, degroup/requantize as
        # arrays, and scatter into S by precomputed indices.  The
        # arithmetic mirrors `_l2_read` operation for operation (float64
        # IEEE), so values are bitwise what the serial form produced.
        ent_sb, ent_mode, ent_cls = [], [], []
        for sb in range(sblimit):
            if sb < bound:
                for c in range(ch):
                    if alloc[c, sb]:
                        ent_sb.append(sb); ent_mode.append(c)
                        ent_cls.append(table[sb][1][alloc[c, sb] - 1])
            elif alloc[0, sb]:
                ent_sb.append(sb); ent_mode.append(2)
                ent_cls.append(table[sb][1][alloc[0, sb] - 1])
        S = np.zeros((ch, 36, 32))
        E = len(ent_sb)
        if E:
            ent_sb = np.asarray(ent_sb)
            ent_mode = np.asarray(ent_mode)
            cls = np.asarray(ent_cls)
            bits = np.asarray(L2_BITS)[cls]
            steps = np.asarray(L2_STEPS)[cls]
            gm = bits < 0
            # per-group field widths: one field per grouped entry, three
            # per ungrouped entry, in entry order
            nread = np.where(gm, 1, 3)
            widths = np.repeat(np.where(gm, -bits, bits), nread)
            G = int(widths.sum())
            ends = np.cumsum(widths)
            offs = (br.pos + (np.arange(12) * G)[:, None]
                    + (ends - widths)[None, :])
            br.pos += 12 * G
            buf = np.frombuffer(br.d, np.uint8)
            byte = offs >> 3
            win = ((buf[byte].astype(np.uint32) << 24)
                   | (buf[byte + 1].astype(np.uint32) << 16)
                   | (buf[byte + 2].astype(np.uint32) << 8)
                   | buf[byte + 3])
            w32 = widths.astype(np.uint32)
            fields = ((win >> (np.uint32(32) - w32 - (offs & 7).astype(
                np.uint32))) & ((np.uint32(1) << w32) - np.uint32(1))
            ).astype(np.int64)                              # (12, F)
            # expand fields -> (12, E, 3) codes
            codes = np.empty((12, E, 3), np.int64)
            f_ent = np.repeat(np.arange(E), nread)          # field -> entry
            if gm.any():
                g = fields[:, gm[f_ent]]    # grouped: one field per entry
                st = steps[gm][None, :]
                codes[:, gm, 0] = g % st
                codes[:, gm, 1] = (g // st) % st
                codes[:, gm, 2] = g // (st * st)
            um = ~gm
            if um.any():
                uf = fields[:, um[f_ent]]                   # (12, 3*sum(um))
                codes[:, um, :] = uf.reshape(12, int(um.sum()), 3)
            # requantize: ((code - H)/H + D) * C, same op order as
            # _l2_read; grouped nb from steps {3:2, 5:3, 9:4}
            nb = np.where(gm, np.select([steps == 3, steps == 5],
                                        [2, 3], 4), bits)
            H = (1 << nb.astype(np.int64)).astype(np.float64) / 2.0
            C = (2.0 * H) / steps
            D = np.where(gm, 0.5, 2.0 ** (1 - nb))
            vals = ((codes - H[None, :, None]) / H[None, :, None]
                    + D[None, :, None]) * C[None, :, None]  # (12, E, 3)
            # scale + scatter: part = grp//4; entries with mode 2 feed
            # both channels from the one decoded triple
            part = np.repeat(np.arange(3), 4)               # (12,)
            step_idx = (3 * np.arange(12)[:, None, None]
                        + np.arange(3)[None, None, :])      # (12, 1, 3)
            for c in range(ch):
                sel = (ent_mode == c) | (ent_mode == 2)
                if not sel.any():
                    continue
                f = SCALEFACTORS[scf[c, ent_sb[sel]][:, part]]  # (Es, 12)
                v = vals[:, sel, :] * f.T[:, :, None]
                si = np.broadcast_to(step_idx, v.shape)
                sbi = np.broadcast_to(ent_sb[sel][None, :, None], v.shape)
                S[c, si.reshape(-1), sbi.reshape(-1)] = v.reshape(-1)
        out = np.zeros((ch, 1152))
        for c in range(ch):
            out[c] = self.synth.run(c, S[c])
        return out


def _l1_requant(code: int, nb: int) -> float:
    frac = (code - (1 << (nb - 1))) / float(1 << (nb - 1))
    return (frac + 2.0 ** (1 - nb)) * ((1 << nb) / float((1 << nb) - 1))


def _l2_read(br: _Bits, cls: int):
    steps = L2_STEPS[cls]
    bits = L2_BITS[cls]
    if bits < 0:                         # grouped: one code, three samples
        g = br.read(-bits)
        codes = (g % steps, (g // steps) % steps, g // (steps * steps))
        nb = {3: 2, 5: 3, 9: 4}[steps]
        C = float(1 << nb) / steps
        return [((c - (1 << (nb - 1))) / float(1 << (nb - 1)) + 0.5) * C
                for c in codes]
    nb = bits
    C = float(1 << nb) / steps
    D = 2.0 ** (1 - nb)
    return [((br.read(nb) - (1 << (nb - 1))) / float(1 << (nb - 1)) + D) * C
            for _ in range(3)]


# --------------------------------------------------------------------------
# stream-level decode


class _Stream:
    """Parsed stream: frame index + gapless bounds."""

    def __init__(self, data: bytes, path: str):
        self.data = data
        self.path = path
        self.frames = _scan_frames(data, path)
        off0, h0, n0 = self.frames[0]
        self.hdr = h0
        self.info = _parse_tag(data, off0, h0, n0) if h0.layer == 3 \
            else _StreamInfo()
        self.first_audio = 1 if self.info.tag_frame else 0
        spf = h0.samples
        naudio = len(self.frames) - self.first_audio
        total = naudio * spf
        if self.info.delay or self.info.padding:
            self.skip = self.info.delay + 529
            trim = max(0, self.info.padding - 529)
            self.num_frames = max(0, total - self.skip - trim)
        else:
            self.skip = 0
            self.num_frames = total
        self.spf = spf

    def make_decoder(self):
        if self.hdr.layer == 3:
            return _L3Decoder(self.hdr)
        return _L12Decoder(self.hdr)


def _decode_all(stream: _Stream) -> np.ndarray:
    dec = stream.make_decoder()
    chunks = []
    for i, (off, h, n) in enumerate(stream.frames):
        if i < stream.first_audio:
            continue                     # Xing/Info/VBRI tag frame
        pcm = dec.decode(stream.data, off, n, h)
        chunks.append(pcm)
    if not chunks:
        return np.zeros((stream.hdr.channels, 0), np.float32)
    pcm = np.concatenate(chunks, axis=1)
    pcm = pcm[:, stream.skip:stream.skip + stream.num_frames]
    # no clipping: like the Vorbis path, overshoots past full scale are
    # preserved (the pipeline's output quantizer saturates at the end)
    return pcm.astype(np.float32)


# --------------------------------------------------------------------------
# public API


def read_mp3(path: str):
    """Decode a whole MPEG audio file to planar float32 + rate."""
    with open(path, "rb") as f:
        data = f.read()
    stream = _Stream(data, path)
    return _decode_all(stream), stream.hdr.rate


def probe_mp3(path: str):
    """Header-walk probe (no audio decode) to `AudioFileInfo`."""
    from .wav import AudioFileInfo

    with open(path, "rb") as f:
        data = f.read()
    stream = _Stream(data, path)
    return AudioFileInfo(path=path, sample_rate=stream.hdr.rate,
                         num_channels=stream.hdr.channels,
                         num_frames=stream.num_frames, bit_depth=32,
                         is_float=True, container="mp3",
                         byte_order="little")


class Mp3Reader:
    """Incremental frame reader with the `WavReader.read(start, count)`
    contract.  Seeks restart `_PRIME` frames early with a decoder reset:
    the decoder state (bit reservoir <= 511 bytes, one granule of IMDCT
    overlap, 480 samples of synthesis FIFO) has finite memory, so the
    re-primed continuation is bitwise equal to the straight-through
    decode once the prime distance covers it (pinned by tests)."""

    _PRIME = 12

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            data = f.read()
        self._s = _Stream(data, path)
        self.sample_rate = self._s.hdr.rate
        self.num_channels = self._s.hdr.channels
        self.num_frames = self._s.num_frames
        self.bits = 32
        self._dec = self._s.make_decoder()
        self._next = 0                   # next frame index to decode
        self._buf = np.zeros((self.num_channels, 0), np.float32)
        self._buf_start = 0              # output-sample pos of buf[0]
        self._emitted = 0                # raw samples emitted by decoder
        self._valid_from = 0             # first raw pos certified exact

    def close(self):
        self._buf = np.zeros((self.num_channels, 0), np.float32)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _restart(self, frame_idx: int):
        self._dec.reset()
        if hasattr(self._dec, "prev_sf"):
            self._dec.prev_sf = [np.zeros(22, np.int32) for _ in range(2)]
        self._next = max(self._s.first_audio, frame_idx - self._PRIME)
        self._emitted = self._next_raw_pos(self._next)
        self._buf = np.zeros((self.num_channels, 0), np.float32)
        self._buf_start = self._emitted
        # samples decoded inside the re-priming window are NOT certified
        # (the bit reservoir / overlap state is still converging); a later
        # read landing there must trigger another, earlier restart.  A
        # restart clamped to the stream head replays the true prefix, so
        # everything it emits is exact.
        self._valid_from = 0 if self._next == self._s.first_audio else \
            self._next_raw_pos(self._next + self._PRIME)

    def _next_raw_pos(self, frame_idx: int) -> int:
        fa = self._s.first_audio
        return max(0, frame_idx - fa) * self._s.spf

    def _decode_next(self):
        s = self._s
        i = self._next
        self._next += 1
        if i < s.first_audio:
            return                       # Xing/Info/VBRI tag frame
        off, h, n = s.frames[i]
        pcm = self._dec.decode(s.data, off, n, h)
        pcm32 = pcm.astype(np.float32)
        self._buf = np.concatenate([self._buf, pcm32], axis=1)
        self._emitted += pcm32.shape[1]

    def read(self, start: int, count: int) -> np.ndarray:
        s = self._s
        count = max(0, min(count, self.num_frames - start))
        if count <= 0:
            return np.zeros((self.num_channels, 0), np.float32)
        raw_start = start + s.skip
        raw_end = raw_start + count
        if raw_start < max(self._buf_start, self._valid_from):
            fa = s.first_audio
            self._restart(fa + raw_start // s.spf)
        # drop consumed samples beyond a keep window
        keep = 1 << 16
        while True:
            excess = raw_start - keep - self._buf_start
            if excess > 0 and self._buf.shape[1] > excess:
                self._buf = self._buf[:, excess:]
                self._buf_start += excess
            if self._buf_start + self._buf.shape[1] >= raw_end or \
                    self._next >= len(s.frames):
                break
            self._decode_next()
        a = raw_start - self._buf_start
        bseg = self._buf[:, a:a + count]
        if bseg.shape[1] < count:
            bseg = np.pad(bseg, ((0, 0), (0, count - bseg.shape[1])))
        return np.ascontiguousarray(bseg)
