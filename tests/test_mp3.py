"""MPEG audio (MP1/MP2/MP3) decoder tests.

Same three-layer strategy as FLAC/Vorbis/ALAC (tests/test_flac.py,
tests/test_vorbis.py, tests/test_alac.py):

1. conformance — libmp3lame / mp2 / libtwolame-encoded vectors decoded by
   the product and cross-checked against the libavcodec float decoders
   (tests/avref.py, the TEST-ONLY FFmpeg shim), at every sample rate of
   all three MPEG versions, tonal and transient (short-block) material,
   CBR and ABR, with sample-exact lengths (LAME gapless trim);
2. spec paths no mainstream encoder emits — HAND-ASSEMBLED Layer I
   frames (mono / stereo / intensity bound / CRC / MPEG-2 LSF), free
   format (bitrate index 0), and forced Layer III intensity stereo via
   header mutation — fed to libavcodec packet-by-packet
   (avref.decode_raw) so the avformat prober's content heuristics can't
   reject synthetic streams;
3. container robustness + the io/codec dispatch + pipeline end-to-end.

Reference surface: the Swift shell reads anything AVAudioFile accepts
(/root/reference/_Swift Code/F9-Batch-Resampler/Models/AudioFile.swift:38),
which includes MPEG audio; the JUCE drop zone lists OS-decodable formats
(Source/FileListAndLogComponent.cpp:150-181).  MPEG *output* stays
rejected (perceptual-lossy deliverables).
"""

import math
import os

import numpy as np
import pytest

import avref
from f9tpu.io import codec
from f9tpu.io.mp3 import Mp3Error, Mp3Reader, probe_mp3, read_mp3
from f9tpu.io import mp3 as m3
from f9tpu.io.mp3tables import BITRATES, SAMPLE_RATES

needs_avref = pytest.mark.skipif(
    not avref.available(), reason="avref unavailable")


@pytest.fixture(params=["native", "python"], autouse=True)
def huffman_path(request, monkeypatch):
    """Run EVERY decode in this module through both the native C++
    Huffman twin and the pure-Python spec oracle (they must agree
    bit-for-bit) — the FLAC/Vorbis/ALAC dual-path pattern."""
    if request.param == "python":
        monkeypatch.setattr(m3, "_NATIVE", False)
    else:
        from f9tpu import native

        if not (native.available() and native.mp3_huff_available()):
            pytest.skip(f"native unavailable: {native.build_error()}")
        monkeypatch.setattr(m3, "_NATIVE", None)
    return request.param


def _tone(ch, rate, secs=1.2, seed=0):
    rng = np.random.default_rng(seed)
    n = int(rate * secs)
    t = np.arange(n) / rate
    x = np.stack([0.35 * np.sin(2 * np.pi * (220 + 130 * c) * t)
                  + 0.05 * rng.standard_normal(n) for c in range(ch)])
    return (np.clip(x, -0.99, 0.99) * (1 << 23)).astype(np.int32)


def _transient(ch, rate, secs=1.5, seed=3):
    rng = np.random.default_rng(seed)
    n = int(rate * secs)
    x = 0.01 * rng.standard_normal((ch, n))
    for k in range(50, n, rate // 6):
        x[:, k:k + 40] += 0.8 * rng.standard_normal((ch, 40))
    return (np.clip(x, -0.99, 0.99) * (1 << 23)).astype(np.int32)


def _err_dbfs(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    return 20 * math.log10(np.sqrt((d * d).mean()) + 1e-300)


def _cross_check(path, tol_dbfs):
    """Decode `path` with the product and with libavcodec; lengths must
    be IDENTICAL (gapless trim included) and the sample error below
    `tol_dbfs` relative to full scale."""
    ref, _rate, rbits = avref.decode_file(path)
    reff = ref.astype(np.float64) / (1 << (rbits - 1))
    ours, _ = read_mp3(path)
    assert ours.shape == reff.shape
    e = _err_dbfs(ours, reff)
    assert e <= tol_dbfs, f"{path}: {e:.1f} dBFS > {tol_dbfs}"
    return ours


# ------------------------------------------------------------ Layer III


@needs_avref
@pytest.mark.parametrize("ch,rate,kbps", [
    (2, 44100, 192),     # MPEG-1
    (1, 32000, 64),
    (2, 48000, 320),
    (2, 22050, 64),      # MPEG-2 (LSF)
    (1, 16000, 32),
    (1, 8000, 16),       # MPEG-2.5
    (2, 11025, 32),
])
def test_l3_tonal_cross_check(tmp_path, ch, rate, kbps):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(ch, rate), rate,
                           24, bit_rate=kbps * 1000)
    _cross_check(p, -120.0)


@needs_avref
@pytest.mark.parametrize("ch,rate,kbps", [
    (1, 8000, 16),       # short blocks cross the 8 kHz region split
    (1, 12000, 32),
    (2, 22050, 64),
    (2, 44100, 128),
    (2, 48000, 192),
])
def test_l3_transient_short_blocks(tmp_path, ch, rate, kbps):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _transient(ch, rate),
                           rate, 24, bit_rate=kbps * 1000)
    _cross_check(p, -120.0)


@needs_avref
def test_l3_abr_vbr_stream(tmp_path):
    p = str(tmp_path / "abr.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100), 44100,
                           24, bit_rate=96000, opts="abr=1")
    _cross_check(p, -120.0)


@needs_avref
def test_l3_gapless_exact_length(tmp_path):
    """The LAME tag's delay/padding trim makes the decoded length equal
    the ORIGINAL PCM length, not a frame multiple."""
    n = 44100 + 137              # deliberately not frame-aligned
    codes = _tone(2, 44100)[:, :n]
    p = str(tmp_path / "g.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", codes, 44100, 24,
                           bit_rate=128000)
    ours = _cross_check(p, -120.0)
    assert ours.shape == (2, n)
    assert probe_mp3(p).num_frames == n


# ------------------------------------------------------------ Layer II


@needs_avref
@pytest.mark.parametrize("enc,ch,rate,kbps,opts", [
    ("mp2", 2, 44100, 192, None),         # table B (30 subbands)
    ("mp2", 2, 44100, 112, None),         # table A (27)
    ("mp2", 2, 48000, 96, None),          # table C (8)
    ("mp2", 1, 32000, 48, None),          # table D (12)
    ("mp2", 2, 24000, 96, None),          # MPEG-2 LSF table
    ("mp2", 1, 16000, 32, None),
    ("libtwolame", 2, 44100, 128, "mode=joint_stereo"),
])
def test_l2_cross_check(tmp_path, enc, ch, rate, kbps, opts):
    # the libavcodec reference emits s16 for Layer II, so the comparison
    # floor is the 16-bit quantization of the reference itself (~-98 dBFS
    # measured); the product's own math is float64 throughout
    p = str(tmp_path / "t.mp2")
    avref.encode_file_opts(enc, p, "mp2", _tone(ch, rate), rate, 24,
                           bit_rate=kbps * 1000, opts=opts)
    _cross_check(p, -90.0)
    y, r = codec.read_audio(p)       # .mp2 rides the same dispatch
    assert r == rate and y.shape[0] == ch


# ------------------------------------------------------- Layer I (hand-built)


class _BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def _build_l1_frame(version, rate, br_idx, mode, mode_ext, alloc, scf,
                    samples, crc=False):
    """One ISO 11172-3 / 13818-3 Layer I frame.  alloc: (ch, 32) codes
    0..14 (nb = alloc+1 bits); scf: (ch, 32) indices 0..62; samples:
    (ch, 12, 32) quantized codes."""
    ch = 1 if mode == 3 else 2
    bw = _BitWriter()
    bw.w(0x7FF, 11)
    bw.w(version, 2)
    bw.w(3, 2)                    # layer code 3 = Layer I
    bw.w(0 if crc else 1, 1)
    bw.w(br_idx, 4)
    bw.w(SAMPLE_RATES[version].index(rate), 2)
    bw.w(0, 2)                    # padding, private
    bw.w(mode, 2)
    bw.w(mode_ext, 2)
    bw.w(0, 4)                    # copyright, original, emphasis
    if crc:
        bw.w(0xFFFF, 16)          # dummy CRC (decoders don't verify)
    bound = (mode_ext + 1) * 4 if mode == 1 else 32
    for sb in range(32):
        if sb < bound:
            for c in range(ch):
                bw.w(alloc[c][sb], 4)
        else:
            bw.w(alloc[0][sb], 4)
    for sb in range(32):
        for c in range(ch):
            if (alloc[c][sb] if sb < bound else alloc[0][sb]):
                bw.w(scf[c][sb], 6)
    for s in range(12):
        for sb in range(32):
            if sb < bound:
                for c in range(ch):
                    if alloc[c][sb]:
                        bw.w(samples[c][s][sb], alloc[c][sb] + 1)
            else:
                if alloc[0][sb]:
                    bw.w(samples[0][s][sb], alloc[0][sb] + 1)
    data = bw.bytes()
    kbps = BITRATES[(version == 3, 1)][br_idx - 1]
    flen = 4 * (12 * (kbps * 1000) // rate)
    assert len(data) <= flen, (len(data), flen)
    return data + b"\x00" * (flen - len(data)), flen


def _l1_stream(version=3, rate=32000, br_idx=14, mode=3, mode_ext=0,
               crc=False, amax=15, nframes=12, seed=0):
    r = np.random.default_rng(seed)
    ch = 1 if mode == 3 else 2
    frames = []
    flen = 0
    for _ in range(nframes):
        alloc = r.integers(0, amax, (ch, 32))
        alloc[:, 24:] = r.integers(0, min(6, amax), (ch, 8))
        alloc[r.random((ch, 32)) < 0.2] = 0
        if mode == 1:
            bound = (mode_ext + 1) * 4
            alloc[1:, bound:] = alloc[0, bound:]
        scf = r.integers(0, 63, (ch, 32))
        samples = np.zeros((ch, 12, 32), np.int64)
        for c in range(ch):
            for sb in range(32):
                if alloc[c][sb]:
                    samples[c, :, sb] = r.integers(
                        0, (1 << (alloc[c][sb] + 1)) - 1, 12)
        f, flen = _build_l1_frame(version, rate, br_idx, mode, mode_ext,
                                  alloc, scf, samples, crc)
        frames.append(f)
    return b"".join(frames), flen


@needs_avref
@pytest.mark.parametrize("desc,kw", [
    ("mono", dict()),
    ("stereo", dict(mode=0, amax=9)),
    ("intensity_bound8", dict(mode=1, mode_ext=1, amax=9)),
    ("crc", dict(crc=True)),
    ("mpeg2_lsf", dict(version=2, rate=22050, br_idx=14, amax=9)),
])
def test_l1_handbuilt_cross_check(tmp_path, desc, kw):
    raw, flen = _l1_stream(**kw)
    ref, rrate = avref.decode_raw("mp1float", raw, flen)
    reff = ref.astype(np.float64) / (1 << 23)
    p = str(tmp_path / f"{desc}.mp1")
    open(p, "wb").write(raw)
    ours, orate = read_mp3(p)
    assert orate == rrate and ours.shape == reff.shape
    e = _err_dbfs(ours, reff)
    assert e <= -100.0, f"{desc}: {e:.1f} dBFS"
    y, r = codec.read_audio(p)   # .mp1 extension rides the dispatch too
    assert r == orate and y.shape == ours.shape


# -------------------------------------------------------- exotic streams


@needs_avref
def test_free_format_stream(tmp_path):
    """Bitrate index 0: frame size resolved from the inter-sync distance.
    Built by clearing the bitrate nibble of a padding-free CBR stream, so
    the payload is untouched: the decode must be BIT-IDENTICAL to the CBR
    decode (libavcodec can't be packet-fed free format — its packet
    decoder sizes frames from the header — so the identity IS the
    oracle: the CBR original was already cross-checked)."""
    p = str(tmp_path / "c.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(1, 48000), 48000,
                           24, bit_rate=64000)   # 48k/64k: exactly 192 B
    data = bytearray(open(p, "rb").read())
    base, _ = read_mp3(p)
    sizes = set()
    offs = []
    st = m3._Stream(bytes(data), p)
    for off, h, nb in st.frames:
        assert data[off + 2] >> 4 != 0
        data[off + 2] &= 0x0F
        sizes.add(nb)
        offs.append(off)
    assert sizes == {192}
    q = str(tmp_path / "free.mp3")
    open(q, "wb").write(bytes(data))
    ours, rate = read_mp3(q)
    assert rate == 48000 and np.array_equal(base, ours)
    # probe agrees the stream is free format and keeps the exact length
    assert probe_mp3(q).num_frames == base.shape[1]
    st2 = m3._Stream(bytes(data), q)
    assert st2.hdr.bitrate == 0 and len(st2.frames) == len(offs)


@needs_avref
def test_forced_intensity_stereo_mpeg1(tmp_path):
    """LAME never emits intensity stereo; force it by setting mode_ext
    bit 0 on every joint-stereo frame.  Both decoders see identical bits;
    the MPEG-1 is_pos semantics (tan ratios, pos 7 = off) are shared with
    libavcodec, modulo corner-band conventions — hence the looser bound."""
    rng = np.random.default_rng(9)
    n = 44100
    t = np.arange(n) / 44100
    y = np.stack([0.4 * np.sin(2 * np.pi * 500 * t),
                  0.4 * np.sin(2 * np.pi * 510 * t)])
    y += 0.01 * rng.standard_normal((2, n))
    codes = (np.clip(y, -0.99, 0.99) * (1 << 23)).astype(np.int32)
    p = str(tmp_path / "js.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", codes, 44100, 24,
                           bit_rate=48000, opts="joint_stereo=1")
    data = bytearray(open(p, "rb").read())
    st = m3._Stream(bytes(data), p)
    nmut = 0
    for off, h, nb in st.frames[st.first_audio:]:
        if h.mode == 1:
            data[off + 3] |= 0x30     # mode_ext = 3: MS + intensity
            nmut += 1
    assert nmut > 10
    q = str(tmp_path / "is.mp3")
    open(q, "wb").write(bytes(data))
    ref, _r, rbits = avref.decode_file(q)
    reff = ref.astype(np.float64) / (1 << (rbits - 1))
    ours, _ = read_mp3(q)
    assert ours.shape == reff.shape
    assert _err_dbfs(ours, reff) <= -40.0


@needs_avref
def test_forced_intensity_stereo_lsf(tmp_path):
    """LSF intensity (ISO 13818-3 io ratios).  Unlike MPEG-1, flipping
    the intensity bit REINTERPRETS the right channel's scalefac_compress
    (different slen partitioning), so a mutated stream decodes to
    well-formed garbage on any decoder — assert robustness (shape,
    finiteness, no exception), and pin the io-ratio math directly."""
    codes = _tone(2, 22050, seed=5)
    p = str(tmp_path / "js.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", codes, 22050, 24,
                           bit_rate=24000, opts="joint_stereo=1")
    base, _ = read_mp3(p)
    data = bytearray(open(p, "rb").read())
    st = m3._Stream(bytes(data), p)
    nmut = 0
    for off, h, nb in st.frames[st.first_audio:]:
        if h.mode == 1:
            data[off + 3] |= 0x10     # intensity on (keep the MS bit)
            nmut += 1
    assert nmut > 10
    q = str(tmp_path / "is.mp3")
    open(q, "wb").write(bytes(data))
    ours, rate = read_mp3(q)
    assert rate == 22050 and ours.shape == base.shape
    assert np.isfinite(ours).all()
    # the io-ratio math itself (ISO 13818-3 2.4.3.2): pos 0 passes both
    # channels; odd positions scale the LEFT by io^((pos+1)/2), even
    # positions the RIGHT by io^(pos/2)
    for io in (2.0 ** -0.25, 2.0 ** -0.5):
        assert m3._lsf_k(0, io) == (1.0, 1.0)
        for pos in range(1, 12):
            k0, k1 = m3._lsf_k(pos, io)
            if pos & 1:
                assert (k0, k1) == (io ** ((pos + 1) >> 1), 1.0)
            else:
                assert (k0, k1) == (1.0, io ** (pos >> 1))


# ------------------------------------------------------- tags + robustness


@needs_avref
def test_id3_and_ape_tags_skipped(tmp_path):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100), 44100,
                           24, bit_rate=128000)
    base, _ = read_mp3(p)
    body = open(p, "rb").read()
    size = 2000
    syn = [(size >> 21) & 0x7F, (size >> 14) & 0x7F,
           (size >> 7) & 0x7F, size & 0x7F]
    id3v2 = bytes([0x49, 0x44, 0x33, 4, 0, 0] + syn) + b"\x00" * size
    id3v1 = b"TAG" + b"\x00" * 125
    q = str(tmp_path / "tagged.mp3")
    open(q, "wb").write(id3v2 + body + id3v1)
    ours, rate = read_mp3(q)
    assert np.array_equal(base, ours)
    assert probe_mp3(q).num_frames == base.shape[1]
    # APEv2 footer-only tag at EOF
    ape = (b"APETAGEX" + (2000).to_bytes(4, "little")
           + (40).to_bytes(4, "little") + (1).to_bytes(4, "little")
           + (0).to_bytes(4, "little") + b"\x00" * 8)
    ape_tag = b"\x00" * (40 - 32) + ape
    r2 = str(tmp_path / "ape.mp3")
    open(r2, "wb").write(body + ape_tag)
    ours2, _ = read_mp3(r2)
    assert np.array_equal(base, ours2)


@needs_avref
def test_corruption_fuzz_never_crashes(tmp_path):
    """Random byte flips and truncations of valid L3/L2 streams must
    either decode (finite samples) or raise Mp3Error — never crash, hang,
    or emit NaN/inf (the watch daemon feeds arbitrary dropped files)."""
    srcs = []
    codes = _tone(2, 44100, 0.6)
    p3 = str(tmp_path / "a.mp3")
    avref.encode_file_opts("libmp3lame", p3, "mp3", codes, 44100, 24,
                           bit_rate=128000)
    srcs.append(open(p3, "rb").read())
    p2 = str(tmp_path / "a.mp2")
    avref.encode_file_opts("mp2", p2, "mp2", codes, 44100, 24,
                           bit_rate=192000)
    srcs.append(open(p2, "rb").read())
    q = str(tmp_path / "mut.mp3")
    for trial in range(60):
        r = np.random.default_rng(1000 + trial)
        mut = bytearray(srcs[trial % 2])
        if r.integers(3) == 0:
            mut = mut[:int(r.integers(8, len(mut)))]      # truncate
        for _ in range(int(r.integers(1, 8))):
            i = int(r.integers(0, len(mut)))
            mut[i] ^= int(r.integers(1, 256))
        open(q, "wb").write(bytes(mut))
        try:
            out, _rate = read_mp3(q)
            assert np.isfinite(out).all(), trial
        except ValueError:
            pass          # Mp3Error subclasses ValueError


@needs_avref
def test_vbri_tag_frame_skipped(tmp_path):
    """FhG-style VBRI headers (offset 32 after the side info) mark the
    first frame as a tag frame: it must not decode as audio."""
    import struct

    p = str(tmp_path / "c.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100), 44100,
                           24, bit_rate=128000)
    data = open(p, "rb").read()
    st = m3._Stream(data, p)
    audio = data[st.frames[st.first_audio][0]:]   # drop the Xing frame
    fb = st.frames[0][2]
    tag = bytearray(data[st.frames[0][0]:st.frames[0][0] + 4]) \
        + bytearray(fb - 4)
    voff = 4 + 32
    tag[voff:voff + 4] = b"VBRI"
    struct.pack_into(">H", tag, voff + 4, 1)
    struct.pack_into(">I", tag, voff + 10, len(audio) + fb)
    struct.pack_into(">I", tag, voff + 14, len(st.frames) - 1)
    q = str(tmp_path / "vbri.mp3")
    open(q, "wb").write(bytes(tag) + audio)
    st2 = m3._Stream(open(q, "rb").read(), q)
    assert st2.info.tag_frame and st2.first_audio == 1
    assert st2.info.frames == len(st.frames) - 1
    out, rate = read_mp3(q)
    # no LAME delay/padding info in VBRI: whole frames, none from the tag
    assert out.shape == (2, (len(st.frames) - 1) * 1152)


@needs_avref
def test_resync_and_truncation(tmp_path):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(1, 44100), 44100,
                           24, bit_rate=128000)
    body = open(p, "rb").read()
    base, _ = read_mp3(p)
    # garbage prefix (not a tag, not a sync) -> scanner resyncs
    q = str(tmp_path / "junk.mp3")
    open(q, "wb").write(b"\x12\x34\x56\x00garbage" + body)
    ours, _ = read_mp3(q)
    assert np.array_equal(base, ours)
    # truncation mid-final-frame -> final frame dropped, no crash
    r2 = str(tmp_path / "trunc.mp3")
    open(r2, "wb").write(body[:-100])
    ours2, _ = read_mp3(r2)
    assert 0 < ours2.shape[1] <= base.shape[1]
    # pure garbage raises the container error
    bad = str(tmp_path / "bad.mp3")
    open(bad, "wb").write(b"\x00" * 4096)
    with pytest.raises(ValueError, match="no MPEG audio"):
        read_mp3(bad)


# ------------------------------------------------------------ reader


@needs_avref
def test_reader_random_access_bitwise(tmp_path):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100, 2.0),
                           44100, 24, bit_rate=160000)
    whole, rate = read_mp3(p)
    with Mp3Reader(p) as r:
        assert (r.sample_rate, r.num_channels) == (rate, 2)
        assert r.num_frames == whole.shape[1]
        # forward, deep seek, backward into the primed window, tiny reads
        reads = [(0, 1000), (50000, 3000), (40000, 500), (41000, 100),
                 (3, 7), (87000, 5000), (86000, 200), (0, 50),
                 (whole.shape[1] - 10, 100)]
        for start, count in reads:
            got = r.read(start, count)
            want = whole[:, start:start + count]
            assert got.shape == want.shape
            assert np.array_equal(got, want), (start, count)
    # chunked full read == whole decode, bitwise
    with Mp3Reader(p) as r:
        parts = []
        pos = 0
        while pos < r.num_frames:
            c = r.read(pos, 997)
            parts.append(c)
            pos += c.shape[1]
        assert np.array_equal(np.concatenate(parts, axis=1), whole)


@needs_avref
def test_reader_seek_worst_case_reservoir(tmp_path):
    """32 kbps @ 48 kHz noise: 96-byte frames with main_data_begin up to
    ~470 bytes (~6.5 frames of reservoir churn) — the hardest case for
    the 12-frame re-prime.  Random seeks must stay bitwise equal."""
    rng = np.random.default_rng(2)
    x = 0.25 * rng.standard_normal((1, 48000 * 4))
    codes = (np.clip(x, -0.99, 0.99) * (1 << 23)).astype(np.int32)
    p = str(tmp_path / "lo.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", codes, 48000, 24,
                           bit_rate=32000)
    whole, _ = read_mp3(p)
    with Mp3Reader(p) as r:
        rs = np.random.default_rng(100)
        for st_ in rs.integers(0, r.num_frames - 3000, 16):
            got = r.read(int(st_), 2000)
            assert np.array_equal(got, whole[:, int(st_):int(st_) + 2000])


@needs_avref
def test_reader_reprime_watermark(tmp_path):
    """A read landing INSIDE a previous restart's re-priming window (past
    buf_start but before the certified watermark) must trigger another,
    earlier restart — never serve samples from a still-converging decoder
    state.  Needs a stream long enough that the keep-window creates the
    gap."""
    p = str(tmp_path / "long.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(1, 44100, 6.0),
                           44100, 24, bit_rate=160000)
    whole, _ = read_mp3(p)
    spf = 1152
    with Mp3Reader(p) as r:
        n = r.num_frames
        assert n > 200 * spf
        a = r.read(n - 2000, 1000)              # deep forward read
        fidx = (150 * spf) // spf
        b = r.read(150 * spf, 500)              # backward -> restart
        # now land just after the restart point, inside its prime window
        c = r.read((fidx - 10) * spf, 300)
        d = r.read((fidx - 3) * spf, 300)
        for got, start, cnt in [(a, n - 2000, 1000), (b, 150 * spf, 500),
                                (c, (fidx - 10) * spf, 300),
                                (d, (fidx - 3) * spf, 300)]:
            assert np.array_equal(got, whole[:, start:start + cnt]), start


def test_huffman_native_python_direct_equivalence():
    """Feed the SAME random bits and granule parameters to the Python
    oracle and the native twin directly: identical (is_, rzero, pos) on
    success, and identical error behavior on hostile streams."""
    from f9tpu import native

    if not (native.available() and native.mp3_huff_available()):
        pytest.skip(f"native unavailable: {native.build_error()}")
    rng = np.random.default_rng(17)
    hdr = m3.FrameHeader(version=3, layer=3, crc=False, bitrate=128000,
                         rate=44100, padding=0, mode=3, mode_ext=0)
    agree = errors = 0
    for trial in range(400):
        g = m3._Granule()
        g.big_values = int(rng.integers(0, 289))
        g.count1table = int(rng.integers(0, 2))
        g.window_switching = bool(rng.integers(0, 2))
        if g.window_switching:
            g.block_type = int(rng.choice([1, 2, 3]))
            g.mixed = bool(rng.integers(0, 2))
            g.table_select = (int(rng.integers(0, 32)),
                              int(rng.integers(0, 32)), 0)
        else:
            g.table_select = tuple(int(v) for v in rng.integers(0, 32, 3))
            g.region0_count = int(rng.integers(0, 16))
            g.region1_count = int(rng.integers(0, 8))
        nbytes = int(rng.integers(40, 520))
        data = rng.integers(0, 256, nbytes, np.uint8).tobytes() \
            + b"\x00" * 80
        end = int(rng.integers(8, nbytes * 8))
        # pos > end is legal input (corrupt scalefactor overrun): both
        # paths must fail/succeed identically there too
        pos = int(rng.integers(0, end + 200)) if trial % 5 == 0 else 0
        try:
            want = m3._huffman_decode(data, pos, end, g, hdr)
            py_err = None
        except m3.Mp3Error:
            py_err = True
        big_end, r1, r2 = m3._hregions(g, hdr)
        tids, linbs = [], []
        for t in g.table_select:
            tbl, lb = m3.HUFF_SELECT[t]
            tids.append(-1 if tbl is None else tbl)
            linbs.append(lb)
        try:
            got = native.mp3_huffman_native(data, pos, end, big_end, r1, r2,
                                            tids, linbs, g.count1table)
            nat_err = None
        except ValueError:
            nat_err = True
        assert py_err == nat_err, (trial, py_err, nat_err)
        if py_err:
            errors += 1
            continue
        assert np.array_equal(want[0], got[0]), trial
        assert (want[1], want[2]) == (got[1], got[2]), trial
        agree += 1
    assert agree > 50 and errors > 50   # both regimes exercised


# ------------------------------------------------ dispatch + pipeline


@needs_avref
def test_codec_dispatch_and_policies(tmp_path):
    p = str(tmp_path / "t.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100), 44100,
                           24, bit_rate=128000)
    assert codec.is_supported(p)
    info = codec.probe(p)
    assert (info.container, info.sample_rate, info.num_channels) == \
        ("mp3", 44100, 2)
    y, r = codec.read_audio(p)
    assert r == 44100 and y.shape == (2, info.num_frames)
    with codec.open_reader(p) as rd:
        c = rd.read(100, 200)
        assert np.array_equal(c, y[:, 100:300])
    with pytest.raises(ValueError, match="raw integer"):
        codec.read_raw_pcm(p)
    done = []
    y2, r2 = codec.read_audio_progress(p, done.append)
    assert np.array_equal(y, y2) and done[-1] == 1.0


@needs_avref
def test_watch_sweeps_mp3_drop(tmp_path):
    """The serving daemon's drop zone accepts .mp3 (the reference shell
    lists every OS-decodable format in its drop filter)."""
    from f9tpu.cli import main

    d = tmp_path / "inbox"
    d.mkdir()
    avref.encode_file_opts("libmp3lame", str(d / "drop.mp3"), "mp3",
                           _tone(2, 44100, 0.3), 44100, 24,
                           bit_rate=192000)
    rc = main(["watch", str(d), "--out", str(tmp_path / "o"),
               "--rate", "48000", "--quality", "low", "--seed", "3",
               "--interval", "0.05", "--sweeps", "2"])
    assert rc == 0
    y, rate = codec.read_audio(str(tmp_path / "o" / "drop_processed.wav"))
    assert rate == 48000 and y.shape[0] == 2


@needs_avref
def test_preview_and_probe_mp3(tmp_path, capsys):
    """Preview playlists accept MP3 items; probe --json reports the
    container and the gapless-exact frame count."""
    import json as _json

    from f9tpu.cli import main
    from f9tpu.pipeline.preview import render_playlist

    p = str(tmp_path / "a.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100, 0.4),
                           44100, 24, bit_rate=192000)
    n = probe_mp3(p).num_frames
    pv, _, _ = render_playlist([p], 44100)
    assert pv.shape == (2, n) and np.isfinite(pv).all()
    rc = main(["probe", p, "--json"])
    assert rc == 0
    doc = _json.loads(capsys.readouterr().out)
    row = doc["files"][0] if isinstance(doc, dict) else doc[0]
    assert row["container"] == "mp3" and row["frames"] == n


@needs_avref
def test_mp3_batch_pipeline_end_to_end(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor

    p = str(tmp_path / "in.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100), 44100,
                           24, bit_rate=192000)
    cfg = ProcessingConfig(target_rate=48000, quality="low", bits=24,
                           output_dir=str(tmp_path / "out"), dither=False)
    res = BatchProcessor(cfg).run([p])
    assert (res.completed, res.failed) == (1, 0)
    outs = os.listdir(tmp_path / "out")
    assert len(outs) == 1
    y, r = codec.read_audio(str(tmp_path / "out" / outs[0]))
    assert r == 48000 and y.shape[0] == 2


@needs_avref
def test_stream_playlist_mp3_item(tmp_path):
    """Block-granular playlist rendering carries MP3 items through the
    chunked reader; bytes match the whole-decode render path."""
    from f9tpu.pipeline.preview import render_playlist, stream_playlist

    p = str(tmp_path / "a.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100, 0.5),
                           44100, 24, bit_rate=192000)
    o1 = str(tmp_path / "s.wav")
    stream_playlist([p], 44100, o1, quality="low")
    y1, r1 = codec.read_audio(o1)
    pv, _, _ = render_playlist([p], 44100, quality="low")
    assert r1 == 44100 and y1.shape[1] > 0 and np.isfinite(y1).all()
    assert y1.shape[0] == 2 and pv.shape[0] == 2


def test_unknown_formats_reject_with_reason(tmp_path):
    for ext, frag in [(".aac", "AAC"), (".opus", "Opus"), (".ape",
                      "Monkey"), (".wv", "WavPack"), (".wma", "WMA")]:
        p = str(tmp_path / f"x{ext}")
        open(p, "wb").write(b"\x00" * 32)
        assert not codec.is_supported(p)
        with pytest.raises(ValueError, match=frag):
            codec.probe(p)


@needs_avref
def test_mp3_streaming_pipeline_end_to_end(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    p = str(tmp_path / "s.mp3")
    avref.encode_file_opts("libmp3lame", p, "mp3", _tone(2, 44100, 1.5),
                           44100, 24, bit_rate=160000)
    out = str(tmp_path / "s.wav")
    cfg = ProcessingConfig(target_rate=32000, quality="low", bits=24,
                           output_dir=str(tmp_path))
    stream_resample_file(p, out, cfg, chunk_seconds=0.3)
    y, r = codec.read_audio(out)
    assert r == 32000 and y.shape[0] == 2
