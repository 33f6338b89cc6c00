"""ALAC / CAF / M4A decoder tests.

Same three-layer strategy as FLAC and Vorbis (tests/test_flac.py,
tests/test_vorbis.py):

1. conformance — libavcodec-encoded ALAC vectors in CAF and M4A
   (tests/avref.py) decoded by the product and cross-checked against the
   libavcodec decoder, bit-exact (lossless);
2. spec-only paths the reference encoder never emits — verbatim
   (escape) elements, order-31 first-difference prediction, mode-15
   double-stage prediction, bytes_shifted low-byte storage — exercised
   by HAND-ASSEMBLED packets against a test-side adaptive-Rice encoder
   that mirrors the decoder's parameter track;
3. container robustness + the io/codec dispatch surface.
"""

import os
import struct

import numpy as np
import pytest

import avref
from f9tpu.io import codec
from f9tpu.io.alac import AlacDecoder, AlacError, parse_alac_cookie
from f9tpu.io.caf import CafError, CafReader, probe_caf, read_caf
from f9tpu.io.mp4 import M4aReader, Mp4Error, probe_m4a, read_m4a

needs_avref = pytest.mark.skipif(
    not avref.available(), reason=f"avref unavailable")


@pytest.fixture(params=["native", "python"])
def decode_path(request, monkeypatch):
    """Run decoder tests against BOTH the native C++ packet decoder and
    the pure-Python spec oracle (they must agree bit-for-bit) — the FLAC
    suite's dual-path pattern."""
    if request.param == "python":
        monkeypatch.setattr(AlacDecoder, "decode_packet",
                            AlacDecoder._decode_packet_py)
    else:
        from f9tpu import native

        if not native.available():
            pytest.skip(f"native unavailable: {native.build_error()}")
    return request.param


def _sig(ch, T, bits, kind="tones", seed=0):
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    t = np.arange(T)
    if kind == "noise":
        return rng.integers(-lim, lim, (ch, T)).astype(np.int64)
    if kind == "silence":
        return np.zeros((ch, T), np.int64)
    if kind == "transient":
        x = 0.01 * rng.standard_normal((ch, T))
        for k in range(50, T, 3000):
            x[:, k:k + 40] += 0.8 * rng.standard_normal((ch, 40))
    else:
        x = np.stack([0.4 * np.sin(2 * np.pi * (220 + 97 * c) * t / 44100)
                      + rng.normal(0, 2e-4, T) for c in range(ch)])
    return np.clip(lim * x, -lim, lim - 1).astype(np.int64)


# --------------------------------------------------------- conformance


@needs_avref
@pytest.mark.parametrize("fmt,ext", [("caf", "caf"), ("ipod", "m4a")])
@pytest.mark.parametrize("ch,T,bits,kind", [
    (2, 44100, 24, "tones"),
    (1, 12345, 16, "transient"),
    (2, 4095, 16, "noise"),        # escapes + a sub-block final packet
    (2, 9000, 24, "silence"),      # zero-run blocks
    (4, 16000, 24, "tones"),       # SCE/CPE multichannel + remap
    (6, 12000, 16, "tones"),       # 5.1 layout
])
def test_alac_cross_check(tmp_path, fmt, ext, ch, T, bits, kind,
                          decode_path):
    codes = _sig(ch, T, bits, kind)
    p = str(tmp_path / f"v.{ext}")
    avref.encode_file("alac", p, fmt, codes, 44100, bits)
    y, rate = codec.read_audio(p)
    ref, rr, rb = avref.decode_file(p)
    assert (rate, rr, rb) == (44100, 44100, bits)
    want = ref.astype(np.float32) / (1 << (bits - 1))
    assert y.shape == want.shape == (ch, T)
    assert np.array_equal(y, want)            # lossless: bit-exact
    info = codec.probe(p)
    assert (info.num_frames, info.num_channels, info.bit_depth) == (T, ch,
                                                                    bits)


@needs_avref
def test_caf_lpcm_decode(tmp_path):
    codes = _sig(2, 20000, 24, "tones")
    for codec_name, bits in [("pcm_s16le", 16), ("pcm_s16be", 16),
                             ("pcm_s24le", 24), ("pcm_s24be", 24),
                             ("pcm_s32le", 32), ("pcm_f32be", 24)]:
        p = str(tmp_path / f"{codec_name}.caf")
        c = codes >> (24 - bits) if bits < 24 else codes << (bits - 24)
        try:
            avref.encode_file(codec_name, p, "caf", c, 48000, bits)
        except AssertionError:
            continue                           # muxer refuses this pcm
        y, rate = read_caf(p)
        ref, rr, rb = avref.decode_file(p)
        assert rate == rr == 48000
        np.testing.assert_allclose(
            y, ref.astype(np.float32) / (1 << (rb - 1)), atol=2e-7,
            err_msg=codec_name)
        assert probe_caf(p).num_frames == codes.shape[1]


@needs_avref
def test_reader_random_access(tmp_path):
    codes = _sig(2, 50000, 24, "transient", seed=3)
    rng = np.random.default_rng(4)
    for fmt, ext, cls in [("caf", "caf", CafReader),
                          ("ipod", "m4a", M4aReader)]:
        p = str(tmp_path / f"ra.{ext}")
        avref.encode_file("alac", p, fmt, codes, 44100, 24)
        whole, _ = codec.read_audio(p)
        with cls(p) as r:
            assert r.num_frames == 50000
            for _ in range(40):
                start = int(rng.integers(0, 50000))
                cnt = int(rng.integers(1, 9000))
                got = r.read(start, cnt)
                assert np.array_equal(got, whole[:, start:start + cnt])
            assert r.read(50000, 10).shape == (2, 0)


@needs_avref
def test_codec_dispatch_and_policies(tmp_path):
    codes = _sig(2, 8000, 16, "tones")
    p = str(tmp_path / "in.caf")
    avref.encode_file("alac", p, "caf", codes, 44100, 16)
    assert codec.is_supported(p)
    with codec.open_reader(p) as r:
        assert r.read(100, 50).shape == (2, 50)
    with pytest.raises(ValueError, match="raw integer"):
        codec.read_raw_pcm(p)
    # AAC in .m4a is rejected with the lossy message
    p2 = str(tmp_path / "aac.m4a")
    avref.encode_file("aac", p2, "ipod", codes, 44100, 16)
    with pytest.raises(ValueError, match="lossy"):
        codec.read_audio(p2)


@needs_avref
def test_corrupt_packets_raise(tmp_path):
    codes = _sig(2, 9000, 24, "tones")
    p = str(tmp_path / "c.caf")
    avref.encode_file("alac", p, "caf", codes, 44100, 24)
    data = bytearray(open(p, "rb").read())
    # truncate mid-data: the reader must raise, not return garbage
    short = str(tmp_path / "short.caf")
    open(short, "wb").write(bytes(data[: len(data) // 2]))
    with pytest.raises((CafError, ValueError)):
        read_caf(short)


def test_cookie_validation():
    good = struct.pack(">IBBBBBBHIII", 4096, 0, 24, 40, 10, 14, 2, 255,
                       0, 0, 44100)
    cfg = parse_alac_cookie(good)
    assert (cfg.frame_length, cfg.bit_depth, cfg.num_channels,
            cfg.sample_rate) == (4096, 24, 2, 44100)
    with pytest.raises(AlacError, match="version"):
        parse_alac_cookie(struct.pack(">IBBBBBBHIII", 4096, 9, 24, 40, 10,
                                      14, 2, 255, 0, 0, 44100))
    with pytest.raises(AlacError, match="too short"):
        parse_alac_cookie(b"\x00" * 8)


# --------------------------------------------------------- hand-built
# packets: spec paths the reference encoder never emits


class _BW:
    """MSB-first bit writer (the ALAC packing convention)."""

    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v, n):
        self.w(v & ((1 << n) - 1), n)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


def _cookie(frame_length=64, bits=16, ch=1, pb=40, mb=10, kb=14,
            rate=44100):
    return struct.pack(">IBBBBBBHIII", frame_length, 0, bits, pb, mb, kb,
                       ch, 255, 0, 0, rate)


def _rice_encode(bw, values, bps, cfg, history_mult):
    """Test-side adaptive-Rice encoder mirroring the decoder's parameter
    track exactly (zigzag, history decay, escapes; no zero-run blocks —
    the values are chosen to keep the history above the threshold)."""
    history = cfg.mb
    for v in values:
        k = min(((history >> 9) + 3).bit_length() - 1, cfg.kb)
        x = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
        x = (abs(v) << 1) - (1 if v < 0 else 0)
        # unary prefix + truncated binary against m = 2^k - 1
        m = (1 << k) - 1
        q = x // m if k > 1 else x
        if (k > 1 and q > 8) or (k == 1 and x > 8):
            bw.w((1 << 9) - 1, 9)               # nine ones: escape
            bw.w(x, bps)
        elif k == 1:
            bw.w(((1 << x) - 1) << 1, x + 1)    # x ones + zero
        else:
            r = x - q * m
            bw.w(((1 << q) - 1) << 1, q + 1)
            if r == 0:
                bw.w(0, k - 1)
            else:
                bw.w(r + 1, k)
        if x > 0xFFFF:
            history = 0xFFFF
        else:
            history += x * history_mult - ((history * history_mult) >> 9)
        assert history >= 128, "test signal dipped into zero-run territory"


def test_handbuilt_verbatim_element(decode_path):
    """Escape (uncompressed) element: raw bit_depth-bit samples."""
    cfg = _cookie(frame_length=8, bits=16, ch=1)
    vals = [100, -200, 32767, -32768, 0, 5, -5, 1]
    bw = _BW()
    bw.w(0, 3)                                  # SCE
    bw.w(0, 4)
    bw.w(0, 12)
    bw.w(0, 1)                                  # has_size = 0
    bw.w(0, 2)                                  # bytes_shifted
    bw.w(1, 1)                                  # escape: verbatim
    for v in vals:
        bw.ws(v, 16)
    bw.w(7, 3)                                  # END
    out = AlacDecoder(cfg).decode_packet(bw.bytes())
    assert out.shape == (1, 8)
    assert out[0].tolist() == vals


def test_handbuilt_order31_first_difference(decode_path):
    """lpc_order == 31: pure cumulative sum of the residuals."""
    cookie = _cookie(frame_length=16, bits=16, ch=1)
    cfg = parse_alac_cookie(cookie)
    res = [10, 3, -2, 5, 0, 1, -1, 2, 7, -4, 3, 3, -6, 1, 0, 2]
    bw = _BW()
    bw.w(0, 3)
    bw.w(0, 4)
    bw.w(0, 12)
    bw.w(0, 1)
    bw.w(0, 2)
    bw.w(0, 1)                                  # compressed
    # mono: no mixBits/mixRes? (spec: the pair is ALWAYS present)
    bw.w(0, 8)                                  # mixBits
    bw.ws(0, 8)                                 # mixRes
    bw.w(0, 4)                                  # mode 0
    bw.w(9, 4)                                  # quant (unused at order 31)
    bw.w(4, 3)                                  # pbFactor
    bw.w(31, 5)                                 # order 31
    for _ in range(31):                         # coefs present even at 31
        bw.ws(0, 16)
    _rice_encode(bw, res, 16, cfg, (cfg.pb * 4) >> 2)
    bw.w(7, 3)
    out = AlacDecoder(cookie).decode_packet(bw.bytes())
    expect = np.cumsum(res)
    assert out[0].tolist() == expect.tolist()


def test_handbuilt_mode15_and_bytes_shifted(decode_path):
    """mode 15 (extra first-difference stage) + bytes_shifted=1 (low
    byte stored raw): both undone in the documented order."""
    cookie = _cookie(frame_length=8, bits=24, ch=1)
    cfg = parse_alac_cookie(cookie)
    res = [5, 2, -1, 3, 1, -2, 0, 4]
    low = [0x12, 0x34, 0x56, 0x78, 0x9A, 0xBC, 0xDE, 0xF0]
    bw = _BW()
    bw.w(0, 3)
    bw.w(0, 4)
    bw.w(0, 12)
    bw.w(0, 1)
    bw.w(1, 2)                                  # bytes_shifted = 1
    bw.w(0, 1)                                  # compressed
    bw.w(0, 8)
    bw.ws(0, 8)
    bw.w(15, 4)                                 # mode 15
    bw.w(9, 4)
    bw.w(4, 3)
    bw.w(0, 5)                                  # order 0 (passthrough)
    for b in low:                               # shifted bytes, pre-rice
        bw.w(b, 8)
    bps = 24 - 8 + 1 - 1                        # bits - shift + ch - 1
    _rice_encode(bw, res, bps, cfg, (cfg.pb * 4) >> 2)
    bw.w(7, 3)
    out = AlacDecoder(cookie).decode_packet(bw.bytes())
    # mode 15 integrates once; order 0 passes through; shift reattaches
    stage = np.cumsum(res)
    expect = [(int(s) << 8) | b for s, b in zip(stage, low)]
    assert out[0].tolist() == expect


def test_hostile_lpc_guard(decode_path):
    """A crafted packet whose adaptive prediction blows past 2^40 must
    raise, not emit wrapped garbage (the FLAC decoder's rule)."""
    cookie = _cookie(frame_length=64, bits=32, ch=1, kb=31)
    cfg = parse_alac_cookie(cookie)
    bw = _BW()
    bw.w(0, 3)
    bw.w(0, 4)
    bw.w(0, 12)
    bw.w(0, 1)
    bw.w(0, 2)
    bw.w(0, 1)
    bw.w(0, 8)
    bw.ws(0, 8)
    bw.w(0, 4)
    bw.w(1, 4)                                  # quant 1: minimal damping
    bw.w(4, 3)
    bw.w(1, 5)                                  # order 1
    bw.ws(32767, 16)                            # huge coefficient
    res = [1 << 30] * 64
    _rice_encode(bw, res, 32, cfg, (cfg.pb * 4) >> 2)
    bw.w(7, 3)
    with pytest.raises(AlacError,
                       match="out of range|truncated|malformed"):
        AlacDecoder(cookie).decode_packet(bw.bytes())


def test_truncated_packet_raises(decode_path):
    cfg = _cookie(frame_length=64, bits=16, ch=2)
    with pytest.raises(AlacError, match="truncated|malformed"):
        AlacDecoder(cfg).decode_packet(b"\x00\x01")


# --------------------------------------------------------- pipeline e2e


@needs_avref
def test_alac_batch_pipeline_end_to_end(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor

    codes = _sig(2, 20000, 24, "tones")
    srcs = []
    for fmt, ext in [("caf", "caf"), ("ipod", "m4a")]:
        p = str(tmp_path / f"in.{ext}")
        avref.encode_file("alac", p, fmt, codes, 44100, 24)
        srcs.append(p)
    cfg = ProcessingConfig(target_rate=48000, quality="low", bits=24,
                           output_dir=str(tmp_path / "out"), dither=False)
    res = BatchProcessor(cfg).run(srcs)
    assert (res.completed, res.failed) == (2, 0)
    outs = sorted(os.listdir(tmp_path / "out"))
    assert len(outs) == 2
    # identical samples in both containers -> byte-identical deliverables
    # (dither off: per-file noise is seeded by PATH, by design)
    b0 = open(tmp_path / "out" / outs[0], "rb").read()
    b1 = open(tmp_path / "out" / outs[1], "rb").read()
    assert b0 == b1


@needs_avref
def test_alac_streaming_pipeline_end_to_end(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    codes = _sig(2, 50000, 24, "transient", seed=9)
    src = str(tmp_path / "s.caf")
    avref.encode_file("alac", src, "caf", codes, 44100, 24)
    out = str(tmp_path / "s.wav")
    cfg = ProcessingConfig(target_rate=32000, quality="low", bits=24,
                           output_dir=str(tmp_path))
    stream_resample_file(src, out, cfg, chunk_seconds=0.3)
    y, r = codec.read_audio(out)
    assert r == 32000 and y.shape[0] == 2
