"""Sun/NeXT .au decoder tests — conformance vectors from libavcodec
(tests/avref.py, the TEST-ONLY FFmpeg shim) for every encoding the shim
can write, hand-crafted files for the rest (float64, signed-8, unknown
data size), plus the io/codec dispatch, the raw device wire, and a batch
pipeline byte-identity check against a WAV twin.

Reference surface: the Swift shell reads anything AVAudioFile accepts
(/root/reference/_Swift Code/F9-Batch-Resampler/Models/AudioFile.swift:38),
which includes Core Audio's Sun AU reader."""

import os
import struct

import numpy as np
import pytest

import avref
from f9tpu.io import codec
from f9tpu.io.au import (AuError, AuReader, probe_au, read_au,
                         read_raw_pcm_au, _ULAW16, _ALAW16)

needs_avref = pytest.mark.skipif(
    not avref.available(), reason="avref unavailable")


def _sig(ch, n, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((ch, n))).clip(-0.95, 0.95)


def _make_au(enc_id, payload, rate=44100, ch=2, size=None, annot=b"\x00" * 4):
    hdr = b".snd" + struct.pack(
        ">IIIII", 24 + len(annot),
        len(payload) if size is None else size, enc_id, rate, ch)
    return hdr + annot + payload


# --------------------------------------------------------- conformance


@needs_avref
@pytest.mark.parametrize("enc,bits", [
    ("pcm_s16be", 16), ("pcm_s24be", 24), ("pcm_s32be", 32),
    ("pcm_f32be", 24), ("pcm_mulaw", 16), ("pcm_alaw", 16),
])
def test_au_cross_check_exact(tmp_path, enc, bits):
    """Every libavcodec-writable encoding decodes SAMPLE-EXACT (these are
    all fixed-point or float container formats — no tolerance)."""
    x = _sig(2, 8000)
    codes = (x * (1 << (bits - 1))).clip(
        -(1 << (bits - 1)), (1 << (bits - 1)) - 1).astype(np.int32)
    p = str(tmp_path / "t.au")
    avref.encode_file(enc, p, "au", codes, 44100, bits)
    ref, _rate, rb = avref.decode_file(p)
    reff = ref.astype(np.float64) / (1 << (rb - 1))
    ours, rate = read_au(p)
    assert rate == 44100 and ours.shape == reff.shape
    # the decoder emits float32 (the pipeline's dtype): for 32-bit codes
    # the comparison lives at float32 precision, exact everywhere else
    assert np.abs(ours - reff.astype(np.float32)).max() == 0.0


def test_au_handcrafted_f64_s8_and_unknown_size(tmp_path):
    x = _sig(2, 5000, seed=3)
    # float64, size field 0xFFFFFFFF (unknown -> use the on-disk size)
    p = str(tmp_path / "f64.au")
    open(p, "wb").write(_make_au(7, x.T.astype(">f8").tobytes(),
                                 size=0xFFFFFFFF))
    y, r = read_au(p)
    assert np.array_equal(y, x.astype(np.float32))
    info = probe_au(p)
    assert (info.bit_depth, info.is_float, info.num_frames) == (64, True,
                                                                5000)
    # signed 8-bit with an annotation field before the data
    s8 = (x.T * 128).clip(-128, 127).astype(np.int8)
    q = str(tmp_path / "s8.snd")
    open(q, "wb").write(_make_au(2, s8.tobytes(), annot=b"hello\x00\x00\x00"))
    y2, _ = read_au(q)
    assert np.array_equal(y2, (s8.astype(np.float32) / 128.0).T)


def test_au_rejects_garbage(tmp_path):
    p = str(tmp_path / "x.au")
    open(p, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="snd magic"):
        read_au(p)
    open(p, "wb").write(_make_au(99, b"\x00" * 64))
    with pytest.raises(ValueError, match="encoding"):
        read_au(p)


def test_g711_tables_match_spec_edges():
    """ITU G.711 pins: the two zero codes, the exact full-scale
    magnitudes (32124 mu / 32256 A), and byte-level sign symmetry."""
    assert _ULAW16[0xFF] == 0 and _ULAW16[0x7F] == 0
    assert _ULAW16[0x00] == -32124 and _ULAW16[0x80] == 32124
    u = _ULAW16.astype(np.int64)
    assert np.array_equal(u[:128], -u[128:])
    a = _ALAW16.astype(np.int64)
    assert np.array_equal(a[:128], -a[128:])
    assert int(np.abs(u).max()) == 32124 and int(np.abs(a).max()) == 32256


# --------------------------------------------------------- reader + dispatch


@needs_avref
def test_au_reader_random_access_and_dispatch(tmp_path):
    x = _sig(2, 20000, seed=5)
    codes = (x * 32768).clip(-32768, 32767).astype(np.int32)
    p = str(tmp_path / "t.au")
    avref.encode_file("pcm_s16be", p, "au", codes, 48000, 16)
    assert codec.is_supported(p)
    info = codec.probe(p)
    assert (info.container, info.sample_rate, info.bit_depth,
            info.byte_order) == ("au", 48000, 16, "big")
    whole, r = codec.read_audio(p)
    with codec.open_reader(p) as rd:
        for start, cnt in [(100, 300), (0, 16), (19990, 100), (7777, 1)]:
            got = rd.read(start, cnt)
            assert np.array_equal(got, whole[:, start:start + cnt])
    done = []
    y2, _ = codec.read_audio_progress(p, done.append, chunk_frames=4096)
    assert np.array_equal(whole, y2) and done[-1] == 1.0


@needs_avref
def test_au_raw_wire_payloads(tmp_path):
    x = _sig(2, 4000, seed=7)
    # linear 24-bit: container bytes verbatim
    c24 = (x * (1 << 23)).clip(-(1 << 23), (1 << 23) - 1).astype(np.int32)
    p = str(tmp_path / "t.au")
    avref.encode_file("pcm_s24be", p, "au", c24, 44100, 24)
    payload, info = codec.read_raw_pcm(p)
    want = np.ascontiguousarray(c24.T.astype(">i4")).view(np.uint8)
    want = want.reshape(-1, 4)[:, 1:].reshape(-1)   # top 3 bytes of >i4
    assert info.bit_depth == 24 and np.array_equal(payload, want)
    # G.711: expands to the exact int16 codes on the host
    c16 = (x * 32768).clip(-32768, 32767).astype(np.int32)
    q = str(tmp_path / "u.au")
    avref.encode_file("pcm_mulaw", q, "au", c16, 44100, 16)
    payload2, info2 = codec.read_raw_pcm(q)
    raw = np.frombuffer(open(q, "rb").read(), np.uint8)
    off = struct.unpack_from(">I", raw, 4)[0]
    want2 = np.ascontiguousarray(
        _ULAW16[raw[off:off + 8000]].astype(">i2")).view(np.uint8)
    assert info2.bit_depth == 16 and np.array_equal(payload2, want2)
    # float .au has no integer wire
    f = str(tmp_path / "f.au")
    open(f, "wb").write(_make_au(6, x.T.astype(">f4").tobytes()))
    with pytest.raises(ValueError, match="raw integer"):
        codec.read_raw_pcm(f)


@needs_avref
def test_au_batch_matches_wav_bytes(tmp_path):
    """A 16-bit .au source and a WAV holding the SAME samples produce
    byte-identical batch output with dither off (.au rides the raw
    device wire; the WAV twin is the reference path)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.io.wav import write_wav_codes
    from f9tpu.pipeline.scheduler import BatchProcessor

    x = _sig(2, 20000, seed=9)
    c16 = (x * 32768).clip(-32768, 32767).astype(np.int32)
    ap = str(tmp_path / "src_a.au")
    avref.encode_file("pcm_s16be", ap, "au", c16, 44100, 16)
    wp = str(tmp_path / "src_b.wav")
    write_wav_codes(wp, c16, 44100, bits=16)
    cfg = ProcessingConfig(target_rate=48000, quality="low", bits=24,
                           output_dir=str(tmp_path / "out"), dither=False)
    res = BatchProcessor(cfg).run([ap, wp])
    assert (res.completed, res.failed) == (2, 0)
    outs = sorted(os.listdir(tmp_path / "out"))
    outs = [o for o in outs if o.endswith(".wav")]
    assert len(outs) == 2
    b0 = open(tmp_path / "out" / outs[0], "rb").read()
    b1 = open(tmp_path / "out" / outs[1], "rb").read()
    assert b0 == b1
