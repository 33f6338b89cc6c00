"""WAV/AIFF codec round-trip and metadata tests (L0 layer, SURVEY.md section 1)."""

import os

import numpy as np
import pytest

from f9tpu.io import (
    probe,
    read_audio,
    read_wav,
    write_wav,
    write_wav_codes,
    write_aiff,
    read_aiff,
    is_supported,
)


def sig(channels=2, frames=4411, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(0.5 * rng.standard_normal((channels, frames)), -0.999, 0.999).astype(np.float32)


@pytest.mark.parametrize("bits,tol", [(16, 2**-15), (24, 2**-23)])
def test_wav_pcm_roundtrip(tmp_path, bits, tol):
    x = sig()
    p = str(tmp_path / f"t{bits}.wav")
    write_wav(p, x, 44100, bits=bits)
    y, rate = read_wav(p)
    assert rate == 44100 and y.shape == x.shape
    assert np.abs(y - x).max() <= tol


def test_wav_float32_roundtrip(tmp_path):
    x = sig(1, 1000)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 96000, bits=32)
    y, rate = read_wav(p)
    assert rate == 96000
    assert np.array_equal(y, x)  # float path is bit-exact


def test_wav_codes_24bit_exact(tmp_path):
    """Pre-quantized device codes must round-trip bit-exactly (the reference's
    24-bit output contract, Source/MainComponent.cpp:784-801)."""
    rng = np.random.default_rng(1)
    codes = rng.integers(-(2**23), 2**23, size=(2, 999), dtype=np.int32)
    p = str(tmp_path / "codes.wav")
    write_wav_codes(p, codes, 48000, bits=24)
    y, rate = read_wav(p)
    back = np.round(y * 8388608.0).astype(np.int32)
    assert np.array_equal(back, codes)


def test_probe_wav(tmp_path):
    x = sig(2, 44100)
    p = str(tmp_path / "probe.wav")
    write_wav(p, x, 44100, bits=24)
    info = probe(p)
    assert info.sample_rate == 44100
    assert info.num_channels == 2
    assert info.num_frames == 44100
    assert info.bit_depth == 24
    assert abs(info.duration_seconds - 1.0) < 1e-9
    # the ±1 Hz session-rate validation (Source/AppState.h:137-141)
    assert info.is_valid_for_rate(44100)
    assert not info.is_valid_for_rate(48000)


@pytest.mark.parametrize("bits,tol", [(16, 2**-15), (24, 2**-23)])
def test_aiff_roundtrip(tmp_path, bits, tol):
    x = sig(2, 3001, seed=2)
    p = str(tmp_path / f"t{bits}.aiff")
    write_aiff(p, x, 88200, bits=bits)
    y, rate = read_aiff(p)
    assert rate == 88200 and y.shape == x.shape
    assert np.abs(y - x).max() <= tol
    info = probe(p)
    assert info.sample_rate == 88200 and info.num_frames == 3001


def test_codec_dispatch(tmp_path):
    x = sig(1, 128, seed=3)
    for name in ("a.wav", "b.aif"):
        p = str(tmp_path / name)
        (write_wav if name.endswith("wav") else write_aiff)(p, x, 44100, bits=24)
        y, rate = read_audio(p)
        assert rate == 44100 and y.shape == x.shape
    assert is_supported("x.WAV") and is_supported("y.Aiff") and not is_supported("z.aac")


def test_mono_file(tmp_path):
    x = sig(1, 777, seed=4)
    p = str(tmp_path / "mono.wav")
    write_wav(p, x[0], 44100)  # 1-D input accepted
    y, _ = read_wav(p)
    assert y.shape == (1, 777)


def test_truncated_wav_raises(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        read_wav(p)


def test_aifc_sowt_and_fl32_decode(tmp_path):
    """AIFC little-endian ('sowt') and float32 ('fl32') variants decode
    correctly (JUCE's format manager accepts these; SURVEY.md section 2.3)."""
    import struct

    from f9tpu.io.aiff import _write_extended80

    def make_aifc(comp, payload, bits, frames, channels=1, rate=44100):
        comm = (struct.pack(">hIh", channels, frames, bits)
                + _write_extended80(float(rate)) + comp + b"\x00\x00")
        ssnd = struct.pack(">II", 0, 0) + payload
        body = b"AIFC"
        body += b"FVER" + struct.pack(">II", 4, 0xA2805140)
        body += b"COMM" + struct.pack(">I", len(comm)) + comm
        body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        return b"FORM" + struct.pack(">I", len(body)) + body

    rng = np.random.default_rng(6)
    x = np.clip(0.5 * rng.standard_normal(1000), -0.999, 0.999).astype(np.float32)

    # sowt: little-endian int16
    codes = np.round(x * 32768).clip(-32768, 32767).astype("<i2")
    p = str(tmp_path / "sowt.aiff")
    with open(p, "wb") as f:
        f.write(make_aifc(b"sowt", codes.tobytes(), 16, 1000))
    y, rate = read_audio(p)
    assert rate == 44100
    assert np.abs(y[0] - x).max() <= 2**-15 + 1e-7

    # fl32: big-endian float32
    p2 = str(tmp_path / "fl32.aiff")
    with open(p2, "wb") as f:
        f.write(make_aifc(b"fl32", x.astype(">f4").tobytes(), 32, 1000))
    y2, rate2 = read_audio(p2)
    assert rate2 == 44100
    assert np.array_equal(y2[0], x)


def test_wav_with_large_metadata_chunk(tmp_path):
    """Broadcast-WAV style: a large 'bext' chunk before 'data' must not break
    probing, streaming reads, or the raw upload path."""
    import struct

    from f9tpu.io import WavReader, read_raw_pcm

    x = sig(2, 1000, seed=7)
    base = str(tmp_path / "plain.wav")
    write_wav(base, x, 48000, bits=24)
    with open(base, "rb") as f:
        raw = f.read()
    # splice a 100 KB bext chunk between fmt and data
    hdr, rest = raw[:12], raw[12:]
    fmt_chunk = rest[: 8 + 16]
    data_chunk = rest[8 + 16:]
    bext = b"bext" + struct.pack("<I", 100_000) + b"\x00" * 100_000
    body = fmt_chunk + bext + data_chunk
    p = str(tmp_path / "bext.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)

    info = probe(p)
    assert info.num_frames == 1000 and info.sample_rate == 48000
    y, rate = read_audio(p)
    assert y.shape == (2, 1000)
    with WavReader(p) as rd:
        assert rd.num_frames == 1000
        blk = rd.read(500, 100)
        assert np.abs(blk - y[:, 500:600]).max() == 0
    rawb, info2 = read_raw_pcm(p)
    assert len(rawb) == 1000 * 2 * 3


def test_odd_sized_data_chunk_pads(tmp_path):
    """Mono 24-bit with odd frame count: data chunk gets its RIFF pad byte."""
    x = sig(1, 333, seed=8)
    p = str(tmp_path / "odd.wav")
    write_wav(p, x, 44100, bits=24)
    assert os.path.getsize(p) == 44 + 333 * 3 + 1  # header + data + pad
    y, _ = read_wav(p)
    assert y.shape == (1, 333)


def test_truncated_24bit_payload(tmp_path):
    """A partial trailing sample decodes by dropping it, native or not."""
    x = sig(1, 100, seed=9)
    p = str(tmp_path / "trunc.wav")
    write_wav(p, x, 44100, bits=24)
    with open(p, "rb") as f:
        raw = f.read()
    with open(p, "wb") as f:
        f.write(raw[:-2])  # chop into the last sample
    y, _ = read_wav(p)
    assert y.shape[1] in (99, 100)  # no crash; partial sample dropped


def test_fuzzed_wav_headers_never_crash(tmp_path):
    """Random corruption of valid WAV bytes: decode either succeeds or raises
    ValueError — never segfaults, hangs, or throws unexpected types."""
    rng = np.random.default_rng(123)
    x = sig(2, 500, seed=10)
    base = str(tmp_path / "base.wav")
    write_wav(base, x, 44100, bits=24)
    with open(base, "rb") as f:
        raw = bytearray(f.read())
    for trial in range(200):
        buf = bytearray(raw)
        n_flips = rng.integers(1, 8)
        for _ in range(n_flips):
            pos = int(rng.integers(0, min(len(buf), 128)))  # header region
            buf[pos] = int(rng.integers(0, 256))
        p = str(tmp_path / "fuzz.wav")
        with open(p, "wb") as f:
            f.write(bytes(buf))
        try:
            y, rate = read_wav(p)
            assert y.ndim == 2  # decoded something structurally sane
        except (ValueError, ZeroDivisionError, OverflowError, MemoryError):
            pass  # clean rejection is fine
        try:
            probe(p)
        except (ValueError, ZeroDivisionError, OverflowError, MemoryError):
            pass


def test_fuzzed_aiff_headers_never_crash(tmp_path):
    rng = np.random.default_rng(321)
    x = sig(1, 300, seed=11)
    base = str(tmp_path / "base.aiff")
    write_aiff(base, x, 44100, bits=16)
    with open(base, "rb") as f:
        raw = bytearray(f.read())
    for trial in range(200):
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, min(len(buf), 96)))
            buf[pos] = int(rng.integers(0, 256))
        p = str(tmp_path / "fuzz.aiff")
        with open(p, "wb") as f:
            f.write(bytes(buf))
        try:
            read_aiff(p)
        except (ValueError, ZeroDivisionError, OverflowError, MemoryError,
                OSError):
            pass


def test_probe_fuzz_never_crashes(tmp_path):
    """Random garbage, truncated containers, and hostile headers must only
    raise the documented error set — never hang, loop, or segfault (the
    production drop-zone takes arbitrary files)."""
    import struct

    from f9tpu.io import codec

    rng = np.random.default_rng(0)
    cases = []
    # pure garbage of various sizes
    for n in (0, 1, 3, 11, 44, 100, 4096):
        cases.append(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    # plausible RIFF/FORM prefixes with hostile bodies
    for tag in (b"RIFF", b"FORM", b"RIFX"):
        for body in (b"", b"\x00" * 8, b"WAVE", b"AIFF",
                     b"WAVEfmt " + b"\xff" * 40,
                     b"WAVE" + b"fmt \xff\xff\xff\x7f" + b"\x00" * 16,
                     b"AIFFCOMM\xff\xff\xff\x7f" + b"\x00" * 18):
            cases.append(tag + struct.pack("<I", len(body)) + body)
    # a valid header whose declared sizes exceed the file
    good = tmp_path / "good.wav"
    from f9tpu.io import wav

    wav.write_wav(str(good), np.zeros((1, 100), np.float32), 44100, bits=24)
    data = good.read_bytes()
    cases.append(data[: len(data) // 2])                  # truncated payload
    cases.append(data[:40])                               # truncated header
    hacked = bytearray(data)
    hacked[4:8] = struct.pack("<I", 0xFFFFFFF0)           # absurd RIFF size
    cases.append(bytes(hacked))

    for i, blob in enumerate(cases):
        p = tmp_path / f"fuzz_{i}.wav"
        p.write_bytes(blob)
        try:
            info = codec.probe(str(p))
            # a parse that *succeeds* must still report sane fields
            assert info.num_frames >= 0 and info.sample_rate > 0
        except (ValueError, OSError, EOFError, struct.error):
            pass  # the documented failure set

    # and the scheduler turns any of them into a per-file FAILED, not a crash
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor

    files = [str(tmp_path / f"fuzz_{i}.wav") for i in range(len(cases))]
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), quality="low")
    res = BatchProcessor(cfg).run(files)
    assert res.completed + res.failed + res.invalid == len(files)


def test_batch_aiff_output_matches_wav(tmp_path):
    """cfg.output_format='aiff' emits big-endian AIFF with the SAME codes as
    the WAV run (same seed -> identical device output, different container)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.io.aiff import read_aiff
    from f9tpu.pipeline import BatchProcessor

    (tmp_path / "in").mkdir()
    rng = np.random.default_rng(17)
    x = (0.3 * rng.standard_normal((2, 9000))).astype(np.float32)
    src = str(tmp_path / "in" / "t.wav")
    write_wav(src, x, 44100, bits=24)

    cfg_w = ProcessingConfig(output_dir=str(tmp_path / "ow"), target_rate=48000,
                             quality="low", seed=5)
    cfg_a = ProcessingConfig(output_dir=str(tmp_path / "oa"), target_rate=48000,
                             quality="low", seed=5, output_format="aiff")
    assert BatchProcessor(cfg_w).run([src]).completed == 1
    assert BatchProcessor(cfg_a).run([src]).completed == 1
    yw, rw = read_wav(str(tmp_path / "ow" / "t_processed.wav"))
    ya, ra = read_aiff(str(tmp_path / "oa" / "t_processed.aiff"))
    assert rw == ra == 48000
    np.testing.assert_array_equal(
        np.round(yw * (1 << 23)), np.round(ya * (1 << 23)))


def test_aiff_codes_and_payload_writers_roundtrip(tmp_path):
    from f9tpu.io.aiff import read_aiff, write_aiff_codes, write_aiff_payload
    from f9tpu.io.wav import _pack24_dispatch

    rng = np.random.default_rng(18)
    codes = rng.integers(-(2**23), 2**23, size=(2, 1000), dtype=np.int32)
    p = str(tmp_path / "c.aiff")
    write_aiff_codes(p, codes, 48000, bits=24)
    y, r = read_aiff(p)
    assert r == 48000
    np.testing.assert_array_equal(np.round(y * (1 << 23)), codes)

    # device-packed little-endian payload path
    inter = np.ascontiguousarray(codes.T).reshape(-1)
    payload = _pack24_dispatch(inter)
    p2 = str(tmp_path / "p.aiff")
    write_aiff_payload(p2, payload, 2, 48000, bits=24)
    y2, _ = read_aiff(p2)
    np.testing.assert_array_equal(np.round(y2 * (1 << 23)), codes)

    # round 4: 16-bit payloads are a supported wire too (the batch narrow
    # wire) — LE int16 bytes swap to BE on write and round-trip exactly
    codes16 = (codes >> 8).astype(np.int32)
    p3 = str(tmp_path / "p16.aiff")
    payload16 = np.ascontiguousarray(
        codes16.T.astype("<i2")).view(np.uint8).reshape(-1)
    write_aiff_payload(p3, payload16, 2, 48000, bits=16)
    y3, _ = read_aiff(p3)
    np.testing.assert_array_equal(np.round(y3 * (1 << 15)), codes16)

    with pytest.raises(ValueError, match="16- or 24-bit"):
        write_aiff_payload(p2, payload, 2, 48000, bits=32)


def test_aiff_incremental_writer_roundtrip(tmp_path):
    """AiffWriter (streaming twin of WavWriter): sizes patched at close,
    appended in chunks, reads back exactly."""
    from f9tpu.io.aiff import AiffWriter, read_aiff, probe_aiff

    rng = np.random.default_rng(19)
    codes = rng.integers(-(2**23), 2**23, size=(2, 10001), dtype=np.int32)
    p = str(tmp_path / "inc.aiff")
    with AiffWriter(p, 2, 44100, bits=24) as w:
        w.append_codes(codes[:, :3000])
        w.append_codes(codes[:, 3000:3001])
        w.append_codes(codes[:, 3001:])
    info = probe_aiff(p)
    assert info.num_frames == 10001 and info.sample_rate == 44100
    y, r = read_aiff(p)
    np.testing.assert_array_equal(np.round(y * (1 << 23)), codes)


def test_stream_aiff_output(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.io import write_wav
    from f9tpu.io.aiff import read_aiff
    from f9tpu.pipeline import stream_resample_file

    rng = np.random.default_rng(20)
    x = (0.3 * rng.standard_normal((2, 44100))).astype(np.float32)
    src = str(tmp_path / "s.wav")
    write_wav(src, x, 44100, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", seed=3, output_format="aiff")
    out = str(tmp_path / "s.aiff")
    n = stream_resample_file(src, out, cfg, chunk_seconds=0.3)
    y, r = read_aiff(out)
    assert r == 48000 and y.shape == (2, n) and n == 48000


def test_raw_device_path_all_containers(tmp_path):
    """Integer-PCM AIFF (both byte orders) rides the on-device raw codec
    path like WAV: identical audio in any container yields byte-identical
    batch output — self-contained (all three run and compare here)."""
    import struct as _st

    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.io.aiff import _write_extended80, write_aiff
    from f9tpu.io.wav import _pack24_dispatch
    from f9tpu.pipeline import BatchProcessor

    rng = np.random.default_rng(23)
    codes = rng.integers(-(2**23), 2**23, size=(2, 5000), dtype=np.int32)
    x = codes.astype(np.float32) / (1 << 23)
    (tmp_path / "in").mkdir()

    wav_p = str(tmp_path / "in" / "s.wav")
    write_wav(wav_p, x, 44100, bits=24)
    be_p = str(tmp_path / "in" / "be.aiff")
    write_aiff(be_p, x, 44100, bits=24)            # big-endian NONE
    # hand-build an AIFC sowt (little-endian) file
    inter = np.ascontiguousarray(codes.T).reshape(-1)
    payload = _pack24_dispatch(inter).tobytes()
    comm = (_st.pack(">hIh", 2, 5000, 24) + _write_extended80(44100.0)
            + b"sowt" + b"\x00\x00")
    ssnd = _st.pack(">II", 0, 0) + payload
    body = b"AIFC"
    body += b"COMM" + _st.pack(">I", len(comm)) + comm
    body += b"SSND" + _st.pack(">I", len(ssnd)) + ssnd
    sowt_p = str(tmp_path / "in" / "lt.aiff")
    with open(sowt_p, "wb") as f:
        f.write(b"FORM" + _st.pack(">I", len(body)) + body)

    outs = {}
    for name, src in (("wav", wav_p), ("be", be_p), ("sowt", sowt_p)):
        # dither off: the noise is keyed by (seed, PATH) by design, and the
        # three containers necessarily have different paths
        cfg = ProcessingConfig(output_dir=str(tmp_path / f"out_{name}"),
                               target_rate=48000, quality="low",
                               dither=False, remove_dc=False)
        assert BatchProcessor(cfg).run([src]).completed == 1
        fn = [f for f in os.listdir(tmp_path / f"out_{name}")
              if f.endswith(".wav")][0]
        y, r = read_wav(str(tmp_path / f"out_{name}" / fn))
        assert r == 48000 and np.isfinite(y).all()
        outs[name] = y
    np.testing.assert_array_equal(outs["wav"], outs["be"])
    np.testing.assert_array_equal(outs["wav"], outs["sowt"])


def test_raw_aiff_truncated_and_malformed(tmp_path):
    """Truncated AIFF short-reads like the WAV raw reader; a malformed SSND
    size must raise, not decode trailing bytes as audio."""
    import struct as _st

    from f9tpu.io.aiff import read_raw_pcm_aiff, write_aiff

    x = (0.2 * np.random.default_rng(0).standard_normal((2, 1000))
         ).astype(np.float32)
    p = str(tmp_path / "t.aiff")
    write_aiff(p, x, 44100, bits=24)
    whole = open(p, "rb").read()
    # truncate mid-payload
    cut = str(tmp_path / "cut.aiff")
    open(cut, "wb").write(whole[: len(whole) - 1500])
    payload, info = read_raw_pcm_aiff(cut)
    assert payload.size > 0 and payload.size % 6 == 0
    assert info.num_frames < 1000

    # malformed SSND size smaller than its own header
    from f9tpu.io.aiff import _write_extended80
    comm = _st.pack(">hIh", 2, 1000, 24) + _write_extended80(44100.0)
    body = b"AIFF" + b"COMM" + _st.pack(">I", len(comm)) + comm
    body += b"SSND" + _st.pack(">I", 4) + b"\x00\x00\x00\x00" + b"JUNKJUNK"
    bad = str(tmp_path / "bad.aiff")
    open(bad, "wb").write(b"FORM" + _st.pack(">I", len(body)) + body)
    with pytest.raises(ValueError, match="SSND"):
        read_raw_pcm_aiff(bad)


def test_metadata_passthrough(tmp_path):
    """--keep-metadata: bext/LIST chunks survive processing; the output stays
    a valid WAV and the manifest size-verification still matches."""
    import struct as _st

    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.io.wav import append_chunks, read_extra_chunks
    from f9tpu.pipeline import BatchProcessor

    (tmp_path / "in").mkdir()
    x = (0.2 * np.random.default_rng(0).standard_normal((2, 4410))
         ).astype(np.float32)
    src = str(tmp_path / "in" / "b.wav")
    write_wav(src, x, 44100, bits=24)
    bext = b"Description goes here".ljust(602, b"\x00")
    info = b"INFO" + b"IART" + _st.pack("<I", 5) + b"f9tp\x00" + b"\x00"
    append_chunks(src, [(b"bext", bext), (b"LIST", info)])

    got = read_extra_chunks(src)
    assert [cid for cid, _ in got] == [b"bext", b"LIST"]
    y0, r0 = read_wav(src)            # reader unaffected by trailing chunks
    assert r0 == 44100 and y0.shape == x.shape

    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", seed=1, keep_metadata=True)
    res = BatchProcessor(cfg).run([src],
                                  manifest_path=str(tmp_path / "m.json"))
    assert res.completed == 1
    out = str(tmp_path / "out" / "b_processed.wav")
    carried = read_extra_chunks(out)
    assert (b"bext", bext) in carried and (b"LIST", info) in carried
    y, r = read_wav(out)
    assert r == 48000 and y.shape[1] == 4800
    # resume still verifies (size recorded after append)
    res2 = BatchProcessor(cfg).run([src],
                                   manifest_path=str(tmp_path / "m.json"))
    assert res2.completed == 1 and res2.audio_seconds_in == 0.0


def test_metadata_sample_indexed_fields_rescaled():
    """cue positions, smpl period/loops, and bext TimeReference must scale
    to the output rate (a 1.000 s marker stays at 1.000 s)."""
    import struct as _st

    from f9tpu.io.wav import scale_metadata_chunks

    cue = _st.pack("<I", 1) + _st.pack("<IIIIII", 1, 44100, 0x61746164,
                                       0, 0, 44100)
    smpl = bytearray(36 + 24)
    _st.pack_into("<I", smpl, 8, int(round(1e9 / 44100)))
    _st.pack_into("<I", smpl, 28, 1)
    _st.pack_into("<II", smpl, 36 + 8, 22050, 44100)
    bext = bytearray(602)
    _st.pack_into("<Q", bext, 338, 44100 * 3600)     # 1 h since midnight
    chunks = [(b"cue ", cue), (b"smpl", bytes(smpl)), (b"bext", bytes(bext))]
    out = dict(scale_metadata_chunks(chunks, 44100, 48000))

    pos = _st.unpack_from("<I", out[b"cue "], 4 + 4)[0]
    off = _st.unpack_from("<I", out[b"cue "], 4 + 20)[0]
    assert pos == off == 48000                       # 1.000 s at 48 k
    assert _st.unpack_from("<I", out[b"smpl"], 8)[0] == int(round(1e9 / 48000))
    lo, hi = _st.unpack_from("<II", out[b"smpl"], 36 + 8)
    assert (lo, hi) == (24000, 48000)
    assert _st.unpack_from("<Q", out[b"bext"], 338)[0] == 48000 * 3600
    # same-rate passthrough is identity
    assert scale_metadata_chunks(chunks, 48000, 48000) is chunks


def test_aiff_metadata_passthrough(tmp_path):
    """aiff -> aiff with --keep-metadata: NAME/ANNO carried verbatim, MARK
    positions rescaled to the output rate."""
    import struct as _st

    from f9tpu.config import ProcessingConfig
    from f9tpu.io.aiff import (append_chunks_aiff, read_aiff,
                               read_extra_chunks_aiff, write_aiff)
    from f9tpu.pipeline import BatchProcessor

    (tmp_path / "in").mkdir()
    x = (0.2 * np.random.default_rng(1).standard_normal((2, 44100))
         ).astype(np.float32)
    src = str(tmp_path / "in" / "m.aiff")
    write_aiff(src, x, 44100, bits=24)
    name = b"Session take 3"
    # one marker at sample 44100 (1.000 s), pstring name "hit" (len 3 + pad)
    mark = _st.pack(">H", 1) + _st.pack(">HI", 1, 44100) + b"\x03hit"
    append_chunks_aiff(src, [(b"NAME", name), (b"MARK", mark)])
    got = dict(read_extra_chunks_aiff(src))
    assert got[b"NAME"] == name and b"MARK" in got
    y0, r0 = read_aiff(src)                  # reader unaffected
    assert r0 == 44100 and y0.shape == x.shape

    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", seed=1, keep_metadata=True,
                           output_format="aiff")
    assert BatchProcessor(cfg).run([src]).completed == 1
    out = str(tmp_path / "out" / "m_processed.aiff")
    carried = dict(read_extra_chunks_aiff(out))
    assert carried[b"NAME"] == name
    pos = _st.unpack_from(">I", carried[b"MARK"], 4)[0]
    assert pos == 48000                      # 1.000 s at the output rate
    y, r = read_aiff(out)
    assert r == 48000 and y.shape[1] == 48000


def test_stream_metadata_passthrough(tmp_path):
    import struct as _st

    from f9tpu.config import ProcessingConfig
    from f9tpu.io import write_wav
    from f9tpu.io.wav import append_chunks, read_extra_chunks
    from f9tpu.pipeline import stream_resample_file

    x = (0.2 * np.random.default_rng(2).standard_normal((2, 44100))
         ).astype(np.float32)
    src = str(tmp_path / "s.wav")
    write_wav(src, x, 44100, bits=24)
    bext = b"Streamed".ljust(602, b"\x00")
    append_chunks(src, [(b"bext", bext)])
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", seed=1, keep_metadata=True)
    out = str(tmp_path / "s48.wav")
    n = stream_resample_file(src, out, cfg, chunk_seconds=0.3)
    assert n == 48000
    assert (b"bext", bext) in read_extra_chunks(out)


def test_stream_aiff_metadata_passthrough(tmp_path):
    """aiff -> aiff on the STREAMING path with --keep-metadata: same-container
    passthrough (the batch worker's rule) — NAME carried, MARK rescaled.
    Round-3 review finding: metadata survival must not depend on file length."""
    import struct as _st

    from f9tpu.config import ProcessingConfig
    from f9tpu.io.aiff import (append_chunks_aiff, read_aiff,
                               read_extra_chunks_aiff, write_aiff)
    from f9tpu.pipeline import stream_resample_file

    x = (0.2 * np.random.default_rng(3).standard_normal((2, 44100))
         ).astype(np.float32)
    src = str(tmp_path / "sm.aiff")
    write_aiff(src, x, 44100, bits=24)
    name = b"Streamed take"
    mark = _st.pack(">H", 1) + _st.pack(">HI", 1, 44100) + b"\x03hit"
    append_chunks_aiff(src, [(b"NAME", name), (b"MARK", mark)])

    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", seed=1, keep_metadata=True,
                           output_format="aiff")
    out = str(tmp_path / "sm48.aiff")
    n = stream_resample_file(src, out, cfg, chunk_seconds=0.3)
    assert n == 48000
    carried = dict(read_extra_chunks_aiff(out))
    assert carried[b"NAME"] == name
    assert _st.unpack_from(">I", carried[b"MARK"], 4)[0] == 48000
    y, r = read_aiff(out)                      # audio intact after append
    assert r == 48000 and y.shape[1] == 48000


def test_append_chunks_size_overflow_restores_file(tmp_path):
    """Appending metadata to a non-RF64 WAV whose patched container size no
    longer fits 32 bits must truncate back to the original valid file (the
    struct.error path the OSError-only except used to leak)."""
    import struct as _st

    from f9tpu.io.wav import append_chunks

    p = str(tmp_path / "huge.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + _st.pack("<I", 0xFFFFFFF0 - 8) + b"WAVE")
        f.truncate(0xFFFFFFF0)                 # sparse: no real disk use
    with pytest.raises(_st.error):
        append_chunks(p, [(b"bext", b"x" * 600)])
    assert os.path.getsize(p) == 0xFFFFFFF0    # appended bytes removed
    with open(p, "rb") as f:                   # header untouched
        assert f.read(8) == b"RIFF" + _st.pack("<I", 0xFFFFFFF0 - 8)


def test_aiff_float_nan_scrubbed_like_wav():
    """fl32 AIFC with NaN/Inf payloads decodes to scrubbed zeros exactly as
    the WAV float path does — one NaN would otherwise spread across the
    resampler's whole convolution window."""
    import struct as _st

    from f9tpu.io.aiff import AiffReader, read_aiff

    # hand-build a minimal AIFC fl32 file with a NaN and an Inf sample
    vals = np.array([0.5, np.nan, np.inf, -0.25], np.float32)
    payload = vals.astype(">f4").tobytes()
    comm = (_st.pack(">hIh", 1, 4, 32) + b"\x40\x0D" + b"\xAC\x44\x00\x00"
            + b"\x00\x00\x00\x00" + b"fl32" + b"\x00\x00")
    ssnd = _st.pack(">II", 0, 0) + payload
    body = (b"AIFC"
            + b"COMM" + _st.pack(">I", len(comm)) + comm
            + b"SSND" + _st.pack(">I", len(ssnd)) + ssnd)
    import io as _io
    raw = b"FORM" + _st.pack(">I", len(body)) + body
    p = "/tmp/nan_test.aifc"
    open(p, "wb").write(raw)
    x, r = read_aiff(p)
    assert np.isfinite(x).all()
    assert x[0, 0] == np.float32(0.5) and x[0, 1] == 0.0 and x[0, 2] == 0.0
    with AiffReader(p) as rd:
        y = rd.read(0, 4)
    assert np.isfinite(y).all()


def test_probe_aiff_clamps_to_truncated_payload(tmp_path):
    """A truncated AIFF: probe must report what the readers will deliver
    (probe_wav parity), not the raw COMM frame count."""
    from f9tpu.io.aiff import AiffReader, probe_aiff, write_aiff

    p = str(tmp_path / "t.aiff")
    x = (0.2 * np.random.default_rng(0).standard_normal((2, 4000))
         ).astype(np.float32)
    write_aiff(p, x, 44100, bits=24)
    full = open(p, "rb").read()
    open(p, "wb").write(full[: len(full) - 3000])   # chop payload tail
    info = probe_aiff(p)
    with AiffReader(p) as rd:
        assert info.num_frames == rd.num_frames < 4000


def test_malformed_headers_raise_valueerror_not_struct_error(tmp_path):
    """Truncated ds64 / short fmt / COMM must surface the module's
    ValueError contract, not a raw struct.error that escapes callers'
    containment."""
    import struct as _st

    from f9tpu.io.aiff import probe_aiff
    from f9tpu.io.wav import probe_wav, read_wav

    # RF64 with a ds64 truncated mid-payload
    p1 = str(tmp_path / "tr.wav")
    open(p1, "wb").write(b"RF64" + _st.pack("<I", 100) + b"WAVE"
                         + b"ds64" + _st.pack("<I", 28) + b"\x00" * 10)
    for fn in (probe_wav, read_wav):
        with pytest.raises(ValueError):
            fn(p1)
    # AIFF COMM with an Inf-exponent sample rate
    p2 = str(tmp_path / "inf.aiff")
    comm = _st.pack(">hIh", 2, 100, 16) + b"\x7F\xFF" + b"\x80" + b"\x00" * 7
    body = b"AIFF" + b"COMM" + _st.pack(">I", len(comm)) + comm
    open(p2, "wb").write(b"FORM" + _st.pack(">I", len(body)) + body)
    with pytest.raises(ValueError):
        probe_aiff(p2)
    # zero-channel WAV fmt
    p3 = str(tmp_path / "zc.wav")
    fmt = _st.pack("<HHIIHH", 1, 0, 44100, 0, 0, 16)
    body = (b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
            + b"data" + _st.pack("<I", 4) + b"\x00" * 4)
    open(p3, "wb").write(b"RIFF" + _st.pack("<I", len(body)) + body)
    for fn in (probe_wav, read_wav):
        with pytest.raises(ValueError, match="channels"):
            fn(p3)


def test_wav_writer_rejects_bits_before_opening(tmp_path):
    from f9tpu.io.wav import WavWriter, write_wav_payload

    p = str(tmp_path / "nope.wav")
    with pytest.raises(ValueError):
        WavWriter(p, 2, 48000, bits=20)
    assert not os.path.exists(p)            # no header-only corpse
    with pytest.raises(ValueError, match="whole"):
        write_wav_payload(str(tmp_path / "p.wav"), np.zeros(10, np.uint8),
                          2, 48000, bits=24)   # 10 bytes != whole 6-byte frames
