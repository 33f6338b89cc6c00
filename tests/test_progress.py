"""Sub-file progress granularity (VERDICT round 2, missing #3).

The reference reports per-buffer progress every 10-50 ms
(AudioProcessingService.swift:209-264); the batch scheduler mirrors that
with fractional manifest progress during the chunked host stages
(decode 0 -> 0.3, staged 0.4, device 0.7, encode 0.7 -> 1.0), with the
chunked forms byte-identical to the one-shot writers.
"""

import numpy as np
import pytest

from f9tpu.config import ProcessingConfig
from f9tpu.io import aiff, codec, wav
from f9tpu.io.wav import read_wav, write_wav
from f9tpu.pipeline import scheduler as sched_mod
from f9tpu.pipeline.manifest import JobManifest
from f9tpu.pipeline.scheduler import BatchProcessor, build_output_path


def _codes(channels, frames, seed=0, bits=24):
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    return rng.integers(-lim, lim, size=(channels, frames)).astype(np.int32)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_codes_chunked_byte_identical(tmp_path, bits):
    codes = _codes(2, 7001, seed=bits)
    a, b = str(tmp_path / "one.wav"), str(tmp_path / "chunk.wav")
    wav.write_wav_codes(a, codes, 44100, bits=bits)
    seen = []
    wav.write_wav_codes(b, codes, 44100, bits=bits,
                        progress_cb=seen.append, chunk_frames=1000)
    assert open(a, "rb").read() == open(b, "rb").read()
    assert seen == sorted(seen) and seen[-1] == 1.0 and len(seen) == 8


@pytest.mark.parametrize("bits", [16, 24])
def test_aiff_codes_chunked_byte_identical(tmp_path, bits):
    codes = _codes(2, 5003, seed=bits)
    a, b = str(tmp_path / "one.aiff"), str(tmp_path / "chunk.aiff")
    aiff.write_aiff_codes(a, codes, 44100, bits=bits)
    seen = []
    aiff.write_aiff_codes(b, codes, 44100, bits=bits,
                          progress_cb=seen.append, chunk_frames=700)
    assert open(a, "rb").read() == open(b, "rb").read()
    assert seen == sorted(seen) and seen[-1] == 1.0 and len(seen) > 3


def test_payload_writers_chunked_byte_identical(tmp_path):
    rng = np.random.default_rng(7)
    frames, ch = 4096, 2
    payload = rng.integers(0, 256, size=(frames * ch * 3,)).astype(np.uint8)
    for mod, ext in ((wav.write_wav_payload, "wav"),
                     (aiff.write_aiff_payload, "aiff")):
        a, b = str(tmp_path / f"one.{ext}"), str(tmp_path / f"chunk.{ext}")
        mod(a, payload, ch, 48000, bits=24)
        seen = []
        mod(b, payload, ch, 48000, bits=24, progress_cb=seen.append,
            chunk_frames=500)
        assert open(a, "rb").read() == open(b, "rb").read()
        assert seen == sorted(seen) and seen[-1] == 1.0 and len(seen) > 3


@pytest.mark.parametrize("mk", ["wav8", "wav16", "wav24", "wav_f32",
                                "aiff24"])
def test_read_audio_progress_matches_read_audio(tmp_path, mk):
    rng = np.random.default_rng(11)
    x = (0.4 * rng.standard_normal((2, 6007))).astype(np.float32)
    if mk == "wav8":
        # hand-built unsigned 8-bit PCM (no writer emits it; readers must
        # still decode it identically whichever path the scheduler takes)
        import struct
        p = str(tmp_path / "a.wav")
        u8 = np.clip(np.round(x * 128.0) + 128.0, 0, 255).astype(np.uint8)
        payload = np.ascontiguousarray(u8.T).reshape(-1).tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 32000,
                                       32000 * 2, 2, 8)
               + b"data" + struct.pack("<I", len(payload)))
        open(p, "wb").write(hdr + payload)
    elif mk == "wav16":
        p = str(tmp_path / "a.wav"); write_wav(p, x, 32000, bits=16)
    elif mk == "wav24":
        p = str(tmp_path / "a.wav"); write_wav(p, x, 32000, bits=24)
    elif mk == "wav_f32":
        p = str(tmp_path / "a.wav"); write_wav(p, x, 32000, bits=32)
    else:
        p = str(tmp_path / "a.aiff"); aiff.write_aiff(p, x, 32000, bits=24)
    ref, rate_ref = codec.read_audio(p)
    seen = []
    got, rate = codec.read_audio_progress(p, seen.append, chunk_frames=1111)
    assert rate == rate_ref
    np.testing.assert_array_equal(got, ref)
    assert seen == sorted(seen) and seen[-1] == 1.0 and len(seen) == 6


def test_read_audio_progress_truncated_file(tmp_path):
    """Mid-frame truncation clips to whole frames, like read_audio."""
    x = (0.2 * np.random.default_rng(3).standard_normal((2, 4000))
         ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000, bits=24)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - 7])   # chop mid-frame
    ref, _ = codec.read_audio(p)
    got, _ = codec.read_audio_progress(p, lambda fr: None, chunk_frames=999)
    np.testing.assert_array_equal(got, ref)


def test_aiff_bad_bits_raises_before_writing(tmp_path):
    """The chunked AIFF writer must validate bit depth BEFORE opening the
    file — a lazy in-generator raise would leave a header-only corpse and
    destroy any pre-existing deliverable at that path."""
    p = str(tmp_path / "keep.aiff")
    open(p, "wb").write(b"PRECIOUS")
    with pytest.raises(ValueError, match="bit depth"):
        aiff.write_aiff_codes(p, _codes(1, 100), 44100, bits=8,
                              progress_cb=lambda fr: None, chunk_frames=10)
    assert open(p, "rb").read() == b"PRECIOUS"


def test_scheduler_subfile_progress(tmp_path, monkeypatch):
    """A long file's manifest progress moves continuously through decode
    (0 -> 0.3), staged (0.4), device (0.7), and encode (0.7 -> 1.0) — not
    the 0.3/0.7/1.0 stage jumps alone (the round-2 verdict's missing #3)."""
    monkeypatch.setattr(sched_mod, "SUBFILE_PROGRESS_FRAMES", 4096)
    monkeypatch.setattr(sched_mod, "SUBFILE_PROGRESS_CHUNK", 4096)
    rate, frames = 8000, 20000
    rng = np.random.default_rng(21)
    x = (0.1 * rng.standard_normal((1, frames))).astype(np.float32)
    src = str(tmp_path / "long.wav")
    write_wav(src, x, rate, bits=32)           # float WAV -> generic decode
    history = {}
    orig_set = JobManifest.set_progress
    orig_update = JobManifest.update

    def rec_set(self, path, progress):
        history.setdefault(path, []).append(round(progress, 4))
        orig_set(self, path, progress)

    def rec_update(self, path, status, progress=None, **kw):
        if progress is not None:
            history.setdefault(path, []).append(round(progress, 4))
        return orig_update(self, path, status, progress=progress, **kw)

    monkeypatch.setattr(JobManifest, "set_progress", rec_set)
    monkeypatch.setattr(JobManifest, "update", rec_update)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=8000,
                           quality="low", bucket_frames=(1 << 15,),
                           dither=False)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1
    h = history[src]
    assert h == sorted(h), f"progress not monotone: {h}"
    assert h[-1] == 1.0
    decode_ticks = [v for v in h if 0.0 < v < 0.3]
    encode_ticks = [v for v in h if 0.7 < v < 1.0]
    assert len(decode_ticks) >= 3, h    # 20000/4096 -> 4 interior ticks
    assert 0.4 in h and 0.7 in h, h
    assert len(encode_ticks) >= 3, h
    # and the deliverable round-trips
    y, r = read_wav(build_output_path(src, cfg.output_dir, cfg.postfix))
    assert r == 8000 and y.shape[-1] == frames


def test_scheduler_short_file_progress_unchanged(tmp_path, monkeypatch):
    """Short files keep the cheap stage ticks (no chunked decode/encode)."""
    rate, frames = 8000, 4000
    x = (0.1 * np.random.default_rng(5).standard_normal((1, frames))
         ).astype(np.float32)
    src = str(tmp_path / "short.wav")
    write_wav(src, x, rate, bits=32)
    history = []
    orig_set = JobManifest.set_progress

    def rec_set(self, path, progress):
        history.append(round(progress, 4))
        orig_set(self, path, progress)

    monkeypatch.setattr(JobManifest, "set_progress", rec_set)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=8000,
                           quality="low", bucket_frames=(4096,), dither=False)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1
    assert all(v in (0.4, 0.7) for v in history), history
