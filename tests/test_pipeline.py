"""End-to-end pipeline tests: manifest/resume, calibration, fused graph,
batch scheduler, preview renderer, self-test.  All hermetic on the CPU backend
(the stub-bridge strategy, SURVEY.md section 4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from f9tpu.config import ProcessingConfig, recording_length
from f9tpu.io import read_wav, write_wav
from f9tpu.models.oracle import resample_oracle
from f9tpu.pipeline import (
    BatchProcessor,
    CalibrationCache,
    FileStatus,
    JobManifest,
    LoopTestVerdict,
    StatusLog,
    build_output_path,
    measure_latency,
    process_batch,
    render_playlist,
    run_loop_test,
)


def make_lib(tmp_path, n=3, rate=44100, channels=2, seconds=0.25, seed=0):
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        frames = int(seconds * rate) + 37 * i  # ragged lengths
        t = np.arange(frames) / rate
        x = np.stack([
            (0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t)).astype(np.float32)
            for _ in range(channels)
        ])
        p = str(tmp_path / f"src_{i}.wav")
        write_wav(p, x, rate, bits=24)
        paths.append(p)
    return paths


# ---------- config ----------

def test_config_validation(tmp_path):
    cfg = ProcessingConfig(output_dir=str(tmp_path))
    cfg.validate()
    with pytest.raises(ValueError):
        ProcessingConfig(output_dir="").validate()  # mandatory out dir
    with pytest.raises(ValueError):
        ProcessingConfig(output_dir=str(tmp_path), bits=20).validate()


def test_recording_length_formula():
    # src + lat + 4*lat (Source/AppState.h:240-243)
    assert recording_length(1000, 100) == 1500


def test_noise_floor_threshold():
    cfg = ProcessingConfig(output_dir="x", noise_floor_db=-96.0,
                           noise_floor_margin_pct=10.0)
    assert abs(cfg.noise_floor_threshold_db - (-105.6)) < 1e-9
    cfg2 = ProcessingConfig(output_dir="x", noise_floor_db=None)
    assert cfg2.noise_floor_threshold_db == -80.0  # fallback


# ---------- manifest ----------

def test_manifest_resume(tmp_path):
    mpath = str(tmp_path / "manifest.json")
    files = ["a.wav", "b.wav"]
    m = JobManifest.load_or_create(files, mpath)
    out = str(tmp_path / "done.wav")
    write_wav(out, np.zeros((1, 10), np.float32), 44100)
    m.update("a.wav", FileStatus.COMPLETED, output_path=out,
             output_size=os.path.getsize(out))
    m2 = JobManifest.load_or_create(files, mpath)
    assert m2.get("a.wav").status == FileStatus.COMPLETED  # resumed
    assert m2.get("b.wav").status == FileStatus.PENDING
    os.remove(out)  # output vanished -> must re-run
    m3 = JobManifest.load_or_create(files, mpath)
    assert m3.get("a.wav").status == FileStatus.PENDING


def test_manifest_fail_remaining(tmp_path):
    m = JobManifest.from_files(["a", "b", "c"])
    m.update("a", FileStatus.COMPLETED)
    m.fail_remaining("device lost")
    assert m.get("b").status == FileStatus.FAILED
    assert m.get("b").error == "device lost"
    assert m.get("a").status == FileStatus.COMPLETED


def test_manifest_fail_remaining_restricted_to_run(tmp_path):
    """With a cumulative manifest, an abort fails only the CURRENT run's
    files — entries carried from earlier sweeps are not this batch's."""
    m = JobManifest.from_files(["old", "cur"])
    m.fail_remaining("abort", paths={"cur"})
    assert m.get("cur").status == FileStatus.FAILED
    assert m.get("old").status == FileStatus.PENDING
    assert m.counts({"cur"}) == {"failed": 1}


def test_manifest_is_cumulative_across_sweeps(tmp_path):
    """watch passes only each sweep's new files; load_or_create must keep
    the unlisted history so a restart doesn't reprocess the library."""
    mpath = str(tmp_path / "m.json")
    out_a = str(tmp_path / "a_done.wav")
    write_wav(out_a, np.zeros((1, 10), np.float32), 44100)
    m = JobManifest.load_or_create(["a.wav"], mpath)
    m.update("a.wav", FileStatus.COMPLETED, output_path=out_a,
             output_size=os.path.getsize(out_a))
    m.save()
    # next sweep lists only the new file; a.wav's entry must survive
    m2 = JobManifest.load_or_create(["b.wav"], mpath)
    m2.update("b.wav", FileStatus.COMPLETED)
    m2.save()
    paths = {e.path for e in JobManifest.load(mpath).entries()}
    assert paths == {"a.wav", "b.wav"}
    # restart-style sweep listing both: a.wav resumes COMPLETED
    m3 = JobManifest.load_or_create(["a.wav", "b.wav"], mpath)
    assert m3.get("a.wav").status == FileStatus.COMPLETED


def test_manifest_input_signature_triggers_reprocess(tmp_path):
    """A completed file whose INPUT content changed (re-drop with same name)
    must come back PENDING even though its old output still verifies."""
    mpath = str(tmp_path / "m.json")
    src = str(tmp_path / "in.wav")
    write_wav(src, np.zeros((1, 64), np.float32), 44100)
    out = str(tmp_path / "out.wav")
    write_wav(out, np.zeros((1, 70), np.float32), 48000)
    st = os.stat(src)
    m = JobManifest.load_or_create([src], mpath)
    m.update(src, FileStatus.COMPLETED, output_path=out,
             output_size=os.path.getsize(out),
             input_size=st.st_size, input_mtime_ns=st.st_mtime_ns)
    m.save()
    # unchanged input -> resumed
    assert JobManifest.load_or_create([src], mpath).get(src).status \
        == FileStatus.COMPLETED
    # rewrite the input with different content (size changes)
    write_wav(src, np.zeros((1, 128), np.float32), 44100)
    assert JobManifest.load_or_create([src], mpath).get(src).status \
        == FileStatus.PENDING


# ---------- calibration ----------

def test_measured_latency_is_zero():
    """The SRC chain is delay-compensated by construction; the impulse test
    (reference: LatencyMeasurementService.swift:57-171) must find ~0 latency."""
    res = measure_latency(44100, 48000, quality="medium")
    assert res.detected
    assert abs(res.latency_frames) <= 1
    assert res.noise_floor_db < -100.0


def test_calibration_cache(tmp_path):
    cpath = str(tmp_path / "cal.json")
    cache = CalibrationCache(cpath)
    r1 = cache.get_or_measure(44100, 48000, quality="medium")
    # second hit must come from cache (same object fields)
    r2 = cache.get_or_measure(44100, 48000, quality="medium")
    assert r1 == r2
    # persisted across instances
    cache2 = CalibrationCache(cpath)
    assert cache2.get_or_measure(44100, 48000, quality="medium") == r1


# ---------- fused graph ----------

def test_process_batch_matches_oracle(tmp_path):
    rng = np.random.default_rng(0)
    frames = 8000
    x = np.zeros((2, 1, 10000), np.float32)
    # amplitude kept well under 1.0: resampling gaussian noise overshoots its
    # sample peaks (Gibbs), and the 24-bit quantizer clips at full scale
    sig0 = (0.15 * rng.standard_normal(frames)).astype(np.float32)
    sig1 = (0.15 * rng.standard_normal(frames - 1111)).astype(np.float32)
    x[0, 0, :frames] = sig0
    x[1, 0, : frames - 1111] = sig1
    cfg = ProcessingConfig(output_dir=str(tmp_path), quality="medium",
                           dither=False, remove_dc=False)
    res = process_batch(x, np.array([frames, frames - 1111], np.int32), cfg,
                        44100, jax.random.PRNGKey(0))
    codes = np.asarray(res.codes)
    of = np.asarray(res.out_frames)
    # per-file valid lengths: exact ceil(n*160/147)
    assert of[0] == -(-frames * 160 // 147)
    assert of[1] == -(-(frames - 1111) * 160 // 147)
    # compare file 1 (shorter, padded) against the oracle on its own length
    ref = resample_oracle(sig1, 44100, 48000, quality="medium")
    got = codes[1, 0, : of[1]].astype(np.float64) / (1 << 23)
    err = got - ref
    rms_db = 20 * np.log10(np.sqrt((err**2).mean()) / np.sqrt((ref**2).mean()))
    # quantization to 24-bit floors the error near -116 dB; parity of the
    # float path itself is covered by test_resample_parity
    assert rms_db < -100.0
    # padding region must be exactly zero codes
    assert np.all(codes[1, 0, of[1]:] == 0)


def test_process_batch_reverb_truncates(tmp_path):
    rate = 44100
    frames = rate  # 1 s
    rng = np.random.default_rng(1)
    x = np.zeros((1, 1, frames), np.float32)
    n_loud = rate // 4
    x[0, 0, :n_loud] = 0.5 * rng.standard_normal(n_loud)
    # silence afterwards: true digital zeros
    cfg = ProcessingConfig(output_dir=str(tmp_path), quality="low",
                           reverb_mode=True, noise_floor_db=-96.0,
                           dither=False)
    res = process_batch(x, np.array([frames], np.int32), cfg, rate,
                        jax.random.PRNGKey(0))
    of = int(np.asarray(res.out_frames)[0])
    # must not truncate below the valid span scaled to 48k...
    min_of = -(-frames * 160 // 147)
    assert of >= min_of
    assert bool(np.asarray(res.tail_terminated)[0])


# ---------- scheduler end-to-end ----------

def test_batch_processor_end_to_end(tmp_path):
    (tmp_path / "in").mkdir(exist_ok=True)
    src_files = make_lib(tmp_path / "in", n=3)
    out_dir = str(tmp_path / "out")
    # remove_dc off: DC removal subtracts the partial-period mean of a sine,
    # which the bare oracle comparison below doesn't model
    cfg = ProcessingConfig(output_dir=out_dir, target_rate=48000,
                           quality="medium", batch_size=2, remove_dc=False,
                           bucket_frames=(1 << 14, 1 << 16))
    log = StatusLog()
    bp = BatchProcessor(cfg, log=log, calibration=CalibrationCache())
    res = bp.run(src_files, manifest_path=str(tmp_path / "manifest.json"))
    assert res.completed == 3 and res.failed == 0
    for p in src_files:
        out = build_output_path(p, out_dir, cfg.postfix)
        assert os.path.exists(out)
        y, rate = read_wav(out)
        assert rate == 48000
        src, _ = read_wav(p)
        assert y.shape[-1] == -(-src.shape[-1] * 160 // 147)
        # content parity vs oracle at 24-bit depth
        ref = resample_oracle(src[0], 44100, 48000, quality="medium")
        err = y[0].astype(np.float64) - ref
        assert 20 * np.log10(np.sqrt((err**2).mean()) / np.sqrt((ref**2).mean())) < -95
    assert any("Batch done" in line for line in log.lines)
    # re-run resumes: everything skipped
    res2 = bp.run(src_files, manifest_path=str(tmp_path / "manifest.json"))
    assert res2.completed == 3 and res2.audio_seconds_in == 0.0


def test_scheduler_sweep_counts_and_collision_reservation(tmp_path):
    """Cumulative-manifest semantics at the scheduler level: a sweep that
    lists only new files (watch style) reports only ITS files in
    BatchResult, and a new same-stem input cannot overwrite an earlier
    sweep's recorded deliverable (collision suffix instead)."""
    rng = np.random.default_rng(0)
    d1, d2 = tmp_path / "d1", tmp_path / "d2"
    d1.mkdir(); d2.mkdir()
    a = str(d1 / "take.wav")
    b = str(d2 / "take.wav")          # same stem, different content/dir
    write_wav(a, (0.2 * rng.standard_normal((1, 4000))).astype(np.float32),
              44100, bits=24)
    write_wav(b, (0.2 * rng.standard_normal((1, 5000))).astype(np.float32),
              44100, bits=24)
    out_dir = str(tmp_path / "out")
    mpath = str(tmp_path / "m.json")
    cfg = ProcessingConfig(output_dir=out_dir, target_rate=48000,
                           quality="low", seed=1, remove_dc=False)
    res1 = BatchProcessor(cfg).run([a], manifest_path=mpath)
    assert res1.completed == 1
    first = open(os.path.join(out_dir, "take_processed.wav"), "rb").read()
    # sweep 2 lists only b: counts cover b alone, a's entry survives, and
    # a's deliverable is reserved -> b writes take_processed_2.wav
    res2 = BatchProcessor(cfg).run([b], manifest_path=mpath)
    assert res2.completed == 1 and res2.failed == 0
    assert open(os.path.join(out_dir, "take_processed.wav"), "rb").read() \
        == first
    assert os.path.exists(os.path.join(out_dir, "take_processed_2.wav"))
    paths = {e.path for e in JobManifest.load(mpath).entries()}
    assert paths == {a, b}
    # restart-style run listing both: everything resumes, nothing recomputed
    res3 = BatchProcessor(cfg).run([a, b], manifest_path=mpath)
    assert res3.completed == 2 and res3.audio_seconds_in == 0.0


def test_batch_processor_invalid_rate(tmp_path):
    files = make_lib(tmp_path, n=1, rate=48000)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "o"), target_rate=48000,
                           require_input_rate=44100)
    bp = BatchProcessor(cfg)
    res = bp.run(files)
    assert res.invalid == 1 and res.completed == 0


def test_batch_processor_bad_file(tmp_path):
    bad = str(tmp_path / "junk.wav")
    with open(bad, "wb") as f:
        f.write(b"not audio at all")
    cfg = ProcessingConfig(output_dir=str(tmp_path / "o"), quality="low")
    res = BatchProcessor(cfg).run([bad])
    assert res.failed == 1


# ---------- preview ----------

def test_render_playlist(tmp_path):
    files = make_lib(tmp_path, n=2, rate=44100, channels=1, seconds=0.1)
    main, mon, items = render_playlist(files, 44100, silence_ms=100,
                                       output_channels=2, monitor=True)
    silence = 4410
    n0 = items[0].num_frames
    assert items[1].start_frame == n0 + silence
    # the gap is digital silence
    assert np.all(main[:, n0 : n0 + silence] == 0)
    assert mon.shape[0] == 2
    assert main.shape[0] == 2


def test_render_playlist_channel_targeting(tmp_path):
    """Programme lands on the *selected* bus channels; others stay silent
    (renderToChannels, AudioProcessingService.swift:604-627,742-876)."""
    files = make_lib(tmp_path, n=2, rate=44100, channels=1, seconds=0.1)
    main, mon, items = render_playlist(
        files, 44100, silence_ms=50, output_channels=8, monitor=False,
        target_channels=[4, 5])
    assert main.shape[0] == 8
    assert np.any(main[4] != 0) and np.any(main[5] != 0)
    for c in (0, 1, 2, 3, 6, 7):
        assert np.all(main[c] == 0)
    # mono source fanned to both targets identically
    np.testing.assert_array_equal(main[4], main[5])


def test_render_playlist_dual_render_monitoring(tmp_path):
    """Monitoring accumulates a stereo mixdown onto the selected monitor
    channels of the same bus (the dual-render design)."""
    files = make_lib(tmp_path, n=1, rate=44100, channels=1, seconds=0.1)
    main, mon, _ = render_playlist(
        files, 44100, output_channels=8, monitor=True,
        target_channels=[6, 7], monitor_channels=(2, 3))
    assert mon is not None and mon.shape[0] == 2
    np.testing.assert_array_equal(main[2], mon[0])
    np.testing.assert_array_equal(main[3], mon[1])
    np.testing.assert_array_equal(main[6], main[7])
    assert np.all(main[0] == 0) and np.all(main[5] == 0)
    # monitor channels overlapping the targets ACCUMULATE both renders
    main2, mon2, _ = render_playlist(
        files, 44100, output_channels=4, monitor=True,
        target_channels=[0, 1], monitor_channels=(0, 1))
    np.testing.assert_allclose(main2[0], mon2[0] * 2, atol=1e-7)


def test_render_playlist_target_validation(tmp_path):
    files = make_lib(tmp_path, n=1, rate=44100, channels=1, seconds=0.05)
    with pytest.raises(ValueError, match="outside"):
        render_playlist(files, 44100, output_channels=2, target_channels=[5])
    with pytest.raises(ValueError, match="duplicate"):
        render_playlist(files, 44100, output_channels=4,
                        target_channels=[1, 1])
    with pytest.raises(ValueError, match="outside"):
        render_playlist(files, 44100, output_channels=2, monitor=True,
                        monitor_channels=(0, 9))


def test_stream_playlist_matches_render(tmp_path):
    """Round 4 (VERDICT r3 missing #1): the constant-memory preview emits a
    file whose samples are IDENTICAL to render_playlist + write_wav —
    incl. mixed rates, loops, bus targeting and the dual-render monitor."""
    from f9tpu.io import wav as wav_mod
    from f9tpu.pipeline import render_playlist, stream_playlist

    files = make_lib(tmp_path, n=2, rate=44100, channels=1, seconds=0.1)
    # add a mixed-rate item so the per-item resample path is covered
    rng = np.random.default_rng(7)
    p48 = str(tmp_path / "hi48.wav")
    write_wav(p48, (0.3 * rng.standard_normal((1, 4800))).astype(np.float32),
              48000, bits=24)
    files = files + [p48]
    kw = dict(silence_ms=70, output_channels=6, monitor=True, loops=2,
              target_channels=[4, 5], monitor_channels=(0, 1),
              quality="low")
    main, mon, items_r = render_playlist(files, 44100, **kw)
    ref_main = str(tmp_path / "ref_main.wav")
    ref_mon = str(tmp_path / "ref_mon.wav")
    wav_mod.write_wav(ref_main, main, 44100, bits=24)
    wav_mod.write_wav(ref_mon, mon, 44100, bits=24)

    got_main = str(tmp_path / "s_main.wav")
    got_mon = str(tmp_path / "s_mon.wav")
    items_s, frames = stream_playlist(files, 44100, got_main,
                                      monitor_out=got_mon, **kw)
    assert frames == main.shape[1]
    assert [(i.path, i.start_frame, i.num_frames) for i in items_s] == \
           [(i.path, i.start_frame, i.num_frames) for i in items_r]
    ya, _ = read_wav(got_main)
    yb, _ = read_wav(ref_main)
    np.testing.assert_array_equal(ya, yb)
    ma, _ = read_wav(got_mon)
    mb, _ = read_wav(ref_mon)
    np.testing.assert_array_equal(ma, mb)
    # the projected-length predicate is exact
    from f9tpu.pipeline.preview import projected_frames

    assert projected_frames(files, 44100, silence_ms=70, loops=2) == frames


def test_stream_playlist_constant_memory(tmp_path):
    """Peak host memory is O(one item) regardless of loop count: a tiny item
    looped into a multi-minute 8-channel programme must not allocate the
    programme (render_playlist would hold ~74 MB of float32 here; the
    streamed form stays under a few MB)."""
    import tracemalloc

    from f9tpu.pipeline import stream_playlist

    rng = np.random.default_rng(8)
    p = str(tmp_path / "tiny.wav")
    write_wav(p, (0.3 * rng.standard_normal((1, 12000))).astype(np.float32),
              48000, bits=24)
    out = str(tmp_path / "long.wav")
    loops = 120
    tracemalloc.start()
    items, frames = stream_playlist([p], 48000, out, silence_ms=150,
                                    output_channels=8, monitor=False,
                                    loops=loops)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(items) == loops
    assert frames == loops * 12000 + (loops - 1) * 7200
    programme_bytes = frames * 8 * 4
    assert programme_bytes > 70_000_000          # the render form's cost
    assert peak < 16_000_000, (peak, programme_bytes)
    from f9tpu.io import probe

    assert probe(out).num_frames == frames


def test_stream_playlist_blockwise_single_long_item(tmp_path):
    """Round 5 (VERDICT r4 weak #3): ONE long item must also stay O(chunk) —
    the round-3 form was O(item), fully materialising each decoded AND
    resampled item (a single hour-long item would hold ~1.3 GB).  The
    block-granular path decodes + resamples ~8 s at a time through the main
    stream's window math, so peak traced memory stays at a few chunks even
    when the item is minutes long."""
    import tracemalloc

    from f9tpu.pipeline import stream_playlist

    rng = np.random.default_rng(9)

    def peak_for(seconds: int) -> tuple[int, int]:
        T = seconds * 44100
        p = str(tmp_path / f"item_{seconds}.wav")
        write_wav(p, (0.25 * rng.standard_normal((1, T))
                      ).astype(np.float32), 44100, bits=24)
        out = str(tmp_path / f"out_{seconds}.wav")
        tracemalloc.start()
        items, frames = stream_playlist([p], 48000, out, quality="low",
                                        output_channels=2,
                                        chunk_seconds=2.0)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert len(items) == 1 and items[0].num_frames == frames
        from f9tpu.io import probe

        assert probe(out).num_frames == frames == -(-T * 160 // 147)
        return peak, T * 4               # decoded-item float32 bytes

    peak_for(10)                         # warm compiles outside measurement
    peak_short, _ = peak_for(30)
    peak_long, item_long = peak_for(120)
    # O(chunk), not O(item): quadrupling the item must not move the peak
    # (a few chunk-sized buffers are live at once; the old form held the
    # whole decoded + resampled item, ~2x item_bytes)
    assert peak_long < 1.25 * peak_short, (peak_short, peak_long)
    assert peak_long < item_long // 2, (peak_long, item_long)


# ---------- self test ----------

def test_loop_selftest():
    rep = run_loop_test(48000, 44100, seconds=0.5, quality="medium")
    assert rep.verdict == LoopTestVerdict.LOOP_DETECTED
    assert abs(rep.measured_freq_hz - 1000.0) < 10.0


# ---------- streaming ----------

def test_stream_resample_matches_whole_file(tmp_path):
    """Chunked overlap-save streaming must equal the whole-file path exactly
    (same filter, same cycle alignment)."""
    import jax.numpy as jnp
    from f9tpu.io import WavReader, read_wav, write_wav
    from f9tpu.ops.resample import resample_rates
    from f9tpu.pipeline import stream_resample_file

    rate = 44100
    rng = np.random.default_rng(7)
    frames = rate * 2 + 1234  # ~2 s, not cycle-aligned
    x = (0.4 * rng.standard_normal((2, frames))).astype(np.float32)
    src = str(tmp_path / "long.wav")
    write_wav(src, x, rate, bits=24)

    out = str(tmp_path / "long_out.wav")
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="medium", dither=False, remove_dc=False)
    n = stream_resample_file(src, out, cfg, chunk_seconds=0.5)  # ~5 chunks
    assert n == -(-frames * 160 // 147)

    y_stream, r = read_wav(out)
    assert r == 48000 and y_stream.shape[1] == n

    xq, _ = read_wav(src)  # compare from the quantized source, like streaming
    y_ref = np.asarray(resample_rates(jnp.asarray(xq), rate, 48000,
                                      quality="medium"))
    ref_codes = np.clip(np.round(y_ref * (1 << 23)), -(1 << 23), (1 << 23) - 1)
    got_codes = np.round(y_stream * (1 << 23))
    # the streamed path (presliced conv) and whole-file path (pallas kernel)
    # accumulate fp32 sums in different orders -> a few codes of difference on
    # near-full-scale samples; require parity well beyond the -120 dB target
    diff = got_codes - ref_codes
    assert np.abs(diff).max() <= 16
    rms_db = 20 * np.log10(np.sqrt((diff**2).mean())
                           / np.sqrt((ref_codes**2).mean()) + 1e-30)
    assert rms_db < -120.0


def test_stream_resample_with_dc_and_dither(tmp_path):
    from f9tpu.io import read_wav, write_wav
    from f9tpu.pipeline import stream_resample_file

    rate = 48000
    rng = np.random.default_rng(8)
    x = (0.2 * rng.standard_normal((1, rate)) + 0.1).astype(np.float32)  # DC!
    src = str(tmp_path / "dc.wav")
    write_wav(src, x, rate, bits=24)
    out = str(tmp_path / "dc_out.wav")
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=44100,
                           quality="low")
    stream_resample_file(src, out, cfg, chunk_seconds=0.25)
    y, r = read_wav(out)
    assert r == 44100
    assert abs(float(y.mean())) < 1e-3  # DC removed across chunks


def test_stream_dither_chunk_invariant_and_matches_batch(tmp_path):
    """Dither noise is keyed by (file seed, channel, absolute output frame):
    streamed bytes must be identical for any chunk size AND identical to the
    batch scheduler's output for the same cfg.seed (ops/dither.py contract)."""
    from f9tpu.io import read_wav, write_wav
    from f9tpu.pipeline import BatchProcessor, stream_resample_file

    rate = 44100
    rng = np.random.default_rng(21)
    frames = rate + 731
    x = (0.3 * rng.standard_normal((2, frames))).astype(np.float32)
    src = str(tmp_path / "in" / "seedcheck.wav")
    os.makedirs(tmp_path / "in")
    write_wav(src, x, rate, bits=24)

    cfg = ProcessingConfig(output_dir=str(tmp_path / "s1"), target_rate=48000,
                           quality="low", seed=7, remove_dc=False)
    o1, o2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    stream_resample_file(src, o1, cfg, chunk_seconds=0.15)
    stream_resample_file(src, o2, cfg, chunk_seconds=0.45)
    y1, _ = read_wav(o1)
    y2, _ = read_wav(o2)
    assert np.array_equal(y1, y2), "dither must be chunk-size invariant"

    cfgb = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                            quality="low", seed=7, remove_dc=False)
    res = BatchProcessor(cfgb).run([src])
    assert res.completed == 1
    yb, rb = read_wav(str(tmp_path / "out" / "seedcheck_processed.wav"))
    assert rb == 48000
    assert yb.shape[1] == y1.shape[1]
    # batch (rows einsum) and stream (presliced conv) accumulate fp32 in
    # different orders, so exact byte identity can't hold — but the dither
    # noise IS identical (same (seed, channel, position) keying), so the
    # difference stays at SRC rounding level (a few codes), NOT at the
    # +-2 LSB random level that mismatched dither streams would produce
    diff = np.round(yb * (1 << 23)) - np.round(y1 * (1 << 23))
    assert np.abs(diff).max() <= 16
    frac_same_seed = (diff != 0).mean()
    assert frac_same_seed < 0.35, \
        "widespread code differences imply the dither streams diverged"

    # negative control: a different seed MUST diverge broadly (validates the
    # discriminator above — independent TPDF draws differ at most samples)
    cfg9 = ProcessingConfig(output_dir=str(tmp_path / "out9"),
                            target_rate=48000, quality="low", seed=9,
                            remove_dc=False)
    assert BatchProcessor(cfg9).run([src]).completed == 1
    y9, _ = read_wav(str(tmp_path / "out9" / "seedcheck_processed.wav"))
    # independent TPDF draws flip ~45% of codes (analytic/simulated); SRC
    # rounding alone flips well under 35%
    diff9 = np.round(y9 * (1 << 23)) - np.round(y1 * (1 << 23))
    assert (diff9 != 0).mean() > 0.40
    assert frac_same_seed < (diff9 != 0).mean() - 0.05


def test_wav_reader_writer_roundtrip(tmp_path):
    from f9tpu.io import WavReader, WavWriter, read_wav

    rng = np.random.default_rng(9)
    codes = rng.integers(-(2**23), 2**23, size=(2, 10000), dtype=np.int32)
    p = str(tmp_path / "inc.wav")
    with WavWriter(p, 2, 44100, bits=24) as w:
        w.append_codes(codes[:, :3000])
        w.append_codes(codes[:, 3000:])
    with WavReader(p) as rd:
        assert rd.num_frames == 10000 and rd.sample_rate == 44100
        mid = rd.read(5000, 100)
        assert mid.shape == (2, 100)
        got = np.round(mid * (1 << 23)).astype(np.int32)
        assert np.array_equal(got, codes[:, 5000:5100])
        # EOF clamp
        tail = rd.read(9990, 100)
        assert tail.shape == (2, 10)


# ---------- MCFX routing through the batch pipeline ----------

def test_process_batch_with_routing(tmp_path):
    """BASELINE.json config 3: multichannel resample with a routing map."""
    rng = np.random.default_rng(11)
    frames = 4410
    x = (0.2 * rng.standard_normal((1, 8, frames))).astype(np.float32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False,
                           channel_routing=[7, 0, -1, 3])
    res = process_batch(x, np.array([frames], np.int32), cfg, 44100,
                        jax.random.PRNGKey(0))
    codes = np.asarray(res.codes)
    assert codes.shape[1] == 4
    # routed channel content: out ch0 == resample of in ch7, ch2 silent
    ref7 = resample_oracle(x[0, 7], 44100, 48000, quality="low")
    got0 = codes[0, 0, : len(ref7)].astype(np.float64) / (1 << 23)
    err = got0 - ref7
    assert 20 * np.log10(np.sqrt((err**2).mean())
                         / np.sqrt((ref7**2).mean())) < -100
    assert np.all(codes[0, 2] == 0)


def test_process_batch_mono_fanout(tmp_path):
    rng = np.random.default_rng(12)
    frames = 2205
    x = (0.2 * rng.standard_normal((2, 1, frames))).astype(np.float32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False,
                           output_channels=2)
    res = process_batch(x, np.array([frames, frames], np.int32), cfg, 44100,
                        jax.random.PRNGKey(0))
    codes = np.asarray(res.codes)
    assert codes.shape[1] == 2
    assert np.array_equal(codes[:, 0], codes[:, 1])  # duplicated channels


def test_batch_processor_routing_end_to_end(tmp_path):
    (tmp_path / "in").mkdir(exist_ok=True)
    files = make_lib(tmp_path / "in", n=1, channels=2, seconds=0.1)
    out_dir = str(tmp_path / "out")
    cfg = ProcessingConfig(output_dir=out_dir, target_rate=48000,
                           quality="low", channel_routing=[1, 0],  # swap L/R
                           dither=False, remove_dc=False)
    bp = BatchProcessor(cfg)
    res = bp.run(files)
    assert res.completed == 1
    y, _ = read_wav(build_output_path(files[0], out_dir, cfg.postfix))
    src, _ = read_wav(files[0])
    # swapped: output ch0 comes from input ch1
    ref = resample_oracle(src[1], 44100, 48000, quality="low")
    err = y[0].astype(np.float64) - ref
    assert 20 * np.log10(np.sqrt((err**2).mean())
                         / np.sqrt((ref**2).mean()) + 1e-30) < -95


def test_routing_silent_channel_stays_zero_under_dither(tmp_path):
    rng = np.random.default_rng(13)
    frames = 2205
    x = (0.2 * rng.standard_normal((1, 2, frames))).astype(np.float32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=True,
                           channel_routing=[1, -1, 0])
    res = process_batch(x, np.array([frames], np.int32), cfg, 44100,
                        jax.random.PRNGKey(0))
    codes = np.asarray(res.codes)
    assert np.all(codes[0, 1] == 0)      # silent bus: digital zero, no dither
    assert np.any(codes[0, 0] != 0)


def test_batch_abort_on_device_failure(tmp_path, monkeypatch):
    """Fault injection: a device-step failure fails the whole batch
    (interfaceDisconnected semantics, MainViewModel.swift:233-250)."""
    (tmp_path / "in").mkdir(exist_ok=True)
    files = make_lib(tmp_path / "in", n=3, seconds=0.05)
    import f9tpu.pipeline.scheduler as sched

    def boom(*a, **k):
        raise RuntimeError("injected device loss")

    monkeypatch.setattr(sched, "process_batch", boom)
    monkeypatch.setattr(sched, "process_batch_raw", boom)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), quality="low",
                           batch_size=2)
    log = StatusLog()
    res = BatchProcessor(cfg, log=log).run(files)
    assert res.completed == 0
    assert res.failed == 3
    assert any("BATCH ABORT" in line for line in log.lines)


def test_render_playlist_looping(tmp_path):
    files = make_lib(tmp_path, n=2, channels=1, seconds=0.05)
    main1, _, items1 = render_playlist(files, 44100, silence_ms=50,
                                       output_channels=1)
    main2, _, items2 = render_playlist(files, 44100, silence_ms=50,
                                       output_channels=1, loops=2)
    assert len(items2) == 4
    # second pass starts after first pass + inter-loop gap
    gap = 44100 * 50 // 1000
    assert items2[2].start_frame == main1.shape[1] + gap
    assert main2.shape[1] == 2 * main1.shape[1] + gap


def test_batch_mixed_rate_library(tmp_path):
    """BASELINE.json config 5: mixed-rate library (44.1/48/96k) in one run —
    files group per input rate and all land at the target rate."""
    (tmp_path / "in").mkdir(exist_ok=True)
    rng = np.random.default_rng(21)
    paths = []
    for rate in (44100, 48000, 96000):
        n = rate // 5  # 200 ms
        # low amplitude: quantizer clipping on resampling overshoots would
        # otherwise dominate the oracle comparison
        x = (0.15 * rng.standard_normal((2, n))).astype(np.float32)
        p = str(tmp_path / "in" / f"r{rate}.wav")
        write_wav(p, x, rate, bits=24)
        paths.append((p, rate, n))
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", dither=False, remove_dc=False)
    res = BatchProcessor(cfg).run([p for p, _, _ in paths])
    assert res.completed == 3
    from f9tpu.models.filters import resolve_ratio
    for p, rate, n in paths:
        y, r = read_wav(build_output_path(p, str(tmp_path / "out"), cfg.postfix))
        assert r == 48000
        L, M = resolve_ratio(rate, 48000)
        assert y.shape[-1] == -(-n * L // M)
        src, _ = read_wav(p)
        ref = resample_oracle(src[0], rate, 48000, quality="low")
        err = y[0].astype(np.float64) - ref
        db = 20 * np.log10(np.sqrt((err**2).mean())
                           / np.sqrt((ref**2).mean()) + 1e-30)
        assert db < -95, (rate, db)


def test_same_rate_passthrough_bit_exact(tmp_path):
    """44.1 -> 44.1 with dither off is a true passthrough: output codes are
    bit-identical to the input file's 24-bit codes (the reference copies
    validated files through the loop unchanged in spirit)."""
    rng = np.random.default_rng(31)
    codes_in = rng.integers(-(2**23), 2**23, size=(2, 4410), dtype=np.int32)
    from f9tpu.io import write_wav_codes
    src = str(tmp_path / "pt.wav")
    write_wav_codes(src, codes_in, 44100, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=44100,
                           quality="high", dither=False, remove_dc=False)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1
    y, r = read_wav(build_output_path(src, str(tmp_path / "out"), cfg.postfix))
    got = np.round(y * (1 << 23)).astype(np.int32)
    assert r == 44100
    assert np.array_equal(got, codes_in)


def test_raw_bytes_path_matches_float_path(tmp_path):
    """On-device codec path (uint8 in, packed 24-bit payload out) must equal
    the float path bit-for-bit."""
    from f9tpu.io import read_raw_pcm, write_wav
    from f9tpu.pipeline import process_batch_raw

    rng = np.random.default_rng(40)
    frames = 4410
    x = (0.2 * rng.standard_normal((2, frames))).astype(np.float32)
    src = str(tmp_path / "raw.wav")
    write_wav(src, x, 44100, bits=24)
    raw, info = read_raw_pcm(src)
    assert info.bit_depth == 24 and len(raw) == frames * 2 * 3

    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False)
    # float path from the decoded file (identical quantized source)
    dec, _ = read_wav(src)
    res_f = process_batch(dec[None], np.array([frames], np.int32), cfg, 44100,
                          jax.random.PRNGKey(0))
    # raw path
    bucket = 8192
    rawb = np.zeros((1, bucket * 2 * 3), np.uint8)
    rawb[0, : len(raw)] = raw
    res_r = process_batch_raw(rawb, np.array([frames], np.int32), cfg, 44100,
                              jax.random.PRNGKey(0), in_channels=2, in_bits=24)
    of = int(np.asarray(res_f.out_frames)[0])
    assert int(np.asarray(res_r.out_frames)[0]) == of
    payload = np.asarray(res_r.codes)[0, : of * 2 * 3]
    # reconstruct codes from the payload and compare with the float path
    from f9tpu.io.wav import _unpack24
    got = _unpack24(payload).reshape(of, 2).T
    want = np.asarray(res_f.codes)[0, :, :of]
    assert np.array_equal(got, want)


def test_raw_bytes_path_matches_float_path_16bit(tmp_path):
    """Round 4 (PERF 'Headroom' item 5): the 16-bit narrow wire — raw uint8
    in, packed int16 payload out — must equal the float path bit-for-bit,
    exactly like the 24-bit twin above."""
    from f9tpu.io import read_raw_pcm, read_wav, write_wav
    from f9tpu.pipeline import process_batch_raw

    rng = np.random.default_rng(46)
    frames = 4410
    x = (0.2 * rng.standard_normal((2, frames))).astype(np.float32)
    src = str(tmp_path / "raw16.wav")
    write_wav(src, x, 44100, bits=16)
    raw, info = read_raw_pcm(src)
    assert info.bit_depth == 16 and len(raw) == frames * 2 * 2

    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", bits=16, dither=True, seed=3,
                           remove_dc=False)
    dec, _ = read_wav(src)
    res_f = process_batch(dec[None], np.array([frames], np.int32), cfg, 44100,
                          jax.random.PRNGKey(0))
    bucket = 8192
    rawb = np.zeros((1, bucket * 2 * 2), np.uint8)
    rawb[0, : len(raw)] = raw
    res_r = process_batch_raw(rawb, np.array([frames], np.int32), cfg, 44100,
                              jax.random.PRNGKey(0), in_channels=2, in_bits=16)
    of = int(np.asarray(res_f.out_frames)[0])
    assert int(np.asarray(res_r.out_frames)[0]) == of
    payload = np.asarray(res_r.codes)[0, : of * 2 * 2]
    got = payload.view("<i2").astype(np.int32).reshape(of, 2).T
    want = np.asarray(res_f.codes)[0, :, :of]
    assert np.array_equal(got, want)


def test_16bit_batch_raw_wire_end_to_end(tmp_path, monkeypatch):
    """A --bits 16 batch rides the narrow wire end to end and emits bytes
    identical to the host-decode path: the same samples written as 16-bit
    int PCM (raw-eligible) and as float32 (host decode) produce identical
    deliverables with dither off.  Also asserts the raw path was actually
    taken for the int source."""
    from f9tpu.io import read_wav, write_wav
    from f9tpu.pipeline import scheduler as sched

    rng = np.random.default_rng(47)
    frames = 5000
    # 16-bit-representable values, clipped WELL inside +-1 so the int16
    # writer and the float32 writer store identical samples
    x16 = np.round(np.clip(0.3 * rng.standard_normal((2, frames)), -0.9, 0.9)
                   * 32767) / 32768.0
    x16 = x16.astype(np.float32)
    src_i = str(tmp_path / "a" / "song.wav")
    src_f = str(tmp_path / "b" / "song.wav")
    os.makedirs(os.path.dirname(src_i))
    os.makedirs(os.path.dirname(src_f))
    write_wav(src_i, x16, 44100, bits=16)
    write_wav(src_f, x16, 44100, bits=32)

    raw_calls = []
    real_raw = sched.process_batch_raw

    def spy_raw(*a, **k):
        raw_calls.append(k.get("in_bits"))
        return real_raw(*a, **k)

    monkeypatch.setattr(sched, "process_batch_raw", spy_raw)
    out_i, out_f = str(tmp_path / "oi"), str(tmp_path / "of")
    cfg_i = ProcessingConfig(output_dir=out_i, target_rate=48000,
                             quality="low", bits=16, dither=False,
                             remove_dc=False)
    cfg_f = ProcessingConfig(output_dir=out_f, target_rate=48000,
                             quality="low", bits=16, dither=False,
                             remove_dc=False)
    assert BatchProcessor(cfg_i).run([src_i]).completed == 1
    assert raw_calls == [16], "16-bit job must take the raw narrow wire"
    assert BatchProcessor(cfg_f).run([src_f]).completed == 1
    yi, ri = read_wav(build_output_path(src_i, out_i, cfg_i.postfix))
    yf, rf = read_wav(build_output_path(src_f, out_f, cfg_f.postfix))
    assert ri == rf == 48000
    np.testing.assert_array_equal(yi, yf)


class _Advance:
    """Test-only acausal stage: advances the signal by `frames` (the
    over-compensated linear-phase insert the negative-latency contract
    exists for).  Causal-streaming APIs cannot represent it, so it is
    batch-only — exactly the case `measure_latency`'s mid-buffer impulse
    placement measures."""

    channel_local = True

    def __init__(self, frames):
        self.frames = int(frames)

    def signature(self):
        return ("advance", self.frames)

    def tail_frames(self, rate):
        return 0

    def apply(self, y, rate):
        pad = [(0, 0)] * (y.ndim - 1) + [(0, self.frames)]
        return jnp.pad(y[..., self.frames:], pad)


def test_acausal_chain_measured_and_compensated(tmp_path):
    """An acausal chain measures a NEGATIVE latency, and applying it through
    the batch graph lands the impulse at exactly zero delay in the output
    (apply-what-you-measure, both signs — VERDICT r3 missing #2)."""
    from f9tpu.ops.chain import Chain
    from f9tpu.ops.resample import resample_rates
    from f9tpu.pipeline.calibration import measure_latency

    adv = 977
    chain = Chain(_Advance(adv))

    def chain_fn(x):
        return chain.apply(resample_rates(x, 44100, 48000, quality="low"),
                           48000)

    cal = measure_latency(44100, 48000, quality="low", chain_fn=chain_fn)
    assert cal.detected
    assert cal.latency_frames == -adv, cal.latency_frames

    # batch graph with the measured (negative) latency: an impulse at a
    # known input position must land at its exact zero-delay output frame
    rate_in, frames = 44100, 44100
    pos_in = 30000
    x = np.zeros((1, 1, frames), np.float32)
    x[0, 0, pos_in] = 0.9
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False,
                           chain=chain, trim_enabled=True)
    res = process_batch(x, np.array([frames], np.int32), cfg, rate_in,
                        jax.random.PRNGKey(0),
                        latency_frames=cal.latency_frames)
    of = int(np.asarray(res.out_frames)[0])
    y = np.asarray(res.codes)[0, 0, :of].astype(np.float64) / (1 << 23)
    got_peak = int(np.abs(y).argmax())
    expected = int(round(pos_in * 160 / 147))
    assert abs(got_peak - expected) <= 1, (got_peak, expected)


def test_stream_negative_latency_inserts_dithered_head(tmp_path):
    """cfg.latency_frames < 0 on the streaming path: |lat| frames of
    dithered digital silence precede the (right-shifted) signal, bytes are
    chunk-size invariant, and the result matches the batch graph under the
    dither contract."""
    from f9tpu.pipeline.stream import stream_resample_file

    rate_in, rate_out, adv = 44100, 48000, 500
    rng = np.random.default_rng(48)
    T = rate_in
    x = (0.3 * rng.standard_normal((2, T))).astype(np.float32)
    src = str(tmp_path / "neg.wav")
    write_wav(src, x, rate_in, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=rate_out,
                           quality="low", seed=9, remove_dc=False,
                           trim_enabled=True, latency_frames=-adv)
    o1, o2 = str(tmp_path / "n1.wav"), str(tmp_path / "n2.wav")
    n1 = stream_resample_file(src, o1, cfg, chunk_seconds=0.23)
    n2 = stream_resample_file(src, o2, cfg, chunk_seconds=0.61)
    assert n1 == n2 == -(-T * 160 // 147)
    assert open(o1, "rb").read() == open(o2, "rb").read()
    y1, _ = read_wav(o1)
    # head is dithered silence: tiny but present (dither on), signal after
    head = y1[:, :adv]
    assert np.abs(head).max() <= 2.0 / (1 << 23)
    # batch graph with the same negative latency agrees (dither contract)
    dec, _ = read_wav(src)
    res = process_batch(dec[None], np.array([T], np.int32), cfg, rate_in,
                        jnp.asarray(np.array(
                            [__import__("f9tpu.ops.dither",
                                        fromlist=["file_seed"]).file_seed(
                                            9, src)], np.int64)),
                        latency_frames=-adv)
    of = int(np.asarray(res.out_frames)[0])
    yb = np.asarray(res.codes)[0][:, :of].astype(np.float64) / (1 << 23)
    assert of == n1
    d = np.abs(y1 - yb) * (1 << 23)
    assert d.max() <= 16 and (d != 0).mean() < 0.35


def test_write_wav_payload_roundtrip(tmp_path):
    from f9tpu.io import read_wav, write_wav_payload
    from f9tpu.io.wav import _pack24

    rng = np.random.default_rng(41)
    codes = rng.integers(-(2**23), 2**23, size=(3000, 2), dtype=np.int32)
    payload = _pack24(codes.reshape(-1))
    p = str(tmp_path / "pl.wav")
    write_wav_payload(p, payload, channels=2, rate=48000, bits=24)
    y, rate = read_wav(p)
    got = np.round(y * (1 << 23)).astype(np.int32)
    assert rate == 48000
    assert np.array_equal(got, codes.T)


def test_raw_path_with_reverb_mode(tmp_path):
    """Raw on-device-codec path combined with reverb-mode tail handling."""
    from f9tpu.io import write_wav
    from f9tpu.pipeline import process_batch_raw
    from f9tpu.io import read_raw_pcm

    rate = 44100
    rng = np.random.default_rng(44)
    x = np.zeros((1, rate), np.float32)
    x[0, : rate // 4] = 0.4 * rng.standard_normal(rate // 4)
    src = str(tmp_path / "rv.wav")
    write_wav(src, x, rate, bits=24)
    raw, info = read_raw_pcm(src)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", reverb_mode=True,
                           noise_floor_db=-96.0, dither=False)
    bucket = rate
    rawb = np.zeros((1, bucket * 1 * 3), np.uint8)
    rawb[0, : len(raw)] = raw
    res = process_batch_raw(rawb, np.array([rate], np.int32), cfg, rate,
                            jax.random.PRNGKey(0), in_channels=1, in_bits=24)
    of = int(np.asarray(res.out_frames)[0])
    assert of >= -(-rate * 160 // 147)  # at least the valid span
    assert bool(np.asarray(res.tail_terminated)[0])
    payload = np.asarray(res.codes)
    assert payload.dtype == np.uint8


# ---------- review-driven regression tests ----------

def test_long_file_not_truncated_in_plain_batch(tmp_path):
    """The 60 s cap is a reverb-capture bound; plain resampling must keep the
    whole file (was: silent truncation + COMPLETED)."""
    rate = 8000  # small rate so "past-cap" stays cheap
    frames = int(2.5 * rate)
    rng = np.random.default_rng(60)
    x = (0.1 * rng.standard_normal((1, frames))).astype(np.float32)
    src = str(tmp_path / "long.wav")
    write_wav(src, x, rate, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=8000,
                           quality="low", max_tail_seconds=1.0,  # cap << file
                           bucket_frames=(4096,), dither=False)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1
    y, r = read_wav(build_output_path(src, cfg.output_dir, cfg.postfix))
    assert y.shape[-1] == frames  # full length preserved (1:1 ratio)


def test_reverb_leading_silence_keeps_tail(tmp_path):
    """A silent intro must not terminate the 'tail' before the source ends."""
    rate = 44100
    frames = rate
    rng = np.random.default_rng(61)
    x = np.zeros((1, 1, frames), np.float32)
    # 300 ms of digital silence, then content to the very end
    lead = int(0.3 * rate)
    x[0, 0, lead:] = 0.3 * rng.standard_normal(frames - lead)
    cfg = ProcessingConfig(output_dir=str(tmp_path), quality="low",
                           reverb_mode=True, noise_floor_db=-96.0,
                           dither=False)
    res = process_batch(x, np.array([frames], np.int32), cfg, rate,
                        jax.random.PRNGKey(0))
    of = int(np.asarray(res.out_frames)[0])
    min_of = -(-frames * 160 // 147)
    assert of >= min_of  # never cut before the full source span


def test_output_name_collision_disambiguated(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    rng = np.random.default_rng(62)
    pa = str(tmp_path / "a" / "kick.wav")
    pb = str(tmp_path / "b" / "kick.wav")
    write_wav(pa, (0.1 * rng.standard_normal((1, 2205))).astype(np.float32),
              44100, bits=24)
    write_wav(pb, (0.1 * rng.standard_normal((1, 2205))).astype(np.float32),
              44100, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low")
    res = BatchProcessor(cfg).run([pa, pb])
    assert res.completed == 2
    outs = sorted(os.listdir(tmp_path / "out"))
    assert outs == ["kick_processed.wav", "kick_processed_2.wav"]


def test_stream_applies_gain(tmp_path):
    from f9tpu.pipeline import stream_resample_file

    rate = 44100
    x = (0.1 * np.ones((1, 4410))).astype(np.float32)
    src = str(tmp_path / "g.wav")
    write_wav(src, x, rate, bits=24)
    out = str(tmp_path / "g_out.wav")
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=44100,
                           quality="low", gain_db=6.0, dither=False,
                           remove_dc=False)
    stream_resample_file(src, out, cfg, chunk_seconds=0.05)
    y, _ = read_wav(out)
    assert abs(float(np.median(y)) - 0.1 * 10 ** (6.0 / 20.0)) < 1e-3


def test_streaming_exclusions_empty_for_all_configs(tmp_path):
    """Round 3's final state: the streaming path (single-chip AND sharded)
    carries the full feature set, so `streaming_exclusions` — the one source
    of truth the scheduler routes by — is empty even for a fully-loaded
    config (chain + reverb tails + trim + routing + normalization)."""
    from f9tpu.ops.chain import Chain, Delay
    from f9tpu.pipeline.stream import streaming_exclusions

    cfg = ProcessingConfig(output_dir=str(tmp_path), reverb_mode=True,
                           chain=Chain(Delay(0.01)), latency_frames=441,
                           channel_routing=[1, 0], normalize_lufs=-16.0)
    assert streaming_exclusions(cfg, sharded=False) == []
    assert streaming_exclusions(cfg, sharded=True) == []


def test_streaming_exclusion_varispeed_fft_chain(tmp_path):
    """The ONE round-4 gate: a varispeed ratio (huge L) + an FFT-convolution
    chain would need tens-of-megaframe grid-aligned chunks for byte-exact
    streaming — excluded loudly, and the scheduler falls back to an
    exact-fit reduced batch instead of failing the file."""
    from f9tpu.ops.chain import Chain, ConvolutionReverb
    from f9tpu.pipeline.stream import (stream_resample_file,
                                       streaming_exclusions)

    rng = np.random.default_rng(51)
    ir = (0.05 * rng.standard_normal(20000)).astype(np.float32)
    src = str(tmp_path / "vs.wav")
    write_wav(src, (0.3 * rng.standard_normal((2, 30_000))).astype(
        np.float32), 44100, bits=24)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                           target_rate=44056, quality="low", seed=3,
                           chain=Chain(ConvolutionReverb(ir, wet=0.5,
                                                         dry=0.5)),
                           latency_frames=0)
    excl = streaming_exclusions(cfg, src)
    assert excl and "FFT-grid" in excl[0]
    with pytest.raises(ValueError, match="FFT-grid"):
        stream_resample_file(src, str(tmp_path / "o.wav"), cfg)
    # a non-varispeed pair with the same chain streams fine (L small)
    cfg48 = ProcessingConfig(output_dir=str(tmp_path / "out"),
                             target_rate=48000, quality="low", seed=3,
                             chain=Chain(ConvolutionReverb(ir, wet=0.5,
                                                           dry=0.5)),
                             latency_frames=0)
    assert streaming_exclusions(cfg48, src) == []
    # scheduler: an oversized varispeed+FFT-chain file takes the exact-fit
    # reduced-batch fallback and still COMPLETES
    cfg_b = ProcessingConfig(output_dir=str(tmp_path / "outb"),
                             target_rate=44056, quality="low", seed=3,
                             bucket_frames=(16_384,), batch_size=4,
                             chain=Chain(ConvolutionReverb(
                                 ir[:4000], wet=0.5, dry=0.5)),
                             latency_frames=0)
    res = BatchProcessor(cfg_b).run([src])
    assert res.completed == 1 and res.failed == 0
    assert not res.per_file[src].get("streamed")


def test_rms_db_normalized_by_valid_length(tmp_path):
    """A short file in a big bucket must report its true RMS, not one diluted
    by bucket padding."""
    rate = 44100
    frames = 4410
    x = np.zeros((1, 1, 1 << 16), np.float32)
    x[0, 0, :frames] = 0.5  # constant: RMS = 0.5 -> -6.02 dB
    cfg = ProcessingConfig(output_dir=str(tmp_path), quality="low",
                           dither=False, remove_dc=False)
    res = process_batch(x, np.array([frames], np.int32), cfg, rate,
                        jax.random.PRNGKey(0))
    assert abs(float(np.asarray(res.rms_db)[0]) - (-6.02)) < 0.1


def test_scheduler_soak_many_small_files(tmp_path):
    """100 tiny files through the full threaded pipeline: exercises queue
    handoffs, the collector, manifest throttling, and resume bookkeeping at
    volume (race-condition soak)."""
    (tmp_path / "in").mkdir()
    rng = np.random.default_rng(99)
    paths = []
    for i in range(100):
        n = 500 + int(rng.integers(0, 1500))
        x = (0.1 * rng.standard_normal((1, n))).astype(np.float32)
        p = str(tmp_path / "in" / f"s{i:03d}.wav")
        write_wav(p, x, 44100, bits=24)
        paths.append(p)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", batch_size=16,
                           bucket_frames=(2048, 4096))
    bp = BatchProcessor(cfg)
    res = bp.run(paths, manifest_path=str(tmp_path / "m.json"))
    assert res.completed == 100 and res.failed == 0
    assert len([f for f in os.listdir(tmp_path / "out")
                if f.endswith(".wav")]) == 100
    # resume run: everything skipped
    res2 = BatchProcessor(cfg).run(paths, manifest_path=str(tmp_path / "m.json"))
    assert res2.completed == 100 and res2.audio_seconds_in == 0.0


def test_rows_layout_matches_flat(tmp_path):
    """The rows-layout fast path must match the flat path to <=1 LSB (the DC
    mean is summed in a different order -> occasional rounding-tie flips)."""
    rng = np.random.default_rng(70)
    x = (0.2 * rng.standard_normal((2, 2, 5000))).astype(np.float32)
    valid = np.array([5000, 3777], np.int32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False)
    key = jax.random.PRNGKey(0)
    rf = process_batch(x, valid, cfg, 44100, key)
    rr = process_batch(x, valid, cfg, 44100, key, rows_layout=True)
    assert rf.layout == "flat" and rr.layout == "rows"
    cf = np.asarray(rf.codes)
    cr = np.asarray(rr.codes).reshape(2, 2, -1)[:, :, : cf.shape[-1]]
    assert np.array_equal(np.asarray(rf.out_frames), np.asarray(rr.out_frames))
    assert np.abs(cf.astype(np.int64) - cr.astype(np.int64)).max() <= 1
    assert np.allclose(np.asarray(rf.peak_db), np.asarray(rr.peak_db), atol=1e-3)
    assert np.allclose(np.asarray(rf.rms_db), np.asarray(rr.rms_db), atol=1e-2)


def test_rows_layout_raw_path(tmp_path):
    from f9tpu.io import read_raw_pcm, write_wav
    from f9tpu.pipeline import process_batch_raw

    rng = np.random.default_rng(71)
    frames = 4410
    x = (0.2 * rng.standard_normal((2, frames))).astype(np.float32)
    src = str(tmp_path / "r.wav")
    write_wav(src, x, 44100, bits=24)
    raw, info = read_raw_pcm(src)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False)
    bucket = 8192
    rawb = np.zeros((1, bucket * 2 * 3), np.uint8)
    rawb[0, : len(raw)] = raw
    key = jax.random.PRNGKey(0)
    r_flat = process_batch_raw(rawb, np.array([frames], np.int32), cfg, 44100,
                               key, in_channels=2, in_bits=24)
    r_rows = process_batch_raw(rawb, np.array([frames], np.int32), cfg, 44100,
                               key, in_channels=2, in_bits=24, rows_layout=True)
    of = int(np.asarray(r_flat.out_frames)[0])
    assert int(np.asarray(r_rows.out_frames)[0]) == of
    # both raw paths emit a device-packed byte payload since round 5 (the
    # rows result reshapes flat on device, then rides the same packer —
    # 3/4 the D2H bytes on the link-bound path); the deliverable bytes
    # must be identical
    assert r_rows.layout == "flat"
    pr = np.asarray(r_rows.codes)[0, : of * 2 * 3]
    pf = np.asarray(r_flat.codes)[0, : of * 2 * 3]
    assert np.array_equal(pf, pr)


def test_batch_processor_rows_end_to_end(tmp_path):
    """Scheduler with device_layout='rows': outputs must still be correct
    WAVs at oracle parity (the default layout is 'packed')."""
    (tmp_path / "in").mkdir()
    files = make_lib(tmp_path / "in", n=2, seconds=0.15)
    out_dir = str(tmp_path / "out")
    cfg = ProcessingConfig(output_dir=out_dir, target_rate=48000,
                           quality="medium", remove_dc=False, dither=False,
                           device_layout="rows")
    res = BatchProcessor(cfg).run(files)
    assert res.completed == 2
    for p in files:
        y, rate = read_wav(build_output_path(p, out_dir, cfg.postfix))
        src, _ = read_wav(p)
        assert rate == 48000
        assert y.shape[-1] == -(-src.shape[-1] * 160 // 147)
        ref = resample_oracle(src[0], 44100, 48000, quality="medium")
        err = y[0].astype(np.float64) - ref
        db = 20 * np.log10(np.sqrt((err**2).mean())
                           / np.sqrt((ref**2).mean()) + 1e-30)
        assert db < -95, db


def test_batch_processor_rows_device_layout(tmp_path):
    (tmp_path / "in").mkdir()
    files = make_lib(tmp_path / "in", n=2, seconds=0.1)
    out_dir = str(tmp_path / "out")
    cfg = ProcessingConfig(output_dir=out_dir, target_rate=48000,
                           quality="low", dither=False, remove_dc=False,
                           device_layout="rows")
    res = BatchProcessor(cfg).run(files)
    assert res.completed == 2
    for p in files:
        y, rate = read_wav(build_output_path(p, out_dir, cfg.postfix))
        src, _ = read_wav(p)
        assert rate == 48000
        ref = resample_oracle(src[0], 44100, 48000, quality="low")
        err = y[0].astype(np.float64) - ref
        db = 20 * np.log10(np.sqrt((err**2).mean())
                           / np.sqrt((ref**2).mean()) + 1e-30)
        assert db < -95, db


def test_rows_layout_multichannel_and_routing(tmp_path):
    """Rows layout with 8-ch input + routing map (layout math must hold for
    any channel count)."""
    rng = np.random.default_rng(80)
    frames = 3000
    x = (0.2 * rng.standard_normal((1, 8, frames))).astype(np.float32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                           quality="low", dither=False, remove_dc=False,
                           channel_routing=[7, 0, -1, 3], device_layout="rows")
    key = jax.random.PRNGKey(0)
    rf = process_batch(x, np.array([frames], np.int32), cfg, 44100, key)
    rr = process_batch(x, np.array([frames], np.int32), cfg, 44100, key,
                       rows_layout=True)
    cf = np.asarray(rf.codes)
    cr = np.asarray(rr.codes).reshape(1, 4, -1)[:, :, : cf.shape[-1]]
    assert np.abs(cf.astype(np.int64) - cr.astype(np.int64)).max() <= 1
    assert np.all(cr[0, 2] == 0)  # silent bus in rows layout too


def test_scheduler_16bit_output(tmp_path):
    """16-bit output config end-to-end (disables the raw fast path, which
    requires 24-bit out)."""
    (tmp_path / "in").mkdir()
    files = make_lib(tmp_path / "in", n=1, seconds=0.1)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", bits=16)
    res = BatchProcessor(cfg).run(files)
    assert res.completed == 1
    from f9tpu.io import probe
    info = probe(build_output_path(files[0], cfg.output_dir, cfg.postfix))
    assert info.bit_depth == 16 and info.sample_rate == 48000


def test_scheduler_lagrange_kind(tmp_path):
    (tmp_path / "in").mkdir()
    files = make_lib(tmp_path / "in", n=1, seconds=0.1)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           kind="lagrange", dither=False, remove_dc=False)
    res = BatchProcessor(cfg).run(files)
    assert res.completed == 1
    y, rate = read_wav(build_output_path(files[0], cfg.output_dir, cfg.postfix))
    src, _ = read_wav(files[0])
    ref = resample_oracle(src[0], 44100, 48000, kind="lagrange")
    err = y[0].astype(np.float64) - ref
    db = 20 * np.log10(np.sqrt((err**2).mean())
                       / np.sqrt((ref**2).mean()) + 1e-30)
    assert db < -90, db


def test_kitchen_sink_pipeline(tmp_path):
    """Every major round-2 feature in ONE run: convolution-reverb insert in
    reverb mode + loudness normalization with a true-peak ceiling + mono
    fan-out + seeded dither + AIFF output."""
    import jax.numpy as jnp

    from f9tpu.io.aiff import read_aiff
    from f9tpu.io import write_wav
    from f9tpu.ops.chain import Chain, ConvolutionReverb, Saturator
    from f9tpu.ops.loudness import integrated_lufs, true_peak_db

    rate = 44100
    (tmp_path / "in").mkdir()
    t = np.arange(int(0.4 * rate)) / rate
    hit = (0.5 * np.sin(2 * np.pi * 220 * t)
           * np.exp(-t / 0.05)).astype(np.float32)
    src = str(tmp_path / "in" / "hit.wav")
    write_wav(src, hit[None], rate, bits=24)       # mono in

    ir_len = 12000                                  # 0.25 s tail @ 48k
    rng = np.random.default_rng(3)
    ir = np.zeros(ir_len, np.float32)
    ir[0] = 1.0
    ir[1:] = (0.05 * rng.standard_normal(ir_len - 1)
              * np.exp(-np.arange(1, ir_len) / 2000)).astype(np.float32)
    chain = Chain(ConvolutionReverb(ir, wet=0.5, dry=0.5),
                  Saturator("tanh", 2.0, 0.7))

    # NOTE no normalize_tp here: the ceiling is SOURCE-referenced (exact for
    # plain resampling, tested separately); an insert chain reshapes peaks
    # after the measurement
    cfg = ProcessingConfig(
        output_dir=str(tmp_path / "out"), target_rate=48000, quality="low",
        seed=5, chain=chain, reverb_mode=True, noise_floor_db=-90.0,
        normalize_lufs=-18.0,
        output_channels=2, output_format="aiff")
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1 and res.failed == 0

    y, r = read_aiff(str(tmp_path / "out" / "hit_processed.aiff"))
    assert r == 48000 and y.shape[0] == 2 and np.isfinite(y).all()
    src_out = int(np.ceil(len(hit) * 48000 / rate))
    assert y.shape[1] > src_out                    # reverb tail kept
    assert float(true_peak_db(jnp.asarray(y.astype(np.float32)), r)) < 0.0


def test_batch_result_per_file_metrics(tmp_path):
    """BatchResult.per_file exposes the device metrics machine-readably (the
    reference's per-file list readouts)."""
    (tmp_path / "in").mkdir(exist_ok=True)
    paths = make_lib(tmp_path / "in", n=2)
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", seed=1)
    res = BatchProcessor(cfg).run(
        paths, manifest_path=str(tmp_path / "m.json"))
    assert res.completed == 2
    assert set(res.per_file) == set(paths)
    # metrics persist in the manifest for tooling (and resume tolerates them)
    from f9tpu.pipeline import JobManifest
    m = JobManifest.load_or_create(paths, str(tmp_path / "m.json"))
    assert m.get(paths[0]).metrics["out_frames"] > 0
    for p, m in res.per_file.items():
        assert m["out_frames"] > 0
        assert -30.0 < m["peak_db"] < 0.0        # ~0.4 amplitude sines
        assert -30.0 < m["rms_db"] < m["peak_db"] + 0.1
        assert m["noise_floor_db"] <= m["rms_db"]


def test_outputs_invariant_to_batch_grouping(tmp_path):
    """The dither contract's strongest claim, tested directly: the same
    seeded files produce byte-identical outputs whether they are processed
    one per batch or all in one batch (noise keys carry no batch geometry)."""
    (tmp_path / "in").mkdir(exist_ok=True)
    paths = make_lib(tmp_path / "in", n=4)

    def run(out, batch_size):
        cfg = ProcessingConfig(output_dir=str(tmp_path / out),
                               target_rate=48000, quality="low", seed=7,
                               batch_size=batch_size,
                               bucket_frames=(1 << 14, 1 << 16))
        assert BatchProcessor(cfg).run(paths).completed == 4
        return {p: open(build_output_path(p, str(tmp_path / out),
                                          cfg.postfix), "rb").read()
                for p in paths}

    a = run("o1", 1)
    b = run("o2", 4)
    for p in paths:
        assert a[p] == b[p], p


def test_noise_floor_excludes_linear_phase_pre_ring():
    """A linear-phase chain pre-rings symmetrically BEFORE the peak; that
    span is filter response, not noise, and must not inflate the measured
    floor (which the scheduler adopts as the tail-detection threshold)."""
    from f9tpu.ops.chain import Chain, FIRInsert
    from f9tpu.ops.resample import resample_rates as _rr

    W = 12001                              # > FIR direct-form cutoff: FFT path
    n = np.arange(W)
    taps = np.sinc((n - (W - 1) / 2) / 4).astype(np.float32)
    taps *= np.hamming(W).astype(np.float32)
    chain = Chain(FIRInsert(taps / taps.sum()))

    def chain_fn(x):
        return chain.apply(_rr(x, 44100, 48000, quality="low"), 48000)

    res = measure_latency(44100, 48000, quality="low", chain_fn=chain_fn,
                          ringout_frames=chain.tail_frames(48000))
    assert res.detected
    assert res.latency_frames == (W - 1) // 2
    # pre-fix the [peak-ring, peak-guard] span of real pre-ring landed in
    # the "noise" RMS and reported tens of dB too high
    assert res.noise_floor_db < -100.0


def test_calibration_cache_unsigned_chain_not_cached(tmp_path):
    """A custom chain_fn without a chain signature must not share (or
    poison) the bare-SRC cache slot."""
    from f9tpu.ops.chain import Chain, Delay
    from f9tpu.ops.resample import resample_rates as _rr

    cache = CalibrationCache(str(tmp_path / "cal.json"))
    bare = cache.get_or_measure(44100, 48000, quality="low")
    assert abs(bare.latency_frames) <= 1

    chain = Chain(Delay(0.05))             # 2400 frames at 48 kHz

    def chain_fn(x):
        return chain.apply(_rr(x, 44100, 48000, quality="low"), 48000)

    got = cache.get_or_measure(44100, 48000, quality="low",
                               chain_fn=chain_fn)   # no chain_sig
    assert abs(got.latency_frames - 2400) <= 1      # measured, not bare hit
    again = cache.get_or_measure(44100, 48000, quality="low")
    assert abs(again.latency_frames) <= 1           # bare slot unpoisoned


def test_calibration_invalidate_field_boundary(tmp_path):
    from f9tpu.pipeline.calibration import CalibrationResult

    cache = CalibrationCache(str(tmp_path / "cal.json"))
    r = CalibrationResult(latency_frames=0, noise_floor_db=-150.0,
                          peak_amplitude=0.9)
    cache._data = {"44100->48000:sinc:low:": r,
                   "44100->480000:sinc:low:": r}
    cache.invalidate("44100->48000")
    assert list(cache._data) == ["44100->480000:sinc:low:"]


def test_loop_test_short_capture_no_crash():
    """A capture too short for zero-crossing analysis must classify, not
    divide by zero."""
    rep = run_loop_test(48000, 44100, seconds=1e-4, quality="low")
    assert rep.verdict in (LoopTestVerdict.DEGRADED, LoopTestVerdict.NO_INPUT,
                           LoopTestVerdict.NO_OUTPUT)


def test_empty_file_reverb_mode_emits_zero_frames(tmp_path):
    """Regression: a 0-frame input in reverb mode must produce 0 output
    frames — the all-quiet tail detector used to fire at win+(k-1)*hop and
    ~0.2 s of pure dither noise was written for an empty file."""
    rate = 44100
    frames = rate // 2
    rng = np.random.default_rng(4)
    x = np.zeros((2, 1, frames), np.float32)
    x[0, 0] = (0.3 * rng.standard_normal(frames)).astype(np.float32)
    cfg = ProcessingConfig(output_dir=str(tmp_path), quality="low",
                           reverb_mode=True, noise_floor_db=-96.0,
                           dither=True)
    res = process_batch(x, np.array([frames, 0], np.int32), cfg, rate,
                        jnp.asarray(np.array([3, 4], np.int32)))
    of = np.asarray(res.out_frames)
    assert of[1] == 0                       # empty in -> empty out
    assert of[0] >= -(-frames * 160 // 147)  # real file unaffected
