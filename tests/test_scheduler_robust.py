"""Round-3 scheduler robustness: oversized-file routing to the streaming
path, encoder fault containment, and content-hash resume verification."""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pytest

from f9tpu.config import ProcessingConfig
from f9tpu.io import read_wav, write_wav
from f9tpu.pipeline import BatchProcessor, stream_resample_file
from f9tpu.pipeline.manifest import FileStatus, JobManifest, file_crc32


def _mk(tmp_path, name, frames, rate=44100, channels=2, seed=0, amp=0.25):
    rng = np.random.default_rng(seed)
    x = (amp * rng.standard_normal((channels, frames))).astype(np.float32)
    p = str(tmp_path / name)
    write_wav(p, x, rate, bits=24)
    return p


class TestOversizedRouting:
    def test_oversized_file_streams(self, tmp_path):
        """A file beyond the largest bucket takes the constant-memory
        streaming path (metrics flag + byte-identical to a direct stream,
        since both derive the dither seed from (cfg.seed, path))."""
        rate = 44100
        big = _mk(tmp_path, "long.wav", 90_000, rate=rate, seed=1)
        small = _mk(tmp_path, "short.wav", 10_000, rate=rate, seed=2)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=5,
                               bucket_frames=(16_384, 32_768), batch_size=4)
        proc = BatchProcessor(cfg)
        res = proc.run([big, small])
        assert res.completed == 2 and res.failed == 0
        assert res.per_file[big].get("streamed") is True
        assert "streamed" not in res.per_file[small]

        # direct streaming run with the same cfg produces identical bytes
        ref = str(tmp_path / "direct.wav")
        cfg2 = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                                quality="low", seed=5,
                                bucket_frames=(16_384, 32_768), batch_size=4)
        stream_resample_file(big, ref, cfg2)
        a = open(str(tmp_path / "out" / "long_processed.wav"), "rb").read()
        b = open(ref, "rb").read()
        assert a == b

    def test_oversized_ineligible_gets_reduced_batch(self, tmp_path):
        """Stream-ineligible config (reverb mode — tail handling is a
        batch-path feature) falls back to an exact-fit bucket at reduced
        batch width, not batch_size staging."""
        rate = 44100
        big = _mk(tmp_path, "long2.wav", 80_000, rate=rate, seed=3)
        from f9tpu.pipeline.logbook import StatusLog

        log = StatusLog()
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=5,
                               bucket_frames=(16_384,), batch_size=8,
                               reverb_mode=True, noise_floor_db=-90.0)
        res = BatchProcessor(cfg, log=log).run([big])
        assert res.completed == 1
        joined = "\n".join(log.lines)
        assert "batch width reduced" in joined
        y, r = read_wav(str(tmp_path / "out" / "long2_processed.wav"))
        assert r == 48000

    def test_oversized_with_latency_still_streams(self, tmp_path):
        """Round 3: the latency-trim exclusion is lifted — an oversized file
        with an explicit chain latency streams (with the trim applied)
        instead of falling back to the exact-fit bucket."""
        rate = 44100
        big = _mk(tmp_path, "long3.wav", 80_000, rate=rate, seed=4)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=5,
                               bucket_frames=(16_384,), batch_size=4,
                               latency_frames=64)
        res = BatchProcessor(cfg).run([big])
        assert res.completed == 1
        assert res.per_file[big].get("streamed") is True

    def test_multiple_buckets_one_run(self, tmp_path):
        """Persistent-pipeline smoke: several groups/buckets complete through
        the single shared decode/collect/encode stage set."""
        files = [
            _mk(tmp_path, "a.wav", 5_000, rate=44100, seed=10),
            _mk(tmp_path, "b.wav", 30_000, rate=44100, seed=11),
            _mk(tmp_path, "c.wav", 5_000, rate=48000, seed=12),
            _mk(tmp_path, "d.wav", 30_000, rate=48000, channels=1, seed=13),
        ]
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=44100, quality="low", seed=1,
                               bucket_frames=(8_192, 65_536), batch_size=2)
        res = BatchProcessor(cfg).run(files)
        assert res.completed == 4 and res.failed == 0


class TestSharedDecodeQueue:
    def test_slow_decode_does_not_block_other_files(self, tmp_path,
                                                    monkeypatch):
        """Round 4 (VERDICT r3 weak #4): decode workers drain one shared
        queue.  With the old static work[i::n] split, a slow file at a
        worker's list head stalled every file behind it in that private
        sublist; now the other worker(s) pick those files up while the slow
        decode runs — every other file STARTS decoding before the slow one
        finishes."""
        import threading
        import time as _time

        from f9tpu.io import codec

        # float32 sources so the host decode path (codec.read_audio) runs
        paths = []
        rng = np.random.default_rng(5)
        for i in range(4):
            x = (0.2 * rng.standard_normal((2, 4000))).astype(np.float32)
            p = str(tmp_path / f"q{i}.wav")
            write_wav(p, x, 44100, bits=32)
            paths.append(p)
        slow = paths[0]
        starts: dict[str, float] = {}
        slow_done = [None]
        lock = threading.Lock()
        real = codec.read_audio

        def spy(path, *a, **k):
            with lock:
                starts.setdefault(path, _time.time())
            if path == slow:
                _time.sleep(1.0)
                out = real(path, *a, **k)
                slow_done[0] = _time.time()
                return out
            return real(path, *a, **k)

        monkeypatch.setattr(codec, "read_audio", spy)
        import f9tpu.pipeline.scheduler as sched

        monkeypatch.setattr(sched.codec, "read_audio", spy)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low",
                               dither=False)
        bp = BatchProcessor(cfg)
        bp.decode_workers = 2
        res = bp.run(paths)
        assert res.completed == 4
        assert slow_done[0] is not None
        late = [p for p in paths[1:] if starts[p] >= slow_done[0]]
        assert not late, (
            f"files {late} waited for the slow decode to finish — "
            "head-of-line blocking is back")


class TestEncoderFaultContainment:
    def test_dead_encoder_fails_files_without_hanging(self, tmp_path,
                                                      monkeypatch):
        """An encode-side struct.error (the round-2 >4 GiB failure class)
        must mark files FAILED and let the run exit — not silently kill the
        worker and wedge the collector on a full queue."""
        files = [_mk(tmp_path, f"f{i}.wav", 4_000, seed=i) for i in range(6)]
        from f9tpu.io import wav as wav_mod

        def boom(*a, **k):
            raise struct.error("'I' format requires 0 <= number <= 4294967295")

        monkeypatch.setattr(wav_mod, "write_wav_codes", boom)
        monkeypatch.setattr(wav_mod, "write_wav_payload", boom)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=1,
                               batch_size=2)
        mpath = str(tmp_path / "m.json")
        res = BatchProcessor(cfg).run(files, manifest_path=mpath)
        assert res.completed == 0
        assert res.failed == 6
        saved = json.load(open(mpath))
        for row in saved["files"]:
            assert row["status"] == "failed"
            assert "4294967295" in row["error"]


class TestContentHashResume:
    def test_corrupted_output_reprocesses_on_resume(self, tmp_path):
        src = _mk(tmp_path, "r.wav", 9_000, seed=7)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=9)
        mpath = str(tmp_path / "manifest.json")
        res = BatchProcessor(cfg).run([src], manifest_path=mpath)
        assert res.completed == 1
        out = str(tmp_path / "out" / "r_processed.wav")
        good = open(out, "rb").read()
        good_crc = file_crc32(out)
        saved = json.load(open(mpath))
        assert saved["files"][0]["output_crc32"] == good_crc

        # corrupt one payload byte WITHOUT changing the size: the round-2
        # size-only check would trust this file
        bad = bytearray(good)
        bad[len(bad) // 2] ^= 0xFF
        open(out, "wb").write(bytes(bad))
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.PENDING  # hash mismatch

        res2 = BatchProcessor(cfg).run([src], manifest_path=mpath)
        assert res2.completed == 1
        assert open(out, "rb").read() == good  # seeded rerun reproduces bytes

    def test_intact_output_skips_on_resume(self, tmp_path):
        src = _mk(tmp_path, "s.wav", 9_000, seed=8)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=9)
        mpath = str(tmp_path / "manifest.json")
        assert BatchProcessor(cfg).run([src], manifest_path=mpath).completed == 1
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.COMPLETED

    def test_old_manifest_without_hash_still_loads(self, tmp_path):
        src = _mk(tmp_path, "t.wav", 4_000, seed=9)
        out = _mk(tmp_path, "t_old_out.wav", 4_000, seed=9)
        rows = {"files": [{"path": src, "status": "completed",
                           "output_path": out,
                           "output_size": os.path.getsize(out)}]}
        mpath = str(tmp_path / "old.json")
        json.dump(rows, open(mpath, "w"))
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.COMPLETED  # tolerant loader


class TestVerifyCommand:
    def test_cli_verify_audits_outputs(self, tmp_path, capsys):
        from f9tpu.cli import main

        src = _mk(tmp_path, "v.wav", 8_000, seed=20)
        out_dir = str(tmp_path / "out")
        rc = main(["process", src, "--out", out_dir, "--rate", "48000",
                   "--quality", "low", "--seed", "3", "--resume"])
        assert rc == 0
        mpath = os.path.join(out_dir, ".manifest.json")
        capsys.readouterr()

        rc = main(["verify", mpath])
        assert rc == 0
        assert "1 ok, 0 corrupt" in capsys.readouterr().out

        # corrupt a payload byte, size unchanged -> crc_mismatch, exit 1
        out = os.path.join(out_dir, "v_processed.wav")
        raw = bytearray(open(out, "rb").read())
        raw[len(raw) // 2] ^= 0x55
        open(out, "wb").write(bytes(raw))
        rc = main(["verify", mpath, "--json"])
        assert rc == 1
        got = json.loads(capsys.readouterr().out)
        assert got["counts"]["corrupt"] == 1
        assert got["files"][0]["status"] == "crc_mismatch"

        # delete it -> missing
        os.unlink(out)
        rc = main(["verify", mpath])
        assert rc == 1
        assert "1 missing" in capsys.readouterr().out


class TestChaosSoak:
    def test_mixed_buckets_with_random_decode_failures(self, tmp_path,
                                                       monkeypatch):
        """Chaos soak for the persistent pipeline: many files across several
        groups/buckets with randomly-injected decode failures — counts must
        reconcile exactly (every file terminal), no hang, partial batches
        flushed per bucket."""
        import f9tpu.io.codec as codec_mod

        rng = np.random.default_rng(42)
        files = []
        for i in range(40):
            rate = [44100, 48000][i % 2]
            frames = int(rng.integers(1_000, 20_000))
            ch = [1, 2][(i // 2) % 2]
            files.append(_mk(tmp_path, f"c{i}.wav", frames, rate=rate,
                             channels=ch, seed=i))

        real_read = codec_mod.read_audio
        real_raw = codec_mod.read_raw_pcm
        fail_set = {f for i, f in enumerate(files) if i % 7 == 3}

        def flaky(path):
            if path in fail_set:
                raise RuntimeError(f"injected decode failure: {path}")
            return real_read(path)

        def flaky_raw(path):
            if path in fail_set:
                raise RuntimeError(f"injected decode failure: {path}")
            return real_raw(path)

        monkeypatch.setattr(codec_mod, "read_audio", flaky)
        monkeypatch.setattr(codec_mod, "read_raw_pcm", flaky_raw)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=5,
                               bucket_frames=(4_096, 16_384, 32_768),
                               batch_size=4)
        mpath = str(tmp_path / "m.json")
        res = BatchProcessor(cfg, decode_workers=3,
                             encode_workers=3).run(files, manifest_path=mpath)
        assert res.completed == len(files) - len(fail_set)
        assert res.failed == len(fail_set)
        saved = json.load(open(mpath))
        statuses = {row["path"]: row["status"] for row in saved["files"]}
        for f in files:
            assert statuses[f] == ("failed" if f in fail_set else "completed")
        # every completed output exists and passes its own content hash
        for row in saved["files"]:
            if row["status"] == "completed":
                assert os.path.getsize(row["output_path"]) == row["output_size"]
                assert file_crc32(row["output_path"]) == row["output_crc32"]


class TestDispatchRetry:
    def test_transient_device_failure_retries_once(self, tmp_path,
                                                   monkeypatch):
        """A transient compile/dispatch failure (the remote compile service
        500s intermittently) retries once and the batch completes; only a
        persistent failure aborts."""
        import f9tpu.pipeline.scheduler as sched

        src = _mk(tmp_path, "t.wav", 4_000, seed=1)
        real = sched.process_batch_raw   # 24-bit PCM WAV takes the raw path
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("INTERNAL: http 500 remote_compile (fake)")
            return real(*a, **k)

        monkeypatch.setattr(sched, "process_batch_raw", flaky)
        monkeypatch.setattr(sched.time, "sleep", lambda s: None)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=1)
        res = BatchProcessor(cfg).run([src])
        assert res.completed == 1 and calls["n"] == 2

    def test_persistent_device_failure_aborts(self, tmp_path, monkeypatch):
        import f9tpu.pipeline.scheduler as sched

        src = _mk(tmp_path, "t2.wav", 4_000, seed=2)

        def dead(*a, **k):
            raise RuntimeError("INTERNAL: deterministic compile error")

        monkeypatch.setattr(sched, "process_batch", dead)
        monkeypatch.setattr(sched, "process_batch_raw", dead)
        monkeypatch.setattr(sched.time, "sleep", lambda s: None)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=1)
        res = BatchProcessor(cfg).run([src])
        assert res.completed == 0 and res.failed == 1


class TestResumeMtimeFastPath:
    def test_untouched_output_skips_crc_read(self, tmp_path, monkeypatch):
        """Resume must NOT re-hash untouched outputs (a `watch` loop resumes
        every sweep; O(library) re-reads per sweep would not scale) — the
        CRC read happens only when size+mtime changed."""
        import f9tpu.pipeline.manifest as man

        src = _mk(tmp_path, "w.wav", 5_000, seed=30)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=9)
        mpath = str(tmp_path / "m.json")
        assert BatchProcessor(cfg).run([src], manifest_path=mpath).completed == 1

        calls = {"n": 0}
        real = man.file_crc32

        def counting(path, *a, **k):
            calls["n"] += 1
            return real(path, *a, **k)

        monkeypatch.setattr(man, "file_crc32", counting)
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.COMPLETED
        assert calls["n"] == 0          # untouched: no re-read

        # touch the output (content unchanged): mtime differs -> CRC runs
        out = str(tmp_path / "out" / "w_processed.wav")
        os.utime(out, ns=(1, 1))
        m2 = JobManifest.load_or_create([src], mpath)
        assert calls["n"] == 1
        assert m2.get(src).status == FileStatus.COMPLETED  # content intact


class TestCrossRunNaming:
    def test_suffixed_names_respect_earlier_reservations(self, tmp_path):
        """Three same-stem inputs over three runs sharing a cumulative
        manifest: each must get a distinct deliverable, and a later run's
        generated suffix must never overwrite an earlier run's recorded
        one (the f_processed_2.wav hole)."""
        outs = str(tmp_path / "out")
        mpath = str(tmp_path / "m.json")
        cfg = ProcessingConfig(output_dir=outs, target_rate=48000,
                               quality="low", seed=3)
        paths = []
        for i in range(3):
            d = tmp_path / f"in{i}"
            d.mkdir()
            paths.append(_mk(d, "f.wav", 3000 + 100 * i, seed=40 + i))
        for p in paths:
            assert BatchProcessor(cfg).run(
                [p], manifest_path=mpath).completed == 1
        names = sorted(o for o in os.listdir(outs) if o.endswith(".wav"))
        assert names == ["f_processed.wav", "f_processed_2.wav",
                         "f_processed_3.wav"], names
        # each deliverable decodes to a distinct length (nothing overwritten)
        lens = {read_wav(os.path.join(outs, n))[0].shape[-1] for n in names}
        assert len(lens) == 3

    def test_reprocessed_file_keeps_its_name(self, tmp_path):
        """A re-dropped (changed content) file must overwrite its OWN
        deliverable, not shift to a suffixed name."""
        outs = str(tmp_path / "out")
        mpath = str(tmp_path / "m.json")
        cfg = ProcessingConfig(output_dir=outs, target_rate=48000,
                               quality="low", seed=4)
        p = _mk(tmp_path, "g.wav", 3000, seed=50)
        assert BatchProcessor(cfg).run([p], manifest_path=mpath).completed == 1
        _mk(tmp_path, "g.wav", 4000, seed=51)          # replaced content
        assert BatchProcessor(cfg).run([p], manifest_path=mpath).completed == 1
        names = sorted(o for o in os.listdir(outs) if o.endswith(".wav"))
        assert names == ["g_processed.wav"], names
        y, _ = read_wav(os.path.join(outs, names[0]))
        assert y.shape[-1] == round(4000 * 48000 / 44100)


class TestOversizedChainRouting:
    def test_oversized_long_ring_chain_streams(self, tmp_path):
        """A chain whose ring-out exceeds the default streaming chunk used
        to hard-fail oversized files (stream_resample_file raised): the
        chunk now grows to fit the ring, so the file still streams."""
        from f9tpu.ops.chain import Chain, Delay

        big = _mk(tmp_path, "ring.wav", 80_000, rate=44100, seed=6)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=5,
                               bucket_frames=(16_384,), batch_size=4,
                               chain=Chain(Delay(21.0)), latency_frames=0)
        res = BatchProcessor(cfg).run([big])
        assert res.completed == 1 and res.failed == 0
        assert res.per_file[big].get("streamed") is True
        # streamed wall is booked to its own stage, not the device counters
        assert "stream" in res.throughput


class TestAtomicPublish:
    def test_encode_failure_leaves_no_partial_file(self, tmp_path,
                                                   monkeypatch):
        """Deliverables are encoded to a .part file and renamed at
        completion: a writer that dies mid-file must leave NEITHER a
        half-written deliverable at the final name NOR .part litter."""
        from f9tpu.io import wav as wav_mod

        src = _mk(tmp_path, "p.wav", 4_000, seed=1)

        def half_then_boom(path, *a, **k):
            with open(path, "wb") as f:
                f.write(b"RIFF\x00\x00\x00\x00WAVEjunk")
            raise struct.error("mid-write failure")

        monkeypatch.setattr(wav_mod, "write_wav_codes", half_then_boom)
        monkeypatch.setattr(wav_mod, "write_wav_payload", half_then_boom)
        out = tmp_path / "out"
        cfg = ProcessingConfig(output_dir=str(out), target_rate=48000,
                               quality="low", seed=1)
        res = BatchProcessor(cfg).run([src])
        assert res.failed == 1
        leftovers = [n for n in os.listdir(out) if not n.startswith(".")]
        assert leftovers == [], leftovers   # no corrupt final, no .part

    def test_stream_success_leaves_no_part(self, tmp_path):
        src = _mk(tmp_path, "s.wav", 20_000, seed=2)
        cfg = ProcessingConfig(output_dir=str(tmp_path), target_rate=48000,
                               quality="low", seed=2)
        out = str(tmp_path / "s48.wav")
        n = stream_resample_file(src, out, cfg, chunk_seconds=0.2)
        assert n > 0 and os.path.exists(out)
        assert not os.path.exists(out + ".part")


class TestManifestDurability:
    def test_stale_tmp_staging_cleaned_on_init(self, tmp_path):
        """Orphaned .tmp-<pid>-<id> staging files from DEAD processes are
        swept when a manifest opens the same path (advisor r3 #1: a
        repeatedly-killed watch daemon accumulated them forever).  Files
        owned by LIVE pids — including our own — are left alone."""
        mpath = str(tmp_path / "m.json")
        dead = mpath + ".tmp-999999-deadbeef"     # pid 999999: not running
        open(dead, "w").write("{}")
        mine = mpath + f".tmp-{os.getpid()}-cafe"  # our own pid: live
        open(mine, "w").write("{}")
        JobManifest.load_or_create([], mpath)
        assert not os.path.exists(dead)
        assert os.path.exists(mine)

    def test_stale_deferred_timer_does_not_overwrite_newer_save(
            self, tmp_path):
        """A deferred-save timer left alive past a forced save must become a
        no-op: its captured generation is stale, so it cannot overwrite
        newer on-disk state (advisor r3 #2)."""
        src = _mk(tmp_path, "g.wav", 1_000, seed=9)
        mpath = str(tmp_path / "mg.json")
        m = JobManifest.load_or_create([src], mpath)
        m.save()                                   # throttle window opens
        m.update(src, FileStatus.PROCESSING)       # throttled: arms a timer
        timer = m._timer
        assert timer is not None
        m.update(src, FileStatus.COMPLETED)
        m.save()                                   # real save: gen advances
        gen = m._save_gen
        # fire the stale timer's callback directly (deterministic, no sleep)
        m._deferred_save(gen - 1)
        assert m._save_gen == gen                  # no write happened
        m2 = JobManifest.load(mpath)
        assert m2.get(src).status == FileStatus.COMPLETED

    def test_corrupt_manifest_recovers(self, tmp_path):
        """A truncated/garbage manifest (crash mid-save, foreign version)
        must fall back to a fresh one — losing history beats wedging the
        watch daemon in a fail-every-sweep loop."""
        src = _mk(tmp_path, "c.wav", 4_000, seed=3)
        mpath = str(tmp_path / "m.json")
        open(mpath, "w").write('{"files": [{"status": "not-a-')
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.PENDING
        assert os.path.exists(mpath + ".corrupt")   # kept for forensics
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=3)
        assert BatchProcessor(cfg).run([src],
                                       manifest_path=mpath).completed == 1

    def test_missing_input_keeps_completed_record(self, tmp_path):
        """An input deleted after a successful run must NOT flip its
        verified COMPLETED record back to pending (the rerun would only
        fail the probe and destroy a valid record for an intact output)."""
        src = _mk(tmp_path, "d.wav", 4_000, seed=4)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=4)
        mpath = str(tmp_path / "m.json")
        assert BatchProcessor(cfg).run([src],
                                       manifest_path=mpath).completed == 1
        os.unlink(src)
        m = JobManifest.load_or_create([src], mpath)
        assert m.get(src).status == FileStatus.COMPLETED

    def test_throttled_updates_flush_without_final_save(self, tmp_path):
        """Updates landing inside the save-interval window self-flush via
        the deferred timer — an exception path that skips the batch-end
        save() can no longer lose the last interval of status changes."""
        import time as _t

        src = _mk(tmp_path, "e.wav", 1_000, seed=5)
        mpath = str(tmp_path / "m.json")
        m = JobManifest.from_files([src], mpath)
        m._save_interval = 0.2
        m.update(src, FileStatus.PROCESSING)          # immediate write
        m.update(src, FileStatus.FAILED, error="late")  # throttled
        saved = json.load(open(mpath))
        assert saved["files"][0]["status"] == "processing"  # not yet
        _t.sleep(0.5)                                  # timer fires
        saved = json.load(open(mpath))
        assert saved["files"][0]["status"] == "failed"


class TestSkippedCount:
    def test_resume_skips_reported_separately(self, tmp_path):
        src = _mk(tmp_path, "k.wav", 4_000, seed=6)
        cfg = ProcessingConfig(output_dir=str(tmp_path / "out"),
                               target_rate=48000, quality="low", seed=6)
        mpath = str(tmp_path / "m.json")
        r1 = BatchProcessor(cfg).run([src], manifest_path=mpath)
        assert r1.completed == 1 and r1.skipped == 0 and not r1.aborted
        r2 = BatchProcessor(cfg).run([src], manifest_path=mpath)
        assert r2.completed == 1 and r2.skipped == 1   # no work done


class TestManifestTimerRace:
    def test_forced_save_cancels_pending_timer(self, tmp_path):
        """A deferred-flush timer left alive past the batch-end save() races
        the NEXT run's manifest on the same path (shared staging file: one
        os.replace removes it under the other -> FileNotFoundError; a stale
        fire can also overwrite the newer run's state).  save() must cancel
        it."""
        from f9tpu.pipeline.manifest import FileStatus, JobManifest

        p = str(tmp_path / "m.json")
        m = JobManifest.from_files(["a", "b"], p)
        m.update("a", FileStatus.PROCESSING)      # immediate save
        m.update("b", FileStatus.PROCESSING)      # throttled -> timer armed
        assert m._timer is not None
        t = m._timer
        m.save()                                  # batch-end forced save
        assert m._timer is None
        assert not t.is_alive() or t.finished.is_set()

    def test_two_manifests_same_path_interleave(self, tmp_path):
        """Hammer two instances on one manifest path (the resume / watch
        pattern): instance-unique staging names mean neither can remove the
        other's tmp file mid-save."""
        from f9tpu.pipeline.manifest import FileStatus, JobManifest

        p = str(tmp_path / "m.json")
        m1 = JobManifest.from_files(["a"], p)
        m2 = JobManifest.from_files(["a"], p)
        for _ in range(50):
            m1.update("a", FileStatus.PROCESSING)
            m2.update("a", FileStatus.COMPLETED)
            m1.save()
            m2.save()
        assert JobManifest.load(p).get("a").status == FileStatus.COMPLETED
