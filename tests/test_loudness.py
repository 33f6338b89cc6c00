"""BS.1770-4 integrated loudness: device implementation vs float64 reference
and against analytic sine expectations."""

import numpy as np
import pytest

import jax.numpy as jnp

from f9tpu.ops.loudness import (
    K_STAGE1_A,
    K_STAGE1_B,
    K_STAGE2_A,
    K_STAGE2_B,
    _ABS_GATE_LUFS,
    _OFFSET,
    _REL_GATE_LU,
    block_loudness,
    integrated_lufs,
    k_weighting_ir,
)

RATE = 48000


def _h_mag2(b, a, f):
    """|H(e^{jw})|^2 of a biquad at frequency f (float64, exact)."""
    w = 2 * np.pi * f / RATE
    z = np.exp(-1j * w)
    num = b[0] + b[1] * z + b[2] * z * z
    den = a[0] + a[1] * z + a[2] * z * z
    return abs(num / den) ** 2


def k_gain2(f):
    return (_h_mag2(K_STAGE1_B, K_STAGE1_A, f)
            * _h_mag2(K_STAGE2_B, K_STAGE2_A, f))


def ref_lufs(x: np.ndarray) -> float:
    """Independent float64 reference: same published coefficients, separate
    filtering (np.convolve), framing, and gating code path."""
    h = k_weighting_ir()
    xk = np.stack([np.convolve(c.astype(np.float64), h)[: x.shape[1]]
                   for c in x])
    hop, per_block = 4800, 4
    n_hops = x.shape[1] // hop
    hs = np.sum(xk[:, : n_hops * hop].reshape(x.shape[0], n_hops, hop) ** 2,
                axis=-1)
    nb = n_hops - per_block + 1
    if nb <= 0:
        return -200.0
    z = np.array([hs[:, j : j + per_block].sum() / (hop * per_block)
                  for j in range(nb)])
    lb = _OFFSET + 10 * np.log10(np.maximum(z, 1e-30))
    keep = lb > _ABS_GATE_LUFS
    if not keep.any():
        return -200.0
    rel = _OFFSET + 10 * np.log10(z[keep].mean()) + _REL_GATE_LU
    keep &= lb > rel
    if not keep.any():
        return -200.0
    return float(_OFFSET + 10 * np.log10(z[keep].mean()))


def test_k_filter_gain_near_1khz():
    """The -0.691 offset exists to cancel the K-filter gain near 1 kHz."""
    g_db = 10 * np.log10(k_gain2(997.0))
    assert abs(g_db - 0.691) < 0.06
    # IR truncation preserves the response: compare FFT of the IR
    h = k_weighting_ir()
    H = np.fft.rfft(h, 1 << 16)
    f997 = int(round(997.0 / RATE * (1 << 16)))
    assert abs(20 * np.log10(abs(H[f997])) - g_db / 2 * 2) < 0.01


def test_sine_loudness_analytic():
    """Stereo 997 Hz at -18 dBFS/channel: LUFS = -0.691
    + 10log10(2 * A^2/2 * g997)."""
    A = 10 ** (-18 / 20)
    t = np.arange(3 * RATE) / RATE
    s = (A * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    x = np.stack([s, s])
    got = float(integrated_lufs(jnp.asarray(x), RATE))
    expect = _OFFSET + 10 * np.log10(2 * (A * A / 2) * k_gain2(997.0))
    assert abs(got - expect) < 0.05, (got, expect)


def test_device_matches_float64_reference():
    rng = np.random.default_rng(8)
    x = (0.15 * rng.standard_normal((2, 4 * RATE))).astype(np.float32)
    # shape the signal so gating does something: fade sections
    x[:, : RATE] *= 0.001
    got = float(integrated_lufs(jnp.asarray(x), RATE))
    assert abs(got - ref_lufs(x)) < 0.02


def test_absolute_gate_ignores_silence():
    A = 10 ** (-20 / 20)
    t = np.arange(2 * RATE) / RATE
    tone = (A * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    x_tone = np.stack([tone, tone])
    x_padded = np.concatenate([x_tone, np.zeros((2, 8 * RATE), np.float32)],
                              axis=1)
    l_tone = float(integrated_lufs(jnp.asarray(x_tone), RATE))
    l_padded = float(integrated_lufs(jnp.asarray(x_padded), RATE))
    # blocks straddling the tone->silence edge legitimately count (~0.34 LU);
    # a BROKEN gate would average the 8 s of silence in:
    # 10*log10(2/10) = -7 LU
    assert abs(l_tone - l_padded) < 0.5
    ungated = l_tone + 10 * np.log10(2 / 10)
    assert l_padded > ungated + 5.0


def test_relative_gate_drops_quiet_sections():
    t = np.arange(3 * RATE) / RATE
    loud = (10 ** (-14 / 20) * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    quiet = (10 ** (-45 / 20) * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    x = np.stack([np.concatenate([loud, quiet])] * 2)
    got = float(integrated_lufs(jnp.asarray(x), RATE))
    l_loud = float(integrated_lufs(jnp.asarray(np.stack([loud] * 2)), RATE))
    # quiet section is ~31 LU below: excluded by the relative gate
    assert abs(got - l_loud) < 0.3


def test_non_48k_input_resampled():
    A = 10 ** (-18 / 20)
    r2 = 44100
    t = np.arange(3 * r2) / r2
    s = (A * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    got = float(integrated_lufs(jnp.asarray(np.stack([s, s])), r2))
    expect = _OFFSET + 10 * np.log10(2 * (A * A / 2) * k_gain2(997.0))
    assert abs(got - expect) < 0.05


def test_short_or_silent_input_floor():
    assert float(integrated_lufs(jnp.zeros((2, 1000), jnp.float32), RATE)) \
        <= -199.0
    assert float(integrated_lufs(jnp.zeros((2, 5 * RATE), jnp.float32), RATE)) \
        <= -199.0


def test_cli_probe_loudness(tmp_path):
    from f9tpu.cli import main
    from f9tpu.io import write_wav

    A = 10 ** (-20 / 20)
    t = np.arange(RATE) / RATE
    s = (A * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, np.stack([s, s]), RATE, bits=24)
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["probe", p, "--loudness"])
    assert rc == 0
    out = buf.getvalue()
    assert "LUFS" in out
    lufs = float(out.split("LUFS")[0].rsplit()[-1])
    assert -22.0 < lufs < -18.0


def test_true_peak_exposes_intersample_overs():
    """A 11.025 kHz sine at fs/4 with peak samples straddling the crest:
    sample peak underestimates; the 4x-oversampled true peak finds ~A."""
    A = 0.5
    rate = 44100
    n = np.arange(2 * rate)
    # quarter-rate sine with 45-degree phase: samples land at +-A/sqrt(2)
    s = (A * np.sin(2 * np.pi * n / 4 + np.pi / 4)).astype(np.float32)
    x = s[None]
    from f9tpu.ops.loudness import true_peak_db

    sample_peak_db = 20 * np.log10(np.abs(s).max())
    tp = float(true_peak_db(jnp.asarray(x), rate))
    assert abs(sample_peak_db - 20 * np.log10(A / np.sqrt(2))) < 0.1
    assert abs(tp - 20 * np.log10(A)) < 0.2       # ~3 dB above sample peak
    assert tp > sample_peak_db + 2.5


def test_loudness_range_quiet_vs_loud_sections():
    from f9tpu.ops.loudness import loudness_range

    t = np.arange(10 * RATE) / RATE
    loud = 10 ** (-14 / 20) * np.sin(2 * np.pi * 997 * t[: 5 * RATE])
    soft = 10 ** (-26 / 20) * np.sin(2 * np.pi * 997 * t[: 5 * RATE])
    x = np.stack([np.concatenate([loud, soft])] * 2).astype(np.float32)
    lra = float(loudness_range(jnp.asarray(x), RATE))
    # two plateaus 12 LU apart -> LRA ~ 12 (minus window straddling)
    assert 8.0 < lra < 13.0, lra
    # steady signal -> near-zero range
    x2 = np.stack([np.concatenate([loud, loud])] * 2).astype(np.float32)
    assert float(loudness_range(jnp.asarray(x2), RATE)) < 0.5


def test_loudness_normalization_end_to_end(tmp_path):
    """--normalize-lufs: files at very different levels land on the target
    integrated loudness; silence passes through ungained."""
    import jax.numpy as jnp

    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.ops.loudness import integrated_lufs
    from f9tpu.pipeline import BatchProcessor

    rate = 48000
    t = np.arange(3 * rate) / rate
    (tmp_path / "in").mkdir()
    levels = {"loud": -10.0, "soft": -34.0}
    for name, db in levels.items():
        a = 10 ** (db / 20)
        s = (a * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
        write_wav(str(tmp_path / "in" / f"{name}.wav"),
                  np.stack([s, s]), rate, bits=24)
    write_wav(str(tmp_path / "in" / "silence.wav"),
              np.zeros((2, 2 * rate), np.float32), rate, bits=24)

    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=44100,
                           quality="low", seed=1, normalize_lufs=-20.0)
    res = BatchProcessor(cfg).run([
        str(tmp_path / "in" / "loud.wav"),
        str(tmp_path / "in" / "soft.wav"),
        str(tmp_path / "in" / "silence.wav"),
    ])
    assert res.completed == 3 and res.failed == 0
    for name in levels:
        y, r = read_wav(str(tmp_path / "out" / f"{name}_processed.wav"))
        got = float(integrated_lufs(jnp.asarray(y.astype(np.float32)), r))
        assert abs(got - (-20.0)) < 0.5, (name, got)
    # the measurement + applied gain surface in the per-file metrics
    loud_m = res.per_file[str(tmp_path / "in" / "loud.wav")]
    assert abs(loud_m["source_lufs"] - (-10.0)) < 0.3
    assert abs(loud_m["applied_gain_db"] - (-10.0)) < 0.3
    ys, _ = read_wav(str(tmp_path / "out" / "silence_processed.wav"))
    assert np.abs(ys).max() <= 2 / (1 << 23)     # dither-level only


def test_true_peak_ceiling_caps_normalization(tmp_path):
    """--normalize-tp: a quiet-but-peaky file whose LUFS gain would push the
    true peak over the ceiling gets its gain capped (ceiling wins)."""
    import jax.numpy as jnp

    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.ops.loudness import integrated_lufs, true_peak_db
    from f9tpu.pipeline import BatchProcessor

    rate = 48000
    t = np.arange(3 * rate) / rate
    # mostly quiet tone with a short loud transient: low LUFS, high peak
    s = (10 ** (-30 / 20) * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    s[rate : rate + 200] = 0.5
    src = str(tmp_path / "peaky.wav")
    write_wav(src, np.stack([s, s]), rate, bits=24)

    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=44100,
                           quality="low", seed=1, normalize_lufs=-14.0,
                           normalize_tp_db=-1.0)
    assert BatchProcessor(cfg).run([src]).completed == 1
    y, r = read_wav(str(tmp_path / "out" / "peaky_processed.wav"))
    yf = jnp.asarray(y.astype(np.float32))
    tp = float(true_peak_db(yf, r))
    lufs = float(integrated_lufs(yf, r))
    assert tp <= -0.8, tp                       # ceiling respected (+0.2 tol)
    assert lufs < -15.0                         # under target: ceiling won

    with pytest.raises(ValueError, match="normalize_tp_db requires"):
        ProcessingConfig(output_dir="x", normalize_tp_db=-1.0).validate()


def test_stream_normalization_parity_with_batch(tmp_path):
    """Round-3 lifted exclusion (VERDICT r2 #3): streaming loudness
    normalization = a chunk-exact metering pre-pass + the normal write.  The
    measured LUFS/TP and the applied gain are BIT-identical to the batch
    scheduler's (both call `meter_source_streamed` + `normalization_gain_db`
    on the same chunk grid), so the two paths differ only by the documented
    SRC-rounding level (rows einsum vs presliced conv — same bound as
    `test_stream_dither_chunk_invariant_and_matches_batch`)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.io import read_wav, write_wav
    from f9tpu.ops.loudness import (array_reader, meter_source_streamed,
                                    normalization_gain_db)
    from f9tpu.pipeline import stream_resample_file
    from f9tpu.pipeline.scheduler import BatchProcessor

    rate = 44100
    rng = np.random.default_rng(3)
    t = np.arange(int(6.5 * rate)) / rate
    s = (0.05 * np.sin(2 * np.pi * 330 * t)
         + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    src = str(tmp_path / "q.wav")
    write_wav(src, np.stack([s, 0.7 * s]), rate, bits=24)

    # remove_dc=False: DC ordering is the one documented stream/batch
    # divergence (stream.py docstring); everything else must match
    cfg = ProcessingConfig(output_dir=str(tmp_path / "out"), target_rate=48000,
                           quality="low", seed=11, normalize_lufs=-18.0,
                           normalize_tp_db=-1.0, remove_dc=False)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1
    sp = str(tmp_path / "streamed.wav")
    stream_resample_file(src, sp, cfg, chunk_seconds=1.5)

    # the gain both paths applied is the identical float (shared meter)
    x, _ = read_wav(src)
    m = meter_source_streamed(array_reader(x), 2, x.shape[1], rate,
                              want_tp=True)
    gain_db, _ = normalization_gain_db(-18.0, m["lufs"], 0.0, -1.0,
                                       m["true_peak_db"])
    batch_metrics = res.per_file[src]
    assert batch_metrics["applied_gain_db"] == round(gain_db, 2)
    assert batch_metrics["source_lufs"] == round(m["lufs"], 2)

    yb, rb = read_wav(str(tmp_path / "out" / "q_processed.wav"))
    ys, rs = read_wav(sp)
    assert rb == rs == 48000
    assert yb.shape == ys.shape
    # identical gain + identical dither keying: differences stay at the SRC
    # rounding level, never the broad divergence a gain mismatch would cause
    diff = np.round(yb * (1 << 23)) - np.round(ys * (1 << 23))
    assert np.abs(diff).max() <= 16
    assert (diff != 0).mean() < 0.35
    # and the streamed file actually hits the target loudness
    from f9tpu.ops.loudness import integrated_lufs

    assert abs(float(integrated_lufs(jnp.asarray(ys), 48000)) - (-18.0)) < 0.5


def test_normalization_note_keeps_clamp_when_capped():
    """When both the +-40 dB clamp and the dBTP ceiling engage, the note
    must report BOTH (the cap used to overwrite the clamp diagnostic)."""
    from f9tpu.ops.loudness import normalization_gain_db

    # want = -10 - (-60) = 50 -> clamped to +40; then TP cap pulls it down
    gain_db, note = normalization_gain_db(-10.0, -60.0, 0.0, -1.0, -20.0)
    assert "clamped" in note and "capped" in note
    assert gain_db == pytest.approx(40.0 - ((-20.0 + 40.0) - (-1.0)))


def test_surround_weights_spec_behavior():
    """BS.1770-4 5.1 weights: LFE excluded, surrounds +1.5 dB."""
    from f9tpu.ops.loudness import integrated_lufs, surround_weights

    rng = np.random.default_rng(5)
    sig = (0.2 * rng.standard_normal(48000 * 2)).astype(np.float32)
    w = surround_weights(6)
    assert w == (1.0, 1.0, 1.0, 0.0, 1.41, 1.41)
    # LFE-only content: a conforming meter reads silence
    x = np.zeros((6, sig.shape[0]), np.float32)
    x[3] = sig
    lufs_w = float(integrated_lufs(jnp.asarray(x), 48000, weights=w))
    lufs_u = float(integrated_lufs(jnp.asarray(x), 48000))
    assert lufs_w <= -199.0 and lufs_u > -30.0
    # surrounds-only content reads ~+1.5 dB over unweighted
    x2 = np.zeros((6, sig.shape[0]), np.float32)
    x2[4] = sig
    x2[5] = sig
    d = (float(integrated_lufs(jnp.asarray(x2), 48000, weights=w))
         - float(integrated_lufs(jnp.asarray(x2), 48000)))
    # G weights scale mean-square POWER: +1.5 dB = 10 log10(1.41)
    assert abs(d - 10 * np.log10(1.41)) < 0.05
    assert surround_weights(2) is None and surround_weights(5) is None


def test_meter_streamed_tp_single_pass_counts_reads(tmp_path):
    """want_tp shares the loudness pass's host reads (the pre-pass is
    link-bound; a second full pass doubled its wall time) and matches the
    reference true_peak_db value."""
    from f9tpu.ops.loudness import (array_reader, meter_source_streamed,
                                    true_peak_db)

    rng = np.random.default_rng(6)
    x = (0.5 * rng.standard_normal((2, 44100 * 3))).astype(np.float32)
    reads = {"n": 0, "spans": []}
    base = array_reader(x)

    def counting(start, count):
        reads["n"] += 1
        return base(start, count)

    m = meter_source_streamed(counting, 2, x.shape[1], 44100, want_tp=True)
    # one read per chunk (loudness+TP fused), plus nothing else
    assert reads["n"] <= 2 + x.shape[1] // (44100 * 20) + 1
    ref_tp = float(true_peak_db(jnp.asarray(x), 44100))
    assert abs(m["true_peak_db"] - ref_tp) < 1e-3
    assert m["lufs"] > -30.0


def test_true_peak_nan_propagates_in_chunked_scan():
    from f9tpu.ops.loudness import _true_peak_chunked, array_reader

    x = np.zeros((1, 3 << 21), np.float32)
    x[0, 1 << 21] = np.nan
    got = _true_peak_chunked(array_reader(x), 1, x.shape[1], 48000,
                             chunk_seconds=10.0)
    assert np.isnan(got)
