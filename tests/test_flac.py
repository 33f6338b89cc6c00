"""FLAC codec tests: encoder round-trips, decoder-only spec features via
hand-built streams, corruption detection, the incremental reader, and the
pipeline surface (batch + stream byte parity with WAV sources).

The reference registers JUCE's basic formats — WAV, AIFF, FLAC, Ogg
(Source/MainComponent.cpp:13, Source/AppState.h:153) — so FLAC sources are
part of its drop-zone surface; these tests pin f9tpu's match of it."""

import os

import numpy as np
import pytest

from f9tpu.io import codec
from f9tpu.io import flac
from f9tpu.io.flac import (
    FlacReader,
    FlacWriter,
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _read_utf8_num,
    probe_flac,
    read_flac,
    read_flac_codes,
    write_flac,
    write_flac_codes,
)
from f9tpu.io.wav import read_wav, write_wav


@pytest.fixture(params=["native", "python"])
def decode_path(request, monkeypatch):
    """Run decoder tests against BOTH the native C++ frame decoder and the
    pure-Python spec oracle (they must agree bit-for-bit)."""
    if request.param == "python":
        from f9tpu import native

        monkeypatch.setattr(native, "flac_available", lambda: False)
    else:
        from f9tpu import native

        if not native.available():
            pytest.skip(f"native unavailable: {native.build_error()}")
    return request.param


def tonal(ch, n, bits, seed=0):
    rng = np.random.default_rng(seed)
    lim = 1 << (bits - 1)
    t = np.arange(n)
    base = np.stack([
        0.6 * lim * np.sin(2 * np.pi * (110 + 70 * c) * t / 44100)
        for c in range(ch)])
    return (base + rng.normal(0, max(1.0, lim * 1e-4), (ch, n))).astype(np.int64)


# --------------------------------------------------------------------------
# encoder round-trips
# --------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
def test_roundtrip_bit_depths(tmp_path, bits, decode_path):
    codes = tonal(2, 9991, bits, seed=bits)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 48000, bits=bits)
    dec, si = read_flac_codes(p)
    assert si.bits == bits and si.sample_rate == 48000
    assert np.array_equal(dec, codes)


@pytest.mark.parametrize("ch", [1, 2, 3, 6, 8])
def test_roundtrip_channel_counts(tmp_path, ch, decode_path):
    codes = tonal(ch, 5000, 24, seed=ch)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 96000, bits=24)
    dec, _ = read_flac_codes(p)
    assert np.array_equal(dec, codes)


def test_roundtrip_fuzz(tmp_path, decode_path):
    """Random shapes x signal classes: silence, constant, full-scale noise
    (escape partitions), tonal (rice), shifted low-res (wasted bits)."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        bits = int(rng.choice([8, 16, 24, 32]))
        ch = int(rng.choice([1, 2, 4]))
        n = int(rng.choice([1, 3, 192, 4095, 4096, 4097, 9000]))
        lim = 1 << (bits - 1)
        kind = int(rng.integers(0, 5))
        if kind == 0:
            codes = np.zeros((ch, n), np.int64)
        elif kind == 1:
            codes = np.full((ch, n), -(lim // 3), np.int64)
        elif kind == 2:
            codes = rng.integers(-lim, lim, (ch, n)).astype(np.int64)
        elif kind == 3:
            codes = tonal(ch, n, bits, seed=trial)
        else:
            t = np.arange(n)
            codes = np.stack([
                ((lim >> 9) * np.sin(2 * np.pi * (100 + 37 * c) * t / 44100)
                 ).astype(np.int64) << 6 for c in range(ch)])
        rate = int(rng.choice([44100, 48000, 12345]))
        p = str(tmp_path / f"f{trial}.flac")
        write_flac_codes(p, codes, rate, bits=bits)
        dec, si = read_flac_codes(p)
        assert si.sample_rate == rate
        assert np.array_equal(dec, codes), (trial, bits, ch, n, kind)


def test_native_encoder_bit_parity():
    """The C++ encoder must produce BIT-IDENTICAL frames to the Python
    oracle for every signal class (the deterministic integer searches —
    rice k, partition order, stereo assignment, fixed order, escapes,
    wasted bits — are mirrored exactly)."""
    from f9tpu import native

    if not native.available():
        pytest.skip(f"native unavailable: {native.build_error()}")
    rng = np.random.default_rng(31)
    for trial in range(25):
        bits = int(rng.choice([8, 12, 16, 20, 24, 32]))
        ch = int(rng.choice([1, 2, 2, 2, 6]))
        n = int(rng.choice([1, 2, 192, 1000, 4096, 4097]))
        lim = 1 << (bits - 1)
        kind = int(rng.integers(0, 8))
        if kind == 0:
            codes = np.zeros((ch, n), np.int64)
        elif kind == 1:
            codes = np.full((ch, n), -(lim // 7), np.int64)
        elif kind == 2:
            codes = rng.integers(-lim, lim, (ch, n)).astype(np.int64)
        elif kind == 3:
            codes = tonal(ch, n, bits, seed=trial)
        elif kind == 4:
            t = np.arange(n)
            codes = np.stack([
                ((lim >> 9) * np.sin(2 * np.pi * (99 + 31 * c) * t / 44100)
                 ).astype(np.int64) << 5 for c in range(ch)])
        elif kind == 5:  # near-identical channels: mid/side & left/side
            t = np.arange(n)
            base = (0.6 * lim * np.sin(2 * np.pi * 123 * t / 44100)
                    ).astype(np.int64)
            codes = np.stack([base + rng.integers(-3, 4, n)
                              for _ in range(ch)])
        elif kind == 6:  # many partials: favors the order-12/16 sweep
            t = np.arange(n)
            codes = np.zeros((ch, n), np.float64)
            for c in range(ch):
                for h in range(1, 9):
                    codes[c] += np.sin(2 * np.pi * (150 * h + 7 * c)
                                       * t / 44100) / h
            codes = (0.12 * lim * codes).astype(np.int64)
        else:  # AR(12) process: high-order prediction + biweight window
            e = rng.standard_normal((ch, n + 64))
            a = 0.96 * np.array([1.6, -0.8, 0.3, -0.1])
            y = e.copy()
            for i in range(4, n + 64):
                y[:, i] = e[:, i] + a @ y[:, i - 4:i][:, ::-1].T
            codes = np.clip((lim >> 6) * y[:, 64:], -lim,
                            lim - 1).astype(np.int64)
        si = flac.StreamInfo(4096, 4096, 0, 0, 44100, ch, bits, n,
                             b"\x00" * 16, 0)
        py = flac._encode_frame(codes, trial, si, 4096)
        nat = native.flac_encode_frame(codes, bits, trial, 4096, 44100)
        assert py == nat, (trial, bits, ch, n, kind)


def test_signed_bits_minimal_negative_widths():
    """An all ``-2**k`` partition needs exactly k+1 bits (the advisor's
    round-4 finding: the old form returned k+2, flipping the rice-vs-escape
    decision away from the native encoder's)."""
    for k in range(0, 31):
        arr = np.full(17, -(1 << k), np.int64)
        assert flac._signed_bits(arr) == k + 1, k
    assert flac._signed_bits(np.zeros(5, np.int64)) == 1
    assert flac._signed_bits(np.array([], np.int64)) == 1
    assert flac._signed_bits(np.array([3, -4], np.int64)) == 3
    assert flac._signed_bits(np.array([4, -4], np.int64)) == 4


def test_native_encoder_parity_all_negative_pow2_partitions():
    """Signals engineered so residual partitions are runs of exactly -2^k
    (constant-slope ramps under fixed prediction): the width computation's
    rice-vs-escape flip must agree between Python and native bit-for-bit."""
    from f9tpu import native

    if not native.available():
        pytest.skip(f"native unavailable: {native.build_error()}")
    rng = np.random.default_rng(97)
    n = 4096
    t = np.arange(n, dtype=np.int64)
    cases = []
    # pure ramps: order-1 residuals are a constant -2^k everywhere
    for k in (0, 1, 4, 7):
        cases.append((-(1 << k) * t)[None, :] % (1 << 23) - (1 << 22))
    # random walk with aligned constant-slope runs of -1 (advisor's class):
    # partitions covering the run see all-(-1) order-1 residuals
    for trial in range(8):
        steps = rng.integers(-2, 3, n).astype(np.int64)
        a, b = 512 * rng.integers(0, 4), 512 * rng.integers(4, 8)
        steps[a:b] = -1
        walk = np.cumsum(steps)
        ch = int(rng.choice([1, 2]))
        cases.append(np.stack([walk + 7 * c for c in range(ch)]))
    for i, codes in enumerate(cases):
        codes = np.clip(codes, -(1 << 22), (1 << 22) - 1)
        py = flac._encode_frame(codes, i, flac.StreamInfo(
            4096, 4096, 0, 0, 48000, codes.shape[0], 24, n,
            b"\x00" * 16, 0), 4096)
        nat = native.flac_encode_frame(codes, 24, i, 4096, 48000)
        assert py == nat, i


def test_mt_encode_thread_count_invariant():
    """The multithreaded frame encoder is byte-identical to the
    sequential one at ANY thread count (frames are independent under
    fixed predictors) — including a final partial frame."""
    from f9tpu import native

    if not native.available():
        pytest.skip(f"native unavailable: {native.build_error()}")
    codes = tonal(2, 4096 * 5 + 777, 24, seed=12)
    ref = None
    for nt in (1, 2, 4, 7):
        data, lens = native.flac_encode_frames_mt(
            codes, 24, 3, 4096, 48000, n_threads=nt)
        assert len(lens) == 6 and sum(lens) == len(data)
        if ref is None:
            ref = data
        else:
            assert data == ref, nt
    # and equal to single-frame sequential encodes
    seq = b"".join(
        native.flac_encode_frame(codes[:, i * 4096:(i + 1) * 4096], 24,
                                 3 + i, 4096, 48000) for i in range(6))
    assert seq == ref


def test_actually_compresses(tmp_path):
    codes = tonal(2, 44100, 16, seed=1)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    assert os.path.getsize(p) < 0.75 * codes.size * 2


def test_write_flac_float_quantize(tmp_path):
    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(4000) / 44100)
         ).astype(np.float32)[None, :]
    p = str(tmp_path / "t.flac")
    write_flac(p, x, 44100, bits=16)
    y, rate = read_flac(p)
    assert rate == 44100
    assert np.abs(y - x).max() <= 2 ** -15


def test_probe_fields(tmp_path):
    codes = tonal(3, 777, 24)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 88200, bits=24)
    info = probe_flac(p)
    assert (info.sample_rate, info.num_channels, info.num_frames,
            info.bit_depth, info.is_float, info.container) == \
        (88200, 3, 777, 24, False, "flac")


def test_incremental_writer_matches_one_shot(tmp_path):
    """FlacWriter fed in odd-sized pieces produces a stream that decodes
    identically to the one-shot write (frame boundaries are the writer's
    own; appends must not leak into emitted frames)."""
    codes = tonal(2, 10240, 16, seed=3)
    a, b = str(tmp_path / "a.flac"), str(tmp_path / "b.flac")
    write_flac_codes(a, codes, 48000, bits=16)
    with FlacWriter(b, 2, 48000, bits=16) as w:
        pos = 0
        for step in (1, 999, 4096, 123, 5021):
            w.append_codes(codes[:, pos:pos + step])
            pos += step
        w.append_codes(codes[:, pos:])
    assert open(a, "rb").read() == open(b, "rb").read()


# --------------------------------------------------------------------------
# decoder-only spec features (hand-built streams)
# --------------------------------------------------------------------------

def _container(frames: bytes, rate=44100, ch=1, bits=16, total=0) -> bytes:
    si = flac.StreamInfo(4096, 4096, 0, 0, rate, ch, bits, total,
                         b"\x00" * 16, 0)
    return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + flac._pack_streaminfo_simple(si) + frames)


def _frame_header(bw, blocksize, rate_code, ch_code, ss_code, number=0,
                  variable=False, bs_extra=None, sr_extra=None):
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(1 if variable else 0, 1)
    bw.write(blocksize, 4)
    bw.write(rate_code, 4)
    bw.write(ch_code, 4)
    bw.write(ss_code, 3)
    bw.write(0, 1)
    for byte in _utf8_coded(number):
        bw.write(byte, 8)
    if bs_extra is not None:
        nbits, val = bs_extra
        bw.write(val, nbits)
    if sr_extra is not None:
        nbits, val = sr_extra
        bw.write(val, nbits)
    bw.write(_crc8(bytes(bw.buf)), 8)


def _finish_frame(bw) -> bytes:
    bw.align()
    body = bytes(bw.buf)
    bw.write(_crc16(body), 16)
    return bw.getvalue()


def test_decode_lpc_subframe(tmp_path, decode_path):
    """Hand-built LPC subframe: the decoder must reproduce the recurrence
    s[i] = (sum c[j]*s[i-1-j] >> shift) + res[i] exactly (RFC 9639 sec.
    9.2.5).  The expectation is computed independently here."""
    n, order, shift = 64, 3, 4
    coefs = [19, -11, 5]
    warm = [100, -200, 300]
    res = list(range(-30, 31))                # n - order = 61 values
    assert len(res) == n - order
    # independent model
    exp = list(warm)
    for i in range(order, n):
        acc = sum(coefs[j] * exp[i - 1 - j] for j in range(order))
        exp.append((acc >> shift) + res[i - order])

    bw = _BitWriter()
    _frame_header(bw, 6, 9, 0, 4, number=0, bs_extra=(8, n - 1))
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)             # LPC, order 3
    bw.write(0, 1)                            # no wasted bits
    for v in warm:
        bw.write_signed(v, 16)
    prec = 6
    bw.write(prec - 1, 4)
    bw.write_signed(shift, 5)
    for c in coefs:
        bw.write_signed(c, prec)
    # residual: method 0, partition order 0, rice k=6
    bw.write(0, 2)
    bw.write(0, 4)
    k = 6
    bw.write(k, 4)
    for v in res:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q = u >> k
        bw.write(1, q + 1)
        bw.write(u & ((1 << k) - 1), k)
    p = str(tmp_path / "lpc.flac")
    with open(p, "wb") as f:
        f.write(_container(_finish_frame(bw), ch=1, bits=16, total=n))
    dec, _ = read_flac_codes(p, verify_md5=False)
    assert dec.shape == (1, n)
    assert dec[0].tolist() == exp


def test_hostile_lpc_rejected_identically(tmp_path, decode_path):
    """A CRC-valid stream whose LPC params drive the reconstruction past
    the 2^40 bound (valid samples fit 33 bits) must be REJECTED by both
    decoders — CRC-16 covers the crafted bytes, so only the range check
    stands between the caller and wrapped-garbage samples (round-4
    advisor finding: the native path used to wrap silently)."""
    n, order, shift = 16, 1, 0
    bw = _BitWriter()
    _frame_header(bw, 6, 9, 0, 7, number=0, bs_extra=(8, n - 1))
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)             # LPC, order 1
    bw.write(0, 1)                            # no wasted bits
    bw.write_signed(2**31 - 1, 32)            # warmup at full 32-bit scale
    prec = 15
    bw.write(prec - 1, 4)
    bw.write_signed(shift, 5)
    bw.write_signed(2**14 - 1, prec)          # x[i] ~= 16383 * x[i-1]
    bw.write(0, 2)                            # residual method 0
    bw.write(0, 4)                            # partition order 0
    bw.write(0, 4)                            # rice k = 0
    for _ in range(n - order):
        bw.write(1, 1)                        # all-zero residuals
    p = str(tmp_path / "hostile.flac")
    with open(p, "wb") as f:
        f.write(_container(_finish_frame(bw), ch=1, bits=32, total=n))
    with pytest.raises(ValueError):
        read_flac_codes(p, verify_md5=False)


def test_truncated_seektable_raises_valueerror(tmp_path):
    """A SEEKTABLE whose body is cut short must raise the module's
    documented ValueError contract, not struct.error (advisor finding)."""
    si = flac.StreamInfo(4096, 4096, 0, 0, 44100, 1, 16, 0, b"\x00" * 16, 0)
    blob = (b"fLaC" + bytes([flac._BLOCK_STREAMINFO])
            + (34).to_bytes(3, "big") + flac._pack_streaminfo_simple(si)
            + bytes([0x83]) + (36).to_bytes(3, "big")   # SEEKTABLE, 2 points
            + b"\x00" * 10)                             # ...but only 10 bytes
    p = str(tmp_path / "trunc.flac")
    with open(p, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError, match="truncated"):
        probe_flac(p)


def test_flac_writer_block_range_validated(tmp_path):
    """Blocks outside [16, 65535] would corrupt the 16-bit frame-header
    field / violate the STREAMINFO minimum — rejected up front."""
    for bad in (0, 8, 15, 65536, 1 << 20):
        with pytest.raises(ValueError, match="block"):
            FlacWriter(str(tmp_path / "b.flac"), 1, 48000, block=bad)
    w = FlacWriter(str(tmp_path / "ok.flac"), 1, 48000, block=16)
    w.append_codes(np.zeros((1, 40), np.int64))
    w.close()
    dec, _ = read_flac_codes(str(tmp_path / "ok.flac"))
    assert dec.shape == (1, 40)


def test_decode_verbatim_and_constant(tmp_path, decode_path):
    n = 16
    vals = list(range(-8, 8))
    bw = _BitWriter()
    _frame_header(bw, 6, 9, 1, 4, number=0, bs_extra=(8, n - 1))  # 2ch indep
    bw.write(0, 1)
    bw.write(1, 6)                            # VERBATIM
    bw.write(0, 1)
    for v in vals:
        bw.write_signed(v, 16)
    bw.write(0, 1)
    bw.write(0, 6)                            # CONSTANT
    bw.write(0, 1)
    bw.write_signed(-12345, 16)
    p = str(tmp_path / "vc.flac")
    with open(p, "wb") as f:
        f.write(_container(_finish_frame(bw), ch=2, bits=16, total=n))
    dec, _ = read_flac_codes(p, verify_md5=False)
    assert dec[0].tolist() == vals
    assert (dec[1] == -12345).all()


def test_decode_variable_blocking_and_rate_codes(tmp_path, decode_path):
    """Variable blocking strategy (sample-number coded headers) plus the
    three get-N-bit sample-rate codes (12/13/14)."""
    for sr_code, sr_extra, want_rate in [
        (12, (8, 33), 33000),      # 8-bit kHz
        (13, (16, 44056), 44056),  # 16-bit Hz
        (14, (16, 4410), 44100),   # 16-bit Hz/10
    ]:
        n = 8
        bw = _BitWriter()
        _frame_header(bw, 6, sr_code, 0, 4, number=0, variable=True,
                      bs_extra=(8, n - 1), sr_extra=sr_extra)
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write_signed(99, 16)
        p = str(tmp_path / f"r{sr_code}.flac")
        with open(p, "wb") as f:
            f.write(_container(_finish_frame(bw), rate=want_rate, ch=1,
                               bits=16, total=n))
        dec, si = read_flac_codes(p, verify_md5=False)
        assert (dec == 99).all()
        # the frame-level rate must parse; STREAMINFO carries it too
        assert si.sample_rate == want_rate


def test_decode_wasted_bits(tmp_path, decode_path):
    """A constant subframe with 3 wasted bits: stored at 13 bits, output
    left-shifted by 3 (RFC 9639 sec. 9.2.2)."""
    n = 8
    bw = _BitWriter()
    _frame_header(bw, 6, 9, 0, 4, number=0, bs_extra=(8, n - 1))
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(1, 1)          # wasted-bits flag
    bw.write(1, 3)          # unary 2 -> wasted = 3
    bw.write_signed(-500, 13)
    p = str(tmp_path / "w.flac")
    with open(p, "wb") as f:
        f.write(_container(_finish_frame(bw), ch=1, bits=16, total=n))
    dec, _ = read_flac_codes(p, verify_md5=False)
    assert (dec == -500 << 3).all()


def test_utf8_coded_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              (1 << 31) - 1, (1 << 36) - 1]:
        enc = _utf8_coded(n)
        br = _BitReader(enc)
        assert _read_utf8_num(br) == n, n
    with pytest.raises(ValueError):
        _utf8_coded(1 << 36)


def test_id3_tag_skipped(tmp_path):
    codes = tonal(1, 500, 16)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    raw = open(p, "rb").read()
    tagged = str(tmp_path / "tagged.flac")
    body = b"\x00" * 40
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, len(body) >> 7, len(body) & 0x7F])
    with open(tagged, "wb") as f:
        f.write(id3 + body + raw)
    dec, _ = read_flac_codes(tagged)
    assert np.array_equal(dec, codes)


# --------------------------------------------------------------------------
# corruption / robustness
# --------------------------------------------------------------------------

def test_corrupt_frame_detected(tmp_path, decode_path):
    codes = tonal(2, 8000, 16)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0x40           # flip a bit mid-frame
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        read_flac_codes(p)


def test_corruption_fuzz_never_crashes(tmp_path, decode_path):
    """Random byte tampering anywhere in the stream must produce a clean
    ValueError (CRC / sync / truncation / MD5), never a crash, hang, or
    silent wrong output — on BOTH the native and Python decoders.  Also
    covers the crafted blocksize-65536 header that would overflow a naive
    scratch buffer."""
    codes = tonal(2, 12000, 16, seed=13)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    raw = open(p, "rb").read()
    rng = np.random.default_rng(99)
    hits = 0
    for _ in range(60):
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(42, len(buf)))] ^= int(rng.integers(1, 256))
        open(p, "wb").write(bytes(buf))
        try:
            dec, _ = read_flac_codes(p)
            assert np.array_equal(dec, codes)  # flips may hit padding only
        except ValueError:
            hits += 1
    assert hits > 40            # almost every tamper is detected loudly


def test_oversized_blocksize_header_rejected(tmp_path, decode_path):
    """bs_code 7 with value 0xFFFF claims blocksize 65536 (> the 65535
    spec max) — must be a clean error on both decoders."""
    bw = _BitWriter()
    _frame_header(bw, 7, 9, 0, 4, number=0, bs_extra=(16, 65535))
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write_signed(1, 16)
    p = str(tmp_path / "big.flac")
    with open(p, "wb") as f:
        f.write(_container(_finish_frame(bw), ch=1, bits=16, total=65536))
    with pytest.raises(ValueError):
        read_flac_codes(p, verify_md5=False)


def test_truncated_stream_detected(tmp_path, decode_path):
    codes = tonal(1, 9000, 16)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - len(raw) // 3])
    with pytest.raises(ValueError, match="truncated|CRC|sync"):
        read_flac_codes(p)


def test_unknown_length_rejected(tmp_path):
    p = str(tmp_path / "t.flac")
    with open(p, "wb") as f:
        f.write(_container(b"", total=0))
    with pytest.raises(ValueError, match="unknown length"):
        probe_flac(p)


def test_not_flac_rejected(tmp_path):
    p = str(tmp_path / "t.flac")
    open(p, "wb").write(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="not a FLAC"):
        probe_flac(p)


# --------------------------------------------------------------------------
# incremental reader
# --------------------------------------------------------------------------

def test_reader_chunk_invariance(tmp_path, decode_path):
    codes = tonal(2, 20000, 24, seed=9)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 48000, bits=24)
    whole, _ = read_flac(p)
    for step in (1, 100, 4096, 4097, 19999):
        with FlacReader(p) as r:
            parts = [r.read(i, step) for i in range(0, 20000, step)]
        assert np.array_equal(np.concatenate(parts, axis=1), whole), step


def test_reader_subblock_reads_decode_each_frame_once(tmp_path, decode_path):
    """Monotonic reads smaller than a FLAC block must be served from the
    last-decoded-block cache: without it every read re-decoded the same
    frame (the cursor had advanced past it, which read as a backward seek)
    — O(frames * blocksize) work for an O(frames) scan."""
    codes = tonal(2, 3 * 4096, 24, seed=11)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 48000, bits=24)
    with FlacReader(p) as r:
        calls = []
        orig = r._decode_block

        def counting(want):
            out = orig(want)
            calls.append(out[0].shape[1])
            return out

        r._decode_block = counting
        parts = [r.read_codes(i, 100) for i in range(0, 3 * 4096, 100)]
        assert np.array_equal(np.concatenate(parts, axis=1), codes)
        # every input frame decoded exactly once (native may batch frames)
        assert sum(calls) == 3 * 4096, calls
        assert len(calls) <= 3, calls


def test_reader_backward_seek_and_eof(tmp_path, decode_path):
    codes = tonal(1, 15000, 16, seed=4)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    whole, _ = read_flac(p)
    with FlacReader(p) as r:
        assert r.num_frames == 15000 and r.sample_rate == 44100
        tail = r.read(14000, 5000)          # clipped at EOF
        assert np.array_equal(tail, whole[:, 14000:])
        back = r.read(37, 100)              # backward seek after EOF read
        assert np.array_equal(back, whole[:, 37:137])
        assert r.read(15000, 10).shape == (1, 0)
        assert r.read(-5, 3).shape == (1, 3)


# --------------------------------------------------------------------------
# dispatch + pipeline surface
# --------------------------------------------------------------------------

def test_codec_dispatch(tmp_path):
    codes = tonal(2, 1000, 16)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    assert codec.is_supported(p)
    info = codec.probe(p)
    assert info.container == "flac"
    x, rate = codec.read_audio(p)
    assert rate == 44100 and x.shape == (2, 1000)
    with codec.open_reader(p) as r:
        assert np.array_equal(r.read(0, 1000), x)
    # raw wire: FLAC re-packs its decoded codes to the WAV payload layout
    payload, rinfo = codec.read_raw_pcm(p)
    assert rinfo.container == "flac" and rinfo.num_frames == 1000
    want = np.ascontiguousarray(
        codes.T.astype("<i2")).view(np.uint8).reshape(-1)
    assert np.array_equal(payload, want)


def test_lossy_formats_rejected_with_reason(tmp_path):
    # known-but-undecodable extensions get an actionable message;
    # truly unknown ones are rejected outright
    p = str(tmp_path / "x.aac")
    open(p, "wb").write(b"\x00" * 64)
    assert not codec.is_supported(p)
    with pytest.raises(ValueError, match="AAC"):
        codec.probe(p)
    p = str(tmp_path / "x.xyz")
    open(p, "wb").write(b"\x00" * 64)
    with pytest.raises(ValueError, match="unsupported"):
        codec.probe(p)
    # .ogg/.caf/.m4a/.mp3 are supported INPUTS since round 5 (decode-only
    # parity with the reference's registerBasicFormats reader + the Swift
    # shell's AVAudioFile surface); garbage bytes still raise actionable
    # container errors
    for ext, frag in [(".ogg", "capture pattern"), (".caf", "not a CAF"),
                      (".m4a", "moov|box"), (".mp3", "no MPEG audio")]:
        p = str(tmp_path / f"x{ext}")
        open(p, "wb").write(b"\x00" * 64)
        assert codec.is_supported(p)
        with pytest.raises(ValueError, match=frag):
            codec.probe(p)


def test_batch_flac_matches_wav_bytes(tmp_path):
    """A FLAC source and a WAV source holding the SAME samples produce
    byte-identical batch output with dither off (FLAC decodes on the host;
    24-bit WAV rides the raw device wire — the two decode paths must
    agree bitwise)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor

    n = 44100
    t = np.arange(n)
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t / 44100),
                  0.4 * np.sin(2 * np.pi * 220 * t / 44100)])
    codes = np.clip(np.round(x * (1 << 23)), -(1 << 23),
                    (1 << 23) - 1).astype(np.int64)
    xq = (codes / (1 << 23)).astype(np.float32)
    fp = str(tmp_path / "src_a.flac")
    wp = str(tmp_path / "src_b.wav")
    write_flac_codes(fp, codes, 44100, bits=24)
    write_wav(wp, xq, 44100, bits=24)
    out = str(tmp_path / "out")
    cfg = ProcessingConfig(target_rate=48000, output_dir=out, bits=24,
                           dither=False)
    res = BatchProcessor(cfg).run([fp, wp])
    assert res.completed == 2 and res.failed == 0
    a, _ = read_wav(os.path.join(out, "src_a_processed.wav"))
    b, _ = read_wav(os.path.join(out, "src_b_processed.wav"))
    assert np.array_equal(a, b)


def test_stream_flac_matches_wav_bytes(tmp_path):
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    n = 44100 * 2
    t = np.arange(n)
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t / 44100),
                  0.4 * np.sin(2 * np.pi * 220 * t / 44100)])
    codes = np.clip(np.round(x * (1 << 23)), -(1 << 23),
                    (1 << 23) - 1).astype(np.int64)
    xq = (codes / (1 << 23)).astype(np.float32)
    fp = str(tmp_path / "src.flac")
    wp = str(tmp_path / "src.wav")
    write_flac_codes(fp, codes, 44100, bits=24)
    write_wav(wp, xq, 44100, bits=24)
    cfg = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                           bits=24, dither=False)
    o1, o2 = str(tmp_path / "o1.wav"), str(tmp_path / "o2.wav")
    stream_resample_file(fp, o1, cfg, chunk_seconds=0.7)
    stream_resample_file(wp, o2, cfg, chunk_seconds=0.7)
    a, _ = read_wav(o1)
    b, _ = read_wav(o2)
    assert np.array_equal(a, b)


def test_batch_flac_output(tmp_path):
    """output_format='flac': the batch scheduler writes decodable FLAC
    deliverables at every depth, and the 24-bit one carries the same codes
    as the WAV deliverable from an identical run (the payload wire is
    container-independent)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor
    from f9tpu.io.wav import read_wav as _read_wav

    n = 44100
    t = np.arange(n)
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t / 44100),
                  0.4 * np.sin(2 * np.pi * 220 * t / 44100)]
                 ).astype(np.float32)
    src = str(tmp_path / "src.wav")
    write_wav(src, x, 44100, bits=24)
    outs = {}
    for fmt in ("flac", "wav"):
        out = str(tmp_path / f"out_{fmt}")
        cfg = ProcessingConfig(target_rate=48000, output_dir=out, bits=24,
                               output_format=fmt)
        res = BatchProcessor(cfg).run([src])
        assert res.completed == 1 and res.failed == 0
        outs[fmt] = os.path.join(out, f"src_processed.{fmt}")
    yf, rf = read_flac(outs["flac"])
    yw, rw = _read_wav(outs["wav"])
    assert rf == rw == 48000
    assert np.array_equal(yf, yw)
    # lossless container: smaller than the PCM twin for tonal material
    assert os.path.getsize(outs["flac"]) < os.path.getsize(outs["wav"])


def test_stream_flac_output_chunk_invariant(tmp_path):
    """Streamed FLAC deliverables are bitwise chunk-size invariant — the
    codes contract all containers share, surviving FLAC's own framing."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    n = 44100 * 2
    t = np.arange(n)
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t / 44100),
                  0.4 * np.sin(2 * np.pi * 220 * t / 44100)]
                 ).astype(np.float32)
    src = str(tmp_path / "src.wav")
    write_wav(src, x, 44100, bits=24)
    cfg = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                           bits=24, output_format="flac")
    o1, o2 = str(tmp_path / "o1.flac"), str(tmp_path / "o2.flac")
    stream_resample_file(src, o1, cfg, chunk_seconds=0.311)
    stream_resample_file(src, o2, cfg, chunk_seconds=1.13)
    assert open(o1, "rb").read() == open(o2, "rb").read()
    # and the codes equal the WAV-container stream byte-for-byte
    o3 = str(tmp_path / "o3.wav")
    cfg_wav = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                               bits=24, output_format="wav")
    stream_resample_file(src, o3, cfg_wav, chunk_seconds=0.311)
    yf, _ = read_flac(o1)
    yw, _ = read_wav(o3)
    assert np.array_equal(yf, yw)


def test_stream_flac_raw_wire_matches_float_wire(tmp_path):
    """FLAC input streaming rides the raw H2D wire (packed codes); bytes
    out must equal the float-wire form exactly (on-device decode is
    bitwise the host conversion)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    codes = tonal(2, 44100, 24, seed=21)
    src = str(tmp_path / "src.flac")
    write_flac_codes(src, codes, 44100, bits=24)
    cfg = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                           bits=24)
    o1, o2 = str(tmp_path / "o1.wav"), str(tmp_path / "o2.wav")
    stream_resample_file(src, o1, cfg, chunk_seconds=0.4)
    import unittest.mock as mock

    with mock.patch.object(FlacReader, "raw_wire", lambda self: None):
        stream_resample_file(src, o2, cfg, chunk_seconds=0.4)
    assert open(o1, "rb").read() == open(o2, "rb").read()


def test_batch_flac_raw_wire_matches_host_decode(tmp_path):
    """Batch: a FLAC job on the raw wire (the default gate) produces the
    same bytes as the host-decode float path (forced via a config the
    gate excludes -> normalize_lufs is not used here, so monkeypatch the
    reader instead: compare against a WAV twin of the same codes, which
    the existing gate sends down the raw path too)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor

    codes = tonal(2, 44100, 16, seed=22)
    fp = str(tmp_path / "src_a.flac")
    wp = str(tmp_path / "src_b.wav")
    write_flac_codes(fp, codes, 44100, bits=16)
    from f9tpu.io.wav import write_wav_codes

    write_wav_codes(wp, codes.astype(np.int32), 44100, bits=16)
    out = str(tmp_path / "out")
    cfg = ProcessingConfig(target_rate=48000, output_dir=out, bits=16,
                           dither=False)
    res = BatchProcessor(cfg).run([fp, wp])
    assert res.completed == 2 and res.failed == 0
    a, _ = read_wav(os.path.join(out, "src_a_processed.wav"))
    b, _ = read_wav(os.path.join(out, "src_b_processed.wav"))
    assert np.array_equal(a, b)


def test_stream_flac_output_16bit(tmp_path):
    """16-bit stream: the i16 D2H wire feeds FlacWriter.append_codes."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.stream import stream_resample_file

    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(22050) / 44100)
         ).astype(np.float32)[None, :]
    src = str(tmp_path / "src.wav")
    write_wav(src, x, 44100, bits=24)
    cfg = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                           bits=16, output_format="flac")
    o = str(tmp_path / "o.flac")
    stream_resample_file(src, o, cfg, chunk_seconds=0.4)
    y, rate = read_flac(o)
    assert rate == 48000 and y.shape[0] == 1
    info = probe_flac(o)
    assert info.bit_depth == 16


def test_seektable_written_and_used(tmp_path):
    """The writer emits a SEEKTABLE (one point per ~interval, placeholders
    reserved at open and filled at close); the reader seeds its boundary
    index from it so a far FIRST read jumps instead of decoding the whole
    prefix — and the jumped read is byte-identical to sequential decode."""
    n = 44100 * 30
    codes = tonal(1, n, 16, seed=17)
    p = str(tmp_path / "long.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    with open(p, "rb") as f:
        si = flac._scan_metadata(f, p)
    assert len(si.seekpoints) >= 3                 # ~10 s spacing over 30 s
    assert si.seekpoints == sorted(si.seekpoints)
    whole, _ = read_flac(p)
    with FlacReader(p) as r:
        assert len(r._index) > 1                   # seeded from the table
        target = 44100 * 25
        got = r.read(target, 1000)
        assert np.array_equal(got, whole[:, target:target + 1000])
        # the cursor jumped via a seek point: it never visited sample 0..
        # (the first boundary it decoded from is a table point, not 0)
        assert r._cur_sample >= si.seekpoints[1][0]
    # a table point with a corrupt offset fails loudly, not silently
    raw = bytearray(open(p, "rb").read())
    off = raw.index(b"\xFF" * 8) - 18 * 2          # second real point
    raw[off + 15] ^= 0x55                          # flip its byte offset
    open(p, "wb").write(bytes(raw))
    with FlacReader(p) as r:
        with pytest.raises(ValueError):
            r.read(44100 * 12, 100)


def test_seektable_thinning_long_stream(tmp_path):
    """Past 128 points the table thins (double spacing) instead of only
    covering the stream's head."""
    w = FlacWriter(str(tmp_path / "x.flac"), 1, 8000, bits=16,
                   seek_interval_s=0.1)            # 800-sample spacing
    blk = np.zeros((1, 4096), np.int64)
    for _ in range(400):                           # 400 frames, 1 point each
        w.append_codes(blk)
    w.close()
    with open(str(tmp_path / "x.flac"), "rb") as f:
        si = flac._scan_metadata(f, "x")
    assert 64 <= len(si.seekpoints) <= 128
    assert si.seekpoints == sorted(si.seekpoints)
    assert si.seekpoints[-1][0] > 4096 * 300       # covers the tail


def test_batch_resume_with_flac_outputs(tmp_path):
    """Checkpoint/resume with FLAC deliverables: a second run skips the
    completed file (CRC-verified), a tampered output is re-rendered."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.manifest import FileStatus, JobManifest
    from f9tpu.pipeline.scheduler import BatchProcessor

    codes = tonal(2, 22050, 24, seed=26)
    src = str(tmp_path / "src.flac")
    write_flac_codes(src, codes, 44100, bits=24)
    out = str(tmp_path / "out")
    mpath = str(tmp_path / "manifest.json")
    cfg = ProcessingConfig(target_rate=48000, output_dir=out, bits=24,
                           output_format="flac")
    res1 = BatchProcessor(cfg).run([src], manifest_path=mpath)
    assert res1.completed == 1
    op = os.path.join(out, "src_processed.flac")
    first = open(op, "rb").read()
    mtime = os.path.getmtime(op)
    res2 = BatchProcessor(cfg).run([src], manifest_path=mpath)
    assert res2.completed == 1 and res2.skipped == 1
    assert os.path.getmtime(op) == mtime        # not re-rendered
    # tamper the deliverable: CRC verification must force a re-render
    raw = bytearray(first)
    raw[-10] ^= 0xFF
    open(op, "wb").write(bytes(raw))
    m = JobManifest.load_or_create([src], mpath)
    assert m.get(src).status == FileStatus.PENDING
    res3 = BatchProcessor(cfg).run([src], manifest_path=mpath)
    assert res3.completed == 1 and res3.skipped == 0
    assert open(op, "rb").read() == first       # byte-identical re-render


def test_watch_sweeps_flac_drop(tmp_path):
    """The serving daemon's drop zone accepts .flac (the reference's
    drop filter spans registerBasicFormats)."""
    from f9tpu.cli import main

    d = tmp_path / "inbox"
    d.mkdir()
    codes = tonal(2, 3000, 24, seed=23)
    write_flac_codes(str(d / "drop.flac"), codes, 44100, bits=24)
    rc = main(["watch", str(d), "--out", str(tmp_path / "o"),
               "--rate", "48000", "--quality", "low", "--seed", "3",
               "--interval", "0.05", "--sweeps", "2"])
    assert rc == 0
    y, rate = read_wav(str(tmp_path / "o" / "drop_processed.wav"))
    assert rate == 48000 and y.shape[0] == 2


def test_preview_flac_item(tmp_path):
    """Preview playlists accept FLAC items; samples match the WAV twin."""
    from f9tpu.pipeline.preview import render_playlist

    n = 8000
    codes = tonal(2, n, 24, seed=24)
    fp = str(tmp_path / "a.flac")
    wp = str(tmp_path / "a.wav")
    write_flac_codes(fp, codes, 44100, bits=24)
    from f9tpu.io.wav import write_wav_codes

    write_wav_codes(wp, codes.astype(np.int32), 44100, bits=24)
    pf, _, _ = render_playlist([fp], 44100)
    pw, _, _ = render_playlist([wp], 44100)
    assert np.array_equal(pf, pw)


def test_probe_json_flac(tmp_path, capsys):
    import json as _json

    from f9tpu.cli import main

    codes = tonal(2, 4321, 24, seed=25)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 96000, bits=24)
    rc = main(["probe", p, "--json"])
    assert rc == 0
    doc = _json.loads(capsys.readouterr().out)
    row = doc["files"][0] if isinstance(doc, dict) else doc[0]
    assert row["container"] == "flac"
    assert row["sample_rate"] == 96000 and row["frames"] == 4321


def test_cli_stream_infers_flac_from_extension(tmp_path):
    """`stream --out x.flac` without --format writes real FLAC (explicit
    --format still wins when given)."""
    from f9tpu.cli import main

    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(22050) / 44100)
         ).astype(np.float32)[None, :]
    src = str(tmp_path / "src.wav")
    write_wav(src, x, 44100, bits=24)
    out = str(tmp_path / "o.flac")
    rc = main(["stream", src, "--out", out, "--rate", "48000"])
    assert rc == 0
    y, rate = read_flac(out)            # real FLAC, not WAV bytes
    assert rate == 48000 and y.shape[0] == 1


def _vorbis_comment(pairs):
    vendor = b"f9tpu-test"
    body = len(vendor).to_bytes(4, "little") + vendor
    body += len(pairs).to_bytes(4, "little")
    for k, v in pairs:
        kv = f"{k}={v}".encode()
        body += len(kv).to_bytes(4, "little") + kv
    return body


def test_metadata_blocks_roundtrip(tmp_path):
    """read_extra_blocks_flac / insert_blocks_flac: tags and art survive a
    splice and the spliced file still decodes with its MD5 intact."""
    from f9tpu.io.flac import insert_blocks_flac, read_extra_blocks_flac

    codes = tonal(2, 5000, 16)
    p = str(tmp_path / "t.flac")
    write_flac_codes(p, codes, 44100, bits=16)
    vc = _vorbis_comment([("TITLE", "Night Stem"), ("ARTIST", "F9")])
    pic = b"\x00" * 16 + b"fakejpegbytes"
    insert_blocks_flac(p, [(4, vc), (6, pic)])
    got = read_extra_blocks_flac(p)
    assert got == [(4, vc), (6, pic)]
    dec, _ = read_flac_codes(p)                 # MD5 still verifies
    assert np.array_equal(dec, codes)
    # a second splice stacks more blocks without corrupting the chain
    insert_blocks_flac(p, [(2, b"APPLbody")])
    assert read_extra_blocks_flac(p) == [(4, vc), (6, pic), (2, b"APPLbody")]
    dec2, _ = read_flac_codes(p)
    assert np.array_equal(dec2, codes)


def test_keep_metadata_flac_to_flac(tmp_path):
    """--keep-metadata carries VORBIS_COMMENT tags through a FLAC->FLAC
    batch job (the same-container carry rule all formats share)."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.pipeline.scheduler import BatchProcessor
    from f9tpu.io.flac import insert_blocks_flac, read_extra_blocks_flac

    codes = tonal(2, 44100, 24, seed=8)
    src = str(tmp_path / "tagged.flac")
    write_flac_codes(src, codes, 44100, bits=24)
    vc = _vorbis_comment([("ALBUM", "Parity Sessions")])
    insert_blocks_flac(src, [(4, vc)])
    out = str(tmp_path / "out")
    cfg = ProcessingConfig(target_rate=48000, output_dir=out, bits=24,
                           output_format="flac", keep_metadata=True)
    res = BatchProcessor(cfg).run([src])
    assert res.completed == 1 and res.failed == 0
    op = os.path.join(out, "tagged_processed.flac")
    assert read_extra_blocks_flac(op) == [(4, vc)]
    y, rate = read_flac(op)                     # MD5 verifies post-splice
    assert rate == 48000 and y.shape[0] == 2


def test_sharded_stream_flac_input(tmp_path):
    """FLAC input through the SHARDED stream (frames mesh) is byte-equal
    to the single-chip stream of the same samples."""
    from f9tpu.config import ProcessingConfig
    from f9tpu.parallel import make_mesh
    from f9tpu.pipeline.stream import stream_resample_file

    n = 44100
    t = np.arange(n)
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t / 44100),
                  0.4 * np.sin(2 * np.pi * 220 * t / 44100)])
    codes = np.clip(np.round(x * (1 << 23)), -(1 << 23),
                    (1 << 23) - 1).astype(np.int64)
    src = str(tmp_path / "src.flac")
    write_flac_codes(src, codes, 44100, bits=24)
    cfg = ProcessingConfig(target_rate=48000, output_dir=str(tmp_path),
                           bits=24)
    o1, o2 = str(tmp_path / "o1.wav"), str(tmp_path / "o2.wav")
    stream_resample_file(src, o1, cfg, chunk_seconds=0.25)
    mesh = make_mesh(num_files_shards=2, num_frames_shards=4)
    stream_resample_file(src, o2, cfg, chunk_seconds=0.25, mesh=mesh)
    assert open(o1, "rb").read() == open(o2, "rb").read()


def test_md5_detects_payload_tamper(tmp_path, decode_path):
    """A stream whose frames are individually valid but whose STREAMINFO
    MD5 disagrees must be rejected: re-encode one frame's worth of audio
    with different content but keep the original STREAMINFO."""
    codes = tonal(1, 4096, 16, seed=5)
    p1, p2 = str(tmp_path / "a.flac"), str(tmp_path / "b.flac")
    write_flac_codes(p1, codes, 44100, bits=16)
    write_flac_codes(p2, codes + 1, 44100, bits=16)
    head = open(p1, "rb").read()
    body = open(p2, "rb").read()
    si_end = 4 + 4 + 34
    franken = head[:si_end] + body[si_end:]
    open(p1, "wb").write(franken)
    with pytest.raises(ValueError, match="MD5"):
        read_flac_codes(p1)


def test_lpc_sweep_ratio_vs_reference_encoder():
    """Round 5 (VERDICT item 7): the (window x order) LPC sweep must land
    within a few % of a mainstream -5-level FLAC encoder.  Reference:
    the system libavcodec FLAC encoder at defaults (max order 8, level-5
    analysis) via tests/avref.py — f9tpu's sweep (orders 4/8/12/16,
    Welch + biweight) measures BELOW it on tonal/harmonic material."""
    import avref

    if not avref.available():
        pytest.skip(f"avref unavailable: {avref.build_error()}")
    from f9tpu import native

    if not native.available():
        pytest.skip(f"native unavailable: {native.build_error()}")
    rng = np.random.default_rng(1)
    rate = 44100
    T = 6 * rate
    lim = 1 << 23
    t = np.arange(T)
    mats = {}
    x = np.zeros((2, T))
    for c in range(2):
        for h in range(1, 16):
            x[c] += np.sin(2 * np.pi * (110 * h + 3 * c) * t / rate) / h
    mats["harmonic"] = np.clip(0.25 * lim * x + rng.normal(0, 100, (2, T)),
                               -lim, lim - 1).astype(np.int64)
    x = sum(0.2 * np.sin(2 * np.pi * f * t / rate) for f in (220, 997, 3001))
    mats["tones"] = np.clip(lim * np.stack([x, x * 0.9])
                            + rng.normal(0, 300, (2, T)),
                            -lim, lim - 1).astype(np.int64)
    for kind, codes in mats.items():
        ours, _ = native.flac_encode_frames_mt(codes, 24, 0, 4096, rate)
        ref = avref.encode_size("flac", codes, rate, 24)
        assert len(ours) <= 1.03 * ref, (kind, len(ours), ref)
