"""Native C++ layer: build, oracle cross-validation, codec hot loops."""

import numpy as np
import pytest

from f9tpu import native
from f9tpu.models.filters import QUALITY_PRESETS, design_cycle_bank, sinc_phase_bank
from f9tpu.models.oracle import resample_oracle

needs_native = pytest.mark.skipif(
    not native.available(), reason=f"native build unavailable: {native.build_error()}")


@needs_native
def test_native_oracle_matches_numpy_oracle():
    """C++ double loop vs the NumPy float64 oracle: same bank, same indexing
    -> agreement to ~1e-15 (independent implementations of the execution)."""
    import math

    rng = np.random.default_rng(0)
    x = rng.standard_normal(8192)
    L, M = 160, 147
    Z = QUALITY_PRESETS["medium"]
    K = max(4, int(math.ceil(2.0 * Z * max(L, M) / L)))
    K += K % 2
    H = sinc_phase_bank(L, M, K)
    delay = (K * L) // 2
    out_len = -(-len(x) * L // M)
    y_cpp = native.resample_oracle_native(x, H, L, M, delay, out_len)
    y_np = resample_oracle(x, 44100, 48000, quality="medium")
    assert y_cpp.shape == y_np.shape
    assert np.abs(y_cpp - y_np).max() < 1e-12


@needs_native
def test_native_oracle_multithreaded_deterministic():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1 << 16)
    bank = design_cycle_bank(96000, 44100, quality="low")
    # reconstruct the (L, K) bank from the oracle designer for the native call
    from f9tpu.models.oracle import _design

    L, M, K, H, delay = _design(96000, 44100, "low", "sinc", 4)
    out_len = -(-len(x) * L // M)
    y1 = native.resample_oracle_native(x, H, L, M, delay, out_len, n_threads=1)
    y8 = native.resample_oracle_native(x, H, L, M, delay, out_len, n_threads=8)
    assert np.array_equal(y1, y8)


@needs_native
def test_pack_unpack_24bit_roundtrip():
    rng = np.random.default_rng(2)
    codes = rng.integers(-(2**23), 2**23, size=100001, dtype=np.int32)
    raw = native.pack24_from_i32(codes)
    assert raw.shape == (300003,)
    back = np.round(native.unpack24_to_f32(raw) * 8388608.0).astype(np.int32)
    assert np.array_equal(back, codes)


@needs_native
def test_pack24_matches_numpy_path():
    from f9tpu.io.wav import _pack24, _unpack24

    rng = np.random.default_rng(3)
    codes = rng.integers(-(2**23), 2**23, size=9999, dtype=np.int32)
    assert np.array_equal(native.pack24_from_i32(codes), _pack24(codes))
    raw = _pack24(codes)
    assert np.allclose(
        native.unpack24_to_f32(raw),
        _unpack24(raw).astype(np.float32) / 8388608.0)


@needs_native
def test_interleave_roundtrip():
    rng = np.random.default_rng(4)
    planar = rng.standard_normal((4, 1000)).astype(np.float32)
    inter = native.interleave_f32(planar)
    assert inter[0] == planar[0, 0] and inter[1] == planar[1, 0]
    back = native.deinterleave_f32(inter, 4)
    assert np.array_equal(back, planar)


@needs_native
def test_async_loader_roundtrip(tmp_path):
    from f9tpu.io import write_wav
    from f9tpu.native import AsyncLoader

    rng = np.random.default_rng(7)
    files = []
    for i, bits in enumerate((16, 24, 24, 16)):
        x = np.clip(0.4 * rng.standard_normal((2, 1000 + 37 * i)),
                    -0.99, 0.99).astype(np.float32)
        p = str(tmp_path / f"l{i}.wav")
        write_wav(p, x, 44100, bits=bits)
        files.append((p, x, bits))
    with AsyncLoader(n_threads=3) as loader:
        tickets = [loader.submit(p, 2, 4096) for p, _, _ in files]
        for t, (p, x, bits) in zip(tickets, files):
            data, rate = loader.wait(t)
            assert rate == 44100
            assert data.shape == x.shape
            tol = 2.0 ** -(bits - 1)
            assert np.abs(data - x).max() <= tol


@needs_native
def test_async_loader_error_paths(tmp_path):
    from f9tpu.native import AsyncLoader

    bad = str(tmp_path / "junk.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage not a wav")
    with AsyncLoader(n_threads=1) as loader:
        t1 = loader.submit(bad, 2, 100)
        with pytest.raises(ValueError):
            loader.wait(t1)
        t2 = loader.submit(str(tmp_path / "missing.wav"), 2, 100)
        with pytest.raises(ValueError):
            loader.wait(t2)


@needs_native
def test_async_loader_bwf_metadata(tmp_path):
    """Native loader walks past large metadata chunks like the Python path."""
    import struct

    from f9tpu.io import write_wav
    from f9tpu.native import AsyncLoader

    x = np.clip(0.4 * np.random.default_rng(8).standard_normal((1, 500)),
                -0.99, 0.99).astype(np.float32)
    base = str(tmp_path / "p.wav")
    write_wav(base, x, 48000, bits=24)
    raw = open(base, "rb").read()
    fmt_chunk, data_chunk = raw[12:36], raw[36:]
    bext = b"bext" + struct.pack("<I", 70_000) + b"\x00" * 70_000
    body = fmt_chunk + bext + data_chunk
    p = str(tmp_path / "bwf.wav")
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with AsyncLoader(1) as loader:
        data, rate = loader.wait(loader.submit(p, 1, 1000))
        assert rate == 48000 and data.shape == (1, 500)
        assert np.abs(data - x).max() <= 2.0 ** -23


@needs_native
def test_native_oracle_minphase_cross_validation():
    """The C++ double oracle is bank-generic: the minimum-phase bank runs
    through it and matches the NumPy float64 oracle to 1e-12 — independent
    native cross-validation of the new kind."""
    from f9tpu.models.oracle import _design

    rng = np.random.default_rng(3)
    x = rng.standard_normal(1 << 14)
    L, M, K, H, delay = _design(44100, 48000, "low", "minphase", 4)
    assert delay == 0
    out_len = -(-len(x) * L // M)
    y_cpp = native.resample_oracle_native(x, H, L, M, delay, out_len)
    y_np = resample_oracle(x, 44100, 48000, quality="low", kind="minphase")
    assert y_cpp.shape == y_np.shape
    assert np.abs(y_cpp - y_np).max() < 1e-12


@needs_native
def test_async_loader_consumed_ticket_refused(tmp_path):
    """Polling a consumed ticket must raise a Python KeyError, not hand a
    freed job pointer to the native poll."""
    from f9tpu.io import write_wav
    from f9tpu.native import AsyncLoader

    x = np.zeros((1, 500), np.float32)
    p = str(tmp_path / "one.wav")
    write_wav(p, x, 44100, bits=16)
    with AsyncLoader(n_threads=1) as loader:
        t = loader.submit(p, 1, 1000)
        loader.wait(t)
        with pytest.raises(KeyError):
            loader.poll(t)


@needs_native
def test_async_loader_non_utf8_filename(tmp_path):
    """Linux filenames are bytes; a surrogate-escaped (non-UTF-8) name must
    decode through the native loader like it does through the Python path."""
    import os

    from f9tpu.io import write_wav

    bname = b"take_\xff_01.wav"
    bpath = os.path.join(os.fsencode(str(tmp_path)), bname)
    path = os.fsdecode(bpath)
    x = np.clip(0.3 * np.random.default_rng(1).standard_normal((2, 800)),
                -0.99, 0.99).astype(np.float32)
    try:
        write_wav(path, x, 48000, bits=24)
    except OSError:
        pytest.skip("filesystem rejects non-UTF-8 names")
    from f9tpu.native import AsyncLoader

    with AsyncLoader(n_threads=1) as loader:
        t = loader.submit(path, 2, 1000)
        data, rate = loader.wait(t)
        assert rate == 48000 and data.shape == x.shape
        assert np.abs(data - x).max() <= 2.0 ** -23


@needs_native
def test_oracle_native_validates_args():
    from f9tpu.native import resample_oracle_native

    with pytest.raises(ValueError):
        resample_oracle_native(np.zeros(16), np.zeros((4, 8)), L=5, M=3,
                               delay=0, out_len=4)
    with pytest.raises(ValueError):
        resample_oracle_native(np.zeros(16), np.zeros((4, 8)), L=4, M=3,
                               delay=-1, out_len=4)
