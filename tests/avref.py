"""TEST-ONLY ctypes loader for tests/avref.c — reference encode/decode via
the system FFmpeg libraries (vectors + independent oracle for f9tpu's
from-scratch ALAC/CAF decoders; FLAC ratio reference).  The PRODUCT code
never touches these libraries — same role as tests/vorbis_ref.py."""

from __future__ import annotations

import ctypes as C
import ctypes.util
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "avref.c")
_LIB = os.path.join(_DIR, "libavref.so")


def _build():
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return None
    for name in ("avcodec", "avformat", "avutil"):
        if not ctypes.util.find_library(name):
            return f"lib{name} not present"
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC,
           "-lavcodec", "-lavformat", "-lavutil"]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed: {e}"
    if p.returncode != 0:
        return f"build failed: {p.stderr[-1500:]}"
    os.replace(tmp, _LIB)
    return None


_lib = None
_err = None


def _load():
    global _lib, _err
    if _lib is not None or _err is not None:
        return _lib
    _err = _build()
    if _err is None:
        try:
            _lib = C.CDLL(_LIB)
        except OSError as e:
            _err = str(e)
            return None
        _lib.avref_encode.restype = C.c_long
        _lib.avref_encode.argtypes = [C.c_char_p, C.c_char_p, C.c_char_p,
                                      C.POINTER(C.c_int32), C.c_int,
                                      C.c_long, C.c_int, C.c_int]
        _lib.avref_encode2.restype = C.c_long
        _lib.avref_encode2.argtypes = [C.c_char_p, C.c_char_p, C.c_char_p,
                                       C.POINTER(C.c_int32), C.c_int,
                                       C.c_long, C.c_int, C.c_int,
                                       C.c_long, C.c_char_p]
        _lib.avref_decode.restype = C.c_long
        _lib.avref_decode.argtypes = [C.c_char_p, C.POINTER(C.c_int32),
                                      C.c_long, C.POINTER(C.c_int),
                                      C.POINTER(C.c_int), C.POINTER(C.c_int)]
        _lib.avref_decode_raw.restype = C.c_long
        _lib.avref_decode_raw.argtypes = [C.c_char_p, C.c_char_p, C.c_long,
                                          C.c_long, C.POINTER(C.c_int32),
                                          C.c_long, C.POINTER(C.c_int),
                                          C.POINTER(C.c_int)]
    return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _err


def encode_size(codec: str, codes: np.ndarray, rate: int, bits: int) -> int:
    """Compressed byte total for (channels, frames) int codes — the
    compression-ratio reference (no container)."""
    lib = _load()
    assert lib is not None, _err
    inter = np.ascontiguousarray(codes.T, np.int32)
    r = lib.avref_encode(codec.encode(), None, None,
                         inter.ctypes.data_as(C.POINTER(C.c_int32)),
                         codes.shape[0], codes.shape[1], rate, bits)
    assert r >= 0, f"avref_encode failed: {r}"
    return int(r)


def encode_file(codec: str, path: str, fmt: str, codes: np.ndarray,
                rate: int, bits: int) -> int:
    """Encode + mux to ``path`` (e.g. ALAC into 'ipod' for .m4a or 'caf');
    returns compressed payload bytes."""
    lib = _load()
    assert lib is not None, _err
    inter = np.ascontiguousarray(codes.T, np.int32)
    r = lib.avref_encode(codec.encode(), path.encode(), fmt.encode(),
                         inter.ctypes.data_as(C.POINTER(C.c_int32)),
                         codes.shape[0], codes.shape[1], rate, bits)
    assert r >= 0, f"avref_encode failed: {r}"
    return int(r)


def encode_file_opts(codec: str, path: str, fmt: str, codes: np.ndarray,
                     rate: int, bits: int, bit_rate: int = 0,
                     opts: str | None = None) -> int:
    """encode_file plus an explicit bit rate and codec AVOptions string
    ('key=val:key=val') — MPEG-audio coverage vectors need bitrate/mode
    control (libmp3lame 'abr', mp2 rates, ...)."""
    lib = _load()
    assert lib is not None, _err
    inter = np.ascontiguousarray(codes.T, np.int32)
    r = lib.avref_encode2(codec.encode(), path.encode(), fmt.encode(),
                          inter.ctypes.data_as(C.POINTER(C.c_int32)),
                          codes.shape[0], codes.shape[1], rate, bits,
                          bit_rate, opts.encode() if opts else None)
    assert r >= 0, f"avref_encode2 failed: {r}"
    return int(r)


def decode_file(path: str, max_frames: int = 1 << 24):
    """Decode any audio file: ((channels, frames) int32 codes, rate, bits).
    Float streams come back as 24-bit codes (bits reported as stream
    depth or sample size)."""
    lib = _load()
    assert lib is not None, _err
    # capacity heuristic: 8ch upper bound
    cap = max_frames
    out = np.zeros(cap * 8, np.int32)
    ch = C.c_int(0)
    rate = C.c_int(0)
    bits = C.c_int(0)
    r = lib.avref_decode(path.encode(),
                         out.ctypes.data_as(C.POINTER(C.c_int32)),
                         cap, C.byref(ch), C.byref(rate), C.byref(bits))
    assert r >= 0, f"avref_decode failed: {r}"
    ch_v = ch.value
    codes = out[: r * ch_v].reshape(r, ch_v).T.copy()
    return codes, rate.value, bits.value


def decode_raw(codec: str, data: bytes, frame_bytes: int,
               max_frames: int = 1 << 22):
    """Decode a raw MPEG-audio elementary stream frame-by-frame with the
    named libavcodec decoder (mp1float/mp2float/mp3float), bypassing the
    avformat prober — hand-assembled conformance frames are fed one
    fixed-size frame per packet.  Returns ((ch, n) 24-bit codes, rate)."""
    lib = _load()
    assert lib is not None, _err
    out = np.zeros(max_frames * 2, np.int32)
    ch = C.c_int(0)
    rate = C.c_int(0)
    r = lib.avref_decode_raw(codec.encode(), data, len(data), frame_bytes,
                             out.ctypes.data_as(C.POINTER(C.c_int32)),
                             max_frames, C.byref(ch), C.byref(rate))
    assert r >= 0, f"avref_decode_raw failed: {r}"
    ch_v = ch.value
    codes = out[: r * ch_v].reshape(r, ch_v).T.copy()
    return codes, rate.value
