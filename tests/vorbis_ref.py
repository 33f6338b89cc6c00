"""TEST-ONLY ctypes bindings to the system libvorbis/libvorbisenc/libogg:

- :func:`encode_ogg` produces conformant Ogg Vorbis streams (the test
  vectors for f9tpu's from-scratch decoder — we have no network and no
  CLI encoder in this image, but the shared libraries are present);
- :func:`decode_ogg_ref` decodes via libvorbisfile (the independent
  oracle the product decoder is cross-checked against).

The PRODUCT decoder (`f9tpu/io/ogg.py` + `f9tpu/io/vorbis.py`) never
touches these libraries — they exist here for vector generation and
cross-validation only, the same role scipy plays for filter-design
oracles elsewhere in the suite.

Struct layouts: the libogg/libvorbis structs are allocated by the CALLER
in the C API; we allocate oversized opaque byte blobs and only read the
few leading fields whose layout is fixed by the public headers
(ogg_packet: ptr/len/b_o_s/e_o_s/granulepos/packetno; ogg_page:
header/header_len/body/body_len).
"""

from __future__ import annotations

import ctypes as C
import ctypes.util

import numpy as np


def _load():
    libs = {}
    for name in ("ogg", "vorbis", "vorbisenc", "vorbisfile"):
        path = ctypes.util.find_library(name)
        if not path:
            return None
        try:
            libs[name] = C.CDLL(path)
        except OSError:
            return None
    return libs


_LIBS = _load()


def available() -> bool:
    return _LIBS is not None


class _OggPacket(C.Structure):
    _fields_ = [("packet", C.POINTER(C.c_ubyte)),
                ("bytes", C.c_long),
                ("b_o_s", C.c_long),
                ("e_o_s", C.c_long),
                ("granulepos", C.c_int64),
                ("packetno", C.c_int64)]


class _OggPage(C.Structure):
    _fields_ = [("header", C.POINTER(C.c_ubyte)),
                ("header_len", C.c_long),
                ("body", C.POINTER(C.c_ubyte)),
                ("body_len", C.c_long)]


def _blob(size: int):
    return C.create_string_buffer(size)


def encode_ogg(x: np.ndarray, rate: int, quality: float = 0.4,
               serial: int = 777) -> bytes:
    """Encode ``x`` (channels, frames) float32 in [-1, 1] to an Ogg Vorbis
    byte stream via libvorbisenc (VBR at ``quality`` in [-0.1, 1.0])."""
    assert _LIBS is not None, "libvorbis not available"
    ogg, vorbis, enc = _LIBS["ogg"], _LIBS["vorbis"], _LIBS["vorbisenc"]
    x = np.ascontiguousarray(x, np.float32)
    ch, n = x.shape

    vi = _blob(1024)
    vc = _blob(1024)
    vd = _blob(4096)
    vb = _blob(4096)
    os_ = _blob(1024)
    vorbis.vorbis_info_init(vi)
    rc = enc.vorbis_encode_init_vbr(vi, C.c_long(ch), C.c_long(rate),
                                    C.c_float(quality))
    assert rc == 0, f"vorbis_encode_init_vbr failed: {rc}"
    vorbis.vorbis_comment_init(vc)
    vorbis.vorbis_comment_add_tag(vc, b"ENCODER", b"f9tpu-test-vectors")
    assert vorbis.vorbis_analysis_init(vd, vi) == 0
    assert vorbis.vorbis_block_init(vd, vb) == 0
    assert ogg.ogg_stream_init(os_, C.c_int(serial)) == 0

    out = bytearray()
    pg = _OggPage()

    def pages(flush: bool) -> None:
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(os_, C.byref(pg)) != 0:
            out.extend(C.string_at(pg.header, pg.header_len))
            out.extend(C.string_at(pg.body, pg.body_len))

    hp, hc, hcode = _OggPacket(), _OggPacket(), _OggPacket()
    assert vorbis.vorbis_analysis_headerout(
        vd, vc, C.byref(hp), C.byref(hc), C.byref(hcode)) == 0
    for p in (hp, hc, hcode):
        ogg.ogg_stream_packetin(os_, C.byref(p))
    pages(flush=True)                 # audio starts on a fresh page

    vorbis.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))
    op = _OggPacket()
    CHUNK = 4096
    pos = 0
    while True:
        todo = min(CHUNK, n - pos)
        if todo > 0:
            buf = vorbis.vorbis_analysis_buffer(vd, C.c_int(todo))
            for c in range(ch):
                C.memmove(buf[c], x[c, pos:pos + todo].ctypes.data,
                          todo * 4)
        assert vorbis.vorbis_analysis_wrote(vd, C.c_int(todo)) == 0
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            assert vorbis.vorbis_analysis(vb, None) == 0
            assert vorbis.vorbis_bitrate_addblock(vb) == 0
            while vorbis.vorbis_bitrate_flushpacket(vd, C.byref(op)) == 1:
                ogg.ogg_stream_packetin(os_, C.byref(op))
                pages(flush=False)
        if todo == 0:
            break
        pos += todo
    pages(flush=True)

    ogg.ogg_stream_clear(os_)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)
    return bytes(out)


def decode_ogg_ref(path: str) -> tuple[np.ndarray, int]:
    """Decode an Ogg Vorbis FILE via libvorbisfile (float path):
    returns ((channels, frames) float32, rate) — the independent oracle."""
    assert _LIBS is not None, "libvorbis not available"
    vf_lib = _LIBS["vorbisfile"]
    vf = _blob(2048)
    rc = vf_lib.ov_fopen(path.encode(), vf)
    assert rc == 0, f"ov_fopen failed: {rc}"
    try:
        class _VorbisInfo(C.Structure):
            _fields_ = [("version", C.c_int), ("channels", C.c_int),
                        ("rate", C.c_long)]

        vf_lib.ov_info.restype = C.POINTER(_VorbisInfo)
        info = vf_lib.ov_info(vf, C.c_int(-1)).contents
        ch, rate = int(info.channels), int(info.rate)
        vf_lib.ov_pcm_total.restype = C.c_int64
        total = int(vf_lib.ov_pcm_total(vf, C.c_int(-1)))
        out = np.zeros((ch, total), np.float32)
        got = 0
        pcm = C.POINTER(C.POINTER(C.c_float))()
        bs = C.c_int(0)
        vf_lib.ov_read_float.restype = C.c_long
        while got < total:
            r = vf_lib.ov_read_float(vf, C.byref(pcm), C.c_int(4096),
                                     C.byref(bs))
            if r <= 0:
                break
            for c in range(ch):
                out[c, got:got + r] = np.ctypeslib.as_array(pcm[c],
                                                            shape=(r,))
            got += r
        assert got == total, (got, total)
        return out, rate
    finally:
        vf_lib.ov_clear(vf)
