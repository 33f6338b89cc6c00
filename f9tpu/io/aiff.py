"""AIFF / AIFF-C decode (and minimal encode) <-> planar float32.

The reference accepts ``.wav``, ``.aif`` and ``.aiff`` drops
(Source/FileListAndLogComponent.cpp:150-181) via JUCE's format manager; output
is always WAV.  This module covers the same surface: read AIFF PCM 8/16/24/32
big-endian, AIFF-C ``NONE``/``sowt``/``fl32``/``FL32``, and write basic AIFF
PCM (for test symmetry and library completeness).
"""

from __future__ import annotations

import struct

import numpy as np

from .wav import AudioFileInfo, _pack24

__all__ = ["probe_aiff", "read_aiff", "write_aiff", "AiffReader",
           "AiffWriter"]


def _read_extended80(b: bytes) -> float:
    """80-bit IEEE extended float (the COMM sample-rate field)."""
    if len(b) < 10:
        raise ValueError("truncated 80-bit float field")
    (se,) = struct.unpack(">H", b[0:2])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    hi, lo = struct.unpack(">II", b[2:10])
    mant = (hi << 32) | lo
    if exp == 0 and mant == 0:
        return 0.0
    if exp >= 0x43FE:
        # Inf/NaN encoding (0x7FFF) or any exponent beyond double range:
        # 2.0**huge raises OverflowError, which would escape the module's
        # ValueError contract for malformed files
        raise ValueError(f"malformed 80-bit float (exponent {exp:#x})")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended80(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    while x >= 1 << 64:
        x /= 2.0
        exp += 1
    while x < 1 << 63:
        x *= 2.0
        exp -= 1
    mant = int(x)
    return struct.pack(">HII", sign | exp, (mant >> 32) & 0xFFFFFFFF, mant & 0xFFFFFFFF)


def _chunks(buf: memoryview, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from(">I", buf, pos + 4)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def _parse(raw: bytes, path: str):
    buf = memoryview(raw)
    if bytes(buf[0:4]) != b"FORM" or bytes(buf[8:12]) not in (b"AIFF", b"AIFC"):
        raise ValueError(f"{path}: not an AIFF/AIFC file")
    is_aifc = bytes(buf[8:12]) == b"AIFC"
    comm = None
    ssnd = None
    try:
        for cid, off, size in _chunks(buf, 12, len(buf)):
            if cid == b"COMM":
                channels, frames, bits = struct.unpack_from(">hIh", buf, off)
                if channels < 1:
                    raise ValueError(f"{path}: malformed COMM "
                                     f"({channels} channels)")
                rate = _read_extended80(bytes(buf[off + 8 : off + 18]))
                comp = bytes(buf[off + 18 : off + 22]) if (is_aifc and size >= 22) else b"NONE"
                comm = (channels, frames, bits, rate, comp)
            elif cid == b"SSND" and size >= 8:
                offset, _block = struct.unpack_from(">II", buf, off)
                # clamp: a hostile offset beyond the chunk must not go
                # negative (downstream frame math would go degenerate)
                ssnd = (off + 8 + offset, max(0, size - 8 - offset))
    except struct.error as e:
        raise ValueError(f"{path}: truncated or malformed chunk ({e})")
    if comm is None:
        raise ValueError(f"{path}: missing COMM chunk")
    return comm, ssnd


def _scan_aiff_header(f, path: str):
    """Seek-based COMM/SSND scan (the AIFF twin of `wav._scan_wav_header`):
    reads only chunk headers + the small COMM payload, so metadata chunks of
    any size are skipped and files bigger than RAM stay safe."""
    head = f.read(12)
    if len(head) < 12 or head[0:4] != b"FORM" \
            or head[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError(f"{path}: not an AIFF/AIFC file")
    is_aifc = head[8:12] == b"AIFC"
    comm = None
    ssnd = None
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            break
        cid = hdr[0:4]
        (size,) = struct.unpack(">I", hdr[4:8])
        pos = f.tell()
        try:
            if cid == b"COMM":
                payload = f.read(min(size, 64))
                channels, frames, bits = struct.unpack_from(">hIh", payload, 0)
                if channels < 1:
                    raise ValueError(f"{path}: malformed COMM "
                                     f"({channels} channels)")
                rate = _read_extended80(payload[8:18])
                comp = payload[18:22] if (is_aifc and size >= 22) else b"NONE"
                comm = (channels, frames, bits, rate, comp)
            elif cid == b"SSND" and size >= 8:
                offset, _block = struct.unpack(">II", f.read(8))
                ssnd = (pos + 8 + offset, max(0, size - 8 - offset))
                if comm is not None:
                    break
        except struct.error as e:
            raise ValueError(f"{path}: truncated or malformed chunk ({e})")
        f.seek(pos + size + (size & 1))
    if comm is None:
        raise ValueError(f"{path}: missing COMM chunk")
    return comm, ssnd


def _decode_aiff_samples(data, channels: int, bits: int, comp: bytes,
                         path: str) -> np.ndarray:
    """Interleaved sample bytes -> flat float32, per COMM compression type
    (shared by the whole-file reader and the incremental `AiffReader`)."""
    little = comp == b"sowt"
    endian = "<" if little else ">"
    if comp in (b"fl32", b"FL32"):
        # scrub NaN/Inf exactly like the WAV float path: one NaN would
        # spread across the resampler's whole convolution window
        with np.errstate(over="ignore", invalid="ignore"):
            return np.nan_to_num(np.frombuffer(data, endian + "f4")
                                 .astype(np.float32),
                                 nan=0.0, posinf=0.0, neginf=0.0)
    if comp in (b"fl64", b"FL64"):
        with np.errstate(over="ignore", invalid="ignore"):
            return np.nan_to_num(np.frombuffer(data, endian + "f8")
                                 .astype(np.float32),
                                 nan=0.0, posinf=0.0, neginf=0.0)
    if comp in (b"NONE", b"sowt"):
        if bits == 16:
            return np.frombuffer(data, endian + "i2").astype(np.float32) / 32768.0
        if bits == 24:
            b24 = np.frombuffer(data, np.uint8)
            b3 = b24[: len(b24) // 3 * 3].reshape(-1, 3).astype(np.uint32)
            if little:
                v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            else:
                v = b3[:, 2] | (b3[:, 1] << 8) | (b3[:, 0] << 16)
            return ((v.astype(np.int32) << 8) >> 8).astype(np.float32) / 8388608.0
        if bits == 32:
            return np.frombuffer(data, endian + "i4").astype(np.float32) / 2147483648.0
        if bits == 8:
            return np.frombuffer(data, np.int8).astype(np.float32) / 128.0
        raise ValueError(f"{path}: unsupported AIFF bit depth {bits}")
    raise ValueError(f"{path}: unsupported AIFC compression {comp!r}")


class AiffReader:
    """Incremental frame reader (seek-based) — the AIFF twin of
    `wav.WavReader`, so the streaming path accepts the reference's full
    drop-zone surface (.wav/.aif/.aiff,
    Source/FileListAndLogComponent.cpp:150-181).  PCM 8/16/24/32 in either
    byte order (AIFF NONE / AIFC sowt) plus fl32/fl64."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            comm, ssnd = _scan_aiff_header(f, path)
        channels, frames, bits, rate, comp = comm
        if ssnd is None:
            raise ValueError(f"{path}: missing SSND chunk")
        self._comp = comp
        self._bits = bits
        self.num_channels = channels
        self.sample_rate = int(round(rate))
        if comp in (b"fl32", b"FL32"):
            sample_bytes = 4
        elif comp in (b"fl64", b"FL64"):
            sample_bytes = 8
        else:
            sample_bytes = bits // 8
        self._bytes_per_frame = channels * sample_bytes
        off, size = ssnd
        self._data_off = off
        import os

        actual = max(0, os.path.getsize(path) - off)
        self.num_frames = min(frames, min(size, actual) // self._bytes_per_frame)
        self._f = open(path, "rb")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read(self, start_frame: int, count: int) -> np.ndarray:
        """Planar float32 (channels, n) for frames [start, start+count)
        clipped to the file; shorter at EOF."""
        channels = self.num_channels
        start_frame = max(0, start_frame)
        count = max(0, min(count, self.num_frames - start_frame))
        if count == 0:
            return np.zeros((channels, 0), np.float32)
        self._f.seek(self._data_off + start_frame * self._bytes_per_frame)
        raw = self._f.read(count * self._bytes_per_frame)
        x = _decode_aiff_samples(raw, channels, self._bits, self._comp,
                                 self.path)
        n = len(x) // channels
        return np.ascontiguousarray(x[: n * channels].reshape(n, channels).T)

    def raw_wire(self) -> tuple[int, bool] | None:
        """``(bits, big_endian)`` when this payload can ride the raw H2D
        upload wire (integer PCM 16/24: AIFF NONE/twos is big-endian, AIFC
        sowt little-endian), else None."""
        if self._bits in (16, 24):
            if self._comp in (b"NONE", b"twos"):
                return self._bits, True
            if self._comp == b"sowt":
                return self._bits, False
        return None

    def read_raw(self, start_frame: int, count: int) -> np.ndarray:
        """Interleaved payload bytes (uint8) for frames [start, start+count)
        clipped to the file — the AIFF twin of `wav.WavReader.read_raw`."""
        if self.raw_wire() is None:
            raise ValueError(f"{self.path}: not an integer-PCM 16/24 payload")
        start_frame = max(0, start_frame)
        count = max(0, min(count, self.num_frames - start_frame))
        if count == 0:
            return np.zeros(0, np.uint8)
        self._f.seek(self._data_off + start_frame * self._bytes_per_frame)
        raw = np.frombuffer(self._f.read(count * self._bytes_per_frame),
                            np.uint8)
        bpf = self._bytes_per_frame
        return raw[: (len(raw) // bpf) * bpf]


def probe_aiff(path: str) -> AudioFileInfo:
    import os

    with open(path, "rb") as f:
        comm, ssnd = _scan_aiff_header(f, path)
    channels, frames, bits, rate, comp = comm
    if ssnd is not None:
        # clamp to what the file actually holds (probe_wav parity): the
        # scheduler's bucket planning and the readers must agree on a
        # truncated file's frame count
        if comp in (b"fl32", b"FL32"):
            sample_bytes = 4
        elif comp in (b"fl64", b"FL64"):
            sample_bytes = 8
        else:
            sample_bytes = max(1, abs(bits)) // 8 or 1
        bpf = max(1, channels) * sample_bytes
        off, size = ssnd
        actual = max(0, os.path.getsize(path) - off)
        frames = min(frames, min(size, actual) // bpf)
    return AudioFileInfo(
        path=path,
        sample_rate=int(round(rate)),
        num_channels=channels,
        num_frames=frames,
        bit_depth=abs(bits),
        is_float=comp in (b"fl32", b"FL32", b"fl64", b"FL64"),
        container="aiff",
        byte_order="little" if comp == b"sowt" else "big",
    )


def read_raw_pcm_aiff(path: str):
    """Raw interleaved PCM payload bytes (uint8) + metadata for the on-device
    codec (`f9tpu.ops.devcodec`): integer PCM 16/24-bit AIFF, either byte
    order ("NONE" big-endian or AIFC "sowt" little-endian — the info's
    ``byte_order`` says which; the device unpack handles both)."""
    with open(path, "rb") as f:
        raw = f.read()
    comm, ssnd = _parse(raw, path)
    channels, frames, bits, rate, comp = comm
    if comp not in (b"NONE", b"sowt") or bits not in (16, 24):
        raise ValueError(
            f"{path}: raw path supports 16/24-bit integer PCM AIFF only")
    if ssnd is None:
        raise ValueError(f"{path}: missing SSND chunk")
    off, size = ssnd
    bpf = channels * (bits // 8)
    # clamp to what the file actually holds: a truncated transfer short-reads
    # (like the WAV raw reader) instead of crashing, and a malformed SSND
    # size (< header) must not go negative — np.frombuffer treats a negative
    # count as "the whole rest of the buffer", i.e. garbage audio
    want = min(size, frames * bpf, max(0, len(raw) - off))
    if want <= 0:
        raise ValueError(f"{path}: empty or malformed SSND payload")
    payload = np.frombuffer(raw, np.uint8, count=want, offset=off)
    info = AudioFileInfo(
        path=path,
        sample_rate=int(round(rate)),
        num_channels=channels,
        num_frames=min(frames, want // bpf),
        bit_depth=bits,
        is_float=False,
        container="aiff",
        byte_order="little" if comp == b"sowt" else "big",
    )
    return payload, info


def read_aiff(path: str) -> tuple[np.ndarray, int]:
    """Decode to planar float32 ``(channels, frames)`` + rate."""
    with open(path, "rb") as f:
        raw = f.read()
    comm, ssnd = _parse(raw, path)
    channels, frames, bits, rate, comp = comm
    if ssnd is None:
        raise ValueError(f"{path}: missing SSND chunk")
    off, size = ssnd
    x = _decode_aiff_samples(raw[off : off + size], channels, bits, comp, path)
    n = len(x) // channels
    return np.ascontiguousarray(x[: n * channels].reshape(n, channels).T), int(round(rate))


def _aiff_payload_from_codes(inter: np.ndarray, bits: int) -> bytes:
    if bits == 16:
        return inter.astype(">i2").tobytes()
    if bits == 24:
        le = _pack24(inter).reshape(-1, 3)
        return le[:, ::-1].reshape(-1).tobytes()  # byte-swap to big-endian
    if bits == 32:
        return inter.astype(">i4").tobytes()
    raise ValueError(f"unsupported AIFF bit depth {bits}")


#: largest SSND data payload a 32-bit IFF container can hold (FORM size =
#: 4 + COMM 26 + SSND header 16 + data + pad must fit a uint32).  AIFF has
#: no RF64-style 64-bit extension; outputs beyond this must use WAV, which
#: auto-upgrades to RF64 (`f9tpu.io.wav`).
MAX_AIFF_DATA_BYTES = 0xFFFFFFFF - 47


def check_aiff_capacity(frames: int, channels: int, bits: int) -> None:
    """Raise up front if an AIFF of this geometry cannot be represented —
    callers (the streaming writer, one-shot writers, pre-flight planning in
    `pipeline.stream`) must fail BEFORE writing hours of audio, not in
    close() (the round-2 >4 GiB corruption mode, VERDICT round 2 #1)."""
    data = frames * channels * (bits // 8)
    if data > MAX_AIFF_DATA_BYTES or frames > 0xFFFFFFFF:
        raise ValueError(
            f"AIFF cannot hold {frames} frames x {channels} ch x {bits}-bit "
            f"({data / 2**30:.2f} GiB > 4 GiB IFF limit); write WAV instead "
            f"(auto-upgrades to RF64)")


def _write_aiff_stream(path: str, chunks, payload_len: int, channels: int,
                       frames: int, rate: int, bits: int) -> None:
    """Write an AIFF whose SSND data arrives as an iterable of byte chunks
    totalling ``payload_len`` (sizes are known up front, so chunked writes
    are byte-identical to the one-shot form)."""
    check_aiff_capacity(frames, channels, bits)
    comm = struct.pack(">hIh", channels, frames, bits) + _write_extended80(float(rate))
    ssnd_len = 8 + payload_len
    body_len = (4 + 8 + len(comm) + 8 + ssnd_len + (ssnd_len & 1))
    with open(path, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", body_len) + b"AIFF")
        f.write(b"COMM" + struct.pack(">I", len(comm)) + comm)
        f.write(b"SSND" + struct.pack(">I", ssnd_len) + struct.pack(">II", 0, 0))
        written = 0
        for c in chunks:
            f.write(c)
            written += len(c)
        if written != payload_len:
            raise ValueError(f"AIFF payload length mismatch: wrote {written},"
                             f" declared {payload_len}")
        if ssnd_len & 1:
            f.write(b"\x00")


def _write_aiff_bytes(path: str, payload: bytes, channels: int, frames: int,
                      rate: int, bits: int) -> None:
    _write_aiff_stream(path, (payload,), len(payload), channels, frames,
                       rate, bits)


def write_aiff(path: str, x: np.ndarray, rate: int, bits: int = 24) -> None:
    """Write planar float32 as big-endian AIFF PCM (16/24/32-bit)."""
    x = np.asarray(x, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    channels, frames = x.shape
    scale = float(1 << (bits - 1))
    codes = np.clip(np.round(x * scale), -scale, scale - 1).astype(np.int32)
    inter = np.ascontiguousarray(codes.T).reshape(-1)
    _write_aiff_bytes(path, _aiff_payload_from_codes(inter, bits),
                      channels, frames, rate, bits)


def write_aiff_codes(path: str, codes: np.ndarray, rate: int,
                     bits: int = 24, progress_cb=None,
                     chunk_frames: int = 1 << 20) -> None:
    """Write pre-quantized signed PCM codes ``(channels, frames)`` int32 as
    AIFF — the batch pipeline's AIFF twin of `wav.write_wav_codes` (the
    device already dithered+quantized; the host only packs big-endian).

    ``progress_cb(done_fraction)``: chunked interleave/pack/write with a
    callback per slice (sub-file encode progress; packing is frame-local so
    bytes are identical to the one-shot form)."""
    if bits not in (16, 24, 32):
        # validate BEFORE opening: the chunked path must not leave a
        # header-only corpse when the first payload chunk would raise
        raise ValueError(f"unsupported AIFF bit depth {bits}")
    codes = np.asarray(codes)
    if codes.ndim == 1:
        codes = codes[None, :]
    channels, frames = codes.shape
    if not (progress_cb and frames):
        inter = np.ascontiguousarray(codes.T).reshape(-1)
        _write_aiff_bytes(path, _aiff_payload_from_codes(inter, bits),
                          channels, frames, rate, bits)
        return

    def chunks():
        for s in range(0, frames, chunk_frames):
            e = min(frames, s + chunk_frames)
            inter = np.ascontiguousarray(codes[:, s:e].T).reshape(-1)
            yield _aiff_payload_from_codes(inter, bits)
            progress_cb(e / frames)

    _write_aiff_stream(path, chunks(), frames * channels * (bits // 8),
                       channels, frames, rate, bits)


def read_extra_chunks_aiff(path: str, max_bytes: int = 1 << 24) -> list:
    """Metadata chunks worth carrying through processing (NAME/AUTH/(c)/ANNO
    text, COMT comments, MARK markers, INST instrument), as
    ``[(chunk_id, payload_bytes), ...]``; oversized (corrupt-size) chunks
    are skipped."""
    from .wav import _seek_kept_chunks

    keep = (b"NAME", b"AUTH", b"(c) ", b"ANNO", b"COMT", b"MARK", b"INST")
    return _seek_kept_chunks(path, ((b"FORM",), (b"AIFF", b"AIFC"),
                                    "AIFF/AIFC"), keep, True, max_bytes)


def scale_metadata_chunks_aiff(chunks: list, rate_in: int,
                               rate_out: int) -> list:
    """Rescale MARK marker positions (the only sample-indexed AIFF metadata
    carried) to the output rate; INST references markers by id, text chunks
    are rate-agnostic — both pass verbatim.  Malformed structures pass
    verbatim (best effort)."""
    if rate_in == rate_out:
        return chunks
    out = []
    for cid, payload in chunks:
        if cid == b"MARK" and len(payload) >= 2:
            try:
                b = bytearray(payload)
                (n,) = struct.unpack_from(">H", b, 0)
                pos = 2
                for _ in range(n):
                    if pos + 6 > len(b):
                        break
                    (p,) = struct.unpack_from(">I", b, pos + 2)
                    struct.pack_into(
                        ">I", b, pos + 2,
                        int(round(p * rate_out / rate_in)) & 0xFFFFFFFF)
                    # skip id(2) + position(4) + pstring name (padded even)
                    name_len = b[pos + 6] if pos + 6 < len(b) else 0
                    pos += 6 + 1 + name_len
                    pos += pos & 1
                payload = bytes(b)
            except struct.error:
                pass
        out.append((cid, payload))
    return out


def append_chunks_aiff(path: str, chunks: list) -> None:
    """Append metadata chunks to an existing AIFF and patch the FORM size;
    truncates back to the original valid file on a mid-write failure."""
    from .wav import _append_chunks_generic

    _append_chunks_generic(path, chunks, big_endian=True)


class AiffWriter:
    """Incremental 16/24/32-bit big-endian AIFF writer; the FORM/COMM/SSND
    sizes are patched on close — the streaming path's AIFF twin of
    `wav.WavWriter`."""

    #: byte offsets of the fields patched at close (fixed header layout:
    #: FORM(8) AIFF(4) COMM(8+18) SSND(8+8) data...)
    _FORM_SIZE_OFF = 4
    _COMM_FRAMES_OFF = 12 + 8 + 2          # FORM hdr + 'AIFF' => COMM body
    _SSND_SIZE_OFF = 12 + 8 + 18 + 4

    def __init__(self, path: str, channels: int, rate: int, bits: int = 24):
        if bits not in (16, 24, 32):
            raise ValueError(f"unsupported AIFF bit depth {bits}")
        self.path = path
        self.channels = channels
        self.rate = rate
        self.bits = bits
        self.frames_written = 0
        self._f = open(path, "wb")
        comm = (struct.pack(">hIh", channels, 0, bits)
                + _write_extended80(float(rate)))
        self._f.write(b"FORM" + struct.pack(">I", 0) + b"AIFF")
        self._f.write(b"COMM" + struct.pack(">I", len(comm)) + comm)
        self._f.write(b"SSND" + struct.pack(">I", 8) + struct.pack(">II", 0, 0))

    def append_codes(self, codes: np.ndarray) -> None:
        """(channels, n) int32 PCM codes.  Raises BEFORE writing if the
        append would push the container past its 32-bit IFF size limit."""
        codes = np.asarray(codes, np.int32)
        check_aiff_capacity(self.frames_written + codes.shape[1],
                            self.channels, self.bits)
        inter = np.ascontiguousarray(codes.T).reshape(-1)
        self._f.write(_aiff_payload_from_codes(inter, self.bits))
        self.frames_written += codes.shape[1]

    def append_payload(self, payload: np.ndarray) -> None:
        """Append a device-packed LITTLE-endian 24-bit interleaved payload
        (uint8): the host byte-swaps each 3-byte sample to big-endian, the
        same one-pass convention as `write_aiff_payload`.  Raises BEFORE
        writing if the append would overflow the 32-bit IFF container."""
        if self.bits != 24:
            raise ValueError("append_payload requires a 24-bit writer")
        payload = np.asarray(payload, np.uint8)
        bpf = self.channels * 3
        if payload.size % bpf:
            raise ValueError("payload length is not a whole number of frames")
        frames = payload.size // bpf
        check_aiff_capacity(self.frames_written + frames,
                            self.channels, self.bits)
        be = np.ascontiguousarray(payload.reshape(-1, 3)[:, ::-1]).reshape(-1)
        self._f.write(be.tobytes())
        self.frames_written += frames

    def close(self) -> None:
        data = self.frames_written * self.channels * (self.bits // 8)
        if data & 1:
            self._f.seek(0, 2)
            self._f.write(b"\x00")  # IFF chunks are word-aligned
        form_size = 4 + (8 + 18) + (8 + 8 + data) + (data & 1)
        self._f.seek(self._FORM_SIZE_OFF)
        self._f.write(struct.pack(">I", form_size))
        self._f.seek(self._COMM_FRAMES_OFF)
        self._f.write(struct.pack(">I", self.frames_written))
        self._f.seek(self._SSND_SIZE_OFF)
        self._f.write(struct.pack(">I", 8 + data))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_aiff_payload(path: str, payload: np.ndarray, channels: int,
                       rate: int, bits: int = 24, progress_cb=None,
                       chunk_frames: int = 1 << 20) -> None:
    """Write a device-packed little-endian 24- or 16-bit payload as AIFF:
    the host byte-swaps each sample to big-endian (one vectorised pass, or
    chunked with per-slice ``progress_cb(done_fraction)`` callbacks)."""
    if bits not in (16, 24):
        raise ValueError("packed payloads are 16- or 24-bit")
    nb = bits // 8
    payload = np.asarray(payload, np.uint8)
    if payload.size % (nb * channels):
        raise ValueError("payload length is not a whole number of frames")
    frames = payload.size // (nb * channels)
    if not (progress_cb and frames):
        be = np.ascontiguousarray(payload.reshape(-1, nb)[:, ::-1]).reshape(-1)
        _write_aiff_bytes(path, be.tobytes(), channels, frames, rate, bits)
        return
    bpf = nb * channels

    def chunks():
        for s in range(0, frames, chunk_frames):
            e = min(frames, s + chunk_frames)
            sl = payload[s * bpf: e * bpf]
            yield np.ascontiguousarray(
                sl.reshape(-1, nb)[:, ::-1]).reshape(-1).tobytes()
            progress_cb(e / frames)

    _write_aiff_stream(path, chunks(), frames * bpf, channels, frames,
                       rate, bits)
