"""Vorbis I decoder — spec-complete, from scratch (decode only).

The reference's ``registerBasicFormats()`` registers an Ogg Vorbis READER
(/root/reference/Source/MainComponent.cpp:13, Source/AppState.h:153), so
``.ogg`` sources are part of the input surface a reference user expects;
f9tpu mirrors that surface as decode-only — Vorbis is perceptual-lossy,
so it stays rejected as an OUTPUT format (``io/codec.py``), exactly the
FLAC-round parity argument applied to the one remaining input container.

Scope (Vorbis I specification, Xiph.Org):
  * headers — identification, comment (tags kept), setup (section 4.2);
  * codebooks — canonical Huffman assignment, VQ lookup types 1/2 with
    ``float32_unpack`` and the sequence flag (section 3);
  * floor 0 (LSP curve, section 6) and floor 1 (piecewise-linear dB
    curve over the published 256-entry inverse-dB table, section 7);
  * residue types 0/1/2 incl. the 8-pass cascade and the interleaved
    type-2 joint vector (section 8);
  * mapping type 0 with square-polar channel coupling (section 4.3.6);
  * IMDCT (via FFT, float64 internally) + the Vorbis window with
    long/short block lapping and hybrid slopes (sections 1.3.2, 4.3.8);
  * granule handling — first-page initial offset and end-of-stream
    truncation, so decoded length is sample-exact.

End-of-packet behaviour follows the spec: EOP inside a header is an
error; EOP inside an audio packet leaves the remaining floor/residue
values zero and the frame decodes normally.  Chained Ogg streams are
rejected with an actionable message (a mastering source should never be
a concatenation of logical streams); grouped (multiplexed) streams
decode the first Vorbis logical stream.

The container layer is ``io/ogg.py``; :class:`OggVorbisReader` below
implements the incremental ``read(start, count)`` reader contract
(`io/wav.py:526`).  Cross-validated against libvorbisfile
(tests/vorbis_ref.py) on generated conformance vectors — see
tests/test_vorbis.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .ogg import OggError, packets_from_pages, read_pages

__all__ = ["VorbisError", "decode_vorbis", "probe_vorbis_bytes",
           "VorbisInfo", "VorbisStreamDecoder", "OggVorbisReader",
           "read_ogg", "probe_ogg"]


class VorbisError(OggError):
    """Malformed or unsupported Vorbis stream data."""


class _EndOfPacket(Exception):
    """Internal: a read ran past the packet end (spec 'end-of-packet')."""


# --------------------------------------------------------------------------
# bit reader — Vorbis packs LSB-first within bytes (spec section 2), the
# opposite convention of FLAC's MSB-first reader in io/flac.py


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = 8 * len(data)

    def read(self, k: int) -> int:
        pos = self.pos
        end = pos + k
        if end > self.n:
            self.pos = self.n
            raise _EndOfPacket
        b0 = pos >> 3
        chunk = int.from_bytes(self.data[b0:(end + 7) >> 3], "little")
        self.pos = end
        return (chunk >> (pos & 7)) & ((1 << k) - 1)

    def read_bit(self) -> int:
        pos = self.pos
        if pos >= self.n:
            raise _EndOfPacket
        self.pos = pos + 1
        return (self.data[pos >> 3] >> (pos & 7)) & 1

    def peek8(self) -> int:
        """Next 8 bits in read order (bit 0 = first read); zero-padded at
        the packet tail — the codebook fast-path index."""
        pos = self.pos
        b0 = pos >> 3
        chunk = int.from_bytes(self.data[b0:b0 + 2], "little")
        return (chunk >> (pos & 7)) & 0xFF


def _ilog(x: int) -> int:
    """Spec 9.2.1: number of bits in the integer part (ilog(0)=0)."""
    return x.bit_length() if x > 0 else 0


def _float32_unpack(x: int) -> np.float32:
    """Spec 9.2.2: the codebook's packed float representation."""
    mantissa = x & 0x1FFFFF
    exponent = (x & 0x7FE00000) >> 21
    if x & 0x80000000:
        mantissa = -mantissa
    return np.float32(float(mantissa) * (2.0 ** (exponent - 788)))


def _lookup1_values(entries: int, dim: int) -> int:
    """Spec 9.2.3: greatest v with v**dim <= entries."""
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v > 0 and v ** dim > entries:
        v -= 1
    return v


# --------------------------------------------------------------------------
# codebooks (spec section 3)


class _Codebook:
    """One decoded codebook: canonical Huffman tree + optional VQ lookup.

    Decode acceleration: a flat binary tree (negative value = leaf holding
    ``~entry``, else index of the next [child0, child1] pair) plus a
    256-entry fast table keyed on the next 8 stream bits — audio codebooks
    are mostly <= 10 bits, so the common case is one table hit."""

    __slots__ = ("dim", "entries", "lengths", "tree", "fast_entry",
                 "fast_len", "fast_node", "vq", "single_entry",
                 "single_bits")

    def __init__(self, br: _Bits):
        if br.read(24) != 0x564342:
            raise VorbisError("codebook sync pattern missing")
        self.dim = br.read(16)
        self.entries = br.read(24)
        lengths = np.zeros(self.entries, np.int32)
        if br.read_bit():                       # ordered
            cur_len = br.read(5) + 1
            cur = 0
            while cur < self.entries:
                num = br.read(_ilog(self.entries - cur))
                if cur + num > self.entries:
                    raise VorbisError("ordered codebook overflows entries")
                lengths[cur:cur + num] = cur_len
                cur += num
                cur_len += 1
                if cur_len > 32 and cur < self.entries:
                    raise VorbisError("codeword length > 32")
        else:
            sparse = br.read_bit()
            for i in range(self.entries):
                if sparse and not br.read_bit():
                    lengths[i] = 0              # unused entry
                else:
                    lengths[i] = br.read(5) + 1
        self.lengths = lengths
        self._build_tree()
        self._read_vq(br)

    # --- canonical codeword assignment: every used entry takes the lowest
    # available codeword of its length, in entry order (spec 3.2.1) ---

    def _build_tree(self) -> None:
        used = np.nonzero(self.lengths)[0]
        self.single_entry = -1
        self.single_bits = 0
        self.tree = None
        self.fast_entry = None
        self.fast_len = None
        self.fast_node = None
        if used.size == 0:
            return                   # an error only if decoded through
        if used.size == 1:
            # the one legal underspecified tree (spec 3.2.1): the decoder
            # consumes the stated codeword length and returns the entry
            # regardless of the bit values read
            self.single_entry = int(used[0])
            self.single_bits = int(self.lengths[used[0]])
            return
        # available[d] = lowest unassigned codeword at depth d, as a
        # left-justified 33-bit value; 0 = branch exhausted at that depth
        available = [0] * 33
        codes = np.zeros(self.entries, np.uint32)
        first = True
        kraft = 0                               # in units of 2^-32
        for e in used:
            length = int(self.lengths[e])
            kraft += 1 << (32 - length)
            if kraft > (1 << 32):
                raise VorbisError("overspecified Huffman tree")
            if first:
                codes[e] = 0
                for d in range(1, length + 1):
                    available[d] = 1 << (32 - d)
                first = False
                continue
            d = length
            while d > 0 and available[d] == 0:
                d -= 1
            if d == 0:
                raise VorbisError("overspecified Huffman tree")
            res = available[d]
            available[d] = 0
            codes[e] = res >> (32 - length)
            # split the claimed branch back down to depth `length`
            for dd in range(d + 1, length + 1):
                available[dd] = res + (1 << (32 - dd))
        if kraft != (1 << 32):
            raise VorbisError("underspecified Huffman tree")
        # flat binary tree: nodes[i] = [left, right]; value > 0 = node
        # index, value < 0 = ~entry leaf (node 0 is the root)
        nodes = [[0, 0]]
        for e in used:
            length = int(self.lengths[e])
            c = int(codes[e])
            ni = 0
            for b in range(length - 1, -1, -1):
                bit = (c >> b) & 1
                if b == 0:
                    nodes[ni][bit] = ~int(e)
                else:
                    nxt = nodes[ni][bit]
                    if nxt == 0:
                        nodes.append([0, 0])
                        nxt = len(nodes) - 1
                        nodes[ni][bit] = nxt
                    ni = nxt
        self.tree = np.asarray(nodes, np.int64)
        # 8-bit fast table: pre-walk every possible next-byte pattern
        fe = np.full(256, -1, np.int32)
        fl = np.zeros(256, np.int32)
        fn = np.zeros(256, np.int32)
        tree = self.tree
        for p in range(256):
            ni = 0
            for depth in range(8):
                ni = int(tree[ni][(p >> depth) & 1])
                if ni < 0:
                    fe[p] = ~ni
                    fl[p] = depth + 1
                    break
            else:
                fn[p] = ni
        self.fast_entry, self.fast_len, self.fast_node = fe, fl, fn

    def _read_vq(self, br: _Bits) -> None:
        lookup = br.read(4)
        if lookup == 0:
            self.vq = None
            return
        if lookup not in (1, 2):
            raise VorbisError(f"reserved codebook lookup type {lookup}")
        minimum = _float32_unpack(br.read(32))
        delta = _float32_unpack(br.read(32))
        value_bits = br.read(4) + 1
        sequence_p = br.read_bit()
        if lookup == 1:
            lookup_values = _lookup1_values(self.entries, self.dim)
        else:
            lookup_values = self.entries * self.dim
        mults = np.array([br.read(value_bits) for _ in range(lookup_values)],
                         np.float32)
        # unroll every entry's vector once at setup (spec 3.3), float32
        # per-op like the C decoders so VQ tables agree to the ulp
        vq = np.zeros((self.entries, self.dim), np.float32)
        idx = np.arange(self.entries)
        last = np.zeros(self.entries, np.float32)
        if lookup == 1:
            div = 1
            for d in range(self.dim):
                off = (idx // div) % lookup_values
                v = mults[off] * delta + minimum + last
                vq[:, d] = v
                if sequence_p:
                    last = v
                div *= lookup_values
        else:
            for d in range(self.dim):
                v = mults[idx * self.dim + d] * delta + minimum + last
                vq[:, d] = v
                if sequence_p:
                    last = v
        self.vq = vq

    # --- decode ---

    def decode_scalar(self, br: _Bits) -> int:
        if self.single_entry >= 0:
            br.read(self.single_bits)
            return self.single_entry
        if self.tree is None:
            raise VorbisError("decode through an empty codebook")
        p = br.peek8()
        e = int(self.fast_entry[p])
        if e >= 0:
            length = int(self.fast_len[p])
            if br.pos + length > br.n:
                # the peek zero-padded past the packet tail: re-walk bit by
                # bit so EOP surfaces exactly where the stream ends
                return self._walk(br, 0)
            br.pos += length
            return e
        if br.pos + 8 > br.n:
            return self._walk(br, 0)
        br.pos += 8
        return self._walk(br, int(self.fast_node[p]))

    def _walk(self, br: _Bits, ni: int) -> int:
        tree = self.tree
        while True:
            ni = int(tree[ni][br.read_bit()])
            if ni < 0:
                return ~ni

    def decode_vq(self, br: _Bits) -> np.ndarray:
        if self.vq is None:
            raise VorbisError("scalar codebook used in a VQ context")
        return self.vq[self.decode_scalar(br)]


# --------------------------------------------------------------------------
# floors (spec sections 6 and 7)


def _floor1_inverse_db_table() -> np.ndarray:
    """The published floor1 amplitude table (spec section 10.1): 256
    float32 values spanning ~-140 dB..unity.  The closed form
    ``exp((i-255)*(140/256)*0.11512925)`` reproduces the spec literals
    except 43 entries that land one float32 ulp off (the spec table was
    evidently generated in single precision); those are pinned to the
    literal bits so decode matches the published table exactly."""
    t = np.exp((np.arange(256) - 255) * (140.0 / 256.0)
               * 0.11512925).astype(np.float32)
    fix = {
        4: 0x34131a23, 5: 0x341ca960, 8: 0x343d3b50, 9: 0x34498770,
        11: 0x346492b8, 16: 0x349c9269, 38: 0x359c6485, 49: 0x361c4d98,
        65: 0x36d60301, 67: 0x36f2bb1e, 72: 0x3726451e, 73: 0x3731133d,
        74: 0x373c951e, 78: 0x37729789, 80: 0x378992be, 85: 0x37bc7979,
        87: 0x37d5c447, 89: 0x37f273f8, 98: 0x3855a4f2, 110: 0x38e365d9,
        111: 0x38f22ce8, 116: 0x3925e3b5, 147: 0x3a9202c6, 148: 0x3a9b7fdb,
        151: 0x3abbd3ef, 161: 0x3b3043fd, 169: 0x3b91d7f9, 184: 0x3c3b8161,
        186: 0x3c54aae5, 187: 0x3c627ce8, 190: 0x3c88c996, 192: 0x3c9b24c0,
        199: 0x3cf11179, 202: 0x3d1197df, 206: 0x3d3b4a6d, 207: 0x3d477640,
        220: 0x3de2195c, 221: 0x3df0cad1, 223: 0x3e088d77, 226: 0x3e24f127,
        230: 0x3e542e4d, 238: 0x3eaf8f6d, 240: 0x3ec71e95,
    }
    u = t.view(np.uint32).copy()
    for i, bits in fix.items():
        u[i] = bits
    return u.view(np.float32)


_FLOOR1_INVERSE_DB = _floor1_inverse_db_table()

_FLOOR1_RANGES = (256, 128, 86, 64)


@dataclasses.dataclass
class _Floor0:
    """Floor type 0: LSP curve (spec section 6).  Extinct in practice —
    no mainstream encoder has emitted it since the 2002 betas — but part
    of the decode spec; exercised by a hand-assembled stream in the
    suite (tests/test_vorbis.py) since libvorbisenc cannot produce one."""

    order: int
    rate: int
    bark_map_size: int
    amplitude_bits: int
    amplitude_offset: int
    book_list: list

    @classmethod
    def parse(cls, br: _Bits, books: list) -> "_Floor0":
        order = br.read(8)
        rate = br.read(16)
        bark_map_size = br.read(16)
        amplitude_bits = br.read(6)
        amplitude_offset = br.read(8)
        num_books = br.read(4) + 1
        bl = [br.read(8) for _ in range(num_books)]
        for b in bl:
            if b >= len(books):
                raise VorbisError("floor0 book out of range")
            if books[b].vq is None:
                raise VorbisError("floor0 book has no VQ lookup")
        if order == 0 or rate == 0 or bark_map_size == 0:
            raise VorbisError("degenerate floor0 configuration")
        return cls(order, rate, bark_map_size, amplitude_bits,
                   amplitude_offset, bl)

    def decode(self, br: _Bits, books: list):
        """Spec 6.2.1: returns (amplitude, lsp coefficients) or None."""
        amplitude = br.read(self.amplitude_bits) if self.amplitude_bits else 0
        if amplitude <= 0:
            return None
        booknumber = br.read(_ilog(len(self.book_list)))
        if booknumber >= len(self.book_list):
            raise VorbisError("floor0 packet book number out of range")
        book = books[self.book_list[booknumber]]
        coeffs: list[float] = []
        last = 0.0
        while len(coeffs) < self.order:
            v = book.decode_vq(br)
            coeffs.extend(float(t) + last for t in v)
            last = coeffs[-1]
        return amplitude, np.asarray(coeffs[: self.order], np.float64)

    def curve(self, data, n2: int) -> np.ndarray:
        """Spec 6.2.2-6.2.3: synthesize the LSP curve over the bark map
        (float64 internally; the spec's iterative per-bin loop collapses
        to products over the coefficient pairs per map bin)."""
        if data is None:
            return np.zeros(n2, np.float32)
        amplitude, lsp = data
        order = self.order

        def bark(x):
            x = np.asarray(x, np.float64)
            return (13.1 * np.arctan(0.00074 * x)
                    + 2.24 * np.arctan(1.85e-8 * x * x) + 1e-4 * x)

        scale = self.bark_map_size / float(bark(0.5 * self.rate))
        i = np.arange(n2, dtype=np.float64)
        mp = np.minimum(np.floor(bark(self.rate / (2.0 * n2) * i) * scale),
                        self.bark_map_size - 1).astype(np.int64)
        omega = np.pi * mp.astype(np.float64) / self.bark_map_size
        cos_o = np.cos(omega)
        c = np.cos(lsp)                               # (order,)
        if order % 2:
            # spec 6.2.3, odd order:
            #   p = (1 - cos^2 w) * prod 4(cos c[2j+1] - cos w)^2
            #   q = (1/4)         * prod 4(cos c[2j]   - cos w)^2
            p = ((1.0 - cos_o ** 2)
                 * np.prod(4.0 * (c[1::2, None] - cos_o[None, :]) ** 2,
                           axis=0))
            q = (np.prod(4.0 * (c[0::2, None] - cos_o[None, :]) ** 2,
                         axis=0) / 4.0)
        else:
            # even order:
            #   p = (1 - cos w)/2 * prod 4(cos c[2j+1] - cos w)^2
            #   q = (1 + cos w)/2 * prod 4(cos c[2j]   - cos w)^2
            p = ((1.0 - cos_o) / 2.0
                 * np.prod(4.0 * (c[1::2, None] - cos_o[None, :]) ** 2,
                           axis=0))
            q = ((1.0 + cos_o) / 2.0
                 * np.prod(4.0 * (c[0::2, None] - cos_o[None, :]) ** 2,
                           axis=0))
        denom = np.sqrt(np.maximum(p + q, 1e-300))
        amp_max = (1 << self.amplitude_bits) - 1
        # arg clamp: a crafted stream with coincident LSP roots drives
        # p+q -> 0 and the exp to inf; cap below float32 overflow so
        # hostile inputs yield a finite (if absurd) curve, not NaN audio
        arg = 0.11512925 * (amplitude * self.amplitude_offset
                            / (amp_max * denom) - self.amplitude_offset)
        return np.exp(np.minimum(arg, 88.0)).astype(np.float32)


@dataclasses.dataclass
class _Floor1:
    """Floor type 1: piecewise-linear curve in 1/256-dB units (spec 7)."""

    partition_class_list: list
    class_dimensions: list
    class_subclasses: list
    class_masterbooks: list
    subclass_books: list
    multiplier: int
    x_list: list
    sort_order: np.ndarray = None
    low_neighbor: np.ndarray = None
    high_neighbor: np.ndarray = None

    @classmethod
    def parse(cls, br: _Bits, books: list) -> "_Floor1":
        partitions = br.read(5)
        pcl = [br.read(4) for _ in range(partitions)]
        max_class = max(pcl) if pcl else -1
        dims, subs, masters, subbooks = [], [], [], []
        for _ in range(max_class + 1):
            dims.append(br.read(3) + 1)
            s = br.read(2)
            subs.append(s)
            if s:
                mb = br.read(8)
                if mb >= len(books):
                    raise VorbisError("floor1 masterbook out of range")
                masters.append(mb)
            else:
                masters.append(-1)
            sb = []
            for _ in range(1 << s):
                b = br.read(8) - 1
                if b >= len(books):
                    raise VorbisError("floor1 subclass book out of range")
                sb.append(b)
            subbooks.append(sb)
        multiplier = br.read(2) + 1
        rangebits = br.read(4)
        x_list = [0, 1 << rangebits]
        for i in range(partitions):
            for _ in range(dims[pcl[i]]):
                x_list.append(br.read(rangebits))
        if len(x_list) > 65:
            raise VorbisError("floor1 X list longer than 65")
        if len(set(x_list)) != len(x_list):
            raise VorbisError("floor1 X list has duplicate values")
        f = cls(pcl, dims, subs, masters, subbooks, multiplier, x_list)
        xs = np.asarray(x_list, np.int64)
        f.sort_order = np.argsort(xs, kind="stable")
        n = len(x_list)
        low = np.zeros(n, np.int64)
        high = np.zeros(n, np.int64)
        for i in range(2, n):
            # spec 9.2.4/9.2.5: nearest X below/above among indices < i
            low[i] = max((j for j in range(i) if x_list[j] < x_list[i]),
                         key=lambda j: x_list[j])
            high[i] = min((j for j in range(i) if x_list[j] > x_list[i]),
                          key=lambda j: x_list[j])
        f.low_neighbor, f.high_neighbor = low, high
        return f

    def decode(self, br: _Bits, books: list):
        """Spec 7.2.3: returns the packet Y vector or None (unused)."""
        if not br.read_bit():
            return None
        rng = _FLOOR1_RANGES[self.multiplier - 1]
        bits = _ilog(rng - 1)
        y = [br.read(bits), br.read(bits)]
        for cls_i in self.partition_class_list:
            cdim = self.class_dimensions[cls_i]
            cbits = self.class_subclasses[cls_i]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_masterbooks[cls_i]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[cls_i][cval & csub]
                cval >>= cbits
                y.append(books[book].decode_scalar(br) if book >= 0 else 0)
        return y

    def curve(self, y, n2: int) -> np.ndarray:
        """Spec 7.2.4: predictive step decode + Bresenham render into the
        inverse-dB table.  All integer math, exactly as specified (the
        truncating divisions and the +-1 asymmetry are contractual)."""
        if y is None:
            return np.zeros(n2, np.float32)
        rng = _FLOOR1_RANGES[self.multiplier - 1]
        xs = self.x_list
        n = len(xs)
        final_y = [0] * n
        step2 = [False] * n
        final_y[0], final_y[1] = y[0], y[1]
        step2[0] = step2[1] = True
        for i in range(2, n):
            lo = int(self.low_neighbor[i])
            hi = int(self.high_neighbor[i])
            predicted = _render_point(xs[lo], final_y[lo],
                                      xs[hi], final_y[hi], xs[i])
            val = y[i]
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * min(highroom, lowroom)
            if val:
                step2[lo] = step2[hi] = step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final_y[i] = val - lowroom + predicted
                    else:
                        final_y[i] = predicted - (val - highroom) - 1
                elif val & 1:
                    final_y[i] = predicted - ((val + 1) >> 1)
                else:
                    final_y[i] = predicted + (val >> 1)
            else:
                step2[i] = False
                final_y[i] = predicted
        # curve synthesis along sorted X, multiplier applied, clamped
        out = np.zeros(n2, np.int64)
        mul = self.multiplier

        def clamp(v):
            return min(max(v, 0), rng - 1)

        order = self.sort_order
        lx = 0
        ly = clamp(final_y[int(order[0])]) * mul
        hx, hy = lx, ly
        for oi in order[1:]:
            oi = int(oi)
            if not step2[oi]:
                continue
            hx = xs[oi]
            hy = clamp(final_y[oi]) * mul
            if lx < n2:
                _render_line(lx, ly, hx, hy, out)
            lx, ly = hx, hy
        if hx < n2:
            out[hx:] = hy
        return _FLOOR1_INVERSE_DB[np.minimum(out[:n2], 255)]


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    """Spec 9.2.6 (integer math, truncating division)."""
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, v: np.ndarray) -> None:
    """Spec 9.2.7: Bresenham segment into ``v`` over [x0, x1) — writes are
    clipped to the vector, the slope math is not."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = ady // adx * (1 if dy >= 0 else -1)   # trunc toward zero
    sy = base + 1 if dy >= 0 else base - 1
    ady -= abs(base) * adx
    y = y0
    lim = len(v)
    if x0 < lim:
        v[x0] = y
    err = 0
    for x in range(x0 + 1, min(x1, lim)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


# --------------------------------------------------------------------------
# residues (spec section 8)


@dataclasses.dataclass
class _Residue:
    rtype: int
    begin: int
    end: int
    partition_size: int
    classifications: int
    classbook: int
    books: list        # [class][pass] -> book index or -1

    @classmethod
    def parse(cls, br: _Bits, rtype: int, books: list) -> "_Residue":
        begin = br.read(24)
        end = br.read(24)
        psize = br.read(24) + 1
        n_class = br.read(6) + 1
        classbook = br.read(8)
        if classbook >= len(books):
            raise VorbisError("residue classbook out of range")
        cb = books[classbook]
        if n_class ** cb.dim > cb.entries:
            raise VorbisError("residue classbook cannot express classes")
        cascades = []
        for _ in range(n_class):
            low = br.read(3)
            high = br.read(5) if br.read_bit() else 0
            cascades.append((high << 3) | low)
        table = []
        for c in range(n_class):
            row = []
            for p in range(8):
                if cascades[c] & (1 << p):
                    b = br.read(8)
                    if b >= len(books):
                        raise VorbisError("residue book out of range")
                    if books[b].vq is None:
                        raise VorbisError(
                            "residue book has no VQ lookup (maptype 0)")
                    row.append(b)
                else:
                    row.append(-1)
            table.append(row)
        return cls(rtype, begin, end, psize, n_class, classbook, table)

    def decode(self, br: _Bits, books: list, do_not_decode: list,
               n2: int) -> np.ndarray:
        """One residue call: returns (channels, n2) float32.  For type 2
        the channels interleave into one joint vector (spec 8.6.4),
        decoded unless EVERY channel is flagged do-not-decode."""
        ch = len(do_not_decode)
        out = np.zeros((ch, n2), np.float32)
        if self.rtype == 2:
            if all(do_not_decode):
                return out
            joint = np.zeros(ch * n2, np.float32)
            self._decode_vectors(br, books, [joint], [False])
            for c in range(ch):
                out[c] = joint[c::ch]
            return out
        self._decode_vectors(br, books, list(out), do_not_decode)
        return out

    def _decode_vectors(self, br: _Bits, books: list, vecs: list,
                        do_not_decode: list) -> None:
        actual_size = len(vecs[0])
        begin = min(self.begin, actual_size)
        end = min(self.end, actual_size)
        n_to_read = end - begin
        if n_to_read <= 0:
            return
        psize = self.partition_size
        parts = n_to_read // psize
        cb = books[self.classbook]
        cpc = cb.dim                      # classwords per classbook codeword
        nch = len(vecs)
        classif = np.zeros((nch, parts + cpc), np.int64)
        try:
            for pass_ in range(8):
                pcount = 0
                while pcount < parts:
                    if pass_ == 0:
                        for j in range(nch):
                            if do_not_decode[j]:
                                continue
                            temp = cb.decode_scalar(br)
                            for i in range(cpc - 1, -1, -1):
                                classif[j][pcount + i] = \
                                    temp % self.classifications
                                temp //= self.classifications
                    for _ in range(cpc):
                        if pcount >= parts:
                            break
                        for j in range(nch):
                            if do_not_decode[j]:
                                continue
                            vq = self.books[classif[j][pcount]][pass_]
                            if vq >= 0:
                                self._partition(br, books[vq], vecs[j],
                                                begin + pcount * psize)
                        pcount += 1
        except _EndOfPacket:
            return                        # spec: rest of the vector is zero

    def _partition(self, br: _Bits, book: _Codebook, v: np.ndarray,
                   offset: int) -> None:
        psize = self.partition_size
        dim = book.dim
        if self.rtype == 0:
            step = psize // dim
            for i in range(step):
                t = book.decode_vq(br)
                v[offset + i: offset + i + dim * step: step] += t
        else:                             # types 1 and 2 share the layout
            i = 0
            while i < psize:
                t = book.decode_vq(br)
                v[offset + i: offset + i + dim] += t
                i += dim


# --------------------------------------------------------------------------
# mappings and modes (spec 4.2.4)


@dataclasses.dataclass
class _Mapping:
    coupling: list                 # [(magnitude_ch, angle_ch), ...]
    mux: list                      # channel -> submap
    submap_floor: list
    submap_residue: list

    @classmethod
    def parse(cls, br: _Bits, channels: int, n_floors: int,
              n_residues: int) -> "_Mapping":
        submaps = br.read(4) + 1 if br.read_bit() else 1
        coupling = []
        if br.read_bit():
            steps = br.read(8) + 1
            bits = _ilog(channels - 1)
            for _ in range(steps):
                m = br.read(bits)
                a = br.read(bits)
                if m == a or m >= channels or a >= channels:
                    raise VorbisError("invalid coupling channel pair")
                coupling.append((m, a))
        if br.read(2) != 0:
            raise VorbisError("mapping reserved bits nonzero")
        if submaps > 1:
            mux = [br.read(4) for _ in range(channels)]
            if any(m >= submaps for m in mux):
                raise VorbisError("mapping mux out of range")
        else:
            mux = [0] * channels
        sf, sr = [], []
        for _ in range(submaps):
            br.read(8)                         # unused time configuration
            f = br.read(8)
            r = br.read(8)
            if f >= n_floors or r >= n_residues:
                raise VorbisError("mapping floor/residue out of range")
            sf.append(f)
            sr.append(r)
        return cls(coupling, mux, sf, sr)


def _inverse_couple(M: np.ndarray, A: np.ndarray):
    """Spec 4.3.6 square-polar inverse coupling (four-quadrant exact):
    the magnitude/angle residue pair becomes the channel pair."""
    new_m = np.empty_like(M)
    new_a = np.empty_like(M)
    pos_m = M > 0
    pos_a = A > 0
    idx = pos_m & pos_a            # mag = M,     ang = M - A
    new_m[idx] = M[idx]
    new_a[idx] = M[idx] - A[idx]
    idx = pos_m & ~pos_a           # ang = M,     mag = M + A
    new_m[idx] = M[idx] + A[idx]
    new_a[idx] = M[idx]
    idx = ~pos_m & pos_a           # mag = M,     ang = M + A
    new_m[idx] = M[idx]
    new_a[idx] = M[idx] + A[idx]
    idx = ~pos_m & ~pos_a          # ang = M,     mag = M - A
    new_m[idx] = M[idx] - A[idx]
    new_a[idx] = M[idx]
    return new_m, new_a


# --------------------------------------------------------------------------
# transform: IMDCT via FFT + the Vorbis window (spec 1.3.2)


def _imdct(X: np.ndarray) -> np.ndarray:
    """IMDCT per spec 4.3.7: out[j] = sum_k X[k] cos(2pi/n (j + 0.5 + n/4)
    (k + 0.5)), n = 2 * len(X) — vectorised over leading axes via one
    length-n inverse FFT (float64; O(n log n) vs the textbook O(n^2))."""
    N = X.shape[-1]
    n = 2 * N
    phi = np.pi / N
    c = 0.5 + N / 2.0
    k = np.arange(N)
    Xp = X.astype(np.float64) * np.exp(1j * phi * c * k)
    t = np.fft.ifft(Xp, n=n, axis=-1) * n
    j = np.arange(n)
    return (t * np.exp(1j * phi * (j + c) / 2.0)).real


def _slope(n: int) -> np.ndarray:
    """Rising half of the Vorbis window over slope length n (spec 4.3.8):
    sin(pi/2 * sin^2(pi/2 * (i + 0.5) / n))."""
    i = np.arange(n, dtype=np.float64)
    s = np.sin((i + 0.5) / n * (np.pi / 2.0))
    return np.sin(0.5 * np.pi * s * s)


def _window(n: int, prev_long: bool, next_long: bool, bs0: int) -> np.ndarray:
    """A block's full window with hybrid slopes (spec 4.3.8): a long block
    lapped against a short neighbor narrows that slope to the short
    window's, centered at n/4 (left) or 3n/4 (right)."""
    w = np.zeros(n, np.float64)
    center = n // 2
    if prev_long:
        ls, ln = 0, center
    else:
        ls, ln = n // 4 - bs0 // 4, bs0 // 2
    if next_long:
        rs, rn = center, center
    else:
        rs, rn = 3 * n // 4 - bs0 // 4, bs0 // 2
    w[ls: ls + ln] = _slope(ln)
    w[ls + ln: rs] = 1.0
    w[rs: rs + rn] = _slope(rn)[::-1]
    return w


# --------------------------------------------------------------------------
# setup + packet decode


@dataclasses.dataclass
class VorbisInfo:
    channels: int
    sample_rate: int
    blocksize0: int
    blocksize1: int
    bitrate_nominal: int
    vendor: str = ""
    comments: list = dataclasses.field(default_factory=list)


class _Setup:
    """The parsed setup header (spec 4.2.4): codebooks, floors, residues,
    mappings, modes — everything packet decode dereferences."""

    def __init__(self, setup: bytes, info: VorbisInfo):
        self.info = info
        br = _Bits(setup[7:])
        try:
            n_books = br.read(8) + 1
            self.books = [_Codebook(br) for _ in range(n_books)]
            for _ in range(br.read(6) + 1):         # time-domain transforms
                if br.read(16) != 0:
                    raise VorbisError("nonzero time-domain transform type")
            self.floors = []
            for _ in range(br.read(6) + 1):
                ft = br.read(16)
                if ft == 0:
                    self.floors.append(_Floor0.parse(br, self.books))
                elif ft == 1:
                    self.floors.append(_Floor1.parse(br, self.books))
                else:
                    raise VorbisError(f"reserved floor type {ft}")
            self.residues = []
            for _ in range(br.read(6) + 1):
                rt = br.read(16)
                if rt not in (0, 1, 2):
                    raise VorbisError(f"reserved residue type {rt}")
                self.residues.append(_Residue.parse(br, rt, self.books))
            self.mappings = []
            for _ in range(br.read(6) + 1):
                mt = br.read(16)
                if mt != 0:
                    raise VorbisError(f"reserved mapping type {mt}")
                self.mappings.append(_Mapping.parse(
                    br, info.channels, len(self.floors), len(self.residues)))
            self.modes = []
            for _ in range(br.read(6) + 1):
                blockflag = br.read_bit()
                if br.read(16) != 0 or br.read(16) != 0:
                    raise VorbisError("nonzero mode window/transform type")
                mapping = br.read(8)
                if mapping >= len(self.mappings):
                    raise VorbisError("mode mapping out of range")
                self.modes.append((blockflag, mapping))
            if not br.read_bit():
                raise VorbisError("setup framing bit unset")
        except _EndOfPacket:
            raise VorbisError("setup header truncated") from None
        self._windows: dict = {}

    def window(self, n: int, prev_long: bool, next_long: bool) -> np.ndarray:
        key = (n, prev_long, next_long)
        w = self._windows.get(key)
        if w is None:
            w = _window(n, prev_long, next_long, self.info.blocksize0)
            self._windows[key] = w
        return w


def _parse_ident(pkt: bytes) -> VorbisInfo:
    if len(pkt) < 7 or pkt[0] != 1 or pkt[1:7] != b"vorbis":
        raise VorbisError("not a Vorbis identification header")
    br = _Bits(pkt[7:])
    try:
        if br.read(32) != 0:
            raise VorbisError("unsupported Vorbis version")
        channels = br.read(8)
        rate = br.read(32)
        br.read(32)                                  # bitrate_maximum
        nominal = br.read(32)
        br.read(32)                                  # bitrate_minimum
        bs0 = 1 << br.read(4)
        bs1 = 1 << br.read(4)
        if channels == 0 or rate == 0:
            raise VorbisError("zero channels or sample rate")
        if not (64 <= bs0 <= bs1 <= 8192):
            raise VorbisError(f"illegal blocksizes {bs0}/{bs1}")
        if not br.read_bit():
            raise VorbisError("identification framing bit unset")
    except _EndOfPacket:
        raise VorbisError("identification header truncated") from None
    if nominal >= 1 << 31:
        nominal -= 1 << 32
    return VorbisInfo(channels, rate, bs0, bs1, nominal)


def _parse_comment(pkt: bytes, info: VorbisInfo) -> None:
    if len(pkt) < 7 or pkt[0] != 3 or pkt[1:7] != b"vorbis":
        raise VorbisError("not a Vorbis comment header")
    br = _Bits(pkt[7:])
    try:
        vlen = br.read(32)
        info.vendor = bytes(
            br.read(8) for _ in range(vlen)).decode("utf-8", "replace")
        for _ in range(br.read(32)):
            ln = br.read(32)
            info.comments.append(bytes(
                br.read(8) for _ in range(ln)).decode("utf-8", "replace"))
        if not br.read_bit():
            raise VorbisError("comment framing bit unset")
    except _EndOfPacket:
        raise VorbisError("comment header truncated") from None


class VorbisStreamDecoder:
    """Packet-at-a-time Vorbis decoder: feed audio packets in stream
    order, receive lapped PCM per packet — the synthesis state machine
    shared by the one-shot :func:`decode_vorbis` and the incremental
    ``OggVorbisReader``."""

    def __init__(self, ident: bytes, comment: bytes, setup: bytes):
        self.info = _parse_ident(ident)
        _parse_comment(comment, self.info)
        if len(setup) < 7 or setup[0] != 5 or setup[1:7] != b"vorbis":
            raise VorbisError("not a Vorbis setup header")
        self.setup = _Setup(setup, self.info)
        self.mode_bits = _ilog(len(self.setup.modes) - 1)
        # native front half (f9native.cpp): packet -> (residue, curve)
        # bitwise identical to the Python path; floor0 streams and
        # native-unavailable hosts stay pure Python
        self._nat = None
        try:
            blob = _native_setup_blob(self.setup, self.mode_bits)
            if blob is not None:
                from .. import native

                if native.available():
                    self._nat = native.VorbisNative(
                        blob, self.info.channels, self.info.blocksize1)
        except Exception:
            self._nat = None                    # any native hiccup: Python
        self.reset()

    def reset(self) -> None:
        """Forget lap state: decode can resume at any packet boundary;
        the first packet after a reset primes the lap and emits nothing."""
        self._prev_right: np.ndarray | None = None
        self._prev_n = 0

    def packet_blocksize(self, pkt: bytes) -> int | None:
        """A packet's block size from its mode bits alone (None for
        non-audio/undecodable packets) — enough to compute lapped output
        lengths without decoding floors or residues (used by the probe
        and the reader's seek index)."""
        br = _Bits(pkt)
        try:
            if br.read_bit() != 0:
                return None
            mode_i = br.read(self.mode_bits) if self.mode_bits else 0
            if mode_i >= len(self.setup.modes):
                return None
            blockflag, _ = self.setup.modes[mode_i]
            return self.info.blocksize1 if blockflag else self.info.blocksize0
        except _EndOfPacket:
            return None

    def decode_packet(self, pkt: bytes) -> np.ndarray | None:
        """Decode one packet; returns (channels, frames) float32 — the
        lapped output, empty for the priming packet — or None for packets
        that decode to nothing (non-audio type, bad mode number)."""
        if self._nat is not None:
            r = self._nat.decode_packet(pkt)
            if r is None:
                return None
            n, prev_flag, next_flag, res, curve = r
            spectrum = res.astype(np.float64) * curve
            return self._lap(spectrum, n, prev_flag, next_flag)
        s = self.setup
        info = self.info
        ch = info.channels
        br = _Bits(pkt)
        try:
            if br.read_bit() != 0:
                return None                     # header-type packet: ignore
            mode_i = br.read(self.mode_bits) if self.mode_bits else 0
            if mode_i >= len(s.modes):
                return None                     # undecodable: drop packet
            blockflag, mapping_i = s.modes[mode_i]
            n = info.blocksize1 if blockflag else info.blocksize0
            prev_flag = next_flag = True
            if blockflag:
                prev_flag = bool(br.read_bit())
                next_flag = bool(br.read_bit())
        except _EndOfPacket:
            return None                         # EOP before mode: drop
        n2 = n // 2
        mapping = s.mappings[mapping_i]

        # --- floor decode, per channel (spec 4.3.2) ---
        floor_data = [None] * ch
        no_residue = [True] * ch
        try:
            for c in range(ch):
                fl = s.floors[mapping.submap_floor[mapping.mux[c]]]
                fd = fl.decode(br, s.books)
                floor_data[c] = fd
                no_residue[c] = fd is None
        except _EndOfPacket:
            pass                                # remaining floors unused

        # --- nonzero vector propagate (spec 4.3.3) ---
        for m, a in mapping.coupling:
            if not (no_residue[m] and no_residue[a]):
                no_residue[m] = no_residue[a] = False

        # --- residue decode per submap (spec 4.3.4) ---
        residue_out = np.zeros((ch, n2), np.float32)
        for sm in range(len(mapping.submap_floor)):
            ch_idx = [c for c in range(ch) if mapping.mux[c] == sm]
            res = s.residues[mapping.submap_residue[sm]]
            dec = res.decode(br, s.books, [no_residue[c] for c in ch_idx],
                             n2)
            for k, c in enumerate(ch_idx):
                residue_out[c] = dec[k]

        # --- inverse coupling (spec 4.3.6), reverse declaration order ---
        for m, a in reversed(mapping.coupling):
            residue_out[m], residue_out[a] = _inverse_couple(
                residue_out[m], residue_out[a])

        # --- floor curve multiply (spec 4.3.5: after coupling) ---
        spectrum = np.zeros((ch, n2), np.float64)
        for c in range(ch):
            fl = s.floors[mapping.submap_floor[mapping.mux[c]]]
            spectrum[c] = (residue_out[c].astype(np.float64)
                           * fl.curve(floor_data[c], n2))
        return self._lap(spectrum, n, prev_flag, next_flag)

    def _lap(self, spectrum: np.ndarray, n: int, prev_flag: bool,
             next_flag: bool) -> np.ndarray:
        """IMDCT + window + overlap-add (spec 4.3.7-4.3.9): emitted
        samples span the previous block's center to this block's center;
        both windows are zero outside their slopes, so plain aligned adds
        are exact for every long/short pairing."""
        n2 = n // 2
        ch = spectrum.shape[0]
        pcm = _imdct(spectrum) * self.setup.window(n, prev_flag, next_flag)
        if self._prev_right is None:
            self._prev_right = pcm[:, n2:].copy()
            self._prev_n = n
            return np.zeros((ch, 0), np.float32)
        np_prev = self._prev_n
        out_len = np_prev // 4 + n // 4
        out = np.zeros((ch, out_len), np.float64)
        pr = self._prev_right
        m = min(out_len, pr.shape[1])
        out[:, :m] = pr[:, :m]
        off = np_prev // 4 - n // 4      # current block's index-0 position
        lo = max(0, off)
        out[:, lo:] += pcm[:, lo - off: out_len - off]
        self._prev_right = pcm[:, n2:].copy()
        self._prev_n = n
        return out.astype(np.float32)


# --------------------------------------------------------------------------
# stream-level decode


def _find_vorbis_stream(data: bytes):
    """Locate the first Vorbis logical stream; reject chained streams."""
    pages = list(read_pages(data))
    serial = None
    for pg in pages:
        if pg.bos and pg.body[:7] == b"\x01vorbis":
            serial = pg.serial
            break
    if serial is None:
        raise VorbisError("no Vorbis logical stream found")
    saw_eos = False
    for pg in pages:
        if pg.serial == serial:
            if saw_eos:
                raise VorbisError(
                    "chained Ogg streams are not supported; split the file")
            if pg.eos:
                saw_eos = True
        elif saw_eos and pg.bos:
            raise VorbisError(
                "chained Ogg streams are not supported; split the file")
    return serial, pages


def _stream_bounds(first_page_granule, first_page_total, last_granule,
                   decoded_total, first_is_eos=False):
    """Sample-exact bounds from granule accounting (spec A.2, matching
    libvorbis block.c's granule tracking):

    * on the FIRST granule-bearing page, ``offset = granule - decoded``:
      negative = samples cropped from the stream head (drop them),
      positive = the stream starts at a nonzero position (granules are
      shifted; total = last - offset);
    * on the EOS page a granule short of the decoded count truncates the
      END (the final block is partial) — when the first granule page IS
      the eos page, the end-trim interpretation wins.
    Returns (head_trim, num_frames)."""
    if last_granule is None:
        return 0, decoded_total
    if first_page_granule is None or first_is_eos:
        return 0, max(0, min(decoded_total, last_granule))
    offset = first_page_granule - first_page_total
    head = max(0, -offset)
    total = last_granule - max(0, offset)
    return head, max(0, min(total, decoded_total - head))


def decode_vorbis(data: bytes) -> tuple[np.ndarray, int, VorbisInfo]:
    """Decode a whole Ogg Vorbis byte stream to planar float32.

    Returns ``((channels, frames) float32, sample_rate, info)`` —
    sample-exact at both ends (initial granule offset honored, final
    granule truncation applied)."""
    serial, pages = _find_vorbis_stream(data)
    packets = packets_from_pages(pages, serial=serial)
    try:
        (ident, _, _), (comment, _, _), (setup, _, _) = (
            next(packets), next(packets), next(packets))
    except StopIteration:
        raise VorbisError("stream ends inside the three headers") from None
    dec = VorbisStreamDecoder(ident, comment, setup)
    ch = dec.info.channels
    chunks: list[np.ndarray] = []
    total = 0
    first_page_granule = None
    first_page_total = None
    first_is_eos = False
    last_granule = None
    for pkt, granule, eos in packets:
        out = dec.decode_packet(pkt)
        if out is not None and out.shape[1]:
            chunks.append(out)
            total += out.shape[1]
        if granule >= 0:
            if first_page_granule is None:
                first_page_granule = granule
                first_page_total = total
                first_is_eos = eos
            last_granule = granule
    if not chunks:
        return np.zeros((ch, 0), np.float32), dec.info.sample_rate, dec.info
    pcm = np.concatenate(chunks, axis=1)
    head, num = _stream_bounds(first_page_granule, first_page_total,
                               last_granule, total, first_is_eos)
    pcm = pcm[:, head: head + num]
    return np.ascontiguousarray(pcm, np.float32), dec.info.sample_rate, \
        dec.info


def probe_vorbis_bytes(data: bytes) -> tuple[VorbisInfo, int]:
    """Header-only probe: (info, num_frames) without decoding audio.
    Lapped output lengths come from packet mode bits alone, so the walk
    is O(packets) bit reads, not a decode."""
    serial, pages = _find_vorbis_stream(data)
    packets = packets_from_pages(pages, serial=serial)
    try:
        (ident, _, _), (comment, _, _), (setup, _, _) = (
            next(packets), next(packets), next(packets))
    except StopIteration:
        raise VorbisError("stream ends inside the three headers") from None
    dec = VorbisStreamDecoder(ident, comment, setup)
    total = 0
    prev_n = None
    first_page_granule = None
    first_page_total = None
    first_is_eos = False
    last_granule = None
    for pkt, granule, eos in packets:
        if first_page_granule is None:
            n = dec.packet_blocksize(pkt)
            if n is not None:
                if prev_n is not None:
                    total += prev_n // 4 + n // 4
                prev_n = n
        if granule >= 0:
            if first_page_granule is None:
                first_page_granule = granule
                first_page_total = total
                first_is_eos = eos
            last_granule = granule
    _, num = _stream_bounds(first_page_granule, first_page_total,
                            last_granule, 1 << 62, first_is_eos)
    return dec.info, num


# --------------------------------------------------------------------------
# incremental reader + whole-file helpers (the io/codec.py surface)


class OggVorbisReader:
    """Incremental frame reader with the `WavReader.read(start, count)`
    contract (`f9tpu/io/wav.py:526`), so Ogg Vorbis sources stream through
    the same fixed-size device chunks as WAV/AIFF/FLAC.

    Vorbis output is lapped (every packet's PCM needs the previous
    packet's right window half), so random access restarts one packet
    early: the decoder is reset, the preceding packet primes the lap
    (emitting nothing — a block's right half does not depend on its
    ``prev`` window flag, so the re-primed continuation is bitwise equal
    to the straight-through decode), and decode proceeds.  A boundary
    index of (first emitted raw sample, packet number) grows as the
    cursor advances, making backward seeks O(distance-from-boundary);
    the streaming pipeline reads monotonically, which is served from a
    bounded rolling buffer with zero re-decode."""

    #: decoded frames kept behind the cursor for halo re-reads
    _KEEP = 1 << 16

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            data = f.read()
        serial, pages = _find_vorbis_stream(data)
        triples = list(packets_from_pages(pages, serial=serial))
        if len(triples) < 3:
            raise VorbisError(f"{path}: stream ends inside the headers")
        self._dec = VorbisStreamDecoder(triples[0][0], triples[1][0],
                                        triples[2][0])
        self._packets = [p for p, _, _ in triples[3:]]
        info = self._dec.info
        self.num_channels = info.channels
        self.sample_rate = info.sample_rate
        self.bits = 32                      # decoded float; no PCM depth
        # granule accounting on mode bits alone (no decode); also record
        # which packets are audio (the lap-priming candidates for seeks)
        total = 0
        prev_n = None
        fpg = fpt = None
        first_is_eos = False
        last_granule = None
        self._is_audio = np.zeros(len(self._packets), bool)
        for i, (pkt, granule, eos) in enumerate(triples[3:]):
            n = self._dec.packet_blocksize(pkt)
            if n is not None:
                self._is_audio[i] = True
                if prev_n is not None:
                    total += prev_n // 4 + n // 4
                prev_n = n
            if granule >= 0 and fpg is None:
                fpg, fpt, first_is_eos = granule, total, eos
            if granule >= 0:
                last_granule = granule
        self._head, self.num_frames = _stream_bounds(
            fpg, fpt, last_granule, total, first_is_eos)
        self._raw_total = total
        # decode cursor: next packet index + raw position it will emit at
        self._next = 0
        self._next_pos = 0
        # boundary index: raw first-emitted-sample position per packet,
        # filled as the cursor passes (position -1 = not yet reached)
        self._bounds = np.full(len(self._packets) + 1, -1, np.int64)
        self._bounds[0] = 0
        # rolling decoded buffer over raw positions [_buf_start, _buf_end)
        self._buf = np.zeros((self.num_channels, 0), np.float32)
        self._buf_start = 0

    def close(self):
        self._packets = []
        self._buf = np.zeros((self.num_channels, 0), np.float32)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def _buf_end(self) -> int:
        return self._buf_start + self._buf.shape[1]

    def _restart(self, raw_target: int) -> None:
        """Reposition the decode cursor at the best known packet boundary
        at or before ``raw_target`` and re-prime the lap."""
        # the last known boundary <= target (bounds grow monotonically)
        ks = np.nonzero((self._bounds >= 0)
                        & (self._bounds <= raw_target))[0]
        k = int(ks[-1]) if ks.size else 0
        self._dec.reset()
        # the nearest AUDIO packet before k primes the lap (its windowed
        # right half does not depend on its own prev flag, so the
        # continuation from packet k is bitwise the warm decode); after a
        # reset the primer emits nothing, so the cursor position is where
        # packet k emits
        prime = k - 1
        while prime > 0 and not self._is_audio[prime]:
            prime -= 1
        self._next = max(0, prime)
        self._next_pos = int(self._bounds[k]) if k else 0
        self._buf = np.zeros((self.num_channels, 0), np.float32)
        self._buf_start = self._next_pos

    def _decode_until(self, raw_hi: int) -> None:
        chunks = [self._buf]
        end = self._buf_end
        while end < raw_hi and self._next < len(self._packets):
            k = self._next
            out = self._dec.decode_packet(self._packets[k])
            self._next += 1
            if out is None:
                if self._bounds[k + 1] < 0:
                    self._bounds[k + 1] = self._next_pos
                continue
            got = out.shape[1]
            emit_at = self._next_pos
            self._next_pos += got
            if self._bounds[k + 1] < 0:      # never overwrite a warm bound
                self._bounds[k + 1] = self._next_pos
            if got == 0:
                continue
            if emit_at + got <= self._buf_start:
                continue                    # before the window of interest
            if emit_at < self._buf_start:
                out = out[:, self._buf_start - emit_at:]
            chunks.append(out)
            end += out.shape[1]
        self._buf = np.concatenate(chunks, axis=1) if len(chunks) > 1 \
            else self._buf

    def read(self, start: int, count: int) -> np.ndarray:
        """Planar float32 ``(channels, m)`` with ``m <= count`` (clipped at
        the stream end), frames ``[start, start+m)`` of the output
        timeline (head offset and end truncation already applied)."""
        start = max(0, int(start))
        count = max(0, min(int(count), self.num_frames - start))
        if count == 0:
            return np.zeros((self.num_channels, 0), np.float32)
        raw_lo = start + self._head
        raw_hi = raw_lo + count
        if raw_lo < self._buf_start:
            self._restart(raw_lo)
        self._decode_until(raw_hi)
        lo = raw_lo - self._buf_start
        out = np.ascontiguousarray(self._buf[:, lo: lo + count])
        if out.shape[1] < count:
            out = np.pad(out, ((0, 0), (0, count - out.shape[1])))
        # bound the rolling buffer: keep _KEEP frames behind the read end
        drop = (raw_hi - self._KEEP) - self._buf_start
        if drop > 0:
            self._buf = self._buf[:, drop:]
            self._buf_start += drop
        return out


def read_ogg(path: str) -> tuple[np.ndarray, int]:
    """Decode a whole Ogg Vorbis file to planar float32 + rate (the
    `read_audio` contract)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        pcm, rate, _ = decode_vorbis(data)
    except OggError as e:
        raise ValueError(f"{path}: {e}") from None
    return pcm, rate


def probe_ogg(path: str):
    """Header-only probe to :class:`io.wav.AudioFileInfo` (granule walk,
    no audio decode)."""
    from .wav import AudioFileInfo

    with open(path, "rb") as f:
        data = f.read()
    try:
        info, num = probe_vorbis_bytes(data)
    except OggError as e:
        raise ValueError(f"{path}: {e}") from None
    return AudioFileInfo(path=path, sample_rate=info.sample_rate,
                         num_channels=info.channels, num_frames=num,
                         bit_depth=32, is_float=True, container="ogg",
                         byte_order="little")


# --------------------------------------------------------------------------
# native front-half serialization (f9native.cpp "Vorbis packet front half")


def _native_setup_blob(s: _Setup, mode_bits: int) -> bytes | None:
    """Serialize the parsed setup for the C++ packet front half: all
    int32 little-endian + raw float32 arrays, in the exact order
    ``f9_vorbis_setup`` reads.  Returns None for configurations the
    native path does not cover (floor type 0 — extinct in the wild)."""
    import struct as _s

    if any(isinstance(f, _Floor0) for f in s.floors):
        return None
    out = bytearray()

    def i32(*vs):
        out.extend(_s.pack(f"<{len(vs)}i", *vs))

    info = s.info
    i32(info.channels, info.blocksize0, info.blocksize1, mode_bits,
        len(s.books))
    z256 = np.zeros(256, np.int32).tobytes()
    for b in s.books:
        i32(b.dim, b.entries, b.single_entry, b.single_bits)
        if b.tree is None:
            i32(0)
            out.extend(z256 * 3)
        else:
            i32(b.tree.shape[0])
            out.extend(np.ascontiguousarray(b.tree, np.int32).tobytes())
            out.extend(np.ascontiguousarray(b.fast_entry,
                                            np.int32).tobytes())
            out.extend(np.ascontiguousarray(b.fast_len, np.int32).tobytes())
            out.extend(np.ascontiguousarray(b.fast_node, np.int32).tobytes())
        if b.vq is None:
            i32(0)
        else:
            i32(1)
            out.extend(np.ascontiguousarray(b.vq, np.float32).tobytes())
    i32(len(s.floors))
    for f in s.floors:
        i32(len(f.partition_class_list), *f.partition_class_list)
        nc = len(f.class_dimensions)
        i32(nc, *f.class_dimensions)
        i32(*f.class_subclasses)
        i32(*f.class_masterbooks)
        for row in f.subclass_books:
            i32(*(row + [-1] * (8 - len(row))))
        i32(f.multiplier, len(f.x_list), *f.x_list)
        i32(*[int(v) for v in f.sort_order])
        i32(*[int(v) for v in f.low_neighbor])
        i32(*[int(v) for v in f.high_neighbor])
    i32(len(s.residues))
    for r in s.residues:
        i32(r.rtype, r.begin, r.end, r.partition_size, r.classifications,
            r.classbook)
        for row in r.books:
            i32(*row)
    i32(len(s.mappings))
    for m in s.mappings:
        i32(len(m.coupling))
        for pair in m.coupling:
            i32(*pair)
        i32(*m.mux)
        i32(len(m.submap_floor), *m.submap_floor)
        i32(*m.submap_residue)
    i32(len(s.modes))
    i32(*[bf for bf, _ in s.modes])
    i32(*[mp for _, mp in s.modes])
    out.extend(_FLOOR1_INVERSE_DB.tobytes())
    return bytes(out)
