"""LZX codec — the public LZX bitstream as documented in [MS-PATCH]
and the LZX DELTA specification (the same compression CHM/ITSS and CAB
use).

Decoder covers verbatim, aligned-offset, and uncompressed blocks, the
repeated-offset LRU (R0/R1/R2), the pretree-delta-coded Huffman tree
transmission, and the Intel E8 call translation.  The from-scratch
COMPRESSOR (verbatim blocks, greedy matching, canonical length-limited
Huffman, the same pretree encoding) is an independent implementation of
the bit grammar — round-trip over adversarial shapes is the
self-verification, the same standard as the zstd/lz4/snappy codecs
(those had CLI validators in the container; LZX has none, so the
compressor carries the burden and the bit-level constants below are
all GENERATED from the spec's formulas rather than copied tables:
``extra_bits(slot) = min(max(slot//2 - 1, 0), 17)`` and the cumulative
position-base recurrence).

Bitstream shape (the part everyone gets wrong): the stream is a
sequence of little-endian 16-bit words, and bits are consumed MSB-first
*within* each word.
"""
from __future__ import annotations

import struct


class LzxError(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# position slots: generated from the spec recurrence, not a pasted table
def _extra_bits(slot: int) -> int:
    return min(max((slot >> 1) - 1, 0), 17)


_POSITION_BASE = [0]
for _s in range(0, 290):
    _POSITION_BASE.append(_POSITION_BASE[-1] + (1 << _extra_bits(_s)))


def _num_position_slots(window_bits: int) -> int:
    if window_bits == 21:
        return 50
    if window_bits == 20:
        return 42
    return window_bits * 2


_MIN_MATCH = 2
_FRAME_SIZE = 0x8000
_NUM_SECONDARY_LEN = 249  # length-tree symbols
_PRETREE_SYMS = 20


# ---------------------------------------------------------------------------
# bit I/O (16-bit LE words, MSB-first bits)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _ensure(self, n: int) -> None:
        while self.nbits < n:
            if self.pos + 2 <= len(self.data):
                (w,) = struct.unpack_from("<H", self.data, self.pos)
                self.pos += 2
            elif self.pos < len(self.data):
                w = self.data[self.pos]
                self.pos += 1
            else:
                w = 0
            self.buf = (self.buf << 16) | w
            self.nbits += 16

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1
        return v

    def align16(self) -> None:
        """Discard bits to the next 16-bit word boundary."""
        drop = self.nbits % 16
        if drop:
            self.read(drop)

    def read_bytes(self, n: int) -> bytes:
        """Byte-aligned raw read (the bit buffer must be empty of
        partial words)."""
        if self.nbits:
            # buffered whole words are pushed back as bytes
            if self.nbits % 16:
                raise LzxError("lzx_misaligned")
            back = self.nbits // 16
            self.pos -= 2 * back
            self.buf = 0
            self.nbits = 0
        if self.pos + n > len(self.data):
            raise LzxError("lzx_truncated")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out


class _BitWriter:
    def __init__(self) -> None:
        self.words: list[int] = []
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        while n > 0:
            take = min(16 - self.nbits, n)
            chunk = (value >> (n - take)) & ((1 << take) - 1)
            self.cur = (self.cur << take) | chunk
            self.nbits += take
            n -= take
            if self.nbits == 16:
                self.words.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def getvalue(self) -> bytes:
        words = list(self.words)
        if self.nbits:
            words.append(self.cur << (16 - self.nbits))
        return b"".join(struct.pack("<H", w) for w in words)


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """lengths -> {symbol: (code, bits)}; canonical LZX order: by length
    then symbol index."""
    syms = sorted((l, s) for s, l in enumerate(lengths) if l)
    codes = {}
    code = 0
    prev_len = 0
    for l, s in syms:
        code <<= (l - prev_len)
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _HuffTable:
    """Decode table from a canonical length list."""

    def __init__(self, lengths: list[int]):
        self.max_len = max(lengths) if any(lengths) else 0
        self.map: dict[tuple[int, int], int] = {}
        for s, (code, l) in _canonical_codes(lengths).items():
            self.map[(l, code)] = s

    def decode(self, br: _BitReader) -> int:
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.map.get((l, code))
            if sym is not None:
                return sym
        raise LzxError("lzx_bad_code")


def _build_lengths(freq: dict[int, int], nsyms: int,
                   limit: int = 16) -> list[int]:
    """Length-limited Huffman lengths (simple overflow-rebalance)."""
    import heapq

    items = [(f, s) for s, f in freq.items() if f]
    if not items:
        return [0] * nsyms
    if len(items) == 1:
        out = [0] * nsyms
        out[items[0][1]] = 1
        return out
    heap = [(f, [s]) for f, s in items]
    heapq.heapify(heap)
    depth = {s: 0 for _f, s in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    # rebalance overflow beyond the limit
    while max(depth.values()) > limit:
        deep = max(depth, key=lambda s: depth[s])
        shallow = min((s for s in depth if depth[s] < limit - 1),
                      key=lambda s: depth[s], default=None)
        if shallow is None:
            raise LzxError("lzx_tree_overflow")
        depth[deep] -= 1
        depth[shallow] += 1
    # kraft fixup: lengths from depths may violate kraft after rebalance;
    # verify and push down until satisfied
    def kraft(d):
        return sum(1 << (limit - l) for l in d.values())
    cap = 1 << limit
    while kraft(depth) > cap:
        s = min((s for s in depth if depth[s] < limit),
                key=lambda s: depth[s])
        depth[s] += 1
    out = [0] * nsyms
    for s, d in depth.items():
        out[s] = max(d, 1)
    return out


# ---------------------------------------------------------------------------
# tree transmission (pretree + delta runs)
# ---------------------------------------------------------------------------


def _read_lengths(br: _BitReader, prev: list[int], first: int,
                  last: int) -> None:
    pre = [br.read(4) for _ in range(_PRETREE_SYMS)]
    pretree = _HuffTable(pre)
    i = first
    while i < last:
        z = pretree.decode(br)
        if z == 17:
            run = br.read(4) + 4
            for _ in range(run):
                if i < last:
                    prev[i] = 0
                    i += 1
        elif z == 18:
            run = br.read(5) + 20
            for _ in range(run):
                if i < last:
                    prev[i] = 0
                    i += 1
        elif z == 19:
            run = br.read(1) + 4
            z2 = pretree.decode(br)
            val = (prev[i] - z2 + 17) % 17
            for _ in range(run):
                if i < last:
                    prev[i] = val
                    i += 1
        else:
            prev[i] = (prev[i] - z + 17) % 17
            i += 1


def _write_lengths(bw: _BitWriter, prev: list[int], lengths: list[int],
                   first: int, last: int) -> None:
    """Compressor side: plain per-symbol delta codes (no runs) — a
    strictly valid subset of the pretree grammar."""
    deltas = [(prev[i] - lengths[i]) % 17 for i in range(first, last)]
    freq: dict[int, int] = {}
    for d in deltas:
        freq[d] = freq.get(d, 0) + 1
    pre_lengths = _build_lengths(freq, _PRETREE_SYMS, limit=15)
    for l in pre_lengths:
        bw.write(l, 4)
    codes = _canonical_codes(pre_lengths)
    for i, d in zip(range(first, last), deltas):
        code, n = codes[d]
        bw.write(code, n)
        prev[i] = lengths[i]


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def lzx_decompress(data: bytes, out_len: int, window_bits: int = 16,
                   frame_align: bool = False) -> bytes:
    """Decode one LZX stream.  ``frame_align=True`` re-aligns the input
    bitstream to a 16-bit boundary after every 0x8000-byte output frame
    — the CAB encoder convention; CHM fixture streams (and this repo's
    compressor) don't pad, so the default is off and the CAB reader
    retries with it on."""
    br = _BitReader(data)
    return _decode_span(br, out_len, window_bits, frame_align)


def _decode_span(br: _BitReader, out_len: int, window_bits: int,
                 frame_align: bool = False) -> bytes:
    nslots = _num_position_slots(window_bits)
    main_syms = 256 + (nslots << 3)
    main_len = [0] * main_syms
    length_len = [0] * _NUM_SECONDARY_LEN
    R = [1, 1, 1]
    out = bytearray()

    intel = br.read(1)
    intel_size = 0
    if intel:
        intel_size = (br.read(16) << 16) | br.read(16)

    next_frame = _FRAME_SIZE

    def frame_check() -> None:
        nonlocal next_frame
        while frame_align and len(out) >= next_frame:
            br.align16()
            next_frame += _FRAME_SIZE

    while len(out) < out_len:
        btype = br.read(3)
        bsize = (br.read(16) << 8) | br.read(8)
        if bsize == 0 or len(out) + bsize > out_len:
            if bsize == 0:
                raise LzxError("lzx_bad_block")
            bsize = out_len - len(out)
        if btype == 3:  # uncompressed
            br.align16()
            if br.nbits == 0 and br.pos % 2:
                raise LzxError("lzx_misaligned")
            raw = br.read_bytes(12)
            R = list(struct.unpack("<3I", raw))
            out += br.read_bytes(bsize)
            if bsize % 2:
                br.read_bytes(1)
            frame_check()
            continue
        aligned_tree = None
        if btype == 2:  # aligned offsets
            aligned_tree = _HuffTable([br.read(3) for _ in range(8)])
        elif btype != 1:
            raise LzxError("lzx_bad_block")
        _read_lengths(br, main_len, 0, 256)
        _read_lengths(br, main_len, 256, main_syms)
        main_tree = _HuffTable(main_len)
        _read_lengths(br, length_len, 0, _NUM_SECONDARY_LEN)
        length_tree = (_HuffTable(length_len)
                       if any(length_len) else None)

        produced = 0
        while produced < bsize:
            sym = main_tree.decode(br)
            if sym < 256:
                out.append(sym)
                produced += 1
                frame_check()
                continue
            v = sym - 256
            slot = v >> 3
            length_header = v & 7
            if length_header == 7:
                if length_tree is None:
                    raise LzxError("lzx_bad_code")
                length = length_tree.decode(br) + 7 + _MIN_MATCH
            else:
                length = length_header + _MIN_MATCH
            if slot == 0:
                offset = R[0]
            elif slot == 1:
                offset = R[1]
                R[0], R[1] = R[1], R[0]
            elif slot == 2:
                offset = R[2]
                R[0], R[2] = R[2], R[0]
            else:
                extra = _extra_bits(slot)
                formatted = _POSITION_BASE[slot]
                if aligned_tree is not None and extra >= 3:
                    formatted += br.read(extra - 3) << 3
                    formatted += aligned_tree.decode(br)
                else:
                    formatted += br.read(extra)
                offset = formatted - 2
                R[2] = R[1]
                R[1] = R[0]
                R[0] = offset
            if offset <= 0 or offset > len(out):
                raise LzxError("lzx_bad_offset")
            for _ in range(length):
                out.append(out[-offset])
            produced += length
            frame_check()

    if intel and intel_size and len(out) > 10:
        out = _e8_untranslate(bytes(out), intel_size)
        return out
    return bytes(out)


def _e8_untranslate(data: bytes, intel_size: int) -> bytes:
    """Reverse the Intel E8 call translation, per 32 KiB frame."""
    out = bytearray(data)
    n = len(out)
    frame = 0
    while frame < n:
        end = min(frame + 0x8000, n) - 10
        i = frame
        while i < end:
            if out[i] == 0xE8:
                (abs_off,) = struct.unpack_from("<i", out, i + 1)
                cur = i  # spec: offset of the E8 byte within the output
                if -cur <= abs_off < intel_size:
                    rel = (abs_off - cur if abs_off >= 0
                           else abs_off + intel_size)
                    struct.pack_into("<i", out, i + 1, rel)
                i += 5
            else:
                i += 1
        frame += 0x8000
    return bytes(out)


# ---------------------------------------------------------------------------
# compressor (verbatim blocks) — the independent grammar implementation
# ---------------------------------------------------------------------------


def lzx_compress(data: bytes, window_bits: int = 16) -> bytes:
    """One LZX stream: intel flag 0 + a single verbatim block covering
    ``data``.  Greedy hash-chain matching with explicit offsets only
    (the decoder's repeated-offset path is exercised by hand-built
    streams in tests)."""
    nslots = _num_position_slots(window_bits)
    main_syms = 256 + (nslots << 3)
    window = 1 << window_bits

    # --- greedy parse ---
    ops: list[tuple] = []  # ('lit', byte) | ('match', length, offset)
    n = len(data)
    table: dict[bytes, int] = {}
    i = 0
    while i < n:
        best_len = 0
        best_off = 0
        if i + 3 <= n:
            key = data[i:i + 3]
            j = table.get(key)
            if j is not None and i - j <= window - 3:
                length = 3
                max_l = min(n - i, 257)
                while (length < max_l
                       and data[j + length] == data[i + length]):
                    length += 1
                best_len = length
                best_off = i - j
            table[key] = i
        if best_len >= 3:
            ops.append(("match", best_len, best_off))
            i += best_len
        else:
            ops.append(("lit", data[i]))
            i += 1

    # --- symbol statistics ---
    def slot_of(offset: int) -> int:
        formatted = offset + 2
        slot = 3
        while _POSITION_BASE[slot + 1] <= formatted:
            slot += 1
        return slot

    main_freq: dict[int, int] = {}
    len_freq: dict[int, int] = {}
    for op in ops:
        if op[0] == "lit":
            main_freq[op[1]] = main_freq.get(op[1], 0) + 1
        else:
            _m, length, offset = op
            slot = slot_of(offset)
            lh = min(length - _MIN_MATCH, 7)
            sym = 256 + ((slot << 3) | lh)
            main_freq[sym] = main_freq.get(sym, 0) + 1
            if lh == 7:
                ls = length - _MIN_MATCH - 7
                len_freq[ls] = len_freq.get(ls, 0) + 1

    main_lengths = _build_lengths(main_freq, main_syms)
    length_lengths = (_build_lengths(len_freq, _NUM_SECONDARY_LEN)
                      if len_freq else [0] * _NUM_SECONDARY_LEN)
    main_codes = _canonical_codes(main_lengths)
    length_codes = _canonical_codes(length_lengths)

    # --- emit ---
    bw = _BitWriter()
    bw.write(0, 1)  # no intel preprocessing
    bw.write(1, 3)  # verbatim block
    bw.write(n >> 8, 16)
    bw.write(n & 0xFF, 8)
    prev_main = [0] * main_syms
    _write_lengths(bw, prev_main, main_lengths, 0, 256)
    _write_lengths(bw, prev_main, main_lengths, 256, main_syms)
    prev_len = [0] * _NUM_SECONDARY_LEN
    _write_lengths(bw, prev_len, length_lengths, 0, _NUM_SECONDARY_LEN)

    for op in ops:
        if op[0] == "lit":
            code, bits = main_codes[op[1]]
            bw.write(code, bits)
        else:
            _m, length, offset = op
            slot = slot_of(offset)
            lh = min(length - _MIN_MATCH, 7)
            sym = 256 + ((slot << 3) | lh)
            code, bits = main_codes[sym]
            bw.write(code, bits)
            if lh == 7:
                code, bits = length_codes[length - _MIN_MATCH - 7]
                bw.write(code, bits)
            extra = _extra_bits(slot)
            if extra:
                bw.write(offset + 2 - _POSITION_BASE[slot], extra)
    return bw.getvalue()
