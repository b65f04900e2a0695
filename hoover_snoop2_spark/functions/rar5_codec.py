"""RAR5 codec — the RAR 5.0 compressed-block bitstream (the single LZ
scheme all RAR5 method values 1-5 use; RAR5 dropped RAR4's PPMd).

The reference unpacks RARs by shelling to ``7z x``
(snoop/data/analyzers/archives.py:173-203); this module decodes the
RAR5 stream natively so compressed members extract without a
subprocess.  The bit grammar is transcribed from the freely distributed
unrar sources (unpack50.cpp / unpackinline.cpp — the de-facto public
specification; the rarfile project documents the same layout):

- byte-aligned block headers: flags byte (bit7 = Huffman tables
  present, bit6 = last block in file, bits 3-4 = size-field byte count
  minus one, bits 0-2 = valid bits in the last block byte minus one),
  a checksum byte ``0x5A ^ flags ^ size ^ size>>8 ^ size>>16``, then
  the little-endian block byte size;
- four canonical Huffman alphabets per block — main (306: 256 literals,
  256 filter, 257 last-length rep, 258-261 the 4-slot LRU of old
  distances, 262+ length slots), distance (64 slots), low-distance
  (16), rep-length (44) — transmitted as 4-bit code lengths for a
  20-symbol pretree (value 15 escapes a zero run) followed by the
  pretree-coded 430-entry table with repeat-previous (16: 3 bits + 3,
  17: 7 bits + 11) and zero-run (18: 3 bits + 3, 19: 7 bits + 11)
  symbols;
- length slots: ``len = 2 + slot`` below 8, else
  ``2 + ((4 | slot&3) << (slot//4 - 1)) + extra``; distance slots:
  ``dist = 1 + slot`` below 4, else
  ``1 + ((2 | slot&1) << (slot//2 - 1)) + extra`` where for 4+ extra
  bits the low nibble rides the low-distance Huffman table; matches
  farther than 0x100/0x2000/0x40000 implicitly lengthen by 1 each;
- post-processing filters (delta / x86 E8 / E8E9 / ARM) announced
  in-stream via main symbol 256.

All constants above are formulas, not tables — there is nothing to
transcribe byte-for-byte, which is what makes this codec implementable
and self-verifiable in-sandbox (unlike PST CYCLIC's mpbbS table, see
NOTES.md).  Self-verification follows the LZX pattern
(functions/lzx_codec.py): a from-scratch COMPRESSOR (greedy LZ over a
hash chain, real frequency-based canonical Huffman, the same pretree
transmission) round-trips adversarial shapes, and the container layer
additionally verifies the FILE header's CRC32 of the unpacked bytes —
a wrong decode can never surface as silently-wrong text, only as
``rar_crc_mismatch``.

Scale posture: the codec runs inside the extraction pipeline's Arrow
batches (one member per call, pure CPU, no Python-per-row on the Spark
side); blob bytes stay in the executor.
"""
from __future__ import annotations

import struct

# alphabet sizes (unpack.hpp)
_NC = 306   # main: 256 literals + 6 control + 44 length slots
_DC = 64    # distance slots
_LDC = 16   # low-distance (low 4 bits of large distances)
_RC = 44    # rep-match length slots
_BC = 20    # pretree
_TABLE_SIZE = _NC + _DC + _LDC + _RC  # 430

_MAX_FILTERS = 8192
_MAX_FILTER_BLOCK = 0x400000

FILTER_DELTA, FILTER_E8, FILTER_E8E9, FILTER_ARM = 0, 1, 2, 3


class Rar5Error(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# bit I/O — MSB-first within bytes (BitInput::fgetbits)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        """Read n bits MSB-first; bits past the end read as 0 (unrar pads
        its input buffer with zero bytes)."""
        v = 0
        p = self.bitpos
        d = self.data
        end = len(d)
        for _ in range(n):
            byte_i = p >> 3
            b = d[byte_i] if byte_i < end else 0
            v = (v << 1) | ((b >> (7 - (p & 7))) & 1)
            p += 1
        self.bitpos = p
        return v

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


# ---------------------------------------------------------------------------
# canonical Huffman (MakeDecodeTables semantics: codes assigned by
# ascending length, ties by symbol index)
# ---------------------------------------------------------------------------


def _make_decoder(lengths: list[int]):
    """lengths → (first_code[l], syms_by_len[l]) for l in 1..15."""
    by_len: list[list[int]] = [[] for _ in range(16)]
    for sym, ln in enumerate(lengths):
        if ln:
            by_len[ln].append(sym)
    first = [0] * 16
    code = 0
    for ln in range(1, 16):
        code <<= 1
        first[ln] = code
        code += len(by_len[ln])
    if code > (1 << 15):
        raise Rar5Error("rar_error")  # oversubscribed tree
    return first, by_len


def _decode_sym(br: _BitReader, dec) -> int:
    first, by_len = dec
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | br.bits(1)
        idx = code - first[ln]
        if 0 <= idx < len(by_len[ln]):
            return by_len[ln][idx]
    raise Rar5Error("rar_error")


def _make_encoder(lengths: list[int]) -> dict[int, tuple[int, int]]:
    first, by_len = _make_decoder(lengths)
    codes: dict[int, tuple[int, int]] = {}
    for ln in range(1, 16):
        for i, sym in enumerate(by_len[ln]):
            codes[sym] = (first[ln] + i, ln)
    return codes


# ---------------------------------------------------------------------------
# block header + tables
# ---------------------------------------------------------------------------


def _read_block_header(br: _BitReader):
    br.align()
    flags = br.bits(8)
    byte_count = ((flags >> 3) & 3) + 1
    if byte_count == 4:
        raise Rar5Error("rar_error")
    block_bit_size = (flags & 7) + 1
    saved_checksum = br.bits(8)
    block_size = 0
    for i in range(byte_count):
        block_size += br.bits(8) << (i * 8)
    checksum = 0xFF & (0x5A ^ flags ^ block_size ^ (block_size >> 8)
                       ^ (block_size >> 16))
    if checksum != saved_checksum:
        raise Rar5Error("rar_error")
    block_start = br.bitpos >> 3
    end_bit = (block_start + block_size - 1) * 8 + block_bit_size
    last_block = bool(flags & 0x40)
    table_present = bool(flags & 0x80)
    return end_bit, last_block, table_present


def _read_tables(br: _BitReader):
    bit_length = [0] * _BC
    i = 0
    while i < _BC:
        ln = br.bits(4)
        if ln == 15:
            zero_count = br.bits(4)
            if zero_count == 0:
                bit_length[i] = 15
                i += 1
            else:
                for _ in range(zero_count + 2):
                    if i < _BC:
                        bit_length[i] = 0
                        i += 1
        else:
            bit_length[i] = ln
            i += 1
    bd = _make_decoder(bit_length)

    table = [0] * _TABLE_SIZE
    i = 0
    while i < _TABLE_SIZE:
        num = _decode_sym(br, bd)
        if num < 16:
            table[i] = num
            i += 1
        elif num < 18:
            n = br.bits(3) + 3 if num == 16 else br.bits(7) + 11
            if i == 0:
                raise Rar5Error("rar_error")
            while n > 0 and i < _TABLE_SIZE:
                table[i] = table[i - 1]
                i += 1
                n -= 1
        else:
            n = br.bits(3) + 3 if num == 18 else br.bits(7) + 11
            while n > 0 and i < _TABLE_SIZE:
                table[i] = 0
                i += 1
                n -= 1
    ld = _make_decoder(table[:_NC])
    dd = _make_decoder(table[_NC:_NC + _DC])
    ldd = _make_decoder(table[_NC + _DC:_NC + _DC + _LDC])
    rd = _make_decoder(table[_NC + _DC + _LDC:])
    return ld, dd, ldd, rd


def _slot_to_length(br: _BitReader, slot: int) -> int:
    if slot < 8:
        return 2 + slot
    lbits = (slot >> 2) - 1
    length = 2 + ((4 | (slot & 3)) << lbits)
    if lbits > 0:
        length += br.bits(lbits)
    return length


def _read_filter_data(br: _BitReader) -> int:
    byte_count = br.bits(2) + 1
    v = 0
    for i in range(byte_count):
        v += br.bits(8) << (i * 8)
    return v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def rar5_decompress(data: bytes, unp_size: int,
                    max_bytes: int = 256 * 2**20) -> bytes:
    """Decode one RAR5 compressed data area into ``unp_size`` bytes.

    Non-solid files only (a solid member's window starts where the
    previous member left off — the container layer refuses those
    typed).  Raises :class:`Rar5Error` with a stable reason string on
    any structural problem; never returns partial/garbage silently.
    """
    if unp_size > max_bytes:
        raise Rar5Error("archive_too_big")
    br = _BitReader(data)
    out = bytearray()
    filters: list[tuple[int, int, int, int]] = []
    old_dist = [0, 0, 0, 0]
    last_length = 0
    tables = None

    end_bit, last_block, table_present = _read_block_header(br)
    if table_present:
        tables = _read_tables(br)
    if tables is None:
        raise Rar5Error("rar_error")

    while len(out) < unp_size:
        if br.bitpos >= end_bit:
            if last_block:
                raise Rar5Error("rar_error")  # stream short of unp_size
            end_bit, last_block, table_present = _read_block_header(br)
            if table_present:
                tables = _read_tables(br)
            continue
        ld, dd, ldd, rd = tables
        main_slot = _decode_sym(br, ld)
        if main_slot < 256:
            out.append(main_slot)
            continue
        if main_slot >= 262:
            length = _slot_to_length(br, main_slot - 262)
            distance = 1
            dist_slot = _decode_sym(br, dd)
            if dist_slot < 4:
                distance += dist_slot
            else:
                dbits = (dist_slot >> 1) - 1
                distance += (2 | (dist_slot & 1)) << dbits
                if dbits > 0:
                    if dbits >= 4:
                        if dbits > 4:
                            distance += br.bits(dbits - 4) << 4
                        distance += _decode_sym(br, ldd)
                    else:
                        distance += br.bits(dbits)
            if distance > 0x100:
                length += 1
                if distance > 0x2000:
                    length += 1
                    if distance > 0x40000:
                        length += 1
            old_dist[1:] = old_dist[:3]
            old_dist[0] = distance
            last_length = length
            _copy_match(out, length, distance, unp_size)
            continue
        if main_slot == 256:
            if len(filters) >= _MAX_FILTERS:
                raise Rar5Error("rar_error")
            block_start = _read_filter_data(br)
            block_length = _read_filter_data(br)
            if block_length > _MAX_FILTER_BLOCK:
                block_length = 0
            ftype = br.bits(3)
            channels = 0
            if ftype == FILTER_DELTA:
                channels = br.bits(5) + 1
            if ftype > FILTER_ARM:
                raise Rar5Error("rar_error")
            filters.append((len(out) + block_start, block_length,
                            ftype, channels))
            continue
        if main_slot == 257:
            if last_length:
                _copy_match(out, last_length, old_dist[0], unp_size)
            continue
        # 258-261: rep distance from the LRU
        dist_num = main_slot - 258
        distance = old_dist[dist_num]
        for i in range(dist_num, 0, -1):
            old_dist[i] = old_dist[i - 1]
        old_dist[0] = distance
        length_slot = _decode_sym(br, rd)
        length = _slot_to_length(br, length_slot)
        last_length = length
        _copy_match(out, length, distance, unp_size)

    if len(out) != unp_size:
        raise Rar5Error("rar_error")
    _apply_filters(out, filters)
    return bytes(out)


def _copy_match(out: bytearray, length: int, distance: int,
                unp_size: int) -> None:
    n = len(out)
    if distance < 1 or distance > n:
        raise Rar5Error("rar_error")
    if n + length > unp_size:
        raise Rar5Error("rar_error")
    if distance >= length:
        start = n - distance
        out += out[start:start + length]
    else:
        for _ in range(length):  # overlapping copy (RLE-style)
            out.append(out[-distance])


def _apply_filters(out: bytearray,
                   filters: list[tuple[int, int, int, int]]) -> None:
    """Post-processing transforms, applied in announcement order over
    the decoded stream (UnpWriteBuf semantics: each filter sees the
    output of earlier filters)."""
    for start, length, ftype, channels in filters:
        if length == 0 or start >= len(out):
            continue
        length = min(length, len(out) - start)
        if ftype == FILTER_DELTA:
            src = bytes(out[start:start + length])
            src_pos = 0
            for ch in range(channels):
                prev = 0
                for dest in range(start + ch, start + length, channels):
                    prev = (prev - src[src_pos]) & 0xFF
                    src_pos += 1
                    out[dest] = prev
        elif ftype in (FILTER_E8, FILTER_E8E9):
            file_size = 0x1000000
            cmp2 = 0xE9 if ftype == FILTER_E8E9 else 0xE8
            pos = 0
            while pos < length - 4:
                cur = out[start + pos]
                pos += 1
                if cur == 0xE8 or cur == cmp2:
                    off = (pos + start) % file_size
                    addr = struct.unpack_from("<i", out, start + pos)[0]
                    if addr < 0:
                        if addr + off >= 0:
                            struct.pack_into(
                                "<I", out, start + pos,
                                (addr + file_size) & 0xFFFFFFFF)
                    elif addr < file_size:
                        struct.pack_into(
                            "<I", out, start + pos,
                            (addr - off) & 0xFFFFFFFF)
                    pos += 4
        elif ftype == FILTER_ARM:
            for pos in range(0, length - 3, 4):
                i = start + pos
                if out[i + 3] == 0xEB:
                    off = out[i] + (out[i + 1] << 8) + (out[i + 2] << 16)
                    off = (off - (start + pos) // 4) & 0xFFFFFF
                    out[i] = off & 0xFF
                    out[i + 1] = (off >> 8) & 0xFF
                    out[i + 2] = (off >> 16) & 0xFF


# ---------------------------------------------------------------------------
# compressor (fixture/self-verification side, LZX-codec pattern)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nacc = 0

    def bit_length(self) -> int:
        return len(self.buf) * 8 + self.nacc

    def finish(self) -> bytes:
        if self.nacc:
            self.buf.append(self.acc << (8 - self.nacc))
            self.acc = 0
            self.nacc = 0
        return bytes(self.buf)


def _huffman_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Code lengths for the used symbols; falls back to flat 9/6-bit
    codes if the tree would exceed the 15-bit cap (rare at fixture
    sizes)."""
    import heapq

    used = [s for s in range(alphabet) if freqs.get(s)]
    if not used:
        return [0] * alphabet
    if len(used) == 1:
        lengths = [0] * alphabet
        lengths[used[0]] = 1
        return lengths
    heap = [(freqs[s], s, None) for s in used]
    heapq.heapify(heap)
    counter = alphabet
    parents: dict[int, int] = {}
    while len(heap) > 1:
        f1, n1, _ = heapq.heappop(heap)
        f2, n2, _ = heapq.heappop(heap)
        parents[n1] = counter
        parents[n2] = counter
        heapq.heappush(heap, (f1 + f2, counter, None))
        counter += 1
    root = heap[0][1]
    lengths = [0] * alphabet
    deep = False
    for s in used:
        d = 0
        n = s
        while n != root:
            n = parents[n]
            d += 1
        lengths[s] = d
        if d > 15:
            deep = True
    if deep:
        flat = 1
        while (1 << flat) < len(used):
            flat += 1
        flat = max(flat, 1)
        lengths = [0] * alphabet
        for s in used:
            lengths[s] = flat
    return lengths


def _write_code_lengths(bw: _BitWriter, table: list[int]) -> None:
    """Pretree + RLE'd 430-entry table (zero runs via symbols 18/19)."""
    pre_lengths = [0] * _BC
    for s in range(_BC):
        pre_lengths[s] = 5
    for v in pre_lengths:
        bw.write(v, 4)
    pre_codes = _make_encoder(pre_lengths)
    i = 0
    n = len(table)
    while i < n:
        v = table[i]
        if v == 0:
            run = 1
            while i + run < n and table[i + run] == 0:
                run += 1
            while run >= 3:
                chunk = min(run, 138)
                if chunk >= 11:
                    code, ln = pre_codes[19]
                    bw.write(code, ln)
                    bw.write(chunk - 11, 7)
                else:
                    code, ln = pre_codes[18]
                    bw.write(code, ln)
                    bw.write(chunk - 3, 3)
                run -= chunk
                i += chunk
            for _ in range(run):
                code, ln = pre_codes[0]
                bw.write(code, ln)
                i += 1
        else:
            code, ln = pre_codes[v]
            bw.write(code, ln)
            i += 1


def _length_slot(v: int) -> tuple[int, int, int]:
    """length-2 value → (slot, extra, extra_bits)."""
    if v < 8:
        return v, 0, 0
    lbits = v.bit_length() - 3
    top3 = v >> lbits
    slot = 4 * lbits + top3
    return slot, v & ((1 << lbits) - 1), lbits


def _dist_slot(u: int) -> tuple[int, int, int]:
    """distance-1 value → (slot, extra, extra_bits)."""
    if u < 4:
        return u, 0, 0
    dbits = u.bit_length() - 2
    top2 = u >> dbits
    slot = 2 * dbits + top2
    return slot, u & ((1 << dbits) - 1), dbits


class Rar5Compressor:
    """Greedy-LZ RAR5 block writer.  Produces the packed data area for
    one (non-solid) file; symbol-level API is exposed so tests can craft
    rep-match / filter / multi-block streams deliberately."""

    MIN_MATCH = 4
    MAX_LEN = 3500  # < max slot reach even after distance increments
    WINDOW = 1 << 22

    def __init__(self):
        self.symbols: list[tuple] = []  # ('lit',b) ('match',len,dist)
                                        # ('rep',idx,len) ('replast',)
                                        # ('filter',start,len,type,ch)

    # -- symbol emitters -------------------------------------------------
    def literal(self, b: int) -> None:
        self.symbols.append(("lit", b))

    def match(self, length: int, dist: int) -> None:
        self.symbols.append(("match", length, dist))

    def rep(self, idx: int, length: int) -> None:
        self.symbols.append(("rep", idx, length))

    def rep_last(self) -> None:
        self.symbols.append(("replast",))

    def filter(self, start: int, length: int, ftype: int,
               channels: int = 0) -> None:
        self.symbols.append(("filter", start, length, ftype, channels))

    # -- greedy LZ front end --------------------------------------------
    def feed(self, data: bytes) -> None:
        n = len(data)
        head: dict[bytes, list[int]] = {}
        i = 0
        while i < n:
            best_len = 0
            best_dist = 0
            if i + self.MIN_MATCH <= n:
                key = data[i:i + self.MIN_MATCH]
                for j in reversed(head.get(key, ())):
                    if i - j > self.WINDOW:
                        break
                    length = self.MIN_MATCH
                    maxl = min(self.MAX_LEN, n - i)
                    while length < maxl and data[j + length] == data[i + length]:
                        length += 1
                    if length > best_len:
                        best_len = length
                        best_dist = i - j
                        if length >= 128:
                            break
            # distances past 0x100/0x2000/0x40000 implicitly lengthen
            # the match by 1 each — the slot can't encode lengths below
            # 2 + inc, so fall back to literals for too-short far matches
            if best_len >= self.MIN_MATCH:
                inc = ((best_dist > 0x100) + (best_dist > 0x2000)
                       + (best_dist > 0x40000))
                if best_len - inc - 2 < 0:
                    best_len = 0
            if best_len >= self.MIN_MATCH:
                self.match(best_len, best_dist)
                for k in range(i, min(i + best_len, n - self.MIN_MATCH + 1)):
                    head.setdefault(data[k:k + self.MIN_MATCH], []).append(k)
                    chain = head[data[k:k + self.MIN_MATCH]]
                    if len(chain) > 16:
                        del chain[0]
                i += best_len
            else:
                self.literal(data[i])
                if i + self.MIN_MATCH <= n:
                    head.setdefault(key, []).append(i)
                    if len(head[key]) > 16:
                        del head[key][0]
                i += 1

    # -- back end --------------------------------------------------------
    def _plan(self):
        """symbols → (main_sym, [(val,bits)...]) events + per-table freqs."""
        events = []
        f_main: dict[int, int] = {}
        f_dist: dict[int, int] = {}
        f_ldd: dict[int, int] = {}
        f_rep: dict[int, int] = {}

        def bump(d, k):
            d[k] = d.get(k, 0) + 1

        for sym in self.symbols:
            kind = sym[0]
            if kind == "lit":
                bump(f_main, sym[1])
                events.append((sym[1], [], None, None))
            elif kind == "match":
                _, length, dist = sym
                inc = ((dist > 0x100) + (dist > 0x2000)
                       + (dist > 0x40000))
                v = length - inc - 2
                if v < 0:
                    raise Rar5Error("rar_error")
                lslot, lextra, lbits = _length_slot(v)
                main = 262 + lslot
                bump(f_main, main)
                u = dist - 1
                dslot, dextra, dbits = _dist_slot(u)
                bump(f_dist, dslot)
                extras = [(lextra, lbits)] if lbits else []
                ldd_sym = None
                if dbits > 0:
                    if dbits >= 4:
                        if dbits > 4:
                            extras.append((dextra >> 4, dbits - 4))
                        ldd_sym = dextra & 15
                        bump(f_ldd, ldd_sym)
                    else:
                        extras.append((dextra, dbits))
                events.append((main, extras, dslot, ldd_sym))
            elif kind == "rep":
                _, idx, length = sym
                main = 258 + idx
                bump(f_main, main)
                v = length - 2
                rslot, rextra, rbits = _length_slot(v)
                bump(f_rep, rslot)
                extras = [(rextra, rbits)] if rbits else []
                events.append((main, extras, ("rep", rslot), None))
            elif kind == "replast":
                bump(f_main, 257)
                events.append((257, [], None, None))
            elif kind == "filter":
                _, start, length, ftype, channels = sym
                bump(f_main, 256)
                extras = []
                for value in (start, length):
                    nb = max(1, (value.bit_length() + 7) // 8)
                    if nb > 4:
                        raise Rar5Error("rar_error")
                    extras.append((nb - 1, 2))
                    for i in range(nb):
                        extras.append(((value >> (8 * i)) & 0xFF, 8))
                extras.append((ftype, 3))
                if ftype == FILTER_DELTA:
                    extras.append((channels - 1, 5))
                events.append((256, extras, None, None))
        return events, f_main, f_dist, f_ldd, f_rep

    def pack(self) -> bytes:
        events, f_main, f_dist, f_ldd, f_rep = self._plan()
        main_l = _huffman_lengths(f_main, _NC)
        dist_l = _huffman_lengths(f_dist, _DC)
        ldd_l = _huffman_lengths(f_ldd, _LDC)
        rep_l = _huffman_lengths(f_rep, _RC)
        main_c = _make_encoder(main_l)
        dist_c = _make_encoder(dist_l)
        ldd_c = _make_encoder(ldd_l)
        rep_c = _make_encoder(rep_l)

        body = _BitWriter()
        _write_code_lengths(body, main_l + dist_l + ldd_l + rep_l)
        for main, extras, dist_info, ldd_sym in events:
            code, ln = main_c[main]
            body.write(code, ln)
            if 262 <= main:
                ex = list(extras)
                if ex and ex[0][1] and main - 262 >= 8:
                    val, nb = ex.pop(0)      # length extra bits
                    body.write(val, nb)
                code, ln = dist_c[dist_info]
                body.write(code, ln)
                for val, nb in ex:           # high distance bits
                    body.write(val, nb)
                if ldd_sym is not None:
                    code, ln = ldd_c[ldd_sym]
                    body.write(code, ln)
            elif 258 <= main < 262:
                rslot = dist_info[1]
                code, ln = rep_c[rslot]
                body.write(code, ln)
                for val, nb in extras:
                    body.write(val, nb)
            elif main == 256:
                for val, nb in extras:
                    body.write(val, nb)

        nbits = body.bit_length()
        payload = body.finish()
        block_bit_size = nbits - (len(payload) - 1) * 8 if payload else 8
        if not payload:
            payload = b"\x00"
            block_bit_size = 8
        block_size = len(payload)
        byte_count = max(1, (block_size.bit_length() + 7) // 8)
        if byte_count > 3:
            raise Rar5Error("archive_too_big")
        flags = 0x80 | 0x40 | ((byte_count - 1) << 3) | (block_bit_size - 1)
        checksum = 0xFF & (0x5A ^ flags ^ block_size ^ (block_size >> 8)
                           ^ (block_size >> 16))
        header = bytes([flags, checksum]) + block_size.to_bytes(
            byte_count, "little")
        return header + payload


def rar5_compress(data: bytes) -> bytes:
    """data → packed RAR5 data area (one block, greedy LZ)."""
    c = Rar5Compressor()
    c.feed(data)
    return c.pack()
