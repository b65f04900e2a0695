"""RAR 2.9/3.x ("RAR29") LZSS codec — the LZ half of RAR4's
compression (the scheme unrar's unpack30.cpp implements; the de-facto
public specification, as for the RAR5 codec in ``rar5_codec.py``).

What decodes: LZ blocks — delta-coded Huffman table transmission
(4-bit pretree lengths with 15-escaped zero runs, then 404 table
entries coded via a 20-symbol pretree with repeat-previous 16/17 and
zero-run 18/19 symbols, each entry a DELTA mod 16 against the previous
table), the 299-symbol main alphabet (256 literals, 256 end-of-block,
257 VM filter, 258 last-match rep, 259-262 the 4-slot old-distance
LRU, 263-270 short length-2 matches, 271-298 length slots), the
60-slot pair-formula distance alphabet with the 17-symbol low-distance
Huffman (symbol 16 = repeat previous low nibble, 16-shot run), and the
28-slot rep-length alphabet.  Length/distance bases follow the same
formulas RAR5 inherited: ``len = 3 + (4|s&3) << (s//4-1) + extra`` for
slots ≥ 8 (rep lengths use ``2 +``), ``dist = 1 + (2|s&1) << (s//2-1)
+ extra`` for slots ≥ 4, distances ≥ 0x2000/0x40000 implicitly
lengthen the match, and the short-distance slots use the fixed
``SDDecode/SDBits`` ladder (0/4/8/16/32/64/128/192 with
2/2/3/4/5/6/6/6 extra bits).

What refuses, typed: PPMd blocks (bit 15 at a table boundary →
``rar_ppmd_unsupported`` — PPMd variant H carries model state across
the whole file; a partial implementation would decode garbage) and
RarVM filter programs (symbol 257 → ``rar_filter_unsupported``).  The
container additionally verifies the RAR4 FILE header's unpacked-data
CRC32, so even a misremembered constant here can only surface as
``rar_crc_mismatch``, never as silently-wrong member bytes.

Self-verification (LZX/RAR5 pattern): the from-scratch compressor
below emits real RAR29 streams (absolute first-table deltas against
the zeroed old table, greedy LZ, end-of-block marker) that round-trip
through the decoder; crafted vectors cover the rep/short/low-dist-rep
paths the greedy encoder skips.
"""
from __future__ import annotations

from .rar5_codec import (
    Rar5Error,
    _BitReader,
    _BitWriter,
    _huffman_lengths,
    _make_decoder,
    _make_encoder,
)


class Rar29Error(Rar5Error):
    pass


_NC = 299
_DC = 60
_LDC = 17
_RC = 28
_BC = 20
_TABLE_SIZE = _NC + _DC + _LDC + _RC  # 404

_LOW_DIST_REP_COUNT = 16

# short-match (length 2) distance ladder, slots 263-270
_SD_DECODE = (0, 4, 8, 16, 32, 64, 128, 192)
_SD_BITS = (2, 2, 3, 4, 5, 6, 6, 6)


def _len_slot_base(slot: int) -> tuple[int, int]:
    """length slot → (base, extra_bits); add 3 (new match) or 2 (rep)."""
    if slot < 8:
        return slot, 0
    bits = (slot >> 2) - 1
    return (4 | (slot & 3)) << bits, bits


def _dist_slot_base(slot: int) -> tuple[int, int]:
    if slot < 4:
        return slot, 0
    bits = (slot >> 1) - 1
    return (2 | (slot & 1)) << bits, bits


def _decode_sym(br: _BitReader, dec) -> int:
    first, by_len = dec
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | br.bits(1)
        idx = code - first[ln]
        if 0 <= idx < len(by_len[ln]):
            return by_len[ln][idx]
    raise Rar29Error("rar_error")


def _read_tables(br: _BitReader, old_table: list[int]):
    """Block-start table read (ReadTables30): byte-align, PPM/keep-old
    flag bits, pretree, delta-coded 404-entry table."""
    br.align()
    if br.bits(1):
        raise Rar29Error("rar_ppmd_unsupported")
    keep_old = br.bits(1)
    if not keep_old:
        for i in range(_TABLE_SIZE):
            old_table[i] = 0
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
            table[i] = (num + old_table[i]) & 0xF
            i += 1
        elif num < 18:
            n = br.bits(3) + 3 if num == 16 else br.bits(7) + 11
            if i == 0:
                raise Rar29Error("rar_error")
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
    old_table[:] = table
    ld = _make_decoder(table[:_NC])
    dd = _make_decoder(table[_NC:_NC + _DC])
    ldd = _make_decoder(table[_NC + _DC:_NC + _DC + _LDC])
    rd = _make_decoder(table[_NC + _DC + _LDC:])
    return ld, dd, ldd, rd


def _copy_match(out: bytearray, length: int, distance: int,
                unp_size: int) -> None:
    n = len(out)
    if distance < 1 or distance > n or n + length > unp_size:
        raise Rar29Error("rar_error")
    if distance >= length:
        start = n - distance
        out += out[start:start + length]
    else:
        for _ in range(length):
            out.append(out[-distance])


def rar29_decompress(data: bytes, unp_size: int,
                     max_bytes: int = 256 * 2**20) -> bytes:
    """Decode one RAR4 method-0x31..0x35 data area (non-solid)."""
    if unp_size > max_bytes:
        raise Rar29Error("archive_too_big")
    br = _BitReader(data)
    out = bytearray()
    old_table = [0] * _TABLE_SIZE
    old_dist = [0, 0, 0, 0]
    last_dist = 0
    last_length = 0
    prev_low_dist = 0
    low_dist_rep = 0
    ld, dd, ldd, rd = _read_tables(br, old_table)

    while len(out) < unp_size:
        if br.bitpos >= br.nbits:
            raise Rar29Error("rar_error")
        num = _decode_sym(br, ld)
        if num < 256:
            out.append(num)
            continue
        if num >= 271:
            base, bits = _len_slot_base(num - 271)
            length = 3 + base + (br.bits(bits) if bits else 0)
            dist_slot = _decode_sym(br, dd)
            dbase, dbits = _dist_slot_base(dist_slot)
            distance = 1 + dbase
            if dbits > 0:
                if dist_slot > 9:
                    if dbits > 4:
                        distance += br.bits(dbits - 4) << 4
                    if low_dist_rep > 0:
                        low_dist_rep -= 1
                        distance += prev_low_dist
                    else:
                        low_dist = _decode_sym(br, ldd)
                        if low_dist == 16:
                            low_dist_rep = _LOW_DIST_REP_COUNT - 1
                            distance += prev_low_dist
                        else:
                            distance += low_dist
                            prev_low_dist = low_dist
                else:
                    distance += br.bits(dbits)
            if distance >= 0x2000:
                length += 1
                if distance >= 0x40000:
                    length += 1
            old_dist[1:] = old_dist[:3]
            old_dist[0] = distance
            last_dist, last_length = distance, length
            _copy_match(out, length, distance, unp_size)
            continue
        if num == 256:
            # end of block: 1xxxx → new table here; 0t → file ends
            if br.bits(1):
                ld, dd, ldd, rd = _read_tables(br, old_table)
                prev_low_dist = 0
                low_dist_rep = 0
                continue
            br.bits(1)  # whether the NEXT solid file needs a table
            break
        if num == 257:
            raise Rar29Error("rar_filter_unsupported")
        if num == 258:
            if last_length:
                _copy_match(out, last_length, last_dist, unp_size)
            continue
        if num < 263:
            dist_num = num - 259
            distance = old_dist[dist_num]
            for i in range(dist_num, 0, -1):
                old_dist[i] = old_dist[i - 1]
            old_dist[0] = distance
            length_slot = _decode_sym(br, rd)
            base, bits = _len_slot_base(length_slot)
            length = 2 + base + (br.bits(bits) if bits else 0)
            last_dist, last_length = distance, length
            _copy_match(out, length, distance, unp_size)
            continue
        # 263-270: short length-2 match
        sd = num - 263
        distance = 1 + _SD_DECODE[sd]
        if _SD_BITS[sd]:
            distance += br.bits(_SD_BITS[sd])
        old_dist[1:] = old_dist[:3]
        old_dist[0] = distance
        last_dist, last_length = distance, 2
        _copy_match(out, 2, distance, unp_size)

    if len(out) != unp_size:
        raise Rar29Error("rar_error")
    return bytes(out)


# ---------------------------------------------------------------------------
# compressor (self-verification side)
# ---------------------------------------------------------------------------


class Rar29Compressor:
    """Greedy-LZ RAR29 block writer (one LZ block, absolute first-table
    deltas, end-of-block marker).  Symbol-level emitters exposed for
    crafted decoder-path tests."""

    MIN_MATCH = 4
    MAX_LEN = 250  # LDecode max 224 + 31 extra, minus distance incs
    WINDOW = 1 << 22

    def __init__(self):
        self.symbols: list[tuple] = []

    def literal(self, b: int) -> None:
        self.symbols.append(("lit", b))

    def match(self, length: int, dist: int) -> None:
        self.symbols.append(("match", length, dist))

    def short_match(self, dist: int) -> None:
        self.symbols.append(("short", dist))

    def rep(self, idx: int, length: int) -> None:
        self.symbols.append(("rep", idx, length))

    def rep_last(self) -> None:
        self.symbols.append(("replast",))

    def feed(self, data: bytes) -> None:
        n = len(data)
        head: dict[bytes, list[int]] = {}
        i = 0
        while i < n:
            best_len = 0
            best_dist = 0
            key = None
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
            if best_len >= self.MIN_MATCH:
                inc = ((best_dist >= 0x2000) + (best_dist >= 0x40000))
                if best_len - inc - 3 < 0:
                    best_len = 0
            if best_len >= self.MIN_MATCH:
                self.match(best_len, best_dist)
                for k in range(i, min(i + best_len, n - self.MIN_MATCH + 1)):
                    chain = head.setdefault(data[k:k + self.MIN_MATCH], [])
                    chain.append(k)
                    if len(chain) > 16:
                        del chain[0]
                i += best_len
            else:
                self.literal(data[i])
                if key is not None:
                    chain = head.setdefault(key, [])
                    chain.append(i)
                    if len(chain) > 16:
                        del chain[0]
                i += 1

    def _len_slot(self, v: int) -> tuple[int, int, int]:
        """length - 3 (new) or - 2 (rep) → (slot, extra, bits)."""
        if v < 8:
            return v, 0, 0
        bits = v.bit_length() - 3
        slot = 4 * bits + (v >> bits)
        return slot, v & ((1 << bits) - 1), bits

    def _plan(self):
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
                events.append(("main", sym[1], []))
            elif kind == "match":
                _, length, dist = sym
                inc = (dist >= 0x2000) + (dist >= 0x40000)
                v = length - inc - 3
                if v < 0:
                    raise Rar29Error("rar_error")
                lslot, lextra, lbits = self._len_slot(v)
                bump(f_main, 271 + lslot)
                u = dist - 1
                if u < 4:
                    dslot, dextra, dbits = u, 0, 0
                else:
                    dbits = u.bit_length() - 2
                    dslot = 2 * dbits + (u >> dbits)
                    dextra = u & ((1 << dbits) - 1)
                bump(f_dist, dslot)
                parts = [("bits", lextra, lbits)] if lbits else []
                parts.append(("dist", dslot, 0))
                if dbits > 0:
                    if dslot > 9:
                        if dbits > 4:
                            parts.append(("bits", dextra >> 4, dbits - 4))
                        parts.append(("ldd", dextra & 15, 0))
                        bump(f_ldd, dextra & 15)
                    else:
                        parts.append(("bits", dextra, dbits))
                events.append(("main", 271 + lslot, parts))
            elif kind == "short":
                _, dist = sym
                u = dist - 1
                sd = None
                for s in range(7, -1, -1):
                    if u >= _SD_DECODE[s]:
                        sd = s
                        break
                extra = u - _SD_DECODE[sd]
                if extra >= (1 << _SD_BITS[sd]):
                    raise Rar29Error("rar_error")
                bump(f_main, 263 + sd)
                parts = ([("bits", extra, _SD_BITS[sd])]
                         if _SD_BITS[sd] else [])
                events.append(("main", 263 + sd, parts))
            elif kind == "rep":
                _, idx, length = sym
                v = length - 2  # rep lengths carry no distance increments
                rslot, rextra, rbits = self._len_slot(v)
                bump(f_main, 259 + idx)
                bump(f_rep, rslot)
                parts = [("rep", rslot, 0)]
                if rbits:
                    parts.append(("bits", rextra, rbits))
                events.append(("main", 259 + idx, parts))
            else:  # replast
                bump(f_main, 258)
                events.append(("main", 258, []))
        bump(f_main, 256)  # end-of-block marker
        events.append(("main", 256, [("bits", 0, 2)]))  # 0 + no-table bit
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

        bw = _BitWriter()
        bw.write(0, 1)  # not PPM
        bw.write(0, 1)  # do not keep old table (old = zeros → absolute)
        table = main_l + dist_l + ldd_l + rep_l
        # pretree: flat 5-bit codes, zero runs via 18/19
        pre_lengths = [5] * _BC
        for v in pre_lengths:
            bw.write(v, 4)
        pre_codes = _make_encoder(pre_lengths)
        i = 0
        while i < _TABLE_SIZE:
            v = table[i]
            if v == 0:
                run = 1
                while i + run < _TABLE_SIZE and table[i + run] == 0:
                    run += 1
                while run >= 3:
                    chunk = min(run, 138)
                    if chunk >= 11:
                        c, ln = pre_codes[19]
                        bw.write(c, ln)
                        bw.write(chunk - 11, 7)
                    else:
                        c, ln = pre_codes[18]
                        bw.write(c, ln)
                        bw.write(chunk - 3, 3)
                    run -= chunk
                    i += chunk
                for _ in range(run):
                    c, ln = pre_codes[0]
                    bw.write(c, ln)
                    i += 1
            else:
                c, ln = pre_codes[v]
                bw.write(c, ln)
                i += 1
        for _, main, parts in events:
            c, ln = main_c[main]
            bw.write(c, ln)
            for kind, val, nbits in parts:
                if kind == "bits":
                    bw.write(val, nbits)
                elif kind == "dist":
                    c, ln = dist_c[val]
                    bw.write(c, ln)
                elif kind == "ldd":
                    c, ln = ldd_c[val]
                    bw.write(c, ln)
                else:  # rep length slot
                    c, ln = rep_c[val]
                    bw.write(c, ln)
        return bw.finish()


def rar29_compress(data: bytes) -> bytes:
    c = Rar29Compressor()
    c.feed(data)
    return c.pack()
