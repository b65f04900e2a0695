"""Pure-Python zstd decoder (RFC 8878, public spec).

Zstandard shows up in three places a web-scale corpus cares about:
RPM payloads (``PAYLOADCOMPRESSOR=zstd`` is the Fedora/RHEL9 default,
previously an honest ``rpm_payload_unsupported`` in
:mod:`..operators.unix_archives`), ``.zst``/``.tar.zst`` member files,
and the registered HTTP content-coding ``zstd`` (RFC 8878 §7.2) that
:mod:`..sources.warc` must undo before text extraction.  The reference
reaches these through the ``7z`` binary's format list
(``/root/reference/snoop/data/analyzers/archives.py:41-55``); here the
decoder is from scratch against the RFC.

Decoder coverage: full frame/block framing (raw, RLE, compressed
blocks; skippable frames; multi-frame streams), Huffman-coded literals
(direct and FSE-compressed weight descriptions, 1- and 4-stream
layouts, treeless repeat), FSE sequence decoding (predefined, RLE,
FSE-compressed, and repeat table modes), the three repeat-offset codes
with the literals_length==0 special case, and overlapping match
copies.  Dictionaries are refused with a typed reason (corpus streams
are self-contained), and the optional xxhash64 content checksum is
consumed but not verified.

Every failure raises :class:`ZstdError` — the decoder is driven inside
Arrow-batched kernels where an untyped exception fails a whole Spark
task instead of producing one broken row.

Correctness is pinned two ways in ``tests/test_zstd.py``: hand-built
raw/RLE frames decode byte-exactly, and — when the ``zstd`` CLI is
present — real compressor output across levels/sizes/shapes round-trips
bit-exactly (the CLI exercises every FSE/Huffman path, including
4-stream literals and repeat tables).
"""

from __future__ import annotations

import struct

__all__ = ["ZstdError", "zstd_decompress", "is_zstd"]


class ZstdError(ValueError):
    """Malformed/unsupported zstd input; callers map it to broken_reason."""


_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F

#: predefined FSE distributions (RFC 8878 §3.1.1.3.2.2.1); -1 is the
#: "less than one" probability that pins a single cell at the table end
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1], 6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1], 6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5,
)

#: literals-length code → (baseline, extra bits) (§3.1.1.3.2.1.1)
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
#: match-length code → (baseline, extra bits) (§3.1.1.3.2.1.1)
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]

assert sum(max(v, 1) for v in _LL_DEFAULT[0]) == 1 << _LL_DEFAULT[1]
assert sum(max(v, 1) for v in _ML_DEFAULT[0]) == 1 << _ML_DEFAULT[1]
assert sum(max(v, 1) for v in _OF_DEFAULT[0]) == 1 << _OF_DEFAULT[1]
assert len(_LL_BASE) == len(_LL_BITS) == 36
assert len(_ML_BASE) == len(_ML_BITS) == 53


def is_zstd(data: bytes) -> bool:
    return len(data) >= 4 and struct.unpack("<I", data[:4])[0] == _MAGIC


# ---------------------------------------------------------------- bitstreams


class _BackBits:
    """RFC 8878 backward bitstream: bits are written LSB-first per byte
    but read from the END; the final byte's highest set bit is a
    sentinel marking where real data stops."""

    __slots__ = ("val", "bits")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ZstdError("zstd_corrupt_bitstream")
        self.val = int.from_bytes(buf, "little")
        self.bits = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1

    def read(self, n: int) -> int:
        """Consume n bits (0 allowed); reading past the start is a
        corruption for every caller here."""
        if n == 0:
            return 0
        self.bits -= n
        if self.bits < 0:
            raise ZstdError("zstd_bitstream_underrun")
        return (self.val >> self.bits) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Look at n bits, zero-filling past the start (Huffman decode
        legitimately peeks beyond the final code's end)."""
        if self.bits >= n:
            return (self.val >> (self.bits - n)) & ((1 << n) - 1)
        if self.bits <= 0:
            return 0
        return (self.val << (n - self.bits)) & ((1 << n) - 1)

    def consume(self, n: int):
        self.bits -= n


class _FwdBits:
    """Little-endian forward bit reader (FSE table descriptions)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def peek(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            if self.pos >= len(self.data) and self.nbits + 8 < n:
                raise ZstdError("zstd_truncated_fse_header")
            self.acc |= b << self.nbits
            self.nbits += 8
            self.pos += 1
        return self.acc & ((1 << n) - 1)

    def take(self, n: int) -> int:
        v = self.peek(n)
        self.acc >>= n
        self.nbits -= n
        return v

    def consumed_bytes(self) -> int:
        return self.pos - self.nbits // 8


# ------------------------------------------------------------------- FSE


class _FseTable:
    """Decode table: per state (symbol, nbits, base_state)."""

    __slots__ = ("log", "symbol", "nbits", "base")

    def __init__(self, counts: list[int], log: int):
        size = 1 << log
        self.log = log
        self.symbol = [0] * size
        self.nbits = [0] * size
        self.base = [0] * size
        spread = [0] * size
        high = size - 1
        for s, c in enumerate(counts):
            if c == -1:
                spread[high] = s
                high -= 1
        pos = 0
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        for s, c in enumerate(counts):
            for _ in range(max(c, 0)):
                spread[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("zstd_bad_fse_distribution")
        # per-symbol occurrence counters give each state its next-state
        # baseline: the j-th state of a symbol with count c maps x=c+j
        nxt = [max(c, 0) for c in counts] + [0]
        for i in range(size):
            s = spread[i]
            if i > high:  # "less than one" cells: full state reset
                self.symbol[i] = s
                self.nbits[i] = log
                self.base[i] = 0
                continue
            x = nxt[s]
            nxt[s] += 1
            nb = log - (x.bit_length() - 1)
            self.symbol[i] = s
            self.nbits[i] = nb
            self.base[i] = (x << nb) - size

    @classmethod
    def rle(cls, symbol: int) -> "_FseTable":
        t = cls.__new__(cls)
        t.log = 0
        t.symbol = [symbol]
        t.nbits = [0]
        t.base = [0]
        return t


def _read_fse_table(fwd: _FwdBits, max_log: int, max_symbols: int) -> _FseTable:
    """Parse an FSE table description (§4.1.1) from the forward stream."""
    log = fwd.take(4) + 5
    if log > max_log:
        raise ZstdError("zstd_fse_log_too_large")
    size = 1 << log
    remaining = size + 1
    threshold = size
    nbits = log + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbols:
        if prev_zero:
            while fwd.peek(2) == 3:
                fwd.take(2)
                counts.extend([0, 0, 0])
            counts.extend([0] * fwd.take(2))
            if len(counts) > max_symbols:
                break
            prev_zero = False
            continue
        maxv = 2 * threshold - 1 - remaining
        small = fwd.peek(nbits - 1)
        if small < maxv:
            fwd.take(nbits - 1)
            count = small
        else:
            count = fwd.take(nbits)
            if count >= threshold:
                count -= maxv
        count -= 1  # shift: -1 = less-than-one
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1 or len(counts) > max_symbols + 1:
        raise ZstdError("zstd_bad_fse_header")
    return _FseTable(counts, log)


# --------------------------------------------------------------- Huffman


class _HuffTable:
    __slots__ = ("max_bits", "symbol", "nbits")

    def __init__(self, weights: list[int]):
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("zstd_bad_huffman_weights")
        max_bits = total.bit_length()  # 2^max_bits = next power of two
        missing = (1 << max_bits) - total
        if missing & (missing - 1):
            raise ZstdError("zstd_bad_huffman_weights")
        weights = weights + [missing.bit_length()]  # implied last weight
        if max_bits > 11:
            raise ZstdError("zstd_huffman_too_deep")
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbol = [0] * size
        self.nbits = [0] * size
        pos = 0
        # ascending weight = descending code length, filled sequentially
        for w in range(1, max_bits + 1):
            for s, ws in enumerate(weights):
                if ws != w:
                    continue
                span = 1 << (w - 1)
                nb = max_bits + 1 - w
                for i in range(pos, pos + span):
                    self.symbol[i] = s
                    self.nbits[i] = nb
                pos += span
        if pos != size:
            raise ZstdError("zstd_bad_huffman_weights")

    def decode_stream(self, buf: bytes, n_out: int) -> bytearray:
        br = _BackBits(buf)
        out = bytearray()
        mb = self.max_bits
        while len(out) < n_out:
            idx = br.peek(mb)
            out.append(self.symbol[idx])
            br.consume(self.nbits[idx])
        if br.bits != 0:
            raise ZstdError("zstd_huffman_stream_not_consumed")
        return out


def _read_huffman(data: bytes) -> tuple[_HuffTable, int]:
    """Parse a Huffman tree description (§4.2.1); returns (table,
    bytes consumed)."""
    if not data:
        raise ZstdError("zstd_truncated_huffman")
    hb = data[0]
    if hb >= 128:  # direct 4-bit weights
        n = hb - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ZstdError("zstd_truncated_huffman")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return _HuffTable(weights), 1 + nbytes
    # FSE-compressed weights: hb = compressed size incl. FSE description
    comp = data[1 : 1 + hb]
    if len(comp) < hb:
        raise ZstdError("zstd_truncated_huffman")
    fwd = _FwdBits(comp)
    table = _read_fse_table(fwd, 6, 255)
    stream = comp[fwd.consumed_bytes():]
    br = _BackBits(stream)
    s1 = br.read(table.log)
    s2 = br.read(table.log)
    weights: list[int] = []
    states = [s1, s2]
    i = 0
    while True:
        if len(weights) > 255:
            raise ZstdError("zstd_bad_huffman_weights")
        cell = states[i]
        weights.append(table.symbol[cell])
        nb = table.nbits[cell]
        if br.bits < nb:
            # stream exhausted: flush the other state's pending symbol
            weights.append(table.symbol[states[1 - i]])
            break
        states[i] = table.base[cell] + br.read(nb)
        i ^= 1
    return _HuffTable(weights), 1 + hb


# --------------------------------------------------------------- literals


def _decode_literals(block: bytes, ctx: dict) -> tuple[bytearray, int]:
    """Returns (literals, bytes consumed from the block)."""
    if not block:
        raise ZstdError("zstd_truncated_block")
    b0 = block[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            hdr = 1
        elif size_format == 1:
            if len(block) < 2:
                raise ZstdError("zstd_truncated_block")
            regen = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            if len(block) < 3:
                raise ZstdError("zstd_truncated_block")
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if lit_type == 0:
            if len(block) < hdr + regen:
                raise ZstdError("zstd_truncated_block")
            return bytearray(block[hdr : hdr + regen]), hdr + regen
        if len(block) < hdr + 1:
            raise ZstdError("zstd_truncated_block")
        return bytearray(block[hdr : hdr + 1] * regen), hdr + 1

    # compressed (2) / treeless (3)
    if size_format == 0:
        streams, sbits, hdr = 1, 10, 3
    elif size_format == 1:
        streams, sbits, hdr = 4, 10, 3
    elif size_format == 2:
        streams, sbits, hdr = 4, 14, 4
    else:
        streams, sbits, hdr = 4, 18, 5
    if len(block) < hdr:
        raise ZstdError("zstd_truncated_block")
    packed = int.from_bytes(block[:hdr], "little") >> 4
    regen = packed & ((1 << sbits) - 1)
    comp = (packed >> sbits) & ((1 << sbits) - 1)
    if len(block) < hdr + comp:
        raise ZstdError("zstd_truncated_block")
    body = block[hdr : hdr + comp]
    if lit_type == 2:
        huff, used = _read_huffman(body)
        ctx["huff"] = huff
        body = body[used:]
    else:
        huff = ctx.get("huff")
        if huff is None:
            raise ZstdError("zstd_treeless_without_table")
    if streams == 1:
        return huff.decode_stream(body, regen), hdr + comp
    if len(body) < 6:
        raise ZstdError("zstd_truncated_block")
    j1, j2, j3 = struct.unpack("<HHH", body[:6])
    rest = body[6:]
    if j1 + j2 + j3 > len(rest):
        raise ZstdError("zstd_bad_jump_table")
    parts = [
        rest[:j1], rest[j1 : j1 + j2], rest[j1 + j2 : j1 + j2 + j3],
        rest[j1 + j2 + j3 :],
    ]
    per = (regen + 3) // 4
    last = regen - 3 * per
    if last < 0:
        raise ZstdError("zstd_bad_literals_size")
    out = bytearray()
    for part, n in zip(parts, (per, per, per, last)):
        out += huff.decode_stream(part, n)
    return out, hdr + comp


# -------------------------------------------------------------- sequences


def _seq_table(fwd: _FwdBits, mode: int, default, max_log: int,
               max_sym: int, ctx: dict, key: str,
               rle_byte_src: bytes) -> tuple[_FseTable, int]:
    """Resolve one of the three sequence code tables per its 2-bit
    compression mode; returns (table, rle bytes consumed)."""
    if mode == 0:  # predefined
        t = ctx.setdefault(
            "_pre_" + key, _FseTable(default[0], default[1])
        )
        ctx[key] = t
        return t, 0
    if mode == 1:  # RLE: one byte = the constant symbol
        if not rle_byte_src:
            raise ZstdError("zstd_truncated_block")
        sym = rle_byte_src[0]
        if sym > max_sym:
            raise ZstdError("zstd_bad_sequence_symbol")
        t = _FseTable.rle(sym)
        ctx[key] = t
        return t, 1
    if mode == 2:  # FSE-compressed description
        t = _read_fse_table(fwd, max_log, max_sym)
        ctx[key] = t
        return t, 0
    t = ctx.get(key)  # repeat
    if t is None:
        raise ZstdError("zstd_repeat_without_table")
    return t, 0


def _decode_sequences(data: bytes, ctx: dict):
    """Parse the sequences section; returns list of (ll, ml, offset_code
    value) triples (offsets unresolved — repeat logic runs at execute)."""
    if not data:
        raise ZstdError("zstd_truncated_block")
    b0 = data[0]
    if b0 == 0:
        return [], 1
    if b0 < 128:
        nseq, pos = b0, 1
    elif b0 < 255:
        if len(data) < 2:
            raise ZstdError("zstd_truncated_block")
        nseq, pos = ((b0 - 128) << 8) | data[1], 2
    else:
        if len(data) < 3:
            raise ZstdError("zstd_truncated_block")
        nseq, pos = data[1] | (data[2] << 8) | 0x7F00, 3
    if len(data) < pos + 1:
        raise ZstdError("zstd_truncated_block")
    scm = data[pos]
    pos += 1
    if scm & 3:
        raise ZstdError("zstd_reserved_seq_mode")
    ll_mode = (scm >> 6) & 3
    of_mode = (scm >> 4) & 3
    ml_mode = (scm >> 2) & 3

    # table descriptions follow in LL, OF, ML order; RLE modes eat one
    # byte each at their position in that same order
    body = data[pos:]
    used = 0

    def next_table(mode, default, max_log, max_sym, key):
        nonlocal used, body
        fwd = _FwdBits(body[used:])
        if mode == 2:
            t, _ = _seq_table(fwd, mode, default, max_log, max_sym, ctx,
                              key, b"")
            used += fwd.consumed_bytes()
            return t
        t, rle_used = _seq_table(
            _FwdBits(b""), mode, default, max_log, max_sym, ctx, key,
            body[used:],
        )
        used += rle_used
        return t

    t_ll = next_table(ll_mode, _LL_DEFAULT, 9, 35, "ll")
    t_of = next_table(of_mode, _OF_DEFAULT, 8, 31, "of")
    t_ml = next_table(ml_mode, _ML_DEFAULT, 9, 52, "ml")

    br = _BackBits(body[used:])
    s_ll = br.read(t_ll.log)
    s_of = br.read(t_of.log)
    s_ml = br.read(t_ml.log)
    seqs = []
    for i in range(nseq):
        of_code = t_of.symbol[s_of]
        if of_code > 31:
            raise ZstdError("zstd_bad_offset_code")
        ov = (1 << of_code) + br.read(of_code) if of_code else 1 + br.read(0)
        ml_code = t_ml.symbol[s_ml]
        ml = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll_code = t_ll.symbol[s_ll]
        ll = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        seqs.append((ll, ml, ov))
        if i != nseq - 1:  # the final sequence skips the state update
            s_ll = t_ll.base[s_ll] + br.read(t_ll.nbits[s_ll])
            s_ml = t_ml.base[s_ml] + br.read(t_ml.nbits[s_ml])
            s_of = t_of.base[s_of] + br.read(t_of.nbits[s_of])
    if br.bits != 0:
        raise ZstdError("zstd_sequences_not_consumed")
    return seqs, None


def _execute(seqs, literals: bytearray, out: bytearray, reps: list[int],
             max_output: int):
    lit_pos = 0
    for ll, ml, ov in seqs:
        if ov > 3:
            offset = ov - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = ov + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            elif idx == 3:
                offset = reps[2]
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and ov == 3: repeat1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("zstd_zero_offset")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(literals):
            raise ZstdError("zstd_literals_overrun")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        start = len(out) - offset
        if start < 0:
            raise ZstdError("zstd_offset_beyond_window")
        if len(out) + ml > max_output:
            raise ZstdError("zstd_too_large")
        if offset >= ml:
            out += out[start : start + ml]
        else:  # overlapping copy replicates the run byte-by-chunk
            remaining = ml
            while remaining > 0:
                chunk = min(remaining, offset)
                out += out[start : start + chunk]
                start += chunk
                remaining -= chunk
    out += literals[lit_pos:]


def _decode_block(block: bytes, ctx: dict, out: bytearray,
                  max_output: int):
    literals, used = _decode_literals(block, ctx)
    seqs, empty_used = _decode_sequences(block[used:], ctx)
    if not seqs:
        if len(out) + len(literals) > max_output:
            raise ZstdError("zstd_too_large")
        out += literals
        return
    _execute(seqs, literals, out, ctx["reps"], max_output)


def zstd_decompress(data: bytes, max_output: int = 1 << 30) -> bytes:
    """Decode one or more concatenated zstd frames to bytes."""
    out = bytearray()
    for _off, _ln, kind, payload in iter_zstd_frames(data, max_output):
        if kind == "frame":
            out += payload
            if len(out) > max_output:
                raise ZstdError("zstd_too_large")
    return bytes(out)


def iter_zstd_frames(data: bytes, max_output: int = 1 << 30):
    """Walk a multi-frame stream, yielding ``(offset, compressed_length,
    kind, payload)`` per frame — ``kind`` is ``"frame"`` (payload =
    decoded bytes) or ``"skippable"`` (payload = the frame's raw user
    content; its magic's low nibble is ``offset`` + 0x50).  The per-frame
    spans make each frame independently fetchable, which is what the
    ``.warc.zst`` convention (one zstd frame per record group) relies
    on — the zstd analogue of the CDX gzip-member contract."""
    pos = 0
    n = len(data)
    while pos < n:
        frame_start = pos
        if n - pos < 4:
            raise ZstdError("zstd_truncated_frame")
        (magic,) = struct.unpack_from("<I", data, pos)
        if _SKIP_LO <= magic <= _SKIP_HI:
            if n - pos < 8:
                raise ZstdError("zstd_truncated_frame")
            (skip,) = struct.unpack_from("<I", data, pos + 4)
            if n - pos < 8 + skip:
                raise ZstdError("zstd_truncated_frame")
            pos += 8 + skip
            yield (frame_start, pos - frame_start, "skippable",
                   data[frame_start + 8 : pos])
            continue
        if magic != _MAGIC:
            raise ZstdError("not_zstd" if pos == 0 else "zstd_bad_frame")
        out = bytearray()
        pos += 4
        if pos >= n:
            raise ZstdError("zstd_truncated_frame")
        fhd = data[pos]
        pos += 1
        single = (fhd >> 5) & 1
        fcs_flag = fhd >> 6
        has_checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if fhd & 0x18:
            raise ZstdError("zstd_reserved_fhd_bits")
        if not single:
            pos += 1  # window descriptor (size sanity is max_output's job)
        pos += (0, 1, 2, 4)[did_flag]
        if did_flag:
            raise ZstdError("zstd_dictionary_unsupported")
        fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
        pos += fcs_len
        if pos > n:
            raise ZstdError("zstd_truncated_frame")
        ctx: dict = {"reps": [1, 4, 8]}
        while True:
            if n - pos < 3:
                raise ZstdError("zstd_truncated_frame")
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = hdr & 1
            btype = (hdr >> 1) & 3
            bsize = hdr >> 3
            if btype == 0:
                if n - pos < bsize:
                    raise ZstdError("zstd_truncated_frame")
                if len(out) + bsize > max_output:
                    raise ZstdError("zstd_too_large")
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:
                if pos >= n:
                    raise ZstdError("zstd_truncated_frame")
                if len(out) + bsize > max_output:
                    raise ZstdError("zstd_too_large")
                out += data[pos : pos + 1] * bsize
                pos += 1
            elif btype == 2:
                if n - pos < bsize:
                    raise ZstdError("zstd_truncated_frame")
                _decode_block(data[pos : pos + bsize], ctx, out, max_output)
                pos += bsize
            else:
                raise ZstdError("zstd_reserved_block")
            if last:
                break
        if has_checksum:
            pos += 4  # consumed, not verified (xxh64 low 32)
            if pos > n:
                raise ZstdError("zstd_truncated_frame")
        yield frame_start, pos - frame_start, "frame", bytes(out)


def zstd_compress_store(data: bytes, block_size: int = 65536) -> bytes:
    """Minimal RFC 8878 writer for fixtures: single-segment frame of
    raw blocks (runs of one byte become RLE blocks).  No entropy coding
    — a store-mode stream any conforming decoder (including the real
    ``zstd`` CLI, cross-checked in tests) accepts."""
    n = len(data)
    out = bytearray(struct.pack("<I", _MAGIC))
    if n <= 255:
        out += bytes([0x20, n])  # single_segment, fcs_flag=0 → 1 byte
    elif n <= 65535 + 256:
        out += bytes([0x60]) + struct.pack("<H", n - 256)
    else:
        out += bytes([0xA0]) + struct.pack("<I", n)
    if n == 0:
        out += (1).to_bytes(3, "little")  # empty raw block, last=1
        return bytes(out)
    pos = 0
    while pos < n:
        chunk = data[pos : pos + block_size]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            out += ((len(chunk) << 3) | 2 | last).to_bytes(3, "little")
            out += chunk[:1]
        else:
            out += ((len(chunk) << 3) | last).to_bytes(3, "little")
            out += chunk
    return bytes(out)
