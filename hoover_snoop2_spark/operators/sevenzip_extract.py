"""7-Zip archive unpacking — a pure-Python reader for the public 7z
container format (the `7zFormat.txt` spec shipped with the LZMA SDK),
covering the archives the stdlib can decode.

The reference shells every archive to ``7z x`` (archives.py:173-203);
this reader parses the container natively and decompresses folders with
``lzma``'s raw filters:

- COPY (coder id 00), LZMA1 (03 01 01, 5-byte props), LZMA2 (21, 1-byte
  dict-size prop) — the coders 7z writes by default for data;
- branch-converter chains: BCJ x86 (04 / 03 03 01 03), Delta (03), and
  the PPC/IA64/ARM/ARMT/SPARC converters, chained with LZMA1/LZMA2 in one
  raw-filter decompressor (the layout 7z writes for executables);
- BCJ2 (03 03 01 1B), the 4-stream x86 converter 7z prefers for
  installers: main/call/jump streams plus an LZMA-style range-coded
  control stream, decoded natively with a dataflow walk over the
  folder's bind pairs (each BCJ2 input either directly packed or fed by
  a simple COPY/LZMA coder);
- EncodedHeader (the usual case: the metadata block is itself an
  LZMA-compressed folder) is decoded through the same path;
- AES-256 folders (coder 06F10701, chained with COPY/LZMA or alone, and
  the encrypted-header variant) decrypt with the worker-local archive
  password (functions/archive_crypto): iterated-SHA-256 key derivation +
  CBC per 7zAes.cpp; no password → ``7z_encrypted``, wrong password →
  ``7z_bad_password`` (member CRCs are verified on extraction, so a
  wrong key can never yield wrong bytes); other multi-coder graphs are
  ``7z_codec_unsupported`` — never a wrong extraction.

Multi-file archives use one folder with substream splitting (kSize per
substream), matching 7z's solid-block layout.
"""

from __future__ import annotations

import io
import lzma
import struct
from zlib import crc32 as _crc32

SEVENZIP_MIME = "application/x-7z-compressed"

MAGIC = b"7z\xbc\xaf\x27\x1c"

_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS_INFO = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_CODERS_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODER_COPY = b"\x00"
_CODER_LZMA1 = b"\x03\x01\x01"
_CODER_LZMA2 = b"\x21"
_CODER_AES = b"\x06\xf1\x07\x01"
_CODER_DELTA = b"\x03"

_CODER_BCJ2 = b"\x03\x03\x01\x1b"

#: branch-converter coders (7z method ids) → stdlib raw-filter ids; these
#: chain with LZMA1/LZMA2 in one lzma.LZMADecompressor (BCJ+LZMA is the
#: common layout for executables inside archives)
_BRANCH_CODERS = {
    b"\x04": lzma.FILTER_X86,
    b"\x03\x03\x01\x03": lzma.FILTER_X86,  # old-style BCJ x86 id
    b"\x05": lzma.FILTER_POWERPC,
    b"\x06": lzma.FILTER_IA64,
    b"\x07": lzma.FILTER_ARM,
    b"\x08": lzma.FILTER_ARMTHUMB,
    b"\x09": lzma.FILTER_SPARC,
}


class SevenZipBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# BCJ2 — the 4-stream x86 branch converter (7zFormat.txt method 0303011B).
# Unlike BCJ, the converted CALL/JMP/Jcc targets live in separate streams
# (call, jump) and a range-coded control stream (rc) marks which candidate
# opcodes were converted.  The range coder is the standard LZMA binary
# coder: 11-bit probabilities, move-5 adaptation, 2+256 contexts
# (0 = Jcc, 1 = E9, 2+prev_byte = E8).  Public spec; the reference covers
# BCJ2 archives by shelling to `7z x` (archives.py:173-203).
# ---------------------------------------------------------------------------

_RC_TOP = 1 << 24
_RC_MODEL_TOTAL = 2048
_RC_INIT_PROB = _RC_MODEL_TOTAL // 2


class _RangeDecoder:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 1  # first byte is the encoder's leading zero cache
        self.range = 0xFFFFFFFF
        code = 0
        for _ in range(4):
            code = (code << 8) | self._byte()
        self.code = code

    def _byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def decode_bit(self, probs: list[int], i: int) -> int:
        bound = (self.range >> 11) * probs[i]
        if self.code < bound:
            self.range = bound
            probs[i] += (_RC_MODEL_TOTAL - probs[i]) >> 5
            bit = 0
        else:
            self.code -= bound
            self.range -= bound
            probs[i] -= probs[i] >> 5
            bit = 1
        while self.range < _RC_TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
        return bit


class _RangeEncoder:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.cache_size = 1
        self.out = bytearray()

    def _shift_low(self):
        if (self.low & 0xFFFFFFFF) < 0xFF000000 or self.low >> 32:
            carry = self.low >> 32
            temp = self.cache
            while True:
                self.out.append((temp + carry) & 0xFF)
                temp = 0xFF
                self.cache_size -= 1
                if self.cache_size == 0:
                    break
            self.cache = (self.low >> 24) & 0xFF
        self.cache_size += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode_bit(self, probs: list[int], i: int, bit: int):
        bound = (self.range >> 11) * probs[i]
        if bit == 0:
            self.range = bound
            probs[i] += (_RC_MODEL_TOTAL - probs[i]) >> 5
        else:
            self.low += bound
            self.range -= bound
            probs[i] -= probs[i] >> 5
        while self.range < _RC_TOP:
            self.range = (self.range << 8) & 0xFFFFFFFF
            self._shift_low()

    def flush(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


def _bcj2_is_candidate(prev: int, b: int) -> bool:
    return (b & 0xFE) == 0xE8 or (prev == 0x0F and (b & 0xF0) == 0x80)


def _bcj2_prob_index(prev: int, b: int) -> int:
    if b == 0xE8:
        return 2 + prev
    return 1 if b == 0xE9 else 0


def bcj2_decode(main: bytes, call: bytes, jump: bytes, rc: bytes,
                out_size: int) -> bytes:
    """Reassemble x86 code from BCJ2's four streams."""
    probs = [_RC_INIT_PROB] * (2 + 256)
    dec = _RangeDecoder(rc)
    out = bytearray()
    mi = ci = ji = 0
    prev = 0
    while len(out) < out_size:
        if mi >= len(main):
            raise SevenZipBroken("7z_error")
        b = main[mi]
        mi += 1
        out.append(b)
        if _bcj2_is_candidate(prev, b) and len(out) + 4 <= out_size:
            if dec.decode_bit(probs, _bcj2_prob_index(prev, b)):
                if b == 0xE8:
                    src, ci = call[ci : ci + 4], ci + 4
                else:
                    src, ji = jump[ji : ji + 4], ji + 4
                if len(src) != 4:
                    raise SevenZipBroken("7z_error")
                absolute = int.from_bytes(src, "big")
                rel = (absolute - (len(out) + 4)) & 0xFFFFFFFF
                out += rel.to_bytes(4, "little")
                prev = (rel >> 24) & 0xFF
                continue
        prev = b
    return bytes(out)


def bcj2_encode(data: bytes) -> tuple[bytes, bytes, bytes, bytes]:
    """(main, call, jump, rc) — fixture-side inverse of bcj2_decode;
    converts every candidate whose 4 target bytes fit (the real encoder
    is choosier, which only changes compression, not correctness)."""
    probs = [_RC_INIT_PROB] * (2 + 256)
    enc = _RangeEncoder()
    main = bytearray()
    call = bytearray()
    jump = bytearray()
    i = 0
    prev = 0
    n = len(data)
    while i < n:
        b = data[i]
        main.append(b)
        i += 1
        if _bcj2_is_candidate(prev, b) and i + 4 <= n:
            pi = _bcj2_prob_index(prev, b)
            rel = int.from_bytes(data[i : i + 4], "little")
            absolute = (rel + i + 4) & 0xFFFFFFFF
            enc.encode_bit(probs, pi, 1)
            (call if b == 0xE8 else jump).extend(absolute.to_bytes(4, "big"))
            prev = data[i + 3]
            i += 4
        else:
            prev = b
    return bytes(main), bytes(call), bytes(jump), enc.flush()


def is_7z(data: bytes) -> bool:
    return data[:6] == MAGIC


def _read_number(f: io.BytesIO) -> int:
    first = f.read(1)
    if not first:
        raise SevenZipBroken("7z_error")
    b = first[0]
    mask = 0x80
    value = 0
    for i in range(8):
        if not b & mask:
            value |= (b & (mask - 1)) << (8 * i)
            return value
        nxt = f.read(1)
        if not nxt:
            raise SevenZipBroken("7z_error")
        value |= nxt[0] << (8 * i)
        mask >>= 1
    return value


def _read_bits(f: io.BytesIO, n: int) -> list[bool]:
    out: list[bool] = []
    byte = 0
    mask = 0
    for _ in range(n):
        if mask == 0:
            byte = f.read(1)[0]
            mask = 0x80
        out.append(bool(byte & mask))
        mask >>= 1
    return out


def _read_bits_or_all(f: io.BytesIO, n: int) -> list[bool]:
    all_defined = f.read(1)[0]
    return [True] * n if all_defined else _read_bits(f, n)


def _lzma2_dict_size(prop: int) -> int:
    if prop > 40:
        raise SevenZipBroken("7z_error")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _lzma_filter_spec(coder_id: bytes, props: bytes) -> dict:
    """Raw-filter dict for an LZMA1/LZMA2 coder's props bytes."""
    if coder_id == _CODER_LZMA2:
        if len(props) != 1:
            raise SevenZipBroken("7z_error")
        return {"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_dict_size(props[0])}
    if coder_id == _CODER_LZMA1:
        if len(props) != 5:
            raise SevenZipBroken("7z_error")
        lclppb = props[0]
        (dict_size,) = struct.unpack("<I", props[1:5])
        return {
            "id": lzma.FILTER_LZMA1,
            "lc": lclppb % 9,
            "lp": (lclppb // 9) % 5,
            "pb": lclppb // 45,
            "dict_size": max(dict_size, 4096),
        }
    raise SevenZipBroken("7z_codec_unsupported")


class _Folder:
    def __init__(self):
        self.coders: list[tuple[bytes, bytes]] = []  # (id, props)
        self.coder_io: list[tuple[int, int]] = []  # (n_in, n_out) per coder
        self.unpack_sizes: list[int] = []
        self.num_unpack_streams = 1
        self.substream_sizes: list[int] = []
        self.bind_pairs: list[tuple[int, int]] = []  # (in_index, out_index)
        self.packed_indices: list[int] = []  # global in-stream index per pack
        self.total_out = 1
        #: CRC defined in UnpackInfo — such single-substream folders are
        #: EXCLUDED from SubStreamsInfo's kCRC digest list (7zFormat.txt)
        self.crc_defined = False
        self.crc: int | None = None  # UnpackInfo folder digest
        #: per-substream digests (None where undefined) — verified on
        #: extraction so a wrong 7z-AES password (or any codec bug) can
        #: never yield wrong member bytes silently
        self.substream_crcs: list[int | None] = []

    @property
    def num_packed(self) -> int:
        return max(1, len(self.packed_indices))

    @property
    def output_size(self) -> int:
        """Size of the folder's final (unbound) output stream.  Coder
        order in the header is arbitrary — an AES folder is usually
        [LZMA2, AES], putting the PACKED-side size last — so
        ``unpack_sizes[-1]`` is not "the folder output" in general."""
        if not self.unpack_sizes:
            return 0
        bound = {o for _, o in self.bind_pairs}
        n_out = sum(n for _, n in self.coder_io) or len(self.unpack_sizes)
        for g in range(n_out - 1, -1, -1):
            if g not in bound and g < len(self.unpack_sizes):
                return self.unpack_sizes[g]
        return self.unpack_sizes[-1]

    def decode(self, packed_streams: list[bytes]) -> bytes:
        if any(cid == _CODER_AES for cid, _ in self.coders):
            # AES-256 folder (also reached for AES-encrypted headers via
            # the EncodedHeader folder): decrypt with the worker-local
            # archive password when configured, else the reference's
            # broken reason — encryption beats codec-unsupported as the
            # reported reason, chained or not
            return self._decode_aes(packed_streams)
        if any(cid == _CODER_BCJ2 for cid, _ in self.coders):
            return self._decode_bcj2_graph(packed_streams)
        packed = packed_streams[0] if packed_streams else b""
        size = self.unpack_sizes[-1] if self.unpack_sizes else None
        if len(self.coders) == 1:
            coder_id, props = self.coders[0]
            if coder_id == _CODER_COPY:
                return packed[:size]
            filt = [_lzma_filter_spec(coder_id, props)]
        elif len(self.coders) == 2:
            # branch-converter + LZMA chain (packed → LZMA → BCJ/delta).
            # All coders here are simple (1-in/1-out), so in/out stream
            # index i IS coder index i; the single bind pair must connect
            # the converter's input to the LZMA coder's output.
            lz = next((i for i, (cid, _) in enumerate(self.coders)
                       if cid in (_CODER_LZMA1, _CODER_LZMA2)), None)
            if lz is None:
                raise SevenZipBroken("7z_codec_unsupported")
            br = 1 - lz
            br_id, br_props = self.coders[br]
            if self.bind_pairs and self.bind_pairs != [(br, lz)]:
                raise SevenZipBroken("7z_codec_unsupported")
            if br_id == _CODER_DELTA:
                if len(br_props) != 1:
                    raise SevenZipBroken("7z_error")
                br_spec = {"id": lzma.FILTER_DELTA, "dist": br_props[0] + 1}
            elif br_id in _BRANCH_CODERS:
                br_spec = {"id": _BRANCH_CODERS[br_id]}
            else:
                raise SevenZipBroken("7z_codec_unsupported")
            # raw-filter order mirrors COMPRESSION order: data → branch →
            # LZMA; the decompressor inverts the whole chain
            filt = [br_spec, _lzma_filter_spec(*self.coders[lz])]
        else:
            # 3+-coder chains (BCJ2's 4-stream layout etc.)
            raise SevenZipBroken("7z_codec_unsupported")
        try:
            dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=filt)
            return dec.decompress(packed, max_length=size if size else -1)
        except lzma.LZMAError as e:
            raise SevenZipBroken("7z_error") from e

    def _decode_aes(self, packed_streams: list[bytes]) -> bytes:
        """AES-256 folder decode: derive the key (iterated SHA-256 over
        salt + UTF-16LE password + counter, 7zAes.cpp), CBC-decrypt the
        packed stream, strip the AES coder out of the chain, and rerun
        the ordinary decode on the plaintext.  Supported shape: one AES
        coder in an all-simple (1-in/1-out) chain whose input is
        directly packed — exactly what 7z/p7zip/py7zr emit (compression
        runs before encryption, so AES always sits next to the packed
        stream)."""
        from ..functions.archive_crypto import (
            aes_cbc_decrypt,
            default_archive_password,
            sevenzip_aes_key,
            sevenzip_aes_props,
        )

        password = default_archive_password()
        if password is None:
            raise SevenZipBroken("7z_encrypted")
        aes_idxs = [j for j, (cid, _) in enumerate(self.coders)
                    if cid == _CODER_AES]
        if (len(aes_idxs) != 1
                or any(nio != (1, 1) for nio in self.coder_io)):
            raise SevenZipBroken("7z_codec_unsupported")
        j = aes_idxs[0]
        # all-simple chain → global stream index i IS coder index i
        packed_by_in = {g: k for k, g in enumerate(self.packed_indices)}
        if j not in packed_by_in:
            raise SevenZipBroken("7z_codec_unsupported")
        if any(a == j for a, _ in self.bind_pairs):
            raise SevenZipBroken("7z_codec_unsupported")
        _, props = self.coders[j]
        try:
            cycles, salt, iv = sevenzip_aes_props(props)
            key = sevenzip_aes_key(password, cycles, salt)
            plain = aes_cbc_decrypt(key, iv, packed_streams[packed_by_in[j]])
        except ValueError as e:
            raise SevenZipBroken("7z_error") from e
        size = self.unpack_sizes[j] if j < len(self.unpack_sizes) else None
        if size is not None:
            plain = plain[:size]
        if len(self.coders) == 1:
            return plain  # stored-encrypted: AES output IS the folder output
        sub = _Folder()
        sub.coders = [c for i, c in enumerate(self.coders) if i != j]
        sub.coder_io = [(1, 1)] * len(sub.coders)
        sizes = [s for i, s in enumerate(self.unpack_sizes) if i != j]
        sub.bind_pairs = [
            (a - (a > j), b - (b > j))
            for a, b in self.bind_pairs
            if b != j
        ]
        # decode() reads the folder's output size from unpack_sizes[-1];
        # coder order is arbitrary (7z emits [LZMA2, AES] as often as
        # [AES, LZMA2]), so move the unbound (final) output's size last
        bound = {b for _, b in sub.bind_pairs}
        final = next(
            (i for i in range(len(sub.coders)) if i not in bound),
            len(sizes) - 1,
        )
        if sizes and final != len(sizes) - 1:
            sizes.append(sizes.pop(final))
        sub.unpack_sizes = sizes
        sub.packed_indices = [0]
        try:
            return sub.decode([plain])
        except SevenZipBroken as e:
            if e.reason == "7z_error":
                # a wrong password yields garbage that the downstream
                # decompressor rejects; genuine corruption is
                # indistinguishable without a MAC (7z AES has none)
                raise SevenZipBroken("7z_bad_password") from e
            raise

    def _decode_bcj2_graph(self, packed_streams: list[bytes]) -> bytes:
        """Dataflow evaluation for BCJ2 folders (the only complex coder
        supported): BCJ2's 4 inputs are each either a directly-packed
        stream or bound to the output of a simple 1-in/1-out coder
        (COPY/LZMA1/LZMA2) that itself consumes a packed stream."""
        if not self.coder_io:
            raise SevenZipBroken("7z_error")
        in_base, out_base = [], []
        gi = go = 0
        for n_in, n_out in self.coder_io:
            in_base.append(gi)
            out_base.append(go)
            gi += n_in
            go += n_out
        bind_by_in = {i: o for i, o in self.bind_pairs}
        packed_by_in = {g: k for k, g in enumerate(self.packed_indices)}

        def coder_of_out(gout: int) -> int:
            for j, (_, n_out) in enumerate(self.coder_io):
                if out_base[j] <= gout < out_base[j] + n_out:
                    return j
            raise SevenZipBroken("7z_error")

        def input_bytes(gin: int) -> bytes:
            if gin in packed_by_in:
                return packed_streams[packed_by_in[gin]]
            if gin in bind_by_in:
                return produce(bind_by_in[gin])
            raise SevenZipBroken("7z_error")

        def produce(gout: int) -> bytes:
            j = coder_of_out(gout)
            cid, props = self.coders[j]
            n_in, n_out = self.coder_io[j]
            size = (
                self.unpack_sizes[gout]
                if gout < len(self.unpack_sizes)
                else None
            )
            if cid == _CODER_BCJ2:
                if n_in != 4:
                    raise SevenZipBroken("7z_error")
                main, call, jump, rc = (
                    input_bytes(in_base[j] + k) for k in range(4)
                )
                if size is None:
                    raise SevenZipBroken("7z_error")
                return bcj2_decode(main, call, jump, rc, size)
            if n_in != 1 or n_out != 1:
                raise SevenZipBroken("7z_codec_unsupported")
            data = input_bytes(in_base[j])
            if cid == _CODER_COPY:
                return data[:size]
            if cid in (_CODER_LZMA1, _CODER_LZMA2):
                try:
                    dec = lzma.LZMADecompressor(
                        format=lzma.FORMAT_RAW,
                        filters=[_lzma_filter_spec(cid, props)],
                    )
                    return dec.decompress(
                        data, max_length=size if size else -1
                    )
                except lzma.LZMAError as e:
                    raise SevenZipBroken("7z_error") from e
            raise SevenZipBroken("7z_codec_unsupported")

        bound_outs = {o for _, o in self.bind_pairs}
        final = [o for o in range(go) if o not in bound_outs]
        if len(final) != 1:
            raise SevenZipBroken("7z_error")
        return produce(final[0])


class _StreamsInfo:
    def __init__(self):
        self.pack_pos = 0
        self.pack_sizes: list[int] = []
        self.folders: list[_Folder] = []


def _parse_folder(f: io.BytesIO) -> _Folder:
    folder = _Folder()
    num_coders = _read_number(f)
    if num_coders < 1 or num_coders > 8:
        raise SevenZipBroken("7z_error")
    total_out = 0
    total_in = 0
    for _ in range(num_coders):
        flags = f.read(1)[0]
        id_size = flags & 0x0F
        coder_id = f.read(id_size)
        n_in = n_out = 1
        if flags & 0x10:  # complex
            n_in = _read_number(f)
            n_out = _read_number(f)
        props = b""
        if flags & 0x20:  # attributes
            props = f.read(_read_number(f))
        folder.coders.append((coder_id, props))
        folder.coder_io.append((n_in, n_out))
        total_in += n_in
        total_out += n_out
    folder.total_out = total_out
    for _ in range(total_out - 1):  # bind pairs
        in_idx = _read_number(f)
        out_idx = _read_number(f)
        folder.bind_pairs.append((in_idx, out_idx))
    num_packed = total_in - (total_out - 1)
    if num_packed > 1:
        folder.packed_indices = [_read_number(f) for _ in range(num_packed)]
    else:
        bound = {i for i, _ in folder.bind_pairs}
        folder.packed_indices = [
            next((g for g in range(total_in) if g not in bound), 0)
        ]
    return folder


def _parse_streams_info(f: io.BytesIO) -> _StreamsInfo:
    info = _StreamsInfo()
    while True:
        prop = _read_number(f)
        if prop == _K_END:
            return info
        if prop == _K_PACK_INFO:
            info.pack_pos = _read_number(f)
            n = _read_number(f)
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_SIZE:
                    info.pack_sizes = [_read_number(f) for _ in range(n)]
                elif sub == _K_CRC:
                    defined = _read_bits_or_all(f, n)
                    f.read(4 * sum(defined))
                else:
                    raise SevenZipBroken("7z_error")
        elif prop == _K_UNPACK_INFO:
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_FOLDER:
                    n_folders = _read_number(f)
                    if f.read(1)[0] != 0:  # external folders unsupported
                        raise SevenZipBroken("7z_error")
                    info.folders = [_parse_folder(f) for _ in range(n_folders)]
                elif sub == _K_CODERS_UNPACK_SIZE:
                    for folder in info.folders:
                        # one size per OUT stream (complex coders like
                        # BCJ2 contribute several)
                        n_out = getattr(folder, "total_out", len(folder.coders))
                        folder.unpack_sizes = [
                            _read_number(f) for _ in range(n_out)
                        ]
                elif sub == _K_CRC:
                    defined = _read_bits_or_all(f, len(info.folders))
                    digests = [struct.unpack("<I", f.read(4))[0]
                               for _ in range(sum(defined))]
                    di = 0
                    for folder, d in zip(info.folders, defined):
                        folder.crc_defined = bool(d)
                        if d:
                            folder.crc = digests[di]
                            di += 1
                else:
                    raise SevenZipBroken("7z_error")
        elif prop == _K_SUBSTREAMS_INFO:
            counts = [1] * len(info.folders)
            while True:
                sub = _read_number(f)
                if sub == _K_END:
                    break
                if sub == _K_NUM_UNPACK_STREAM:
                    counts = [_read_number(f) for _ in info.folders]
                elif sub == _K_SIZE:
                    for folder, cnt in zip(info.folders, counts):
                        sizes = [_read_number(f) for _ in range(cnt - 1)]
                        total = folder.output_size
                        sizes.append(total - sum(sizes))
                        folder.substream_sizes = sizes
                elif sub == _K_CRC:
                    # single-substream folders whose CRC was already given
                    # in UnpackInfo are skipped in this digest list
                    # (7zFormat.txt SubStreamsInfo): counting them would
                    # misalign every later header field
                    n_digests = sum(
                        cnt for folder, cnt in zip(info.folders, counts)
                        if cnt != 1 or not folder.crc_defined
                    )
                    defined = _read_bits_or_all(f, n_digests)
                    digests = [struct.unpack("<I", f.read(4))[0]
                               for _ in range(sum(defined))]
                    # align digests back onto substreams: folders skipped
                    # in this list carry their UnpackInfo folder CRC
                    flat = []
                    di = 0
                    for k, d in enumerate(defined):
                        flat.append(digests[di] if d else None)
                        di += d
                    fi = 0
                    for folder, cnt in zip(info.folders, counts):
                        if cnt == 1 and folder.crc_defined:
                            folder.substream_crcs = [folder.crc]
                        else:
                            folder.substream_crcs = flat[fi:fi + cnt]
                            fi += cnt
                else:
                    raise SevenZipBroken("7z_error")
            for folder, cnt in zip(info.folders, counts):
                folder.num_unpack_streams = cnt
                if not folder.substream_sizes:
                    folder.substream_sizes = [folder.output_size]
        else:
            raise SevenZipBroken("7z_error")


def _parse_files_info(f: io.BytesIO) -> tuple[list[str], list[bool], list[bool]]:
    """(names, has_stream per file, is_empty_file per streamless file)."""
    n_files = _read_number(f)
    names: list[str] = []
    empty_stream = [False] * n_files
    empty_file: list[bool] = []
    while True:
        prop = _read_number(f)
        if prop == _K_END:
            break
        size = _read_number(f)
        block = io.BytesIO(f.read(size))
        if prop == _K_EMPTY_STREAM:
            empty_stream = _read_bits(block, n_files)
        elif prop == _K_EMPTY_FILE:
            empty_file = _read_bits(block, sum(empty_stream))
        elif prop == _K_NAME:
            if block.read(1)[0] != 0:
                raise SevenZipBroken("7z_error")
            # names are NUL-terminated UTF-16LE strings back to back;
            # decode whole chunks (per-unit decode would split the
            # surrogate pairs of non-BMP characters)
            raw = block.read()
            names = []
            start = 0
            for i in range(0, len(raw) - 1, 2):
                if raw[i : i + 2] == b"\x00\x00":
                    names.append(raw[start:i].decode("utf-16-le", "replace"))
                    start = i + 2
        # all other properties (mtime, attributes, ...) skipped
    has_stream = [not e for e in empty_stream]
    return names[:n_files], has_stream, empty_file


def unpack_7z(data: bytes, max_bytes: int = 256 * 2**20) -> list[tuple[str, bytes]]:
    """7z bytes → [(member name, member bytes)] (files only)."""
    if not is_7z(data):
        raise SevenZipBroken("7z_error")
    if len(data) < 32:
        raise SevenZipBroken("7z_error")
    nh_off, nh_size = struct.unpack_from("<QQ", data, 12)
    if nh_size == 0:
        return []  # valid empty archive
    start = 32 + nh_off
    header = data[start : start + nh_size]
    if len(header) != nh_size:
        raise SevenZipBroken("7z_error")
    f = io.BytesIO(header)
    prop = _read_number(f)
    if prop == _K_ENCODED_HEADER:
        info = _parse_streams_info(f)
        if not info.folders or not info.pack_sizes:
            raise SevenZipBroken("7z_error")
        hdr_folder = info.folders[0]
        hp = 32 + info.pack_pos
        hdr_packs = []
        for k in range(hdr_folder.num_packed):
            sz = info.pack_sizes[k] if k < len(info.pack_sizes) else 0
            hdr_packs.append(data[hp : hp + sz])
            hp += sz
        f = io.BytesIO(hdr_folder.decode(hdr_packs))
        prop = _read_number(f)
    if prop != _K_HEADER:
        raise SevenZipBroken("7z_error")

    streams = _StreamsInfo()
    names: list[str] = []
    has_stream: list[bool] = []
    empty_file: list[bool] = []
    while True:
        prop = _read_number(f)
        if prop == _K_END:
            break
        if prop == _K_MAIN_STREAMS:
            streams = _parse_streams_info(f)
        elif prop == _K_FILES_INFO:
            names, has_stream, empty_file = _parse_files_info(f)
        else:
            raise SevenZipBroken("7z_error")

    # decode folders → substream payloads in order.  A header may omit
    # SubStreamsInfo entirely (one substream per folder, allowed by
    # 7zFormat.txt) — default every such folder to its full unpack size
    # here, OUTSIDE the SubStreamsInfo branch, or its members would
    # silently extract as b''.
    for folder in streams.folders:
        if not folder.substream_sizes:
            folder.substream_sizes = [folder.output_size]
            folder.num_unpack_streams = 1
    payloads: list[bytes] = []
    pos = 32 + streams.pack_pos
    pack_idx = 0
    budget = max_bytes
    for folder in streams.folders:
        folder_packs: list[bytes] = []
        for _ in range(folder.num_packed):
            pack_size = streams.pack_sizes[pack_idx] if pack_idx < len(
                streams.pack_sizes) else 0
            pack_idx += 1
            folder_packs.append(data[pos : pos + pack_size])
            pos += pack_size
        if folder.output_size > budget:
            raise SevenZipBroken("archive_too_big")
        blob = folder.decode(folder_packs)
        budget -= len(blob)
        off = 0
        for k, size in enumerate(folder.substream_sizes):
            payload = blob[off : off + size]
            off += size
            want = (folder.substream_crcs[k]
                    if k < len(folder.substream_crcs) else
                    folder.crc if folder.num_unpack_streams == 1 else None)
            if want is not None and _crc32(payload) != want:
                # with AES in the chain a digest mismatch means a wrong
                # password far more often than corruption (7z has no MAC);
                # either way, never hand out wrong member bytes
                raise SevenZipBroken(
                    "7z_bad_password"
                    if any(cid == _CODER_AES for cid, _ in folder.coders)
                    else "7z_crc_mismatch")
            payloads.append(payload)

    out: list[tuple[str, bytes]] = []
    stream_i = 0
    empty_i = 0
    for idx, name in enumerate(names):
        if idx < len(has_stream) and not has_stream[idx]:
            # streamless entry: empty file or directory
            is_file = empty_i < len(empty_file) and empty_file[empty_i]
            empty_i += 1
            if is_file:
                out.append((name, b""))
            continue
        payload = payloads[stream_i] if stream_i < len(payloads) else b""
        stream_i += 1
        out.append((name, payload))
    return out


# ---------------------------------------------------------------------------
# fixture writer: one solid folder (COPY or LZMA2), raw (unencoded) header
# ---------------------------------------------------------------------------


def _write_number(value: int) -> bytes:
    """Inverse of _read_number: n leading 1-bits in the first byte mark n
    little-endian extra bytes; the first byte's free low bits carry the
    value's high bits."""
    if value < 0x80:
        return bytes([value])
    for n in range(1, 8):
        if value < 1 << (8 * n + 7 - n):
            marker = (0xFF << (8 - n)) & 0xFF
            high = value >> (8 * n)
            low = value & ((1 << (8 * n)) - 1)
            return bytes([marker | high]) + low.to_bytes(n, "little")
    return bytes([0xFF]) + value.to_bytes(8, "little")


def build_7z(
    members: list[tuple[str, bytes]],
    codec: str = "copy",
    with_substreams: bool = True,
    unpackinfo_crc: bool = False,
    substreams_crc: bool = False,
    password: str | None = None,
) -> bytes:
    """Deterministic 7z fixture: all members in one solid folder.

    ``with_substreams=False`` omits the SubStreamsInfo block entirely
    (legal for single-member archives); ``unpackinfo_crc`` writes the
    folder CRC in UnpackInfo; ``substreams_crc`` writes the SubStreamsInfo
    kCRC digest list — which, per 7zFormat.txt, EXCLUDES single-substream
    folders whose CRC is already defined in UnpackInfo."""
    import zlib as _zlib

    if not with_substreams and len(members) != 1:
        raise ValueError("with_substreams=False needs exactly one member")
    blob = b"".join(payload for _, payload in members)
    # props byte 18 → dict size 2 MiB (>= preset-1's 1 MiB window)
    _lzma2_coder = bytes([len(_CODER_LZMA2) | 0x20]) + _CODER_LZMA2 + b"\x01\x12"
    chain_coders: list[bytes] = []  # second coder of a branch chain
    multi: dict | None = None  # BCJ2 4-stream layout
    if codec == "bcj2_lzma2":
        # data → BCJ2 split (main/call/jump/rc); main additionally LZMA2.
        # Folder: coder0 = LZMA2, coder1 = BCJ2 (4-in/1-out); bind pair
        # connects BCJ2 input g1 to LZMA2 output; packed streams are
        # global inputs [0 (lzma2), 2 (call), 3 (jump), 4 (rc)]
        b_main, b_call, b_jump, b_rc = bcj2_encode(blob)
        packed_main = lzma.compress(
            b_main, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "preset": 1}],
        )
        multi = {
            "pack": [packed_main, b_call, b_jump, b_rc],
            "coders": [
                _lzma2_coder,
                bytes([len(_CODER_BCJ2) | 0x10]) + _CODER_BCJ2
                + _write_number(4) + _write_number(1),
            ],
            "bind_pairs": [(1, 0)],
            "packed_indices": [0, 2, 3, 4],
            "unpack_sizes": [len(b_main), len(blob)],
        }
        packed = b"".join(multi["pack"])
        coder = b""  # unused on this path
    elif codec == "copy":
        packed = blob
        coder = bytes([len(_CODER_COPY)]) + _CODER_COPY
    elif codec == "lzma2":
        packed = lzma.compress(
            blob, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "preset": 1}],
        )
        coder = _lzma2_coder
    elif codec == "bcj_lzma2":
        # data → X86 branch converter → LZMA2 (the layout 7z writes for
        # executables); header: coder0 = LZMA2, coder1 = BCJ, bind pair
        # connects BCJ's input to LZMA2's output
        packed = lzma.compress(
            blob, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_X86},
                     {"id": lzma.FILTER_LZMA2, "preset": 1}],
        )
        coder = _lzma2_coder
        chain_coders = [bytes([1]) + b"\x04"]  # BCJ x86, no props
    elif codec == "delta_lzma2":
        packed = lzma.compress(
            blob, format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_DELTA, "dist": 3},
                     {"id": lzma.FILTER_LZMA2, "preset": 1}],
        )
        coder = _lzma2_coder
        chain_coders = [bytes([1 | 0x20]) + _CODER_DELTA + b"\x01\x02"]  # dist-1
    elif codec in ("aes_copy", "aes_lzma2"):
        # password-protected folder, the layout 7z emits: compression
        # (if any) runs FIRST, AES sits next to the packed stream.
        # Deterministic salt/iv from the content; cycles 13 keeps the
        # KDF fast for fixtures (real 7z uses 19).
        from hashlib import blake2b as _b2

        from ..functions.archive_crypto import (
            aes_cbc_encrypt,
            sevenzip_aes_key,
        )

        if password is None:
            raise ValueError("aes codecs need a password")
        cycles = 13
        salt = _b2(b"7zsalt" + blob, digest_size=8).digest()
        iv = _b2(b"7ziv" + blob, digest_size=8).digest()
        aes_props = bytes([cycles | 0xC0, 0x77]) + salt + iv
        aes_coder = (bytes([len(_CODER_AES) | 0x20]) + _CODER_AES
                     + _write_number(len(aes_props)) + aes_props)
        key = sevenzip_aes_key(password, cycles, salt)
        if codec == "aes_lzma2":
            compressed = lzma.compress(
                blob, format=lzma.FORMAT_RAW,
                filters=[{"id": lzma.FILTER_LZMA2, "preset": 1}],
            )
            enc = aes_cbc_encrypt(key, iv, compressed)
            # coder0 = LZMA2, coder1 = AES; LZMA2's input (global in 0)
            # is bound to AES's output (out 1); AES input (g1) is packed
            multi = {
                "pack": [enc],
                "coders": [_lzma2_coder, aes_coder],
                "bind_pairs": [(0, 1)],
                "packed_indices": [1],
                "unpack_sizes": [len(blob), len(compressed)],
            }
        else:
            enc = aes_cbc_encrypt(key, iv, blob)
            multi = {
                "pack": [enc],
                "coders": [aes_coder],
                "bind_pairs": [],
                "packed_indices": [0],
                "unpack_sizes": [len(blob)],
            }
        packed = enc
        coder = b""  # unused on this path
    else:
        raise ValueError(codec)

    h = io.BytesIO()
    h.write(_write_number(_K_HEADER))
    h.write(_write_number(_K_MAIN_STREAMS))
    pack_segments = multi["pack"] if multi else [packed]
    # PackInfo
    h.write(_write_number(_K_PACK_INFO))
    h.write(_write_number(0))  # pack pos
    h.write(_write_number(len(pack_segments)))
    h.write(_write_number(_K_SIZE))
    for seg in pack_segments:
        h.write(_write_number(len(seg)))
    h.write(_write_number(_K_END))
    # UnPackInfo
    h.write(_write_number(_K_UNPACK_INFO))
    h.write(_write_number(_K_FOLDER))
    h.write(_write_number(1))  # one folder
    h.write(bytes([0]))  # not external
    if multi:
        h.write(_write_number(len(multi["coders"])))
        for c in multi["coders"]:
            h.write(c)
        for in_idx, out_idx in multi["bind_pairs"]:
            h.write(_write_number(in_idx))
            h.write(_write_number(out_idx))
        if len(multi["packed_indices"]) > 1:
            # a single packed stream's index is implicit (the parser
            # infers the one unbound input), matching 7zFormat.txt
            for g in multi["packed_indices"]:
                h.write(_write_number(g))
        h.write(_write_number(_K_CODERS_UNPACK_SIZE))
        for sz in multi["unpack_sizes"]:
            h.write(_write_number(sz))
    else:
        h.write(_write_number(1 + len(chain_coders)))  # coder count
        h.write(coder)
        for c in chain_coders:
            h.write(c)
        if chain_coders:
            # one bind pair: converter (coder 1) input ← LZMA2 (coder 0)
            # output
            h.write(_write_number(1))
            h.write(_write_number(0))
        h.write(_write_number(_K_CODERS_UNPACK_SIZE))
        h.write(_write_number(len(blob)))
        for _ in chain_coders:
            h.write(_write_number(len(blob)))  # branch filters keep size
    if unpackinfo_crc:
        h.write(_write_number(_K_CRC))
        h.write(bytes([1]))  # all defined
        h.write(struct.pack("<I", _zlib.crc32(blob)))
    h.write(_write_number(_K_END))
    # SubStreamsInfo (optional for single-substream folders)
    if with_substreams:
        h.write(_write_number(_K_SUBSTREAMS_INFO))
        h.write(_write_number(_K_NUM_UNPACK_STREAM))
        h.write(_write_number(len(members)))
        h.write(_write_number(_K_SIZE))
        for _, payload in members[:-1]:
            h.write(_write_number(len(payload)))
        if substreams_crc:
            # digest list: all substreams EXCEPT the single substream of a
            # folder whose CRC is already in UnpackInfo
            digests = [
                _zlib.crc32(payload) for _, payload in members
            ] if not (len(members) == 1 and unpackinfo_crc) else []
            h.write(_write_number(_K_CRC))
            h.write(bytes([1]))  # all defined
            for d in digests:
                h.write(struct.pack("<I", d))
        h.write(_write_number(_K_END))
    h.write(_write_number(_K_END))  # end MainStreams
    # FilesInfo
    h.write(_write_number(_K_FILES_INFO))
    h.write(_write_number(len(members)))
    name_block = b"\x00" + b"".join(
        name.encode("utf-16-le") + b"\x00\x00" for name, _ in members
    )
    h.write(_write_number(_K_NAME))
    h.write(_write_number(len(name_block)))
    h.write(name_block)
    h.write(_write_number(_K_END))
    h.write(_write_number(_K_END))  # end Header

    header = h.getvalue()
    # real CRCs (this reader never checks them, but external readers —
    # bsdtar cross-validating the AES fixtures — refuse zeroed ones)
    start_hdr = struct.pack("<QQI", len(packed), len(header),
                            _zlib.crc32(header))
    out = bytearray()
    out += MAGIC
    out += bytes([0, 4])  # version 0.4
    out += struct.pack("<I", _zlib.crc32(start_hdr))
    out += start_hdr
    assert len(out) == 32
    out += packed
    out += header
    return bytes(out)
