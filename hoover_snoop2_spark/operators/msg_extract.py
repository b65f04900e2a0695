"""Outlook `.msg` extraction — replaces the reference's external
`msgconvert` subprocess (email.py:281-307 converts .msg → .eml and feeds
email.parse).

An OXMSG file is an OLE compound file (public [MS-OXMSG] spec) whose MAPI
properties live in streams named ``__substg1.0_PPPPTTTT`` (PPPP = property
id, TTTT = type: 001F UTF-16 / 001E bytes / 0102 binary); attachments are
``__attach_version1.0_#NNNNNNNN`` storages.  We read the same fields the
eml path produces (subject/from/to/date/body/attachments), so .msg rows
come out shaped like message/rfc822 digests.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone

from ..functions.textutils import zulu
from .cfb import CfbError, CompoundFile, is_cfb

_P_SUBJECT = "0037"
_P_BODY = "1000"
_P_RTF_COMPRESSED = "1009"  # PidTagRtfCompressed, [MS-OXRTFCP] LZFu
_P_HTML = "1013"            # PidTagHtml (binary html)
_P_SENDER_NAME = "0C1A"
_P_SENDER_EMAIL = "5D01"  # SMTP address
_P_SENDER_EMAIL2 = "0065"
_P_DISPLAY_TO = "0E04"
_P_ATT_NAME_LONG = "3707"
_P_ATT_NAME = "3704"
_P_ATT_DATA = "3701"

#: FILETIME stream carrying the client-submit time
_P_SUBMIT_TIME = "0039"


def _prop(streams: dict[str, bytes], prefix: str, pid: str) -> bytes | None:
    for typ in ("001F", "001E", "0102", "0040"):
        v = streams.get(f"{prefix}__substg1.0_{pid}{typ}")
        if v is not None:
            return v
    return None


def _text(streams, prefix, pid) -> str | None:
    raw = _prop(streams, prefix, pid)
    if raw is None:
        return None
    # 001F = UTF-16LE; 001E = 8-bit
    key_16 = f"{prefix}__substg1.0_{pid}001F" in streams
    return raw.decode("utf-16-le" if key_16 else "latin-1", errors="replace")


def _filetime_to_zulu(raw: bytes) -> str | None:
    if len(raw) < 8:
        return None
    (ft,) = struct.unpack("<Q", raw[:8])
    if not ft:
        return None
    epoch = datetime(1601, 1, 1, tzinfo=timezone.utc)
    return zulu(epoch + timedelta(microseconds=ft // 10))


# ---------------------------------------------------------------------------
# [MS-OXRTFCP] LZFu — Outlook's compressed-RTF encoding for
# PidTagRtfCompressed.  The reference reads rich .msg bodies by shelling to
# msgconvert (email.py:281-307); this is a native decoder of the public
# spec: a 4096-byte circular dictionary pre-loaded with a standard RTF
# prefix, control bytes consumed LSB-first, references as 16-bit
# big-endian (12-bit offset, 4-bit length-2), terminated by a reference
# whose offset equals the current write position.
# ---------------------------------------------------------------------------

_LZFU_PREFIX = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}"
    b"{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript "
    b"\\fdecor MS Sans SerifSymbolArialTimes New RomanCourier"
    b"{\\colortbl\\red0\\green0\\blue0\r\n\\par "
    b"\\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)
_LZFU_COMPRESSED = 0x75465A4C    # "LZFu"
_LZFU_UNCOMPRESSED = 0x414C454D  # "MELA"
_DICT = 4096


def _lzfu_crc_table() -> list[int]:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _lzfu_crc_table()


def _lzfu_crc(data: bytes, crc: int = 0) -> int:
    # the spec's CRC: standard CRC-32 table, init 0, NO final complement
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


class LzfuError(ValueError):
    pass


def decompress_lzfu(data: bytes) -> bytes:
    """PidTagRtfCompressed bytes → raw RTF bytes ([MS-OXRTFCP] §2.2)."""
    if len(data) < 16:
        raise LzfuError("lzfu header truncated")
    comp_size, raw_size, comp_type, crc = struct.unpack("<4I", data[:16])
    # COMPSIZE counts every byte after its own field: 12 header bytes
    # (RAWSIZE+COMPTYPE+CRC) + payload → payload ends at 4 + COMPSIZE
    payload = data[16 : 4 + comp_size]
    if comp_type == _LZFU_UNCOMPRESSED:
        return payload[:raw_size]
    if comp_type != _LZFU_COMPRESSED:
        raise LzfuError(f"unknown COMPTYPE 0x{comp_type:08X}")
    if _lzfu_crc(payload) != crc:
        raise LzfuError("lzfu crc mismatch")
    dict_buf = bytearray(_DICT)
    dict_buf[: len(_LZFU_PREFIX)] = _LZFU_PREFIX
    wpos = len(_LZFU_PREFIX)
    out = bytearray()
    pos = 0
    n = len(payload)
    while pos < n and len(out) < raw_size:
        control = payload[pos]
        pos += 1
        for bit in range(8):
            if pos >= n or len(out) >= raw_size:
                break
            if control & (1 << bit):
                if pos + 2 > n:
                    raise LzfuError("truncated reference token")
                word = (payload[pos] << 8) | payload[pos + 1]
                pos += 2
                offset = (word >> 4) & 0xFFF
                if offset == wpos:  # end-of-stream marker
                    return bytes(out)
                length = (word & 0xF) + 2
                for _ in range(length):
                    c = dict_buf[offset]
                    offset = (offset + 1) % _DICT
                    out.append(c)
                    dict_buf[wpos] = c
                    wpos = (wpos + 1) % _DICT
            else:
                c = payload[pos]
                pos += 1
                out.append(c)
                dict_buf[wpos] = c
                wpos = (wpos + 1) % _DICT
    return bytes(out)


def compress_lzfu(raw: bytes) -> bytes:
    """Raw RTF bytes → PidTagRtfCompressed bytes (greedy longest-match;
    used by the fixture builder so decode gets exercised on real
    dictionary references, not just literals)."""
    dict_buf = bytearray(_DICT)
    dict_buf[: len(_LZFU_PREFIX)] = _LZFU_PREFIX
    wpos = len(_LZFU_PREFIX)
    filled = len(_LZFU_PREFIX)  # bytes of dict ever written
    tokens = bytearray()
    control, nbits = 0, 0
    body = bytearray()

    def flush():
        nonlocal control, nbits
        body.append(control)
        body.extend(tokens)
        tokens.clear()
        control, nbits = 0, 0

    i = 0
    n = len(raw)
    while i < n:
        # longest dictionary match (min 2, max 17 bytes)
        best_len, best_off = 0, 0
        limit = _DICT if filled >= _DICT else filled
        max_len = min(17, n - i)
        for off in range(limit):
            if off == wpos:
                continue  # offset==wpos is reserved for the end marker
            ln = 0
            o = off
            while ln < max_len and dict_buf[o] == raw[i + ln]:
                ln += 1
                o = (o + 1) % _DICT
                if o == wpos:
                    # matches may run INTO the write cursor (overlap) —
                    # bytes written during the copy; emulate by allowing
                    # continuation only when the next byte repeats
                    break
            if ln > best_len:
                best_len, best_off = ln, off
        if best_len >= 2:
            word = ((best_off & 0xFFF) << 4) | ((best_len - 2) & 0xF)
            tokens.extend(struct.pack(">H", word))
            control |= 1 << nbits
            for k in range(best_len):
                dict_buf[wpos] = raw[i + k]
                wpos = (wpos + 1) % _DICT
                filled = min(filled + 1, _DICT)
            i += best_len
        else:
            tokens.append(raw[i])
            dict_buf[wpos] = raw[i]
            wpos = (wpos + 1) % _DICT
            filled = min(filled + 1, _DICT)
            i += 1
        nbits += 1
        if nbits == 8:
            flush()
    # end marker: reference with offset == wpos
    tokens.extend(struct.pack(">H", (wpos & 0xFFF) << 4))
    control |= 1 << nbits
    nbits += 1
    flush()
    payload = bytes(body)
    header = struct.pack(
        "<4I", len(payload) + 12, len(raw), _LZFU_COMPRESSED,
        _lzfu_crc(payload),
    )
    return header + payload


def looks_like_msg(data: bytes) -> bool:
    """OLE container holding MAPI property streams (vs legacy office)."""
    if not is_cfb(data):
        return False
    try:
        cf = CompoundFile(data)
        return any("__substg1.0_" in p for p in cf.paths())
    except (CfbError, struct.error, IndexError):
        return False


def parse_msg(data: bytes) -> dict:
    """.msg bytes → the email_meta-shaped dict the digest layer expects:
    subject / from / to / date / text / attachments[(name, bytes)]."""
    cf = CompoundFile(data)
    paths = cf.paths()
    streams = {p: cf.read(e) for p, e in paths.items()}

    out: dict = {}
    subject = _text(streams, "", _P_SUBJECT)
    if subject:
        out["subject"] = subject
    # body priority mirrors what msgconvert feeds the reference's eml
    # path (email.py:281-307): plain PidTagBody, else PidTagHtml
    # (tag-strip like text/html mail parts), else PidTagRtfCompressed
    # (LZFu decode → rtf text)
    body = _text(streams, "", _P_BODY)
    if not body:
        raw_html = _prop(streams, "", _P_HTML)
        if raw_html is not None:
            from .html_extract import strip_tags

            key_16 = f"__substg1.0_{_P_HTML}001F" in streams
            html_text = (
                raw_html.decode("utf-16-le", errors="replace")
                if key_16
                else raw_html.decode("utf-8", errors="replace")
            )
            body = strip_tags(html_text)
    if not body:
        raw_rtf = _prop(streams, "", _P_RTF_COMPRESSED)
        if raw_rtf is not None:
            from .rtf_extract import rtf_to_text

            try:
                body = rtf_to_text(decompress_lzfu(raw_rtf))
            except LzfuError:
                body = None
    if body:
        out["text"] = body
    sender = (
        _text(streams, "", _P_SENDER_EMAIL)
        or _text(streams, "", _P_SENDER_EMAIL2)
        or _text(streams, "", _P_SENDER_NAME)
    )
    if sender:
        out["from"] = [sender]
    to = _text(streams, "", _P_DISPLAY_TO)
    if to:
        out["to"] = [t.strip() for t in to.split(";") if t.strip()]
    raw_time = _prop(streams, "", _P_SUBMIT_TIME)
    if raw_time:
        dt = _filetime_to_zulu(raw_time)
        if dt:
            out["date"] = dt

    attachments: list[tuple[str, bytes]] = []
    att_prefixes = sorted(
        {p.split("/", 1)[0] + "/" for p in streams
         if p.startswith("__attach_version1.0_")}
    )
    for prefix in att_prefixes:
        name = (
            _text(streams, prefix, _P_ATT_NAME_LONG)
            or _text(streams, prefix, _P_ATT_NAME)
            or "attachment"
        )
        payload = _prop(streams, prefix, _P_ATT_DATA)
        if payload is not None:
            attachments.append((name, payload))
    out["attachments"] = attachments
    return out


# ---------------------------------------------------------------------------
# deterministic .msg fixture builder (golden-corpus role)
# ---------------------------------------------------------------------------


def build_msg(subject: str, body: str, sender: str, to: list[str],
              attachments: list[tuple[str, bytes]] | None = None,
              body_mode: str = "plain") -> bytes:
    """Write a minimal valid CFB file with the MAPI streams above — enough
    structure for any conformant reader.  Single FAT sector, 512-byte
    sectors, all streams in the mini stream (each < 4096 bytes).

    body_mode: 'plain' writes PidTagBody; 'html' wraps the body in html
    and writes only PidTagHtml (binary, 0102); 'rtf' wraps it in a
    minimal RTF document and writes only PidTagRtfCompressed (LZFu) —
    the storage Outlook uses for rich-text mail.
    """
    streams: list[tuple[str, bytes]] = [
        (f"__substg1.0_{_P_SUBJECT}001F", subject.encode("utf-16-le")),
        (f"__substg1.0_{_P_SENDER_EMAIL}001F", sender.encode("utf-16-le")),
        (f"__substg1.0_{_P_DISPLAY_TO}001F", "; ".join(to).encode("utf-16-le")),
    ]
    if body_mode == "plain":
        streams.append(
            (f"__substg1.0_{_P_BODY}001F", body.encode("utf-16-le"))
        )
    elif body_mode == "html":
        html = f"<html><body><p>{body}</p></body></html>"
        streams.append(
            (f"__substg1.0_{_P_HTML}0102", html.encode("utf-8"))
        )
    elif body_mode == "rtf":
        # RTF is an ASCII format: specials escaped, non-ASCII as signed
        # 16-bit \uN? units (the '?' is the mandated uc-1 fallback byte)
        esc = []
        for ch in body:
            if ch in "\\{}":
                esc.append("\\" + ch)
            elif ord(ch) < 128:
                esc.append(ch)
            else:
                # one \uN? per UTF-16 code unit (surrogate pair beyond BMP)
                u16 = ch.encode("utf-16-le")
                for k in range(0, len(u16), 2):
                    cp = int.from_bytes(u16[k : k + 2], "little")
                    if cp > 32767:
                        cp -= 65536
                    esc.append(f"\\u{cp}?")
        rtf = ("{\\rtf1\\ansi\\deff0 " + "".join(esc) + "}").encode("ascii")
        streams.append(
            (f"__substg1.0_{_P_RTF_COMPRESSED}0102", compress_lzfu(rtf))
        )
    else:
        raise ValueError(f"unknown body_mode {body_mode!r}")
    storages: list[tuple[str, list[tuple[str, bytes]]]] = []
    for i, (name, payload) in enumerate(attachments or []):
        storages.append(
            (f"__attach_version1.0_#{i:08X}",
             [(f"__substg1.0_{_P_ATT_NAME_LONG}001F", name.encode("utf-16-le")),
              (f"__substg1.0_{_P_ATT_DATA}0102", payload)])
        )

    from .cfb import build_cfb

    return build_cfb(streams, storages)
