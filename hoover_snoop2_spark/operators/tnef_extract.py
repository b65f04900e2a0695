"""TNEF (winmail.dat) reader — [MS-OXTNEF], the Transport Neutral
Encapsulation Format Outlook uses when rich mail crosses an SMTP hop.

The reference Tika-parses ``application/vnd.ms-tnef``
(``snoop/data/analyzers/_tika_mime_types.py:526``); here the stream is
decoded natively: the attribute walk (level / id / length / data /
checksum), the message body in any of its three carriers (attBody,
MAPI PidTagHtml, MAPI PidTagRtfCompressed via the in-repo [MS-OXRTFCP]
LZFu codec), and attachment fan-out (attAttachTitle/attAttachData plus
the attAttachment MAPI long-filename override), so winmail.dat children
ride the same recursion as .msg and archive members.

Self-verification: every attribute carries a 16-bit additive checksum
([MS-OXTNEF] §2.1.2) which the parser enforces and ``build_tnef``
emits — a corrupted stream is surfaced as a typed ``tnef_*`` broken
reason, never wrong bytes.
"""
from __future__ import annotations

import struct

TNEF_SIGNATURE = 0x223E9F78

_LVL_MESSAGE = 0x01
_LVL_ATTACHMENT = 0x02

# full 32-bit attribute ids: (type << 16) | id — [MS-OXTNEF] §2.1.3.2
ATT_TNEF_VERSION = 0x00089006
ATT_OEM_CODEPAGE = 0x00069007
ATT_MESSAGE_CLASS = 0x00078008
ATT_SUBJECT = 0x00018004
ATT_BODY = 0x0002800C
ATT_DATE_SENT = 0x00038005
ATT_FROM = 0x00068000           # TRP-wrapped sender
ATT_MAPI_PROPS = 0x00069003
ATT_ATTACH_REND_DATA = 0x00069002   # opens a new attachment scope
ATT_ATTACH_TITLE = 0x00018010
ATT_ATTACH_DATA = 0x0006800F
ATT_ATTACHMENT = 0x00069005         # attachment-level MAPI props

# MAPI property types ([MS-OXCDATA] §2.11.1) with fixed on-wire sizes;
# each single fixed value is padded to a 4-byte boundary in TNEF
_FIXED_PTYPES = {
    0x0002: 2,   # PT_I2
    0x0003: 4,   # PT_LONG
    0x0004: 4,   # PT_R4
    0x0005: 8,   # PT_DOUBLE
    0x0006: 8,   # PT_CURRENCY
    0x0007: 8,   # PT_APPTIME
    0x000A: 4,   # PT_ERROR
    0x000B: 2,   # PT_BOOLEAN
    0x0014: 8,   # PT_I8
    0x0040: 8,   # PT_SYSTIME
    0x0048: 16,  # PT_CLSID
}
_VAR_PTYPES = {0x001E, 0x001F, 0x0102, 0x000D}  # STRING8/UNICODE/BINARY/OBJECT

_P_BODY = 0x1000
_P_RTF_COMPRESSED = 0x1009
_P_HTML = 0x1013
_P_SUBJECT = 0x0037
_P_ATT_NAME_LONG = 0x3707
_P_ATT_DATA = 0x3701


class TnefBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_tnef(data: bytes) -> bool:
    return len(data) >= 6 and struct.unpack_from("<I", data)[0] == TNEF_SIGNATURE


def _checksum(payload: bytes) -> int:
    # [MS-OXTNEF] §2.1.2: 16-bit additive checksum over the data bytes
    return sum(payload) & 0xFFFF


def _walk_attributes(data: bytes):
    """Yield (level, att_id, payload) with checksum enforcement."""
    if not looks_like_tnef(data):
        raise TnefBroken("tnef_bad_signature")
    pos = 6  # signature(4) + LegacyKey(2)
    n = len(data)
    while pos < n:
        if pos + 9 > n:
            raise TnefBroken("tnef_truncated")
        level = data[pos]
        att_id, length = struct.unpack_from("<II", data, pos + 1)
        pos += 9
        if pos + length + 2 > n:
            raise TnefBroken("tnef_truncated")
        payload = data[pos : pos + length]
        pos += length
        (want,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if _checksum(payload) != want:
            raise TnefBroken("tnef_checksum")
        if level not in (_LVL_MESSAGE, _LVL_ATTACHMENT):
            raise TnefBroken("tnef_bad_level")
        yield level, att_id, payload


def _cstr(payload: bytes, codepage: str) -> str:
    return payload.split(b"\x00", 1)[0].decode(codepage, errors="replace")


def _dtr_to_zulu(payload: bytes) -> str | None:
    # DTR ([MS-OXTNEF] §2.1.3.4.2): six uint16 fields + day-of-week
    if len(payload) < 12:
        return None
    y, mo, d, h, mi, s = struct.unpack_from("<6H", payload)
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        return None
    return f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}Z"


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def parse_mapi_props(payload: bytes) -> dict[int, object]:
    """MAPI property blob inside attMapiProps/attAttachment
    ([MS-OXTNEF] §2.1.3.3) → {prop_id: first value} for the scalar
    subset this pipeline consumes.  Strings decode, binaries stay
    bytes, fixed types come back as ints."""
    out: dict[int, object] = {}
    if len(payload) < 4:
        raise TnefBroken("tnef_mapi_truncated")
    (count,) = struct.unpack_from("<I", payload)
    pos = 4
    n = len(payload)
    for _ in range(count):
        if pos + 4 > n:
            raise TnefBroken("tnef_mapi_truncated")
        (tag,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        ptype = tag & 0xFFFF
        pid = tag >> 16
        if pid >= 0x8000:
            # named property: GUID + kind (+ name or dispid)
            if pos + 20 > n:
                raise TnefBroken("tnef_mapi_truncated")
            (kind,) = struct.unpack_from("<I", payload, pos + 16)
            pos += 20
            if kind == 1:
                if pos + 4 > n:
                    raise TnefBroken("tnef_mapi_truncated")
                (cb,) = struct.unpack_from("<I", payload, pos)
                pos += 4 + _pad4(cb)
            elif kind == 0:
                pos += 4
            else:
                raise TnefBroken("tnef_mapi_named_kind")
            if pos > n:
                raise TnefBroken("tnef_mapi_truncated")
        base = ptype & 0x0FFF
        multi = bool(ptype & 0x1000)
        values: list[object] = []
        if base in _VAR_PTYPES or multi:
            if pos + 4 > n:
                raise TnefBroken("tnef_mapi_truncated")
            (cvals,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            for _v in range(cvals):
                if base in _VAR_PTYPES:
                    if pos + 4 > n:
                        raise TnefBroken("tnef_mapi_truncated")
                    (cb,) = struct.unpack_from("<I", payload, pos)
                    pos += 4
                    if pos + cb > n:
                        raise TnefBroken("tnef_mapi_truncated")
                    raw = payload[pos : pos + cb]
                    pos += _pad4(cb)
                    if base == 0x001E:
                        values.append(
                            raw.split(b"\x00", 1)[0].decode(
                                "cp1252", errors="replace"
                            )
                        )
                    elif base == 0x001F:
                        values.append(
                            raw.decode("utf-16-le", errors="replace").rstrip(
                                "\x00"
                            )
                        )
                    else:
                        values.append(raw)
                else:
                    size = _FIXED_PTYPES.get(base)
                    if size is None:
                        raise TnefBroken(f"tnef_mapi_type_{base:04x}")
                    if pos + size > n:
                        raise TnefBroken("tnef_mapi_truncated")
                    values.append(
                        int.from_bytes(
                            payload[pos : pos + size], "little", signed=False
                        )
                    )
                    pos += _pad4(size)
        else:
            size = _FIXED_PTYPES.get(base)
            if size is None:
                raise TnefBroken(f"tnef_mapi_type_{base:04x}")
            if pos + size > n:
                raise TnefBroken("tnef_mapi_truncated")
            values.append(
                int.from_bytes(payload[pos : pos + size], "little", signed=False)
            )
            pos += _pad4(size)
        if values and pid not in out:
            out[pid] = values[0]
    return out


def _body_from_props(props: dict[int, object]) -> str | None:
    # same carrier priority as parse_msg (msg_extract.py:255-279)
    body = props.get(_P_BODY)
    if isinstance(body, str) and body:
        return body
    raw_html = props.get(_P_HTML)
    if isinstance(raw_html, bytes) and raw_html:
        from .html_extract import strip_tags

        return strip_tags(raw_html.decode("utf-8", errors="replace"))
    if isinstance(raw_html, str) and raw_html:
        from .html_extract import strip_tags

        return strip_tags(raw_html)
    raw_rtf = props.get(_P_RTF_COMPRESSED)
    if isinstance(raw_rtf, bytes) and raw_rtf:
        from .msg_extract import LzfuError, decompress_lzfu
        from .rtf_extract import rtf_to_text

        try:
            return rtf_to_text(decompress_lzfu(raw_rtf))
        except LzfuError:
            return None
    return None


def parse_tnef(data: bytes) -> dict:
    """TNEF bytes → the email_meta-shaped dict the digest layer expects
    (same contract as ``parse_msg``): subject / from / date / text /
    attachments[(name, bytes)]."""
    codepage = "cp1252"
    out: dict = {}
    attachments: list[dict] = []
    cur: dict | None = None
    msg_props: dict[int, object] = {}
    body: str | None = None

    for level, att_id, payload in _walk_attributes(data):
        if level == _LVL_MESSAGE:
            if att_id == ATT_OEM_CODEPAGE and len(payload) >= 4:
                (cp,) = struct.unpack_from("<I", payload)
                try:
                    b"\x00".decode(f"cp{cp}")
                    codepage = f"cp{cp}"
                except LookupError:
                    pass
            elif att_id == ATT_SUBJECT:
                out["subject"] = _cstr(payload, codepage)
            elif att_id == ATT_BODY:
                body = _cstr(payload, codepage)
            elif att_id == ATT_DATE_SENT:
                dt = _dtr_to_zulu(payload)
                if dt:
                    out["date"] = dt
            elif att_id == ATT_FROM:
                # TRP ([MS-OXTNEF] §2.1.3.4.3): 4 uint16s then
                # display-name and address, both null-terminated
                if len(payload) > 8:
                    parts = payload[8:].split(b"\x00")
                    addr = next(
                        (
                            p.decode(codepage, errors="replace")
                            for p in parts[1:2] + parts[0:1]
                            if p
                        ),
                        None,
                    )
                    if addr:
                        out["from"] = [addr.split(":", 1)[-1]]
            elif att_id == ATT_MAPI_PROPS:
                msg_props = parse_mapi_props(payload)
        else:  # attachment level
            if att_id == ATT_ATTACH_REND_DATA:
                cur = {"name": None, "data": None}
                attachments.append(cur)
            elif cur is None:
                raise TnefBroken("tnef_attachment_order")
            elif att_id == ATT_ATTACH_TITLE:
                cur["name"] = _cstr(payload, codepage) or cur["name"]
            elif att_id == ATT_ATTACH_DATA:
                cur["data"] = payload
            elif att_id == ATT_ATTACHMENT:
                props = parse_mapi_props(payload)
                long_name = props.get(_P_ATT_NAME_LONG)
                if isinstance(long_name, str) and long_name:
                    cur["name"] = long_name
                blob = props.get(_P_ATT_DATA)
                if isinstance(blob, bytes) and cur["data"] is None:
                    cur["data"] = blob

    if body is None:
        body = _body_from_props(msg_props)
    if body:
        out["text"] = body
    if "subject" not in out:
        subj = msg_props.get(_P_SUBJECT)
        if isinstance(subj, str) and subj:
            out["subject"] = subj
    out["attachments"] = [
        (a["name"] or "attachment", a["data"])
        for a in attachments
        if a["data"] is not None
    ]
    return out


# ---------------------------------------------------------------------------
# deterministic TNEF fixture builder (golden-corpus role, like build_msg)
# ---------------------------------------------------------------------------


def _attr(level: int, att_id: int, payload: bytes) -> bytes:
    return (
        struct.pack("<BII", level, att_id, len(payload))
        + payload
        + struct.pack("<H", _checksum(payload))
    )


def _mapi_blob(props: list[tuple[int, int, object]]) -> bytes:
    """props: [(pid, ptype, value)] → §2.1.3.3 encoding (scalar values)."""
    out = bytearray(struct.pack("<I", len(props)))
    for pid, ptype, value in props:
        out += struct.pack("<I", (pid << 16) | ptype)
        if ptype in _VAR_PTYPES:
            if ptype == 0x001E:
                raw = str(value).encode("cp1252", errors="replace") + b"\x00"
            elif ptype == 0x001F:
                raw = str(value).encode("utf-16-le") + b"\x00\x00"
            else:
                raw = bytes(value)
            out += struct.pack("<II", 1, len(raw))
            out += raw + b"\x00" * (_pad4(len(raw)) - len(raw))
        else:
            size = _FIXED_PTYPES[ptype]
            out += int(value).to_bytes(size, "little")
            out += b"\x00" * (_pad4(size) - size)
    return bytes(out)


def build_tnef(
    subject: str,
    body: str,
    sender: str = "",
    attachments: list[tuple[str, bytes]] | None = None,
    body_mode: str = "plain",
    date: tuple[int, int, int, int, int, int] | None = None,
) -> bytes:
    """Emit a conformant TNEF stream.  body_mode 'plain' uses attBody;
    'html'/'rtf' carry the body only in MAPI props (PidTagHtml /
    LZFu PidTagRtfCompressed) — the shapes Outlook actually sends."""
    out = bytearray(struct.pack("<IH", TNEF_SIGNATURE, 0x1234))
    out += _attr(
        _LVL_MESSAGE, ATT_TNEF_VERSION, struct.pack("<I", 0x00010000)
    )
    out += _attr(_LVL_MESSAGE, ATT_OEM_CODEPAGE, struct.pack("<II", 1252, 0))
    out += _attr(
        _LVL_MESSAGE,
        ATT_MESSAGE_CLASS,
        b"IPM.Microsoft Mail.Note\x00",
    )
    out += _attr(
        _LVL_MESSAGE,
        ATT_SUBJECT,
        subject.encode("cp1252", errors="replace") + b"\x00",
    )
    if sender:
        name_b = sender.split("@")[0].encode("cp1252", errors="replace") + b"\x00"
        addr_b = f"SMTP:{sender}".encode("cp1252", errors="replace") + b"\x00"
        trp = struct.pack("<4H", 4, 8 + len(name_b) + len(addr_b),
                          len(name_b), len(addr_b)) + name_b + addr_b
        out += _attr(_LVL_MESSAGE, ATT_FROM, trp)
    if date is not None:
        y, mo, d, h, mi, s = date
        dow = 0
        out += _attr(
            _LVL_MESSAGE,
            ATT_DATE_SENT,
            struct.pack("<7H", y, mo, d, h, mi, s, dow),
        )
    if body_mode == "plain":
        out += _attr(
            _LVL_MESSAGE,
            ATT_BODY,
            body.encode("cp1252", errors="replace") + b"\x00",
        )
    elif body_mode == "html":
        html = f"<html><body><p>{body}</p></body></html>"
        out += _attr(
            _LVL_MESSAGE,
            ATT_MAPI_PROPS,
            _mapi_blob([(_P_HTML, 0x0102, html.encode("utf-8"))]),
        )
    elif body_mode == "rtf":
        from .msg_extract import compress_lzfu

        esc = []
        for ch in body:
            if ch in "\\{}":
                esc.append("\\" + ch)
            elif ord(ch) < 128:
                esc.append(ch)
            else:
                u16 = ch.encode("utf-16-le")
                for k in range(0, len(u16), 2):
                    cp = int.from_bytes(u16[k : k + 2], "little")
                    if cp > 32767:
                        cp -= 65536
                    esc.append(f"\\u{cp}?")
        rtf = ("{\\rtf1\\ansi\\deff0 " + "".join(esc) + "}").encode("ascii")
        out += _attr(
            _LVL_MESSAGE,
            ATT_MAPI_PROPS,
            _mapi_blob([(_P_RTF_COMPRESSED, 0x0102, compress_lzfu(rtf))]),
        )
    else:
        raise ValueError(f"unknown body_mode {body_mode!r}")
    for i, (name, payload) in enumerate(attachments or []):
        # 14-byte RendData: atyp=file, position, size hints, flags
        out += _attr(
            _LVL_ATTACHMENT,
            ATT_ATTACH_REND_DATA,
            struct.pack("<HIHHI", 1, 0, 0, 0, 0),
        )
        short = f"ATT{i:05d}.DAT"
        out += _attr(
            _LVL_ATTACHMENT,
            ATT_ATTACH_TITLE,
            short.encode("cp1252") + b"\x00",
        )
        out += _attr(_LVL_ATTACHMENT, ATT_ATTACH_DATA, payload)
        out += _attr(
            _LVL_ATTACHMENT,
            ATT_ATTACHMENT,
            _mapi_blob([(_P_ATT_NAME_LONG, 0x001F, name)]),
        )
    return bytes(out)
