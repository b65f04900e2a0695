"""iCalendar (.ics) and vCard (.vcf) text extraction — native readers for
two text formats the reference routes through Tika (`text/calendar`,
`text/x-vcalendar`, `text/x-vcard` all appear in the Tika-accepted mime
list, _tika_mime_types.py:1350,1469-1470; any `text/*` maps to the `text`
filetype, models.py:172).

Both formats are line-oriented "content lines" per the public RFCs:

- RFC 5545 (iCalendar): CRLF lines, folded by inserting CRLF + single
  WSP; property text values escape ``\\n`` ``\\,`` ``\\;`` ``\\\\``;
  components nest between BEGIN:X / END:X.
- RFC 6350 (vCard 4.0) shares the grammar; legacy vCard 2.1 additionally
  allows ``ENCODING=QUOTED-PRINTABLE`` property values whose soft line
  breaks end the physical line with ``=`` (the continuation is NOT
  space-folded — it must be stitched before unfolding rules apply).

The emitted text is a deterministic sequence of labelled property
blocks in document order (one ``Label: value`` block per interesting
property — normalize_text folds intra-block newlines, so each property
keeps its own line in the indexed text), the same normalize→index
contract as the other extractors.
"""

from __future__ import annotations

import quopri

__all__ = [
    "ics_to_text",
    "ics_dates",
    "vcf_to_text",
    "looks_like_ics",
    "looks_like_vcf",
]


# ---------------------------------------------------------------------------
# content-line assembly
# ---------------------------------------------------------------------------


def _raw_lines(data: bytes) -> list[str]:
    text = data.decode("utf-8", "replace")
    if text.startswith("\ufeff"):
        text = text[1:]
    return text.replace("\r\n", "\n").replace("\r", "\n").split("\n")


def _unfold(lines: list[str]) -> list[str]:
    """RFC 5545 §3.1 unfolding: a line starting with SPACE/HTAB continues
    the previous content line (the single leading WSP is removed)."""
    out: list[str] = []
    for ln in lines:
        if ln[:1] in (" ", "\t") and out:
            out[-1] += ln[1:]
        else:
            out.append(ln)
    return [ln for ln in out if ln.strip()]


def _stitch_qp(lines: list[str]) -> list[str]:
    """vCard 2.1 quoted-printable soft breaks: a content line whose params
    include ENCODING=QUOTED-PRINTABLE and whose value ends with ``=``
    continues on the NEXT physical line verbatim (no leading-WSP rule)."""
    out: list[str] = []
    i = 0
    while i < len(lines):
        ln = lines[i]
        if "QUOTED-PRINTABLE" in ln.split(":", 1)[0].upper():
            while ln.endswith("=") and i + 1 < len(lines):
                i += 1
                ln = ln[:-1] + lines[i]
        out.append(ln)
        i += 1
    return out


def _content_lines(data: bytes) -> list[tuple[str, dict[str, str], str]]:
    lines = _stitch_qp(_unfold(_raw_lines(data)))
    parsed = []
    for ln in lines:
        item = _parse_line(ln)
        if item:
            parsed.append(item)
    return parsed


def _parse_line(line: str) -> tuple[str, dict[str, str], str] | None:
    """``NAME;P1=V1;P2="q:v":value`` → (NAME, {P1: V1, ...}, value).
    The name/params–value split is the first ``:`` outside DQUOTE
    (RFC 5545 §3.2 allows ``:`` inside quoted param values)."""
    in_q = False
    for i, ch in enumerate(line):
        if ch == '"':
            in_q = not in_q
        elif ch == ":" and not in_q:
            head, value = line[:i], line[i + 1 :]
            break
    else:
        return None
    parts = head.split(";")
    name = parts[0].strip().upper()
    if not name:
        return None
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k.strip().upper()] = v.strip().strip('"')
        else:  # vCard 2.1 bare type params: TEL;HOME;VOICE:...
            params.setdefault("TYPE", p.strip())
    return name, params, value


def _decode_value(params: dict[str, str], value: str) -> str:
    enc = params.get("ENCODING", "").upper()
    if enc == "QUOTED-PRINTABLE":
        charset = params.get("CHARSET", "utf-8") or "utf-8"
        try:
            return quopri.decodestring(value.encode("ascii", "replace")).decode(
                charset, "replace"
            )
        except Exception:
            return value
    return _unescape(value)


def _unescape(value: str) -> str:
    out = []
    i = 0
    while i < len(value):
        ch = value[i]
        if ch == "\\" and i + 1 < len(value):
            nxt = value[i + 1]
            if nxt in ("n", "N"):
                out.append("\n")
            elif nxt in (",", ";", "\\"):
                out.append(nxt)
            else:
                out.append(ch)
                out.append(nxt)
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------


def _first_token(data: bytes) -> bytes:
    head = data[:64].lstrip(b"\xef\xbb\xbf \t\r\n")
    return head.upper()


def looks_like_ics(data: bytes) -> bool:
    return _first_token(data).startswith(b"BEGIN:VCALENDAR")


def looks_like_vcf(data: bytes) -> bool:
    return _first_token(data).startswith(b"BEGIN:VCARD")


# ---------------------------------------------------------------------------
# iCalendar
# ---------------------------------------------------------------------------

_ICS_COMPONENTS = ("VEVENT", "VTODO", "VJOURNAL", "VFREEBUSY")

#: properties emitted per component, in this order (multi-valued ones
#: repeat in document order)
_ICS_PROPS = (
    "SUMMARY",
    "DTSTART",
    "DTEND",
    "DUE",
    "LOCATION",
    "ORGANIZER",
    "ATTENDEE",
    "URL",
    "CATEGORIES",
    "STATUS",
    "DESCRIPTION",
)


def _ics_datetime(value: str) -> str:
    """RFC 5545 DATE/DATE-TIME → readable ISO: 20240102T030405Z →
    2024-01-02T03:04:05Z; 20240102 → 2024-01-02.  Anything that doesn't
    match the fixed grammar passes through verbatim."""
    v = value.strip()
    if len(v) >= 8 and v[:8].isdigit():
        date = f"{v[:4]}-{v[4:6]}-{v[6:8]}"
        rest = v[8:]
        if rest.startswith("T") and len(rest) >= 7 and rest[1:7].isdigit():
            time = f"{rest[1:3]}:{rest[3:5]}:{rest[5:7]}"
            return f"{date}T{time}{rest[7:]}"
        if not rest:
            return date
    return v


def _strip_mailto(value: str) -> str:
    return value[7:] if value.lower().startswith("mailto:") else value


def ics_to_text(data: bytes) -> str:
    """Deterministic readable text for an iCalendar stream: labelled
    property blocks per VEVENT/VTODO/VJOURNAL/VFREEBUSY in document
    order, blank-line separated (one block per property so each survives
    normalize_text as its own line).  The calendar-level X-WR-CALNAME (a
    de facto standard emitted by most producers) heads the output."""
    blocks: list[str] = []
    cur: list[str] | None = None
    depth_component = ""
    for name, params, value in _content_lines(data):
        if name == "BEGIN":
            comp = value.strip().upper()
            if comp in _ICS_COMPONENTS and cur is None:
                cur = []
                depth_component = comp
            continue
        if name == "END":
            comp = value.strip().upper()
            if cur is not None and comp == depth_component:
                blocks.extend(cur)
                cur = None
                depth_component = ""
            continue
        if cur is None:
            if name == "X-WR-CALNAME" and value.strip():
                blocks.insert(0, f"Calendar: {_unescape(value).strip()}")
            continue
        if name not in _ICS_PROPS:
            continue
        val = _decode_value(params, value).strip()
        if not val:
            continue
        if name in ("DTSTART", "DTEND", "DUE"):
            val = _ics_datetime(val)
        elif name in ("ORGANIZER", "ATTENDEE"):
            cn = params.get("CN", "").strip()
            addr = _strip_mailto(val)
            val = f"{cn} <{addr}>" if cn else addr
        label = name.capitalize()
        cur.append(f"{label}: {val}")
    return "\n\n".join(blocks)


def ics_dates(data: bytes) -> tuple[str | None, str | None]:
    """(date_created, date_modified) from the first component's CREATED /
    LAST-MODIFIED (fallback DTSTAMP), zulu-normalized — the fields the
    reference gets from Tika's rmeta for calendar media."""
    created = modified = stamp = None
    for name, _params, value in _content_lines(data):
        v = _ics_datetime(value)
        if name == "CREATED" and created is None:
            created = v
        elif name == "LAST-MODIFIED" and modified is None:
            modified = v
        elif name == "DTSTAMP" and stamp is None:
            stamp = v
        if created and modified:
            break
    from .office_extract import _parse_iso_zulu

    return _parse_iso_zulu(created or stamp), _parse_iso_zulu(modified or stamp)


# ---------------------------------------------------------------------------
# vCard
# ---------------------------------------------------------------------------

_VCF_PROPS = (
    "FN",
    "N",
    "NICKNAME",
    "ORG",
    "TITLE",
    "ROLE",
    "EMAIL",
    "TEL",
    "ADR",
    "URL",
    "BDAY",
    "NOTE",
)

_VCF_LABELS = {
    "FN": "Name",
    "N": "Structured name",
    "NICKNAME": "Nickname",
    "ORG": "Organization",
    "TITLE": "Title",
    "ROLE": "Role",
    "EMAIL": "Email",
    "TEL": "Phone",
    "ADR": "Address",
    "URL": "Url",
    "BDAY": "Birthday",
    "NOTE": "Note",
}


def vcf_to_text(data: bytes) -> str:
    """Deterministic readable text for a vCard stream: labelled property
    blocks per card in document order (one block per property; multi-card
    contact exports concatenate).  Compound values (N, ADR, ORG) join
    their non-empty ``;`` components with a single space."""
    blocks: list[str] = []
    cur: list[str] | None = None
    for name, params, value in _content_lines(data):
        base = name.split(".", 1)[-1]  # drop vCard group prefixes (item1.)
        if base == "BEGIN" and value.strip().upper() == "VCARD":
            cur = []
            continue
        if base == "END" and value.strip().upper() == "VCARD":
            if cur:
                blocks.extend(cur)
            cur = None
            continue
        if cur is None or base not in _VCF_PROPS:
            continue
        val = _decode_value(params, value)
        if base in ("N", "ADR", "ORG"):
            val = " ".join(p.strip() for p in val.split(";") if p.strip())
        val = val.strip()
        if not val:
            continue
        label = _VCF_LABELS[base]
        typ = params.get("TYPE", "").strip()
        if typ and base in ("EMAIL", "TEL", "ADR", "URL"):
            label = f"{label} ({typ.lower()})"
        cur.append(f"{label}: {val}")
    return "\n\n".join(blocks)
