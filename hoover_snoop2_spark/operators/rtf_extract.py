"""RTF text extraction (public RTF 1.9 spec) — another Tika-delegated
format (`application/rtf` → filetype 'doc', _file_types.py:27) made local.

Minimal-but-correct tokenizer: destination groups (fonttbl, colortbl,
stylesheet, info, pict, \\* ignorables) are skipped wholesale; ``\\par`` /
``\\line`` break blocks; ``\\'xx`` hex and ``\\uN`` unicode escapes decode
(with the mandated uc-skip of fallback bytes); everything else outside
control words is text.
"""

from __future__ import annotations

import re

from ..functions.textutils import normalize_text

_SKIP_DESTINATIONS = frozenset(
    "fonttbl colortbl stylesheet info generator pict object header footer "
    "headerl headerr footerl footerr themedata colorschememapping "
    "latentstyles datastore".split()
)

_TOKEN = re.compile(
    rb"\\'[0-9a-fA-F]{2}"          # hex escape
    rb"|\\u-?\d+ ?"                 # unicode escape (delimiter space eaten)
    rb"|\\[a-zA-Z]+-?\d* ?"         # control word (optional param + space)
    rb"|\\[^a-zA-Z]"                # control symbol
    rb"|[{}]"
    rb"|[^\\{}]+"                   # plain text run
)


def rtf_to_text(data: bytes) -> str:
    if not data.startswith(b"{\\rtf"):
        return ""
    out: list[str] = []
    depth = 0
    skip_until_depth: int | None = None
    uc_skip = 1
    pending_skip = 0
    charset = "cp1252"  # RTF default ANSI code page

    i = 0
    tokens = _TOKEN.finditer(data)
    for m in tokens:
        tok = m.group(0)
        if skip_until_depth is not None:
            if tok == b"{":
                depth += 1
            elif tok == b"}":
                depth -= 1
                if depth < skip_until_depth:
                    skip_until_depth = None
            continue
        if tok == b"{":
            depth += 1
            continue
        if tok == b"}":
            depth -= 1
            continue
        if tok.startswith(b"\\'"):
            byte = bytes([int(tok[2:], 16)])
            if pending_skip:
                pending_skip -= 1
                continue
            out.append(byte.decode(charset, errors="replace"))
            continue
        if tok.startswith(b"\\u") and tok[2:3] in b"-0123456789":
            code = int(tok[2:].strip())
            if code < 0:
                code += 65536
            # non-BMP chars arrive as two \uN units (UTF-16 surrogate
            # pair) — combine with a pending high surrogate
            if (
                0xDC00 <= code <= 0xDFFF
                and out
                and len(out[-1]) == 1
                and 0xD800 <= ord(out[-1]) <= 0xDBFF
            ):
                hi = ord(out.pop())
                code = 0x10000 + ((hi - 0xD800) << 10) + (code - 0xDC00)
            out.append(chr(code))
            pending_skip = uc_skip
            continue
        if tok.startswith(b"\\") and tok[1:2].isalpha():
            word = tok[1:].strip()
            name = word.rstrip(b"-0123456789").decode("ascii", "replace")
            if name in _SKIP_DESTINATIONS:
                skip_until_depth = depth
                continue
            if name in ("par", "line"):
                out.append("\n\n")
            elif name == "tab":
                out.append(" ")
            elif name == "uc":
                try:
                    uc_skip = int(word[len(name):] or 1)
                except ValueError:
                    uc_skip = 1
            elif name == "ansicpg":
                try:
                    charset = "cp" + str(int(word[len(name):]))
                except ValueError:
                    pass
            continue
        if tok == b"\\*":
            skip_until_depth = depth  # ignorable destination
            continue
        if tok.startswith(b"\\"):
            continue  # other control symbols
        # plain text
        text = tok.replace(b"\r", b"").replace(b"\n", b"")
        if pending_skip:
            cut = min(pending_skip, len(text))
            text = text[cut:]
            pending_skip -= cut
        if text:
            out.append(text.decode(charset, errors="replace"))
    _ = i
    return normalize_text("".join(out)) or ""
