"""CSV/TSV table handling: dialect sniffing, table info, row explosion.

Reference behavior reproduced:

- ``guess_csv_settings`` — csv.Sniffer over the first 8 KiB with delimiter
  candidates ``[':', ',', '|', '\\t', ';']``; text/plain blobs that sniff as
  CSV get their mime *corrected* to text/csv or text/tab-separated-values
  (archives.py:106-141).  We never mutate — we emit a corrected mime column.
- ``get_table_info`` — sheet/row/column counts + header names
  (archives.py:244-344) → the digest's ``table-columns``/``table-row-count``/
  ``table-sheets`` / ``table-sheet-count`` fields (digests.py:233-251).
- ``_do_explode_row`` — each row becomes a text doc of ``col = value`` lines
  ('=' chosen because it is not a sniffable delimiter); 200-column and
  1024-char-cell caps (archives.py:206-234); 20 000-row split granularity
  (defaultsettings.py:383-391) becomes the fan-out bound.
"""

from __future__ import annotations

import csv
import io

#: reference archives.py:88
CSV_DELIMITER_LIST = ":,|\t;"
GUESS_READ_LEN = 8192

#: reference archives.py:217-219
OUT_SEPARATOR = "="
MAX_CELL_LEN = 1024
MAX_ROW_LEN = 200

#: reference defaultsettings.py:383-391 — rows per split (we cap fan-out)
TABLE_SPLIT_ROWS = 20_000


def _fast_guess_delimiter(data: str, delimiters: str, preferred: list[str]):
    """``csv.Sniffer._guess_delimiter`` restricted to the candidate set.

    The stdlib routine builds per-line frequency tables for EVERY 7-bit
    character (127 ``str.count`` calls per line — ~65% of the whole csv
    kernel's CPU), yet a character outside ``delimiters`` can never be
    returned: its mode only ever feeds the ``k in delimiters``-gated
    branch.  Restricting the frequency loop to the candidates is
    therefore output-identical — every other statement below is a pinned
    copy of the CPython 3.11 algorithm (chunked evaluation, cumulative
    charFrequency across chunks, the mode adjustment, the consistency
    ramp, the single-delimiter early return, the preferred-list and
    dominance fallbacks).  Equivalence is pinned by
    ``test_html_tables.py::test_fast_sniff_matches_stdlib``.
    """
    rows = list(filter(None, data.split("\n")))
    chunk_len = min(10, len(rows))
    iteration = 0
    char_frequency: dict[str, dict[int, int]] = {}
    modes: dict[str, tuple[int, int]] = {}
    delims: dict[str, tuple[int, int]] = {}
    start, end = 0, chunk_len
    while start < len(rows):
        iteration += 1
        for line in rows[start:end]:
            for char in delimiters:
                meta_frequency = char_frequency.get(char, {})
                # must count even if frequency is 0
                freq = line.count(char)
                meta_frequency[freq] = meta_frequency.get(freq, 0) + 1
                char_frequency[char] = meta_frequency
        for char in char_frequency.keys():
            items = list(char_frequency[char].items())
            if len(items) == 1 and items[0][0] == 0:
                continue
            if len(items) > 1:
                mode = max(items, key=lambda x: x[1])
                items.remove(mode)
                modes[char] = (mode[0],
                               mode[1] - sum(item[1] for item in items))
            else:
                modes[char] = items[0]
        mode_list = modes.items()
        total = float(min(chunk_len * iteration, len(rows)))
        consistency = 1.0
        threshold = 0.9
        while len(delims) == 0 and consistency >= threshold:
            for k, v in mode_list:
                if v[0] > 0 and v[1] > 0:
                    if (v[1] / total) >= consistency:
                        delims[k] = v
            consistency -= 0.01
        if len(delims) == 1:
            delim = list(delims.keys())[0]
            skipinitialspace = (rows[0].count(delim) ==
                                rows[0].count("%c " % delim))
            return (delim, skipinitialspace)
        start = end
        end += chunk_len
    if not delims:
        return ("", 0)
    if len(delims) > 1:
        for d in preferred:
            if d in delims.keys():
                skipinitialspace = (rows[0].count(d) ==
                                    rows[0].count("%c " % d))
                return (d, skipinitialspace)
    items = [(v, k) for (k, v) in delims.items()]
    items.sort()
    delim = items[-1][1]
    skipinitialspace = (rows[0].count(delim) ==
                        rows[0].count("%c " % delim))
    return (delim, skipinitialspace)


def _fast_sniff(sample: str, delimiters: str):
    """``csv.Sniffer.sniff`` with the frequency scan restricted to the
    candidate delimiters (see :func:`_fast_guess_delimiter`).  The quote
    heuristic — cheap, regex-based — still runs through the live stdlib
    implementation; only the hot fallback is replaced.  Raises
    ``csv.Error`` exactly when the stdlib would."""
    sniffer = csv.Sniffer()
    quotechar, doublequote, delimiter, skipinitialspace = (
        sniffer._guess_quote_and_delimiter(sample, delimiters)
    )
    if not delimiter:
        delimiter, skipinitialspace = _fast_guess_delimiter(
            sample, delimiters, sniffer.preferred
        )
    if not delimiter:
        raise csv.Error("Could not determine delimiter")

    class dialect(csv.Dialect):
        _name = "sniffed"
        lineterminator = "\r\n"
        quoting = csv.QUOTE_MINIMAL

    dialect.doublequote = doublequote
    dialect.delimiter = delimiter
    # _csv.reader won't accept a quotechar of ''
    dialect.quotechar = quotechar or '"'
    dialect.skipinitialspace = skipinitialspace
    return dialect


def guess_csv_dialect(data: bytes, mime_encoding: str | None):
    """csv.Sniffer over the first 8 KiB (archives.py:106-126)."""
    text = data[:GUESS_READ_LEN]
    enc = mime_encoding or "latin-1"
    if enc.startswith("unknown") or enc == "binary":
        enc = "latin-1"
    if enc == "us-ascii":
        enc = "ascii"
    try:
        decoded = text.decode(enc, errors="backslashreplace")
    except LookupError:
        decoded = text.decode("latin-1", errors="backslashreplace")
    # sound pre-filter: Sniffer can only ever return a delimiter that
    # occurs in the sample (sniff() raises otherwise), and its Python
    # char-frequency scan costs ~1 ms per call — skip it outright when no
    # candidate delimiter appears (the common prose/exploded-row case)
    if not any(d in decoded for d in CSV_DELIMITER_LIST):
        return None
    try:
        return _fast_sniff(decoded, CSV_DELIMITER_LIST)
    except csv.Error:
        return None


def corrected_table_mime(data: bytes, mime_type: str, mime_encoding: str | None) -> str:
    """is_table's mime correction (archives.py:123-141), side-effect-free."""
    if mime_type != "text/plain":
        return mime_type
    dialect = guess_csv_dialect(data, mime_encoding)
    if dialect is None:
        return mime_type
    return "text/tab-separated-values" if dialect.delimiter == "\t" else "text/csv"


def is_table_mime(mime_type: str) -> bool:
    return mime_type in ("text/csv", "text/tab-separated-values")


def _decode_table(data: bytes, mime_encoding: str | None) -> str:
    enc = mime_encoding or "latin-1"
    if enc in ("binary", "us-ascii"):
        enc = "latin-1" if enc == "binary" else "ascii"
    try:
        return data.decode(enc, errors="replace")
    except LookupError:
        return data.decode("latin-1", errors="replace")


def table_info(
    data: bytes, mime_type: str, mime_encoding: str | None, dialect=None
) -> dict | None:
    """Row/column counts + header names (get_table_info analog,
    archives.py:244-344).  Single-sheet (csv) only — no pyexcel here.
    Pass ``dialect`` to reuse an earlier sniff (3 sniffs/doc otherwise)."""
    if dialect is None:
        dialect = guess_csv_dialect(data, mime_encoding)
    if dialect is None and not is_table_mime(mime_type):
        return None
    text = _decode_table(data, mime_encoding)
    delim = dialect.delimiter if dialect else ("\t" if mime_type.endswith("values") else ",")
    reader = csv.reader(io.StringIO(text), delimiter=delim)
    try:
        rows = list(reader)
    except csv.Error:
        return None
    if not rows:
        return None
    header = rows[0][:MAX_ROW_LEN]
    return {
        "table-columns": header,
        "table-row-count": len(rows),
        "table-col-count": len(header),
        "table-sheets": ["0"],
        "table-sheet-count": 1,
    }


def explode_row(row: list[str], colnames: list[str] | None) -> str:
    """One row → '<col> = <value>' lines (_do_explode_row,
    archives.py:206-234)."""
    row = row[:MAX_ROW_LEN]
    if colnames and len(colnames) > MAX_ROW_LEN:
        colnames = colnames[:MAX_ROW_LEN]
    if not colnames:
        colnames = [f"C{i}" for i in range(1, 1 + len(row))]
    # ragged rows: pad/trim names to row length (reference asserts equality;
    # real CSVs are ragged, so we align instead of erroring)
    if len(colnames) < len(row):
        colnames = colnames + [f"C{i}" for i in range(len(colnames) + 1, len(row) + 1)]
    out_lines = []
    for v, k in zip(row, colnames):
        if len(v) > MAX_CELL_LEN:
            v = v[:MAX_CELL_LEN]
        out_lines.append(f"{k} {OUT_SEPARATOR} {v}\n")
    return "".join(out_lines)


def explode_table(
    data: bytes, mime_type: str, mime_encoding: str | None,
    max_rows: int = TABLE_SPLIT_ROWS, dialect=None,
) -> list[tuple[str, str]]:
    """Table → [(child_name, child_text)] one per data row, header row used
    as column names (unpack_table analog, archives.py:347-474)."""
    if dialect is None:
        dialect = guess_csv_dialect(data, mime_encoding)
    text = _decode_table(data, mime_encoding)
    delim = dialect.delimiter if dialect else ("\t" if mime_type.endswith("values") else ",")
    reader = csv.reader(io.StringIO(text), delimiter=delim)
    out: list[tuple[str, str]] = []
    colnames: list[str] | None = None
    for i, row in enumerate(reader):
        if i == 0:
            colnames = row[:MAX_ROW_LEN]
            continue
        if i > max_rows:
            break
        out.append((f"{i}.txt", explode_row(row, colnames)))
    return out
