"""Apple `.partial.emlx` reconstruction — re-expression of the reference's
`emlx.reconstruct` task (snoop/data/analyzers/emlx.py:14-58).

Apple Mail zeroes out large MIME parts (marked `X-Apple-Content-Length`)
and stores their payloads as sibling files named
``<msg>.<part-ref>.emlxpart`` in the same directory.  The reference
resolves siblings through the Directory ORM (`child_file_set` lookup,
emlx.py:40-48); here it is a **grouped join**: files grouped by directory,
parts re-attached per group with ``applyInPandas`` (one mail directory is
small, so per-group pandas is the right granularity).

Pure kernel: ``reconstruct_emlx_bytes(emlx_bytes, parts)`` — testable
without Spark; Spark wrapper: ``reconstruct_emlx(files_df)`` over
``(path, data)`` rows.
"""

from __future__ import annotations

import email
import os
import re

from .archive_unpack import emlx_strip
from .email_parse import iter_parts as _iter_meta  # noqa: F401  (kept for parity refs)


def _iter_message_parts(message, numbers=None):
    """(ref, part) pairs with '1.2'-style position refs (reference
    email.iter_parts, email.py:60-67)."""
    numbers = numbers or []
    if message.is_multipart():
        for n, part in enumerate(message.get_payload(), 1):
            yield from _iter_message_parts(part, numbers + [str(n)])
    else:
        yield ".".join(numbers), message


def reconstruct_emlx_bytes(
    name: str, emlx_bytes: bytes, siblings: dict[str, bytes]
) -> bytes:
    """One `.partial.emlx` + its directory's files → reconstructed RFC-822
    bytes.  ``siblings`` maps filename → bytes for the directory."""
    eml_data = emlx_strip(emlx_bytes)
    message = email.message_from_bytes(eml_data)
    for ref, part in _iter_message_parts(message):
        if part.get("X-Apple-Content-Length"):
            part_name = re.sub(r"\.partial\.emlx$", f".{ref}.emlxpart", name)
            payload = siblings.get(part_name)
            if payload is None:
                continue  # reference logs+skips missing parts (emlx.py:50-52)
            part.set_payload(payload)
    return message.as_bytes()


def reconstruct_emlx(files_df):
    """(path, data) rows → reconstructed (path, data) for every
    `.partial.emlx`, via a per-directory grouped apply.

    Directories are natural small groups (one mailbox folder), so the
    shuffle key is ``dirname(path)`` and each group fits a pandas frame —
    the distributed analog of the reference's same-directory file lookup.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def per_dir(pdf: pd.DataFrame) -> pd.DataFrame:
        by_name = dict(zip(pdf["name"], pdf["data"]))
        out = []
        for name, data in by_name.items():
            if not name.endswith(".partial.emlx"):
                continue
            fixed = reconstruct_emlx_bytes(name, data, by_name)
            out.append({"dirname": pdf["dirname"].iloc[0], "name": name,
                        "data": fixed})
        return pd.DataFrame(out, columns=["dirname", "name", "data"])

    with_dir = files_df.select(
        F.expr("substring_index(path, '/', size(split(path, '/')) - 1)").alias("dirname"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
        "data",
    )
    return (
        with_dir.groupBy("dirname")
        .applyInPandas(per_dir, schema="dirname string, name string, data binary")
        .select(
            F.concat_ws("/", "dirname", "name").alias("path"),
            "data",
        )
    )


def _dirname(path: str) -> str:  # pragma: no cover — kept for symmetry
    return os.path.dirname(path)
