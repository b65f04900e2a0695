"""Visio extraction: modern OPC .vsdx/.vsdm text natively; legacy OLE
.vsd typed (container recognized, text a documented gap).

The reference Tika-accepts the whole family
(``snoop/data/analyzers/_tika_mime_types.py:527-532`` vsdx/vsdm/vssx/
vstx + ``:760`` legacy ``application/vnd.visio``).

.vsdx is a zip of XML (OPC): shape text lives in ``<Text>`` elements of
``visio/pages/page<N>.xml`` (namespace
``.../office/visio/2012/main``); pages concatenate in numeric order,
one paragraph per shape — the block shape Tika's XDGFParser emits.
.vsdm additionally carries ``visio/vbaProject.bin``, which fans out
through the same [MS-OVBA] walk as docm.
"""
from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

VSDX_MIME = "application/vnd.ms-visio.drawing"
VSDM_MIME = "application/vnd.ms-visio.drawing.macroenabled.12"
VSD_MIME = "application/vnd.visio"

_PAGE_RE = re.compile(r"visio/pages/page(\d+)\.xml$")


def classify_zip_visio(names: set[str]) -> str | None:
    """Zip member names -> visio mime (drawing vs macro-enabled)."""
    if "visio/document.xml" not in names:
        return None
    return VSDM_MIME if "visio/vbaProject.bin" in names else VSDX_MIME


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def vsdx_to_text(data: bytes) -> str:
    """Shape text from every page, numeric page order, one paragraph
    per shape Text element."""
    paras: list[str] = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        pages = []
        for n in zf.namelist():
            m = _PAGE_RE.match(n)
            if m:
                pages.append((int(m.group(1)), n))
        for _num, name in sorted(pages):
            try:
                root = ET.fromstring(zf.read(name))
            except ET.ParseError:
                continue
            for el in root.iter():
                if _local(el.tag) == "Text":
                    text = "".join(el.itertext()).strip()
                    if text:
                        paras.append(text)
    return "\n\n".join(paras)


def is_visio_ole(paths: dict) -> bool:
    """Legacy .vsd: OLE container with a VisioDocument stream."""
    return any(p.split("/")[-1] == "VisioDocument" for p in paths)


def is_vsd(data: bytes) -> bool:
    """Bytes-level legacy-.vsd probe for the OLE refinement chain."""
    import struct as _struct

    from .cfb import CfbError, CompoundFile, is_cfb

    if not is_cfb(data):
        return False
    try:
        return is_visio_ole(CompoundFile(data).paths())
    except (CfbError, _struct.error):
        return False


def build_vsdx(shapes_per_page: list[list[str]],
               vba_project: bytes | None = None,
               extra_members: list[tuple[str, bytes]] | None = None) -> bytes:
    """Fixture writer: minimal OPC layout with one page XML per entry;
    ``extra_members`` lets fixtures add e.g. docProps/core.xml."""
    ns = "http://schemas.microsoft.com/office/visio/2012/main"
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr(zipfile.ZipInfo("visio/document.xml"),
                    f'<VisioDocument xmlns="{ns}"/>')
        for name, payload in extra_members or []:
            zf.writestr(zipfile.ZipInfo(name), payload)
        for i, shapes in enumerate(shapes_per_page, 1):
            body = "".join(
                f"<Shape ID='{j}'><Text>{t}</Text></Shape>"
                for j, t in enumerate(shapes, 1)
            )
            zf.writestr(
                zipfile.ZipInfo(f"visio/pages/page{i}.xml"),
                f'<PageContents xmlns="{ns}"><Shapes>{body}</Shapes>'
                "</PageContents>",
            )
        if vba_project is not None:
            zf.writestr(zipfile.ZipInfo("visio/vbaProject.bin"), vba_project)
    return out.getvalue()
