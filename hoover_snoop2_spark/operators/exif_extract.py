"""EXIF GPS + creation-date extraction — from-scratch re-expression of the
reference's `exif.extract` task (snoop/data/analyzers/exif.py:61-99).

The reference wraps the ExifRead library; that library is absent here, so
this is a minimal TIFF/EXIF reader built from the public TIFF 6.0 / EXIF
2.3 specs: JPEG APP1 scan → TIFF header (II/MM endianness) → IFD0 walk →
GPS IFD (lat/lon rationals + refs) and Exif IFD (DateTimeOriginal).

Output semantics preserved exactly:

- ``location`` = "{lat}, {lng}" decimal string, sign flipped for S/W refs
  (exif.py:24-50),
- ``date-created`` = zulu of "%Y:%m:%d %H:%M:%S" (exif.py:54-59), with
  `EXIF DateTimeOriginal` preferred over `Image DateTime` (exif.py:90-95),
- GPS zero-division → broken 'exifread_gps_zero_division_error'
  (exif.py:84-87).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

from ..functions.textutils import zulu

#: reference exif.py:10
EXIF_MIME_TYPES = frozenset(
    {"image/tiff", "image/jpeg", "image/webp", "image/heic"}
)

_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DT_ORIGINAL = 0x9003
_GPS_LAT_REF, _GPS_LAT = 0x0001, 0x0002
_GPS_LON_REF, _GPS_LON = 0x0003, 0x0004


class ExifBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _find_tiff(data: bytes) -> bytes | None:
    """Locate the TIFF blob: bare TIFF, or inside a JPEG APP1 segment."""
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return data
    if data[:3] != b"\xff\xd8\xff":
        return None
    i = 2
    while i + 4 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no more metadata
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            return data[i + 10 : i + 2 + seg_len]
        i += 2 + seg_len
    return None


def _read_ifd(tiff: bytes, offset: int, endian: str) -> dict[int, tuple]:
    """One IFD → {tag: (type, values)}; rationals kept as (num, den)."""
    out: dict[int, tuple] = {}
    if offset + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(endian + "H", tiff, offset)
    pos = offset + 2
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
    for _ in range(n):
        if pos + 12 > len(tiff):
            break
        tag, typ, count = struct.unpack_from(endian + "HHI", tiff, pos)
        total = sizes.get(typ, 1) * count
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", tiff, pos + 8)
        try:
            if typ == 2:  # ASCII
                raw = tiff[voff : voff + count]
                out[tag] = (typ, raw.split(b"\x00")[0].decode("ascii", "replace"))
            elif typ in (3,):  # SHORT
                out[tag] = (typ, struct.unpack_from(endian + f"{count}H", tiff, voff))
            elif typ in (4,):  # LONG
                out[tag] = (typ, struct.unpack_from(endian + f"{count}I", tiff, voff))
            elif typ in (5, 10):  # RATIONAL / SRATIONAL
                fmt = "I" if typ == 5 else "i"
                vals = struct.unpack_from(endian + f"{2 * count}{fmt}", tiff, voff)
                out[tag] = (typ, [(vals[2 * i], vals[2 * i + 1]) for i in range(count)])
        except struct.error:
            continue
        pos += 12
    return out


def _dms_to_float(rationals: list[tuple[int, int]]) -> float:
    def r2f(r):
        num, den = r
        if den == 0:
            raise ExifBroken("exifread_gps_zero_division_error")
        return num / den

    d, m, s = (r2f(rationals[i]) for i in range(3))
    return d + m / 60.0 + s / 3600.0


def extract_exif(data: bytes) -> dict:
    """bytes → {'location': 'lat, lng', 'date-created': zulu} (either key
    optional) — the exif.extract result dict (exif.py:80-99)."""
    tiff = _find_tiff(data)
    if tiff is None or len(tiff) < 8:
        return {}
    endian = "<" if tiff[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, endian)

    out: dict = {}
    gps_ptr = ifd0.get(_TAG_GPS_IFD)
    if gps_ptr:
        gps = _read_ifd(tiff, gps_ptr[1][0], endian)
        lat, lat_ref = gps.get(_GPS_LAT), gps.get(_GPS_LAT_REF)
        lon, lon_ref = gps.get(_GPS_LON), gps.get(_GPS_LON_REF)
        if all(v is not None for v in (lat, lat_ref, lon, lon_ref)):
            latf = _dms_to_float(lat[1])
            if lat_ref[1] and lat_ref[1][0] != "N":
                latf = -latf
            lonf = _dms_to_float(lon[1])
            if lon_ref[1] and lon_ref[1][0] != "E":
                lonf = -lonf
            out["location"] = f"{latf}, {lonf}"

    date_candidates = []
    exif_ptr = ifd0.get(_TAG_EXIF_IFD)
    if exif_ptr:
        exif_ifd = _read_ifd(tiff, exif_ptr[1][0], endian)
        dto = exif_ifd.get(_TAG_DT_ORIGINAL)
        if dto:
            date_candidates.append(dto[1])
    dt = ifd0.get(_TAG_DATETIME)
    if dt:
        date_candidates.append(dt[1])
    for raw in date_candidates:  # DateTimeOriginal preferred (exif.py:90-95)
        try:
            parsed = datetime.strptime(raw, "%Y:%m:%d %H:%M:%S")
        except ValueError:
            continue
        out["date-created"] = zulu(parsed.replace(tzinfo=timezone.utc))
        break
    return out


def build_exif_jpeg(lat_dms, lat_ref, lon_dms, lon_ref, dt_original) -> bytes:
    """Deterministic test fixture: minimal JPEG with an EXIF APP1 segment
    (fills the golden-corpus role of the reference's jpeg fixtures,
    test_blobs.py:91-93)."""
    def ifd_entry(tag, typ, count, value_or_off):
        return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value_or_off)

    # layout: header(8) | IFD0(2+2*12+4) | gps IFD | exif IFD | data area
    ifd0_off = 8
    ifd0_size = 2 + 2 * 12 + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = 2 + 4 * 12 + 4
    exif_off = gps_off + gps_size
    exif_size = 2 + 1 * 12 + 4
    data_off = exif_off + exif_size

    data_area = b""
    def put(b: bytes) -> int:
        nonlocal data_area
        off = data_off + len(data_area)
        data_area += b
        return off

    lat_off = put(b"".join(struct.pack("<II", n, d) for n, d in lat_dms))
    lon_off = put(b"".join(struct.pack("<II", n, d) for n, d in lon_dms))
    dt_bytes = dt_original.encode("ascii") + b"\x00"
    dt_off = put(dt_bytes)

    ifd0 = struct.pack("<H", 2)
    ifd0 += ifd_entry(_TAG_EXIF_IFD, 4, 1, exif_off)
    ifd0 += ifd_entry(_TAG_GPS_IFD, 4, 1, gps_off)
    ifd0 += struct.pack("<I", 0)

    gps = struct.pack("<H", 4)
    gps += ifd_entry(_GPS_LAT_REF, 2, 2, int.from_bytes(lat_ref.encode() + b"\x00\x00", "little"))
    gps += ifd_entry(_GPS_LAT, 5, 3, lat_off)
    gps += ifd_entry(_GPS_LON_REF, 2, 2, int.from_bytes(lon_ref.encode() + b"\x00\x00", "little"))
    gps += ifd_entry(_GPS_LON, 5, 3, lon_off)
    gps += struct.pack("<I", 0)

    exif_ifd = struct.pack("<H", 1)
    exif_ifd += ifd_entry(_TAG_DT_ORIGINAL, 2, len(dt_bytes), dt_off)
    exif_ifd += struct.pack("<I", 0)

    tiff = b"II*\x00" + struct.pack("<I", ifd0_off) + ifd0 + gps + exif_ifd + data_area
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return b"\xff\xd8" + seg + b"\xff\xd9"
