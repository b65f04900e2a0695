"""iCalendar / vCard extraction (operators/calendar_extract.py) — the
reference routes text/calendar and text/x-vcard through Tika
(_tika_mime_types.py:1350,1469-1470); here the readers are native."""

import pytest

from hoover_snoop2_spark.corpus import render_ics, render_vcf
from hoover_snoop2_spark.functions.magic import sniff_bytes
from hoover_snoop2_spark.functions.textutils import normalize_text
from hoover_snoop2_spark.operators.calendar_extract import (
    ics_dates,
    ics_to_text,
    looks_like_ics,
    looks_like_vcf,
    vcf_to_text,
)


def test_sniff_ics_vcf():
    ics = b"BEGIN:VCALENDAR\r\nVERSION:2.0\r\nEND:VCALENDAR\r\n"
    vcf = b"BEGIN:VCARD\r\nVERSION:3.0\r\nEND:VCARD\r\n"
    assert sniff_bytes(ics)[0] == "text/calendar"
    assert sniff_bytes(vcf)[0] == "text/x-vcard"
    # BOM + leading blank lines still sniff
    assert sniff_bytes(b"\xef\xbb\xbf\r\n" + ics)[0] == "text/calendar"
    assert looks_like_ics(ics) and not looks_like_ics(vcf)
    assert looks_like_vcf(vcf) and not looks_like_vcf(ics)
    # plain text is untouched
    assert sniff_bytes(b"hello world\n")[0] == "text/plain"


def test_unfolding_and_escapes():
    data = (
        b"BEGIN:VCALENDAR\r\n"
        b"BEGIN:VEVENT\r\n"
        b"SUMMARY:part one \r\n and part two\r\n"
        b"DESCRIPTION:a\\, b\\; c\\\\ d\\nnewline\r\n"
        b"END:VEVENT\r\n"
        b"END:VCALENDAR\r\n"
    )
    text = ics_to_text(data)
    assert "Summary: part one and part two" in text
    assert "Description: a, b; c\\ d\nnewline" in text


def test_ics_datetime_and_people():
    data = (
        b"BEGIN:VCALENDAR\r\n"
        b"BEGIN:VEVENT\r\n"
        b"DTSTART:20240102T030405Z\r\n"
        b"DTEND;VALUE=DATE:20240103\r\n"
        b'ORGANIZER;CN="Ada L":mailto:ada@example.com\r\n'
        b"ATTENDEE:mailto:bob@example.com\r\n"
        b"END:VEVENT\r\n"
        b"END:VCALENDAR\r\n"
    )
    text = ics_to_text(data)
    assert "Dtstart: 2024-01-02T03:04:05Z" in text
    assert "Dtend: 2024-01-03" in text
    assert "Organizer: Ada L <ada@example.com>" in text
    assert "Attendee: bob@example.com" in text


def test_ics_dates_fallback_to_dtstamp():
    data = (
        b"BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n"
        b"DTSTAMP:20230506T070809Z\r\n"
        b"END:VEVENT\r\nEND:VCALENDAR\r\n"
    )
    created, modified = ics_dates(data)
    assert created == "2023-05-06T07:08:09Z"
    assert modified == "2023-05-06T07:08:09Z"


def test_vcf_quoted_printable_soft_break():
    data = (
        b"BEGIN:VCARD\r\n"
        b"FN:X\r\n"
        b"NOTE;ENCODING=QUOTED-PRINTABLE;CHARSET=UTF-8:Caf=C3=A9 one =\r\n"
        b"two.\r\n"
        b"END:VCARD\r\n"
    )
    text = vcf_to_text(data)
    assert "Note: Café one two." in text


def test_vcf_compound_and_types():
    data = (
        b"BEGIN:VCARD\r\n"
        b"N:Doe;Jane;;;\r\n"
        b"ORG:Acme;R&D\r\n"
        b"EMAIL;TYPE=WORK:jd@acme.example\r\n"
        b"TEL;HOME;VOICE:+1-555-0000\r\n"
        b"ADR;TYPE=HOME:;;12 Main St;Springfield;;12345;US\r\n"
        b"END:VCARD\r\n"
    )
    text = vcf_to_text(data)
    assert "Structured name: Doe Jane" in text
    assert "Organization: Acme R&D" in text
    assert "Email (work): jd@acme.example" in text
    # vCard 2.1 bare type param (first one wins)
    assert "Phone (home): +1-555-0000" in text
    assert "Address (home): 12 Main St Springfield 12345 US" in text


def test_multi_card_document_order():
    data = (
        b"BEGIN:VCARD\r\nFN:First Person\r\nEND:VCARD\r\n"
        b"BEGIN:VCARD\r\nFN:Second Person\r\nEND:VCARD\r\n"
    )
    text = vcf_to_text(data)
    assert text.index("First Person") < text.index("Second Person")


@pytest.mark.parametrize("doc_id", [1, 5, 9, 101, 997])
def test_render_ics_golden_roundtrip(doc_id):
    data, golden = render_ics(doc_id, "en")
    assert (normalize_text(ics_to_text(data)) or "") == golden


@pytest.mark.parametrize("doc_id", [2, 6, 10, 102, 998])
def test_render_vcf_golden_roundtrip(doc_id):
    data, golden = render_vcf(doc_id, "de")
    assert (normalize_text(vcf_to_text(data)) or "") == golden


@pytest.mark.parametrize(
    "junk",
    [
        b"",
        b"BEGIN:VCALENDAR",
        b"BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\nSUMMARY:x",  # no END
        b"\x00\x01\x02\xff" * 16,
        b"BEGIN:VCARD\r\nNOTE;ENCODING=QUOTED-PRINTABLE:bad =",
    ],
)
def test_broken_inputs_never_raise(junk):
    assert isinstance(ics_to_text(junk), str)
    assert isinstance(vcf_to_text(junk), str)
    created, modified = ics_dates(junk)
    assert created is None or isinstance(created, str)
