"""Standard MIDI file stats — the public SMF format: header chunk,
track event walk with running status, and duration via the tempo map
(meta 0x51 set-tempo events over PPQN ticks, or SMPTE divisions).

Feeds the media-stats path's ``duration_ms`` for ``audio/midi`` blobs
(Tika list :1107).  Self-verification: ``build_midi`` writes the same
event grammar independently (varint deltas, running status, tempo
metas); round-trips + hand-computed durations in tests.
"""
from __future__ import annotations

import struct


class MidiError(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for _ in range(4):
        if pos >= len(data):
            raise MidiError("midi_truncated")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise MidiError("midi_truncated")


def midi_stats(data: bytes) -> tuple[int, int, int]:
    """(format, n_tracks, duration_ms)."""
    if data[:4] != b"MThd" or len(data) < 14:
        raise MidiError("midi_truncated")
    (hlen,) = struct.unpack(">I", data[4:8])
    fmt, ntrks, division = struct.unpack(">HHH", data[8:14])
    pos = 8 + hlen

    tempo_events: list[tuple[int, int]] = []  # (tick, usec per quarter)
    max_tick = 0
    for _t in range(ntrks):
        if data[pos:pos + 4] != b"MTrk":
            raise MidiError("midi_truncated")
        (tlen,) = struct.unpack(">I", data[pos + 4:pos + 8])
        tpos = pos + 8
        tend = tpos + tlen
        if tend > len(data):
            raise MidiError("midi_truncated")
        tick = 0
        status = 0
        while tpos < tend:
            delta, tpos = _varint(data, tpos)
            tick += delta
            b = data[tpos]
            if b >= 0x80:
                status = b
                tpos += 1
            if status == 0xFF:
                mtype = data[tpos]
                tpos += 1
                mlen, tpos = _varint(data, tpos)
                if mtype == 0x51 and mlen == 3:
                    usec = int.from_bytes(data[tpos:tpos + 3], "big")
                    tempo_events.append((tick, usec))
                tpos += mlen
                if mtype == 0x2F:
                    break
            elif status in (0xF0, 0xF7):
                mlen, tpos = _varint(data, tpos)
                tpos += mlen
            elif 0x80 <= status < 0xF0:
                n = 1 if 0xC0 <= status < 0xE0 else 2
                tpos += n
            else:
                raise MidiError("midi_bad_event")
        max_tick = max(max_tick, tick)
        pos = tend

    if division & 0x8000:
        # SMPTE: negative fps in the high byte, ticks/frame low byte
        fps = 256 - (division >> 8)
        tpf = division & 0xFF
        if fps == 0 or tpf == 0:
            return fmt, ntrks, 0
        return fmt, ntrks, int(max_tick * 1000 / (fps * tpf))

    # PPQN with a tempo map (default 500000 usec/quarter)
    tempo_events.sort()
    usec_total = 0
    cur_tick = 0
    cur_tempo = 500000
    for tick, usec in tempo_events:
        if tick > cur_tick:
            usec_total += (min(tick, max_tick) - cur_tick) * cur_tempo
            cur_tick = min(tick, max_tick)
        cur_tempo = usec
        if cur_tick >= max_tick:
            break
    if max_tick > cur_tick:
        usec_total += (max_tick - cur_tick) * cur_tempo
    if division == 0:
        return fmt, ntrks, 0
    return fmt, ntrks, usec_total // (division * 1000)


def build_midi(tracks: list[list[tuple[int, bytes]]],
               division: int = 480, fmt: int = 1) -> bytes:
    """Fixture writer: tracks are [(delta, event_bytes)] lists; an
    end-of-track meta is appended to each."""
    def varint(v: int) -> bytes:
        out = bytearray([v & 0x7F])
        v >>= 7
        while v:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        return bytes(reversed(out))

    out = bytearray(b"MThd" + struct.pack(">IHHH", 6, fmt, len(tracks),
                                          division))
    for events in tracks:
        body = bytearray()
        for delta, ev in events:
            body += varint(delta) + ev
        body += varint(0) + b"\xff\x2f\x00"
        out += b"MTrk" + struct.pack(">I", len(body)) + body
    return bytes(out)


def tempo_event(usec_per_quarter: int) -> bytes:
    return b"\xff\x51\x03" + usec_per_quarter.to_bytes(3, "big")
