"""Standard MIDI stats: tempo-map duration, running status, SMPTE
divisions, truncation typing, media-row integration."""
import pytest

from hoover_snoop2_spark.operators.midi_stats import (
    MidiError,
    build_midi,
    midi_stats,
    tempo_event,
)


def test_single_tempo_duration():
    # 480 PPQN, default 500000 usec/qn: 960 ticks = 2 quarters = 1000 ms
    track = [(0, b"\x90\x3c\x40"), (960, b"\x80\x3c\x40")]
    blob = build_midi([track], division=480)
    fmt, ntrks, dur = midi_stats(blob)
    assert (fmt, ntrks) == (1, 1)
    assert dur == 1000


def test_tempo_change_integration():
    # first quarter at 500000 (500 ms), tempo doubles speed at tick 480:
    # second quarter at 250000 (250 ms) -> 750 ms total
    track = [
        (0, b"\x90\x3c\x40"),
        (480, tempo_event(250000)),
        (480, b"\x80\x3c\x40"),
    ]
    _f, _n, dur = midi_stats(build_midi([track], division=480))
    assert dur == 750


def test_explicit_initial_tempo_and_running_status():
    # tempo 1_000_000 usec/qn from tick 0; running status note pair
    track = [
        (0, tempo_event(1000000)),
        (0, b"\x90\x3c\x40"),
        (240, b"\x3c\x00"),       # running status: same 0x90
        (240, b"\x90\x3e\x40"),
        (480, b"\x3e\x00"),
    ]
    _f, _n, dur = midi_stats(build_midi([track], division=480))
    # 960 ticks at 1s/quarter = 2000 ms
    assert dur == 2000


def test_smpte_division():
    # SMPTE 25 fps, 40 ticks/frame -> 1000 ticks/sec
    division = ((256 - 25) << 8) | 40
    track = [(0, b"\x90\x3c\x40"), (2500, b"\x80\x3c\x40")]
    _f, _n, dur = midi_stats(build_midi([track], division=division))
    assert dur == 2500


def test_multitrack_max_end():
    t1 = [(0, b"\x90\x3c\x40"), (480, b"\x80\x3c\x40")]
    t2 = [(0, b"\x90\x40\x40"), (1920, b"\x80\x40\x40")]
    _f, ntrks, dur = midi_stats(build_midi([t1, t2], division=480))
    assert ntrks == 2
    assert dur == 2000  # 4 quarters at default tempo


def test_truncation_typed():
    blob = build_midi([[(0, b"\x90\x3c\x40")]])
    with pytest.raises(MidiError):
        midi_stats(blob[:10])
    with pytest.raises(MidiError):
        midi_stats(blob[: len(blob) - 2])


def test_media_row_gets_duration():
    from hoover_snoop2_spark.operators.multimodal import media_map_in_pandas
    import pandas as pd

    blob = build_midi([[(0, b"\x90\x3c\x40"), (960, b"\x80\x3c\x40")]],
                      division=480)
    fn = media_map_in_pandas()
    out = list(fn(iter([pd.DataFrame({"sha3_256": ["x"],
                                      "data": [blob]})])))[0]
    row = out.iloc[0]
    assert row["media_type"] == "midi"
    assert row["duration_ms"] == 1000
    assert row["n_channels"] == 1  # track count rides the channel column
