"""Roundtrip tests for the first-party MIDI / MusicXML io layer."""
import os
from fractions import Fraction

import pytest

from musicnlp_tpu.io import (
    Pitch, Note, Rest, Chord, Measure, Part, Score,
    read_midi, write_midi, read_mxl, write_mxl, read_musicxml, write_musicxml,
    midi2step_octave, time_sig2bar_dur, note2pitch,
)


def _simple_score() -> Score:
    m0 = Measure(number=0, time_sig=(4, 4), tempo=120, offset=Fraction(0))
    m0.append([
        Note(pitch=60, duration=1, offset=0),
        Note(pitch=64, duration=Fraction(1, 2), offset=1),
        Rest(duration=Fraction(1, 2), offset=Fraction(3, 2)),
        Note(pitch=67, duration=2, offset=2),
    ])
    m1 = Measure(number=1, offset=Fraction(4))
    m1.append([
        Chord(pitches=[60, 64, 67], duration=2, offset=0),
        Note(pitch=72, duration=2, offset=2),
    ])
    part = Part(name='Melody, Ch#1', measures=[m0, m1])
    return Score(title='t', parts=[part])


def test_pitch_spelling():
    assert midi2step_octave(60) == ('C', 0, 4)
    assert midi2step_octave(61) == ('C', 1, 4)
    assert midi2step_octave(63) == ('E', -1, 4)
    assert Pitch.from_name('B#', -2).midi == 0  # the p_1/-2_B vocab edge case
    assert Pitch.from_name('C-', 0).midi == 11
    assert Pitch(midi=61).name == 'C#'
    assert Pitch(midi=70).name == 'B-'


def test_time_sig2bar_dur():
    assert time_sig2bar_dur((4, 4)) == 4
    assert time_sig2bar_dur((6, 8)) == 3
    assert time_sig2bar_dur('12/8') == 6


def test_note2pitch_tuplet_weighted():
    """Skyline pitch is in Hz (reference music_lib.py:148-157): tuplet =
    duration-weighted mean frequency, rest contributes 0 Hz."""
    from musicnlp_tpu.io.score import Rest
    c4, c5 = 261.6255653005986, 523.2511306011972
    t = (Note(pitch=60, duration=Fraction(1, 3)), Note(pitch=72, duration=Fraction(2, 3)))
    assert note2pitch(t) == pytest.approx((c4 + 2 * c5) / 3)
    assert note2pitch(Note(pitch=60, duration=Fraction(1))) == pytest.approx(c4)
    assert note2pitch(Rest(duration=Fraction(1))) == 0.0
    # a rest member pulls the average down without dominating it
    tr = (Rest(duration=Fraction(1, 3), offset=Fraction(0)),
          Note(pitch=72, duration=Fraction(2, 3), offset=Fraction(1, 3)))
    assert note2pitch(tr) == pytest.approx(2 * c5 / 3)


def test_midi_roundtrip(tmp_path):
    path = str(tmp_path / 'x.mid')
    score = _simple_score()
    write_midi(score, path)
    back = read_midi(path)
    assert len(back.parts) == 1
    part = back.parts[0]
    assert part.measures[0].time_sig == (4, 4)
    assert part.measures[0].tempo == pytest.approx(120, abs=0.01)
    notes0 = [e for e in part.measures[0].elements if isinstance(e, Note)]
    assert [n.pitch.midi for n in notes0] == [60, 64, 67]
    assert notes0[0].dur == 1 and notes0[1].dur == Fraction(1, 2)
    # chord survives
    m1 = part.measures[1]
    chords = [e for e in m1.elements if isinstance(e, Chord)]
    assert len(chords) == 1 and sorted(p.midi for p in chords[0].pitches) == [60, 64, 67]


def test_midi_bar_split(tmp_path):
    # note spanning a barline gets split with ties
    path = str(tmp_path / 'y.mid')
    m0 = Measure(number=0, time_sig=(4, 4), tempo=100, offset=0)
    m0.append(Note(pitch=60, duration=6, offset=0))  # 6 QL > 4 QL bar
    part = Part(name='P', measures=[m0])
    write_midi(Score(title='t', parts=[part]), path)
    back = read_midi(path)
    ms = back.parts[0].measures
    assert len(ms) == 2
    n0 = ms[0].elements[0]
    n1 = ms[1].elements[0]
    assert n0.dur == 4 and n0.tie == 'start'
    assert n1.dur == 2 and n1.tie == 'stop'


def test_musicxml_roundtrip(tmp_path):
    path = str(tmp_path / 'x.musicxml')
    score = _simple_score()
    write_musicxml(score, path)
    back = read_musicxml(path)
    assert back.title == 't'
    part = back.parts[0]
    assert part.name == 'Melody, Ch#1'
    assert part.measures[0].time_sig == (4, 4)
    assert part.measures[0].tempo == 120
    elems = part.measures[0].elements
    assert isinstance(elems[2], Rest)
    assert [e.dur for e in elems] == [1, Fraction(1, 2), Fraction(1, 2), 2]
    m1 = part.measures[1]
    assert isinstance(m1.elements[0], Chord)
    assert sorted(p.midi for p in m1.elements[0].pitches) == [60, 64, 67]
    assert m1.offset == 4


def test_mxl_roundtrip(tmp_path):
    path = str(tmp_path / 'x.mxl')
    score = _simple_score()
    write_mxl(score, path)
    back = read_mxl(path)
    assert [e.dur for e in back.parts[0].measures[0].elements] == [1, Fraction(1, 2), Fraction(1, 2), 2]


def test_musicxml_tuplet_duration(tmp_path):
    # fractional (triplet) durations survive the roundtrip exactly
    path = str(tmp_path / 'trip.musicxml')
    m0 = Measure(number=0, time_sig=(4, 4), tempo=120, offset=0)
    third = Fraction(1, 3)
    m0.append([Note(pitch=60 + i, duration=third, offset=i * third) for i in range(3)])
    m0.append(Rest(duration=3, offset=1))
    write_musicxml(Score(title='trip', parts=[Part(name='P', measures=[m0])]), path)
    back = read_musicxml(path)
    durs = [e.dur for e in back.parts[0].measures[0].elements]
    assert durs == [third, third, third, 3]


def test_midi_multitrack(tmp_path):
    path = str(tmp_path / 'mt.mid')
    m_m = Measure(number=0, time_sig=(4, 4), tempo=90, offset=0)
    m_m.append(Note(pitch=72, duration=4, offset=0))
    m_b = Measure(number=0, offset=0)
    m_b.append(Note(pitch=40, duration=4, offset=0))
    score = Score(title='mt', parts=[
        Part(name='Melody, Ch#1', measures=[m_m]),
        Part(name='Bass, Ch#2', measures=[m_b]),
    ])
    write_midi(score, path)
    back = read_midi(path)
    assert len(back.parts) == 2
    assert back.parts[0].measures[0].elements[0].pitch.midi == 72
    assert back.parts[1].measures[0].elements[0].pitch.midi == 40


def test_midi_deterministic(tmp_path):
    p1, p2 = str(tmp_path / 'a.mid'), str(tmp_path / 'b.mid')
    write_midi(_simple_score(), p1)
    write_midi(_simple_score(), p2)
    assert open(p1, 'rb').read() == open(p2, 'rb').read()


def test_midi_write_preserves_ties(tmp_path):
    """write(read(x)) keeps cross-bar note durations byte-exactly: a Score
    whose notes were split at barlines with ties (the read_midi layout) must
    re-serialize to one note-on/note-off span, not a truncated head."""
    p1 = str(tmp_path / 'a.mid')
    p2 = str(tmp_path / 'b.mid')
    m0 = Measure(number=0, time_sig=(4, 4), tempo=100, offset=0)
    m0.append(Note(pitch=60, duration=9, offset=0))   # spans 3 bars
    m0.append(Note(pitch=64, duration=2, offset=1))
    part = Part(name='P', measures=[m0])
    write_midi(Score(title='t', parts=[part]), p1)
    back = read_midi(p1)
    # sanity: the read side split the 9-QL note into start/continue/stop
    ties = [e.tie for m in back.parts[0].measures for e in m.elements
            if isinstance(e, Note) and e.pitch.midi == 60]
    assert ties == ['start', 'continue', 'stop']
    write_midi(back, p2)
    assert open(p1, 'rb').read() == open(p2, 'rb').read()
    again = read_midi(p2)
    durs = {e.pitch.midi: [] for m in again.parts[0].measures
            for e in m.elements if isinstance(e, Note)}
    total = {}
    for m in again.parts[0].measures:
        for e in m.elements:
            if isinstance(e, Note):
                total[e.pitch.midi] = total.get(e.pitch.midi, 0) + e.dur
    assert total == {60: 9, 64: 2}


def test_midi_write_orphan_tie_still_sounds(tmp_path):
    """A stop/continue segment with no preceding start (hand-built Score) must
    still be emitted rather than silently dropped."""
    path = str(tmp_path / 'o.mid')
    m0 = Measure(number=0, time_sig=(4, 4), tempo=100, offset=0)
    m0.append(Note(pitch=62, duration=2, offset=0, tie='stop'))
    part = Part(name='P', measures=[m0])
    write_midi(Score(title='t', parts=[part]), path)
    back = read_midi(path)
    notes = [e for m in back.parts[0].measures for e in m.elements
             if isinstance(e, Note)]
    assert [n.pitch.midi for n in notes] == [62] and notes[0].dur == 2
