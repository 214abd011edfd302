"""Extractor tests: skyline melody/bass selection, tuplets, quantization, warnings."""
from fractions import Fraction

import pytest

from musicnlp_tpu.io import (
    Chord, Measure, Note, Part, Pitch, Rest, Score, write_midi, read_midi,
)
from musicnlp_tpu.preprocess import MusicConverter, WarnLog
from musicnlp_tpu.preprocess.music_extractor import MusicExtractor


def _score(measures_per_part, names=('Piano',), drum_flags=None) -> Score:
    parts = []
    for i, (name, measures) in enumerate(zip(names, measures_per_part)):
        drum = bool(drum_flags[i]) if drum_flags else False
        parts.append(Part(name=name, measures=measures, is_drum=drum))
    return Score(title='test', parts=parts)


def _bar(number, elems, ts=None, tempo=None, offset=None):
    m = Measure(number=number, time_sig=ts, tempo=tempo,
                offset=Fraction(offset if offset is not None else number * 4))
    m.append(elems)
    return m


def test_simple_melody():
    m0 = _bar(0, [Note(60, 1, 0), Note(62, 1, 1), Note(64, 2, 2)], ts=(4, 4), tempo=120)
    m1 = _bar(1, [Note(65, 4, 0)])
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0, m1]]), exp='str_join')
    assert out == ('TimeSig_4/4 Tempo_120 '
                   '<bar> p_1/4 d_1 p_3/4 d_1 p_5/4 d_2 '
                   '<bar> p_6/4 d_4 </s>')


def test_skyline_keeps_top_pitch():
    # two simultaneous voices: skyline must keep the higher line
    m0 = _bar(0, [
        Note(72, 2, 0), Note(60, 2, 0),  # C5 over C4
        Note(74, 2, 2), Note(62, 2, 2),
    ], ts=(4, 4), tempo=100)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0]]), exp='str')
    pitch_toks = [t for t in out if t.startswith('p_') and t != 'p_r']
    assert pitch_toks == ['p_1/5', 'p_3/5']


def test_full_mode_bass():
    m0 = _bar(0, [
        Note(72, 4, 0), Note(48, 4, 0),  # melody C5, bass C3
    ], ts=(4, 4), tempo=100)
    me = MusicExtractor(mode='full', warn_logger=True)
    out = me(_score([[m0]]), exp='str_join')
    assert out == ('TimeSig_4/4 Tempo_100 '
                   '<bar> <melody> p_1/5 d_4 <bass> p_1/3 d_4 </s>')


def test_chord_flattened_to_top():
    m0 = _bar(0, [Chord([60, 64, 67], 4, 0)], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody')
    out = me(_score([[m0]]), exp='str')
    assert 'p_8/4' in out  # G4 = top of C-major triad


def test_triplet_grouping():
    third = Fraction(1, 3)
    m0 = _bar(0, [
        Note(60, third, 0), Note(62, third, third), Note(64, third, 2 * third),
        Note(65, 3, 1),
    ], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0]]), exp='str_join')
    assert '<tup> p_1/4 p_3/4 p_5/4 d_1 </tup>' in out


def test_rest_fill_gap():
    m0 = _bar(0, [Note(60, 1, 0), Note(64, 1, 3)], ts=(4, 4), tempo=120)  # gap at [1, 3)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0]]), exp='str_join')
    assert 'p_1/4 d_1 p_r d_2 p_5/4 d_1' in out
    assert any(w['warn_name'] == WarnLog.BarNoteGap for w in me.warn_logger.warnings)


def test_empty_bars_cropped():
    m0 = _bar(0, [Rest(4, 0)], ts=(4, 4), tempo=120)
    m1 = _bar(1, [Note(60, 4, 0)])
    m2 = _bar(2, [Rest(4, 0)])
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0, m1, m2]]), exp='str_join')
    assert out.count('<bar>') == 1
    names = [w['warn_name'] for w in me.warn_logger.warnings]
    assert WarnLog.EmptyStrt in names and WarnLog.EmptyEnd in names


def test_drum_track_ignored():
    m_d = _bar(0, [Note(38, 4, 0)], ts=(4, 4), tempo=120)
    m_p = _bar(0, [Note(72, 4, 0)], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody')
    out = me(_score([[m_d], [m_p]], names=('Drums', 'Piano'), drum_flags=(1, 0)), exp='str')
    pitch_toks = [t for t in out if t.startswith('p_') and t != 'p_r']
    assert pitch_toks == ['p_1/5']


def test_unquantized_notes_snapped():
    # offsets/durations off the 1/8-QL grid get snapped by majority overlap
    m0 = _bar(0, [
        Note(60, Fraction(9, 10), 0),           # 0.9 QL
        Note(62, Fraction(31, 10), Fraction(9, 10)),
    ], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0]]), exp='str_join')
    # slot [7/8, 1): note2 overlaps 0.1 vs note1's 0.025 -> majority wins the slot.
    # 25/8 QL is not notatable as one type+dots, so it renders as music21's
    # descending power-of-2 components (tied), like the reference's artifacts.
    assert out == ('TimeSig_4/4 Tempo_120 <bar> p_1/4 d_7/8 '
                   'p_3/4 d_2 p_3/4 d_1 p_3/4 d_1/8 </s>')
    assert any(w['warn_name'] == WarnLog.NoteNotQuant for w in me.warn_logger.warnings)


def test_mean_tempo_and_mode_time_sig():
    m0 = _bar(0, [Note(60, 4, 0)], ts=(4, 4), tempo=100)
    m1 = _bar(1, [Note(62, 4, 0)], tempo=140)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0, m1]]), exp='str_join')
    assert out.startswith('TimeSig_4/4 Tempo_120 ')
    assert any(w['warn_name'] == WarnLog.MultTempo for w in me.warn_logger.warnings)


def test_extract_through_midi_file(tmp_path):
    """End-to-end: write MIDI -> read -> extract -> render -> re-extract is stable."""
    m0 = _bar(0, [Note(60, 1, 0), Note(64, 1, 1), Note(67, 1, 2), Note(72, 1, 3)],
              ts=(4, 4), tempo=120)
    m1 = _bar(1, [Chord([55, 60, 64], 2, 0), Note(65, 2, 2)])
    path = str(tmp_path / 'e2e.mid')
    write_midi(_score([[m0, m1]]), path)

    me = MusicExtractor(mode='full', warn_logger=True)
    out = me(path, exp='str_join', return_key=True)
    text, keys = out.score, out.keys
    assert text.startswith('TimeSig_4/4 Tempo_120 <bar> <melody>')
    assert len(keys) >= 1

    # render the extraction and re-extract: fixed point
    mc = MusicConverter(mode='full')
    score = mc.str2score(text, title='rt')
    me2 = MusicExtractor(mode='full')
    text2 = me2(score, exp='str_join')
    assert text2 == text


def test_id_export_matches_str():
    m0 = _bar(0, [Note(60, 4, 0)], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody')
    toks = me(_score([[m0]]), exp='str')
    ids = MusicExtractor(mode='melody')(_score([[m0]]), exp='id')
    assert [me.vocab.i2t(i) for i in ids] == toks


def test_overlap_truncation():
    # long low note overlapped by later higher note: low note truncated
    m0 = _bar(0, [Note(60, 4, 0), Note(72, 2, 2)], ts=(4, 4), tempo=120)
    me = MusicExtractor(mode='melody', warn_logger=True)
    out = me(_score([[m0]]), exp='str_join')
    assert 'p_1/4 d_2 p_1/5 d_2' in out
    assert any(w['warn_name'] == WarnLog.HighPchOvl for w in me.warn_logger.warnings)
