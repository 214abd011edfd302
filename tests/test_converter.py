"""Converter roundtrip tests: tokens -> score -> MXL -> tokens."""
from fractions import Fraction

import pytest

from musicnlp_tpu.io import Note, Rest, Chord
from musicnlp_tpu.preprocess import MusicConverter, KeyFinder
from musicnlp_tpu.vocab import ElmType

# A small 2-bar full-mode song in midi pitch kind (mirrors the reference's
# sample-score fixture format, _sample_score.py)
SAMPLE_FULL = (
    'TimeSig_4/4 Tempo_120 '
    '<bar> <melody> p_7/2 d_1 p_2/4 d_1/2 p_10/3 d_1/2 p_3/2 d_1 p_3/4 d_1/2 p_10/3 d_1/2 '
    '<bass> p_7/2 d_2 p_3/2 d_2 '
    '<bar> <melody> <tup> p_10/2 p_5/3 p_2/4 d_1 </tup> p_9/3 d_1 p_r d_2 '
    '<bass> p_10/2 d_2 p_5/2 d_2 </s>'
)

SAMPLE_MELODY = (
    'TimeSig_3/4 Tempo_90 '
    '<bar> p_1/4 d_1 p_5/4 d_1 p_8/4 d_1 '
    '<bar> p_8/4 d_2 p_r d_1 </s>'
)


def test_str2music_elms_full():
    mc = MusicConverter(mode='full')
    out = mc.str2music_elms(SAMPLE_FULL)
    assert out.time_sig.meta == (4, 4)
    assert out.tempo.meta == 120
    assert len(out.elms_by_bar) == 2
    bar1 = out.elms_by_bar[1]
    types = [e.type for e in bar1]
    assert types[0] == ElmType.melody
    assert ElmType.tuplets in types
    assert ElmType.bass in types
    tup = next(e for e in bar1 if e.type == ElmType.tuplets)
    assert tup.meta == ((45, 52, 61), 1)  # p_10/2, p_5/3, p_2/4


def test_str2score_full():
    mc = MusicConverter(mode='full')
    score = mc.str2score(SAMPLE_FULL, title='test')
    assert len(score.parts) == 2
    melody, bass = score.parts
    assert 'Melody' in melody.name and 'Bass' in bass.name
    assert len(melody.measures) == 2 and len(bass.measures) == 2
    m0 = melody.measures[0]
    assert m0.time_sig == (4, 4) and m0.tempo == 120
    # sequential offsets assigned within each bar
    assert [float(n.offset) for n in m0.elements] == [0.0, 1.0, 1.5, 2.0, 3.0, 3.5]
    # tuplet notes have 1/3 QL each
    m1 = melody.measures[1]
    assert [n.dur for n in m1.elements[:3]] == [Fraction(1, 3)] * 3
    assert isinstance(m1.elements[-1], Rest)


def test_str2score_melody():
    mc = MusicConverter(mode='melody')
    score = mc.str2score(SAMPLE_MELODY)
    assert len(score.parts) == 1
    assert score.parts[0].measures[0].time_sig == (3, 4)


def test_mxl_roundtrip_tokens(tmp_path):
    """tokens -> score -> MXL file -> tokens reproduces the sequence exactly."""
    mc = MusicConverter(mode='full')
    score = mc.str2score(SAMPLE_FULL, title='rt')
    path = str(tmp_path / 'rt.mxl')
    score.write_mxl(path)
    back = mc.mxl2str(path, pitch_kind='midi')
    assert back == SAMPLE_FULL


def test_midi_roundtrip_tokens(tmp_path):
    """tokens -> score -> MIDI file -> parses with right notes (MIDI has no rests)."""
    mc = MusicConverter(mode='full')
    score = mc.str2score(SAMPLE_FULL, title='rt')
    path = str(tmp_path / 'rt.mid')
    score.write_midi(path)
    from musicnlp_tpu.io import read_midi
    back = read_midi(path)
    assert len(back.parts) == 2
    pitches = [n.pitch.midi for n in back.parts[0].measures[0].elements if isinstance(n, Note)]
    assert pitches == [42, 61, 57, 38, 62, 57]


def test_conditional_prompt(tmp_path):
    mc = MusicConverter(mode='full')
    score = mc.str2score(SAMPLE_FULL, title='cp')
    path = str(tmp_path / 'cp.mxl')
    score.write_mxl(path)
    prompt = mc.mxl2str(path, n_bar=1, pitch_kind='midi')
    assert prompt.endswith('<bar>')  # open bar for generation
    assert prompt.count('<bar>') == 2  # 1 content bar + trailing start
    assert '</s>' not in prompt


def test_insert_key(tmp_path):
    mc = MusicConverter(mode='full')
    score = mc.str2score(SAMPLE_FULL, title='k')
    path = str(tmp_path / 'k.mxl')
    score.write_mxl(path)
    s = mc.mxl2str(path, insert_key='EbMajor', pitch_kind='midi')
    toks = s.split()
    assert toks[2] == 'Key_EbMajor'


def test_broken_render():
    """Render-robustness: over/under-full bars repaired (reference gen_broken path)."""
    broken = (
        'TimeSig_4/4 Tempo_120 '
        '<bar> <melody> p_5/4 d_4 p_7/4 d_2 '       # over-full melody bar (6 QL in 4/4)
        '<bass> p_5/2 d_2 '                          # under-full bass bar
        '<bar> <melody> p_5/4 d_1 <bass> p_5/2 d_4 </s>'
    )
    mc = MusicConverter(mode='full')
    score = mc.str2score(broken, omit_eos=True, check_duration_match='each-other')
    m_bars = score.parts[0].measures
    b_bars = score.parts[1].measures
    from musicnlp_tpu.io.note_ops import get_notes_duration
    for mb, bb in zip(m_bars, b_bars):
        assert get_notes_duration(mb.elements) == get_notes_duration(bb.elements)


def test_visualize_str():
    mc = MusicConverter(mode='full')
    viz = mc.visualize_str(SAMPLE_FULL)
    lines = viz.split('\n')
    assert len(lines) == 3  # header + 2 bars
    assert 'TimeSig_4/4' in lines[0]


def test_key_finder_on_rendered():
    mc = MusicConverter(mode='melody')
    # C-major-ish melody
    s = ('TimeSig_4/4 Tempo_120 '
         '<bar> p_1/4 d_1 p_3/4 d_1 p_5/4 d_1 p_6/4 d_1 '
         '<bar> p_8/4 d_1 p_10/4 d_1 p_12/4 d_1 p_1/5 d_1 </s>')
    score = mc.str2score(s)
    keys = KeyFinder(score)(return_type='dict')
    assert len(keys) >= 1
    assert 'CMajor' in keys or 'AMinor' in keys
