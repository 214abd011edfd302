"""Native C++ MIDI extraction kernel vs the Python reference extractor."""
from fractions import Fraction

import numpy as np
import pytest

from musicnlp_tpu.io import Measure, Note, Part, Score, read_midi, write_midi
from musicnlp_tpu.preprocess.fast_extractor import (
    FastMidiExtractor, fast_extract_available,
)
from musicnlp_tpu.preprocess.music_extractor import MusicExtractor

pytestmark = pytest.mark.skipif(not fast_extract_available(),
                                reason='native midi_extract lib unavailable')


def _write_song(path, bars, ts=(4, 4), tempo=120, name='Piano'):
    measures = []
    bar_len = Fraction(4 * ts[0], ts[1])
    for i, notes in enumerate(bars):
        m = Measure(number=i, time_sig=ts if i == 0 else None,
                    tempo=tempo if i == 0 else None, offset=bar_len * i)
        m.append(notes)
        measures.append(m)
    score = Score(title='t', parts=[Part(name=name, measures=measures)])
    write_midi(score, path)
    return path


def _compare(path, mode='full'):
    fast = FastMidiExtractor(mode=mode)(str(path))
    ref = MusicExtractor(mode=mode, warn_logger=True)(
        read_midi(str(path)), exp='str_join')
    return fast, ref


def test_simple_song_matches_python(tmp_path):
    bars = [
        [Note(60, 1, 0), Note(64, 1, 1), Note(67, 2, 2)],
        [Note(72, 4, 0), Note(48, 4, 0)],
        [Note(65, 2, 0), Note(69, 2, 2)],
    ]
    fast, ref = _compare(_write_song(tmp_path / 'a.mid', bars))
    assert fast == ref


def test_melody_mode_matches(tmp_path):
    bars = [[Note(60 + i, 1, j) for j in range(4)] for i in range(3)]
    fast, ref = _compare(_write_song(tmp_path / 'b.mid', bars), mode='melody')
    assert fast == ref


def test_skyline_overlap(tmp_path):
    # low long note under a high short note: melody takes high, then low resumes
    bars = [[Note(55, 4, 0), Note(79, 1, 1)]]
    fast, ref = _compare(_write_song(tmp_path / 'c.mid', bars))
    assert fast == ref


def test_rests_and_gaps(tmp_path):
    bars = [[Note(62, 1, 0), Note(66, 1, 3)],     # gap in the middle
            [Note(69, 2, 1)]]                      # leading + trailing rest
    fast, ref = _compare(_write_song(tmp_path / 'd.mid', bars))
    assert fast == ref


def test_empty_bar_crop(tmp_path):
    bars = [[], [Note(60, 4, 0)], [Note(64, 4, 0)], []]
    fast, ref = _compare(_write_song(tmp_path / 'e.mid', bars))
    assert fast == ref


def test_three_four_time(tmp_path):
    bars = [[Note(60, 1, 0), Note(64, 1, 1), Note(67, 1, 2)],
            [Note(72, 3, 0)]]
    fast, ref = _compare(_write_song(tmp_path / 'f.mid', bars, ts=(3, 4)))
    assert fast == ref


def test_random_corpus_agreement(tmp_path):
    """Fuzz: random single-voice songs must agree exactly."""
    rng = np.random.default_rng(0)
    n_match = 0
    for i in range(10):
        bars = []
        for b in range(int(rng.integers(2, 5))):
            notes, off = [], 0
            while off < 4:
                dur = int(rng.integers(1, min(4, 4 - off) + 1))
                notes.append(Note(int(rng.integers(40, 90)), dur, off))
                off += dur
            bars.append(notes)
        fast, ref = _compare(_write_song(tmp_path / f'r{i}.mid', bars))
        assert fast == ref, f'song {i}: \n{fast}\n{ref}'
        n_match += 1
    assert n_match == 10


def test_throughput_sanity(tmp_path):
    """Native path parses+extracts a song far faster than the Python path."""
    import time
    bars = [[Note(60 + (j % 12), Fraction(1, 2), Fraction(j, 2))
             for j in range(8)] for _ in range(64)]
    p = _write_song(tmp_path / 'big.mid', bars)
    fx = FastMidiExtractor()
    t0 = time.perf_counter()
    for _ in range(20):
        fx(str(p))
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    ref = MusicExtractor(mode='full', warn_logger=True)
    for _ in range(2):
        ref(read_midi(str(p)), exp='str_join')
    t_py = (time.perf_counter() - t0) * 10
    assert t_fast < t_py, f'native {t_fast:.3f}s vs python-equivalent {t_py:.3f}s'


def test_extract_with_meta_and_export(tmp_path):
    bars = [[Note(60, 1, 0), Note(64, 1, 1), Note(67, 2, 2)],
            [Note(72, 4, 0), Note(48, 4, 0)]]
    p = _write_song(tmp_path / 'm.mid', bars)
    fx = FastMidiExtractor()
    rec = fx.extract_with_meta(str(p))
    assert rec['score'].startswith('TimeSig_4/4 Tempo_120')
    assert rec['keys'] and all(0 <= v <= 1.0001 for v in rec['keys'].values())
    assert rec['duration'] == 4  # 2 bars at 120bpm

    from musicnlp_tpu.preprocess.music_export import MusicExport
    res = MusicExport(mode='full')([str(p)], save_each=False, fast_midi=True)
    assert res['n_error'] == 0 and len(res['songs']) == 1
    assert res['songs'][0]['score'] == rec['score']
