"""Legacy melody stack: time-slot grid encoding + padded loader + pitch w2v.

Covers the reference's obsolete first-generation pipeline
(reference musicnlp/preprocess/melody_extractor.py:81-949,
trainer/melody_loader.py:20-39, trainer/melody_w2v.py:19-82) as rebuilt in
musicnlp_tpu/preprocess/melody_grid.py and musicnlp_tpu/trainer/melody_w2v.py.
"""
import glob
import os
from fractions import Fraction

import numpy as np
import pytest

from musicnlp_tpu.io.score import Measure, Note, Part, Rest, Score
from musicnlp_tpu.preprocess import (
    GridVocab, MelodyGridDataset, MelodyGridExtractor, grid_decode,
)
from musicnlp_tpu.trainer import PitchEmbedding

ORIGINAL = '/root/reference/generated-samples/original'


# ------------------------------------------------------------------ vocabulary
def test_grid_vocab_layout():
    """The reference's exact id layout (melody_extractor.py:157-176):
    [SEP]=0, [TRIP]=1, [PAD]=2, [REST]=64, pitch p -> 128+p."""
    assert (GridVocab.SEP, GridVocab.TRIP, GridVocab.PAD) == (0, 1, 2)
    assert GridVocab.REST == 64
    assert GridVocab.pitch2id(0) == 128 and GridVocab.pitch2id(127) == 255
    assert GridVocab.SIZE == 256


def test_grid_vocab_bijection():
    for i in range(GridVocab.SIZE):
        s = GridVocab.id2str(i)
        if i in (GridVocab.SEP, GridVocab.TRIP, GridVocab.PAD, GridVocab.REST) \
                or i >= GridVocab.N_SPECIAL:
            assert GridVocab.str2id(s) == i


# ------------------------------------------------------------------ encoding
def _score_one_part(elements_by_bar, ts=(4, 4), name='P1'):
    measures = []
    for i, elms in enumerate(elements_by_bar):
        measures.append(Measure(number=i, elements=list(elms),
                                time_sig=(ts if i == 0 else None),
                                tempo=(120.0 if i == 0 else None)))
    return Score(title='t', parts=[Part(name=name, measures=measures)])


def test_encode_simple_bar():
    """4/4 at precision 5 -> 32 slots; a quarter note covers 8 slots."""
    scr = _score_one_part([[
        Note(pitch=60, duration=1, offset=0),
        Rest(duration=1, offset=1),
        Note(pitch=64, duration=2, offset=2),
    ]])
    ids = MelodyGridExtractor(precision=5)(scr)
    assert len(ids) == 32
    want = [GridVocab.pitch2id(60)] * 8 + [GridVocab.REST] * 8 \
        + [GridVocab.pitch2id(64)] * 16
    assert ids.tolist() == want


def test_encode_bar_separator_and_ts():
    """Bars joined with ONE [SEP]; 3/4 bar -> 24 slots."""
    bar = [Note(pitch=60, duration=3, offset=0)]
    scr = _score_one_part([bar, bar], ts=(3, 4))
    ids = MelodyGridExtractor()(scr)
    assert len(ids) == 24 + 1 + 24
    assert ids[24] == GridVocab.SEP
    assert (ids == GridVocab.SEP).sum() == 1


def test_encode_picks_highest_pitch_per_slot():
    """Monophony enforcement: overlapping voices keep the highest pitch
    (reference: 'concurrent notes are filtered such that only the note with
    the highest pitch remains', melody_extractor.py:189-191)."""
    m = Measure(number=0, elements=[], time_sig=(4, 4), tempo=120.0,
                voices=[[Note(pitch=60, duration=4, offset=0)],
                        [Note(pitch=72, duration=2, offset=1)]])
    scr = Score(title='t', parts=[Part(name='P1', measures=[m])])
    ids = MelodyGridExtractor()(scr)
    p60, p72 = GridVocab.pitch2id(60), GridVocab.pitch2id(72)
    assert ids.tolist() == [p60] * 8 + [p72] * 16 + [p60] * 8


def test_encode_part_selection_by_mean_frequency():
    """Per vertical bar, the part with the max duration-weighted mean pitch
    frequency is taken wholesale (bar_with_max_pitch, 'fqs')."""
    lo = [Note(pitch=40, duration=4, offset=0)]
    hi = [Note(pitch=80, duration=4, offset=0)]
    scr = Score(title='t', parts=[
        Part(name='low', measures=[Measure(0, list(lo), (4, 4), 120.0)]),
        Part(name='high', measures=[Measure(0, list(hi), (4, 4), 120.0)]),
    ])
    ids = MelodyGridExtractor()(scr)
    assert set(ids.tolist()) == {GridVocab.pitch2id(80)}


def test_encode_triplet_last_quarter_marker():
    """A triplet group's span splits into 4 equal runs: the 3 pitches then
    [TRIP] (reference 'last quarter encoding', melody_extractor.py:625-630).
    Three 1/3-QL notes span 1 QL = 8 slots -> 4 runs of 2."""
    trip = [Note(pitch=60 + i, duration=Fraction(1, 3),
                 offset=Fraction(i, 3), tm=(3, 2)) for i in range(3)]
    rest = [Rest(duration=3, offset=1)]
    scr = _score_one_part([trip + rest])
    ids = MelodyGridExtractor()(scr)
    want = ([GridVocab.pitch2id(60)] * 2 + [GridVocab.pitch2id(61)] * 2
            + [GridVocab.pitch2id(62)] * 2 + [GridVocab.TRIP] * 2
            + [GridVocab.REST] * 24)
    assert ids.tolist() == want


# ------------------------------------------------------------------ decode
def test_decode_roundtrip_simple():
    scr = _score_one_part([[
        Note(pitch=60, duration=1, offset=0),
        Rest(duration=1, offset=1),
        Note(pitch=64, duration=2, offset=2),
    ], [
        Note(pitch=67, duration=4, offset=0),
    ]])
    me = MelodyGridExtractor()
    ids = me(scr)
    out = grid_decode(ids)
    assert len(out.parts) == 1
    bars = out.parts[0].measures
    assert len(bars) == 2 and bars[0].time_sig == (4, 4)
    got = [(n.pitch.midi if isinstance(n, Note) else 'R', Fraction(n.dur))
           for n in bars[0].elements]
    assert got == [(60, 1), ('R', 1), (64, 2)]
    assert np.array_equal(me(out), ids)  # encode(decode(ids)) == ids


def test_decode_triplet_reconstruction():
    trip = [Note(pitch=60 + i, duration=Fraction(1, 3),
                 offset=Fraction(i, 3), tm=(3, 2)) for i in range(3)]
    scr = _score_one_part([trip + [Rest(duration=3, offset=1)]])
    ids = MelodyGridExtractor()(scr)
    out = grid_decode(ids)
    notes = out.parts[0].measures[0].elements
    assert [n.pitch.midi for n in notes[:3]] == [60, 61, 62]
    assert all(Fraction(n.dur) == Fraction(1, 3) for n in notes[:3])
    assert notes[3].dur == 3 and isinstance(notes[3], Rest)


def test_decode_renders_midi(tmp_path):
    """encoding2score parity: decoded grid ids render to a writable score
    (reference melody_extractor.py:860-886)."""
    scr = _score_one_part([[Note(pitch=69, duration=4, offset=0)]])
    out = grid_decode(MelodyGridExtractor()(scr))
    p = str(tmp_path / 'grid.mid')
    out.write_midi(p)
    assert os.path.getsize(p) > 0


def test_decode_midi_roundtrip_slot_exact(tmp_path):
    """Multi-bar grid -> score -> MIDI file -> re-parse -> re-encode is
    slot-identical (pins bar offsets: write_midi keys on Measure.offset)."""
    from musicnlp_tpu.io.midi import read_midi
    bars = [
        [Note(pitch=60, duration=1, offset=0), Note(pitch=64, duration=1, offset=1),
         Note(pitch=67, duration=1, offset=2), Note(pitch=72, duration=1, offset=3)],
        [Rest(duration=1, offset=0), Note(pitch=65, duration=Fraction(1, 2), offset=1),
         Note(pitch=69, duration=Fraction(5, 2), offset=Fraction(3, 2))],
        [Note(pitch=74, duration=4, offset=0)],
    ]
    ex = MelodyGridExtractor()
    ids = ex(_score_one_part(bars))
    p = str(tmp_path / 'rt.mid')
    grid_decode(ids).write_midi(p)
    re_ids = ex(read_midi(p))
    assert re_ids.tolist() == ids.tolist()


# ------------------------------------------------------------------ real files
def test_encode_real_world_file():
    f = sorted(glob.glob(os.path.join(ORIGINAL, '*.mxl')))[0]
    ids = MelodyGridExtractor()(f)
    assert len(ids) > 100
    n_bars = int((ids == GridVocab.SEP).sum()) + 1
    assert n_bars > 4
    assert ids.max() >= GridVocab.N_SPECIAL  # some pitches present
    out = grid_decode(ids)  # decodes without error
    assert len(out.parts[0].measures) == n_bars


# ------------------------------------------------------------------ loader
def test_melody_grid_dataset_padding():
    songs = [[128, 129, 130], [140], [150, 151]]
    ds = MelodyGridDataset(songs, names=['a', 'b', 'c'])
    assert len(ds) == 3 and ds.ids.shape == (3, 3)
    assert ds[1].tolist() == [140, GridVocab.PAD, GridVocab.PAD]
    assert MelodyGridDataset(songs, pad=False)[1].tolist() == [140]


# ------------------------------------------------------------------ w2v
def test_pitch_embedding_trains_and_structures():
    """Co-occurring pitches embed closer than never-co-occurring ones, on a
    corpus of two disjoint pitch communities."""
    rng = np.random.default_rng(0)
    community_a = [GridVocab.pitch2id(p) for p in (60, 62, 64, 65, 67)]
    community_b = [GridVocab.pitch2id(p) for p in (90, 92, 94, 96, 98)]
    songs = []
    for _ in range(30):
        songs.append(rng.choice(community_a, size=60).tolist())
        songs.append(rng.choice(community_b, size=60).tolist())
    pe = PitchEmbedding(vector_size=16, window=4, negatives=4, lr=0.1, seed=1)
    emb = pe(songs, epochs=3, batch_size=512)
    assert emb.shape == (GridVocab.SIZE, 16)
    assert len(pe.losses) == 3 and pe.losses[-1] < pe.losses[0]
    within = pe.similarity(community_a[0], community_a[1])
    across = pe.similarity(community_a[0], community_b[1])
    assert within > across
    top = [i for i, _ in pe.most_similar(community_a[0], topn=4)]
    assert set(top) & set(community_a[1:])


def test_pitch_embedding_save_load(tmp_path):
    rng = np.random.default_rng(3)
    songs = [rng.integers(128, 180, size=40).tolist() for _ in range(6)]
    pe = PitchEmbedding(vector_size=8, window=3, negatives=2, lr=0.05, seed=0)
    pe(songs, epochs=1, batch_size=128)
    p = str(tmp_path / 'w2v.npz')
    pe.save(p)
    pe2 = PitchEmbedding.load(p)
    assert pe2.dim == 8 and pe2.window == 3 and pe2.k == 2
    np.testing.assert_array_equal(pe2.emb_in, pe.emb_in)
    assert pe2.losses == pe.losses
    assert pe2.similarity(130, 131) == pe.similarity(130, 131)


def test_decode_triplet_merged_runs():
    """Triplets with repeated member pitches (RLE runs merge) must still
    reconstruct: 3 notes of span/3 each (the reference decode's ln==1/ln==2
    merged-run branches, melody_extractor.py:696-760)."""
    trip = [Note(pitch=p, duration=Fraction(1, 3), offset=Fraction(i, 3),
                 tm=(3, 2)) for i, p in enumerate((60, 60, 62))]
    scr = _score_one_part([trip + [Rest(duration=3, offset=1)]])
    me = MelodyGridExtractor()
    ids = me(scr)
    out = grid_decode(ids)
    notes = out.parts[0].measures[0].elements
    assert [n.pitch.midi for n in notes[:3]] == [60, 60, 62]
    assert all(Fraction(n.dur) == Fraction(1, 3) for n in notes[:3])
    assert np.array_equal(me(out), ids)


def test_decode_triplet_first_member_merges_with_prior_note():
    """A first member continuing the preceding note's pitch must split at the
    triplet boundary (the reference's dur_non_trip split)."""
    elems = [Note(pitch=60, duration=1, offset=0)] + [
        Note(pitch=p, duration=Fraction(1, 3), offset=1 + Fraction(i, 3),
             tm=(3, 2)) for i, p in enumerate((60, 64, 67))]
    scr = _score_one_part([elems + [Rest(duration=2, offset=2)]])
    me = MelodyGridExtractor()
    ids = me(scr)
    out = grid_decode(ids)
    notes = out.parts[0].measures[0].elements
    assert (notes[0].pitch.midi, Fraction(notes[0].dur)) == (60, 1)
    assert [n.pitch.midi for n in notes[1:4]] == [60, 64, 67]
    assert all(Fraction(n.dur) == Fraction(1, 3) for n in notes[1:4])
    assert np.array_equal(me(out), ids)


def test_part_selection_counts_rests_at_zero():
    """Reference 'fqs' weights rests at frequency 0 (avg_pitch,
    melody_extractor.py:406-428): a sparse high part must lose to a
    continuous lower melody."""
    sparse_hi = [Note(pitch=80, duration=1, offset=0), Rest(duration=3, offset=1)]
    steady_lo = [Note(pitch=60, duration=4, offset=0)]
    scr = Score(title='t', parts=[
        Part(name='hi', measures=[Measure(0, list(sparse_hi), (4, 4), 120.0)]),
        Part(name='lo', measures=[Measure(0, list(steady_lo), (4, 4), 120.0)]),
    ])
    ids = MelodyGridExtractor()(scr)
    assert set(ids.tolist()) == {GridVocab.pitch2id(60)}


def test_pitch_embedding_small_corpus():
    """Corpora smaller than the batch size still train (whole-corpus
    batches), and the tail of a non-dividing epoch is not dropped."""
    songs = [[130, 131, 132, 133]] * 3
    pe = PitchEmbedding(vector_size=4, window=2, negatives=2, lr=0.05, seed=0)
    emb = pe(songs, epochs=2, batch_size=4096)
    assert emb.shape == (GridVocab.SIZE, 4)
    assert len(pe.losses) == 2 and all(np.isfinite(pe.losses))
