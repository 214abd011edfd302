"""Batch export pipeline tests: files -> JSON shards -> combined -> columnar dataset."""
import glob
import json
import os
from fractions import Fraction

import numpy as np
import pytest

from musicnlp_tpu.io import Measure, Note, Part, Score
from musicnlp_tpu.io.musicxml import write_musicxml
from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
from musicnlp_tpu.preprocess.music_export import (
    MusicExport, combine_saved_songs, json2dataset,
)
from musicnlp_tpu.utils.config import sconfig, u
from musicnlp_tpu.vocab import MusicTokenizer


def _make_song_file(path, base_pitch=60, n_bar=3):
    measures = []
    for b in range(n_bar):
        m = Measure(number=b, time_sig=(4, 4) if b == 0 else None,
                    tempo=120 if b == 0 else None, offset=Fraction(b * 4))
        m.append([Note(base_pitch + (b % 3), 1, 0), Note(base_pitch + 4, 1, 1),
                  Note(base_pitch + 7, 2, 2)])
        measures.append(m)
    score = Score(title=os.path.splitext(os.path.basename(path))[0],
                  parts=[Part(name='Piano', measures=measures)])
    write_musicxml(score, path)
    return path


@pytest.fixture()
def song_files(tmp_path):
    return [_make_song_file(str(tmp_path / f'artist - song{i}.musicxml'),
                            base_pitch=57 + i) for i in range(4)]


def test_export_save_each_and_resume(song_files, tmp_path):
    out = str(tmp_path / 'json')
    me = MusicExport(mode='melody')
    res = me(song_files, output_dir=out, save_each=True)
    assert res['n_error'] == 0
    shards = sorted(glob.glob(os.path.join(out, '*.json')))
    assert len(shards) == 4
    d = json.load(open(shards[0]))
    assert d['score'].startswith('TimeSig_4/4 Tempo_120')
    assert d['score'].endswith('</s>')
    assert isinstance(d['keys'], dict) and d['keys']
    # resume: second run skips everything (mtimes unchanged)
    mtimes = {p: os.path.getmtime(p) for p in shards}
    res2 = me(song_files, output_dir=out, save_each=True)
    assert res2['n_error'] == 0
    assert all(os.path.getmtime(p) == mtimes[p] for p in shards)


def test_export_parallel_thread(song_files, tmp_path):
    me = MusicExport(mode='melody')
    res = me(song_files, save_each=False, parallel=2, parallel_mode='thread')
    assert len(res['songs']) == 4
    titles = {s['title'] for s in res['songs']}
    assert len(titles) == 4


def test_export_error_isolation(song_files, tmp_path):
    bad = str(tmp_path / 'broken.musicxml')
    with open(bad, 'w') as f:
        f.write('<not-music-xml/>')
    me = MusicExport(mode='melody')
    res = me(song_files + [bad], save_each=False, parallel=2,
             parallel_mode='thread', halt_on_error=False)
    assert res['n_error'] == 1
    assert 'broken' in res['errors'][0]['song_path']
    assert len(res['songs']) == 4


def test_combine_and_dataset(song_files, tmp_path):
    out = str(tmp_path / 'json')
    me = MusicExport(mode='full')
    me(song_files, output_dir=out, save_each=True)
    combined = combine_saved_songs(glob.glob(os.path.join(out, '*.json')),
                                   out_path=str(tmp_path / 'combined.json'))
    assert combined['n_song'] == 4
    # re-combining a dir that (deliberately or via a lazy glob) now contains
    # the combined file itself must not ingest it as a song -- the natural
    # `extract --combine json/combined.json` rerun hits exactly this
    import shutil
    shutil.copy(str(tmp_path / 'combined.json'), os.path.join(out, 'combined.json'))
    again = combine_saved_songs(glob.glob(os.path.join(out, '*.json')))
    assert again['n_song'] == 4
    ds_dir = str(tmp_path / 'ds')
    paths = json2dataset(combined, ds_dir, test_frac=0.25, pitch_kind='midi')
    assert set(paths) == {'train', 'test'}
    train = SongDataset.load(paths['train'])
    test = SongDataset.load(paths['test'])
    assert len(train) == 3 and len(test) == 1
    # the columnar store feeds the training pipeline directly
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    ad = AugmentedDataset(train, tok, random_crop=False)
    item = ad[0]
    assert item['input_ids'].shape == (64,)
    assert (item['key_scores'] > 0).any()


def test_json2dataset_step_corpus_remaps_to_midi(song_files, tmp_path):
    """CLI extract writes STEP-kind corpora (reference layout); a midi
    materialization must remap instead of sanitizing every spelled pitch to
    rare, and a degree one must fail with guidance (key-dependent ids)."""
    me = MusicExport(mode='full', extractor_args=dict(with_pitch_step=True))
    res = me(song_files, save_each=False)
    songs = res['songs']
    paths = json2dataset(songs, str(tmp_path / 'dsm'), test_frac=0.25,
                         pitch_kind='midi')
    train = SongDataset.load(paths['train'])
    assert train.pitch_kind == 'midi' and len(train) == 3
    with pytest.raises(ValueError, match='degree'):
        json2dataset(songs, str(tmp_path / 'dsd'), pitch_kind='degree')


def test_config_registry():
    assert sconfig('datasets.POP909.n_song') == 909
    assert sconfig('datasets.LMD.n_song') == 176640
    assert sconfig('nope.nope', default=None) is None
    assert 'degree' in sconfig('check-arg.pitch_kind')
    assert u.dataset_path.endswith('datasets')
    os.environ['MUSICNLP_TPU_BASE'] = '/tmp/xyz'
    try:
        assert u.base_path == '/tmp/xyz'
        assert u.model_path == '/tmp/xyz/models'
    finally:
        del os.environ['MUSICNLP_TPU_BASE']
