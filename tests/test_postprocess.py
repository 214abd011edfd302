"""Postprocess tests: stats, visualization data, train-log parsing, fixtures."""
import json
import os
from fractions import Fraction

import numpy as np
import pytest

from musicnlp_tpu._sample_scores import (
    gen_broken, sample_full_degree, sample_full_midi, sample_full_step,
)
from musicnlp_tpu.postprocess.music_stats import MusicStats
from musicnlp_tpu.postprocess.music_visualize import MusicVisualize
from musicnlp_tpu.postprocess.train_plot import (
    load_train_log, plot_train_curves, summarize_run,
)
from musicnlp_tpu.preprocess import MusicConverter
from musicnlp_tpu.trainer.eval import repair_generated
from musicnlp_tpu.vocab import MusicVocabulary


def test_sample_scores_in_vocab():
    for text, pk in ((sample_full_midi, 'midi'), (sample_full_step, 'step'),
                     (sample_full_degree, 'degree')):
        v = MusicVocabulary(pitch_kind=pk)
        assert all(t in v for t in text.split()), pk


def test_stats_vocab_type_counts():
    ms = MusicStats()
    counts = ms.vocab_type_counts(sample_full_midi.split())
    assert counts['time_sig'][(4, 4)] == 1
    assert counts['tempo'][120] == 1
    assert sum(counts['pitch'].values()) > 10
    assert counts['duration'][1] >= 3


def test_weighted_pitch_counts():
    ms = MusicStats()
    w = ms.weighted_pitch_counts(sample_full_midi)
    # C5 (midi 72): 1 + tuplet share 2/3 + 4 = 17/3
    assert w[72] == Fraction(17, 3)
    assert -1 in w  # rest tracked too
    total = sum(w.values())
    assert total == Fraction(32)  # 4 bars x 4 quarters x 2 channels


def test_broken_render_robustness():
    """The deliberately broken generation must repair + render (reference
    render-robustness check, music_converter.py:506-548)."""
    v = MusicVocabulary(pitch_kind='midi')
    fixed = repair_generated(gen_broken, v)
    assert fixed.endswith('</s>')
    mc = MusicConverter(mode='full')
    score = mc.str2score(fixed, pitch_kind='midi', title='broken')
    assert len(list(score.parts)) == 2


def test_visualize_stats_and_report(tmp_path):
    songs = [dict(score=sample_full_midi, keys={'CMajor': 0.9}, duration=8,
                  warnings=[dict(warn_name='HighPitchOverlap')]),
             dict(score=sample_full_midi, keys={'GMajor': 0.7}, duration=9,
                  warnings=[])]
    mv = MusicVisualize(songs, dataset_name='unit')
    st = mv.stats()
    assert st['n_song'] == 2
    assert (st['token_length'] == len(sample_full_midi.split())).all()
    assert st['time_sig'][(4, 4)] == 2
    assert st['warning']['HighPitchOverlap'] == 1
    rep = mv.report()
    assert rep['n_song'] == 2 and rep['top_time_sigs'][0][0] == (4, 4)
    cov = mv.token_coverage_curve()
    assert np.isclose(cov[-1], 1.0)
    p = mv.plot('bar_count', str(tmp_path / 'bc.png'))
    assert os.path.getsize(p) > 0


def test_train_log_parsing(tmp_path):
    path = str(tmp_path / 'train_log.jsonl')
    with open(path, 'w') as f:
        for i in range(6):
            f.write(json.dumps(dict(step=i + 1, epoch=i // 3, loss=3.0 - i * 0.3,
                                    ntp_acc=0.1 * i, ikr=0.5, lr=1e-3)) + '\n')
            if i % 3 == 2:
                f.write(json.dumps(dict(epoch=i // 3, eval_loss=2.5 - i * 0.2,
                                        eval_ntp_acc=0.2, eval_ikr=0.6,
                                        train_tokens_per_sec=1000.0)) + '\n')
    log = load_train_log(path)
    assert len(log['steps']) == 6 and len(log['epochs']) == 2
    s = summarize_run(path)
    assert s['best_epoch'] == 1 and s['mean_tokens_per_sec'] == 1000.0
    p = plot_train_curves(path)
    assert os.path.getsize(p) > 0


def test_step_timer_and_profile_fn():
    from musicnlp_tpu.utils.profiling import StepTimer, profile_fn
    t = StepTimer()
    for _ in range(5):
        t.mark(n_tokens=100)
    s = t.summary()
    assert s['steps'] == 5 and s['tokens_per_sec'] > 0
    assert 'p50_step_s' in s and 'p90_step_s' in s
    rep = profile_fn(lambda: sum(range(10000)))
    assert 'function calls' in rep


def test_music_fs_discovery_and_splits(tmp_path, monkeypatch):
    import os
    from musicnlp_tpu.utils.music_fs import (
        get_converted_song_paths, load_split_map, save_split_map,
    )
    # backend-deduped discovery: MS preferred over LP for the same stem
    base = tmp_path / 'datasets' / 'converted' / 'POP909'
    for backend, stems in (('MS', ['a - x', 'b - y']), ('LP', ['b - y', 'c - z'])):
        d = base / backend
        d.mkdir(parents=True)
        for s in stems:
            (d / f'{s}.mxl').write_bytes(b'zz')
    monkeypatch.setenv('MUSICNLP_TPU_BASE', str(tmp_path))
    paths = get_converted_song_paths('POP909')
    stems = sorted(os.path.splitext(os.path.basename(p))[0] for p in paths)
    assert stems == ['a - x', 'b - y', 'c - z']
    assert any('/MS/' in p and 'b - y' in p for p in paths)   # MS wins dup

    # split maps: json + MAESTRO-style csv
    m = {'song1': 'train', 'song2': 'test'}
    save_split_map(m, str(tmp_path / 'split.json'))
    assert load_split_map(str(tmp_path / 'split.json')) == m
    csv_p = tmp_path / 'maestro.csv'
    csv_p.write_text('canonical_title,split\nfoo,train\nbar,validation\n')
    got = load_split_map(str(csv_p))
    assert got == {'foo': 'train', 'bar': 'test'}


def test_sample_fixtures_cross_kind_consistent():
    """The three pitch-kind fixtures are the SAME song: step->midi matches the
    midi fixture; step+CMajor->degree matches the degree fixture."""
    from musicnlp_tpu.preprocess import transform as tsf
    to_midi = tsf.ToMidiPitch()(sample_full_step)
    assert to_midi == sample_full_midi
    ak = tsf.AugmentKey()
    as_degree = ak((sample_full_step, 'CMajor'))
    assert as_degree == sample_full_degree


def test_visualize_breadth(tmp_path):
    """Round-2 MusicVisualize parity breadth (reference :304-862):
    duration-weighted pitch/key dists, per-dataset comparisons, coverage
    summaries per tokenizer, warning-severity report, empty-channel and
    tuplet-duration ratios, stats cache."""
    from musicnlp_tpu.preprocess.transform import SanitizeRare, ToMidiPitch
    to_midi = lambda s: ToMidiPitch()(SanitizeRare()(s))
    songs_a = [dict(score=sample_full_midi, keys={'CMajor': 0.9, 'GMajor': 0.5},
                    duration=8, warnings=[dict(warn_name='Higher Pitch Overlap'),
                                          dict(warn_name='Invalid Tuplet Durations')])]
    songs_b = [dict(score=to_midi(sample_full_step), keys={'DMajor': 0.8},
                    duration=12, warnings=[dict(warn_name='Gap in extracted Bar Notes')])]
    mv = MusicVisualize({'corpus-a': songs_a, 'corpus-b': songs_b})

    # per-dataset stats + merged
    assert mv.stats()['n_song'] == 2
    assert mv.per_dataset('corpus-a')['n_song'] == 1
    rep = mv.report()
    assert set(rep['per_dataset']) == {'corpus-a', 'corpus-b'}

    # duration-weighted pitch: midi 72 carries 17/3 QL in the midi sample
    w = mv.weighted_pitch_dist(dataset='corpus-a')
    assert np.isclose(w[72], 17 / 3)
    # weighted key dist uses confidences
    kd = mv.key_dist(weighted=True, dataset='corpus-a')
    assert np.isclose(kd['CMajor'], 0.9) and np.isclose(kd['GMajor'], 0.5)

    # ratios
    assert 0.0 <= mv.tuplet_duration_ratio() <= 1.0
    assert 0.0 <= mv.stats()['empty_channel_ratio'] <= 1.0

    # coverage per tokenizer scheme
    cov = mv.coverage_summary(ratios=(0.5, 0.95))
    assert cov['corpus-a'][0.5] <= cov['corpus-a'][0.95]
    from musicnlp_tpu.trainer.pair_merge_tokenizer import PairMergeTokenizerTrainer
    pm = PairMergeTokenizerTrainer(pitch_kind='midi')(
        [s['score'] for s in songs_a + songs_b], coverage_ratio=0.9)
    cov_pm = mv.coverage_summary(ratios=(0.95,), tokenizer=pm)
    assert cov_pm['corpus-a'][0.95] > 0

    # warning severities
    sev = mv.warning_severity_report()
    assert sev['total'] == 3 and sev['severity_weighted'] > 0
    assert any(sev['by_severity'].values())

    # cache round trip
    cache = str(tmp_path / 'viz_cache.json')
    mv.save_cache(cache)
    mv2 = MusicVisualize({'corpus-a': songs_a, 'corpus-b': songs_b})
    mv2.load_cache(cache)
    assert mv2.stats()['n_song'] == 2
    assert mv2.stats()['time_sig'][(4, 4)] == mv.stats()['time_sig'][(4, 4)]
    assert mv2.per_dataset('corpus-b')['n_song'] == 1

    # per-dataset hue plots + weighted pitch + coverage PNGs
    paths = mv.plot_all(str(tmp_path / 'plots'))
    assert all(os.path.getsize(p) > 0 for p in paths)
    assert any('weighted_pitch' in p for p in paths)
    assert any('coverage' in p for p in paths)


# ------------------------------------------------- repair_bar_durations
def test_repair_bar_durations_valid_unchanged():
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    assert repair_bar_durations(sample_full_midi, v) == sample_full_midi


def test_repair_bar_durations_overflow_and_underfill():
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_4/4 Tempo_120 '
           '<bar> <melody> p_1/4 d_2 p_5/4 d_4 '        # 6 QL: overflow
           '<bass> p_1/3 d_2 p_3/3 d_1 '                # 3 QL: underfill
           '</s>')
    rep = repair_bar_durations(txt, v)
    assert rep != txt
    bar = rep.split('<bar>')[1]
    mel = bar.split('<bass>')[0]
    # the crossing note is truncated to the 2 QL remainder
    assert 'p_5/4 d_2' in mel and 'd_4' not in mel
    # bass padded with a 1 QL rest
    assert 'p_r d_1' in bar.split('<bass>')[1]
    # idempotent
    assert repair_bar_durations(rep, v) == rep


def test_repair_bar_durations_coalesces_repeated_channels():
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_4/4 Tempo_120 '
           '<bar> <melody> p_1/4 d_2 <bass> p_1/3 d_2 '
           '<melody> p_5/4 d_2 <bass> p_3/3 d_2 '
           '</s>')
    rep = repair_bar_durations(txt, v)
    toks = rep.split()
    # exactly one marker of each kind, melody first
    assert toks.count(v.start_of_melody) == 1
    assert toks.count(v.start_of_bass) == 1
    assert toks.index(v.start_of_melody) < toks.index(v.start_of_bass)
    # merged in order: melody = p_1/4 d_2 p_5/4 d_2 (sums to capacity)
    bar = rep.split('<bar>')[1]
    assert bar.split('<bass>')[0].split()[:5] == [
        '<melody>', 'p_1/4', 'd_2', 'p_5/4', 'd_2']


def test_repair_bar_durations_missing_channel_and_rare_timesig():
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_rare Tempo_120 '
           '<bar> <melody> p_1/4 d_4 '
           '</s>')
    rep = repair_bar_durations(txt, v)
    assert 'TimeSig_4/4' in rep and 'TimeSig_rare' not in rep
    assert '<bass> p_r d_4' in rep


def test_repair_bar_durations_orphan_notes_before_channel_marker():
    # notes before the bar's first channel marker survive repair_generated
    # (it's channel-agnostic) and would render as a malformed channel split;
    # the repair must adopt them into melody and report the text as changed
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_4/4 Tempo_120 '
           '<bar> p_1/4 d_1 p_3/4 d_2 <melody> p_5/4 d_4 '
           '<bass> p_1/3 d_4 '
           '</s>')
    rep = repair_bar_durations(txt, v)
    assert rep != txt                       # must NOT be declared valid
    bar = rep.split('<bar>')[1]
    mel = bar.split('<bass>')[0].split()
    # orphans lead the melody channel; the 4-QL note truncates to 1 QL
    assert mel[:5] == ['<melody>', 'p_1/4', 'd_1', 'p_3/4', 'd_2']
    assert 'p_5/4' in mel and 'd_4' not in mel
    # idempotent and the repaired text round-trips as valid
    assert repair_bar_durations(rep, v) == rep


def test_repair_bar_durations_tuplet_boundary_drop():
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_4/4 Tempo_120 '
           '<bar> <melody> p_1/4 d_3 <tup> p_1/4 p_5/4 p_8/4 d_2 </tup> '
           '<bass> p_1/3 d_2 <tup> p_1/3 p_5/3 p_8/3 d_2 </tup> '
           '</s>')
    rep = repair_bar_durations(txt, v)
    bar = rep.split('<bar>')[1]
    mel, bass = bar.split('<bass>')
    assert '<tup>' not in mel          # crossing tuplet dropped, rest-padded
    assert 'p_r d_1' in mel
    assert '<tup>' in bass             # in-capacity tuplet kept


def test_repair_bar_durations_render_reextract_roundtrip(tmp_path):
    """The full contract: repaired text renders to MXL and re-extracts
    token-exactly under the strict extraction grammar."""
    from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    v = MusicVocabulary(pitch_kind='midi')
    txt = ('TimeSig_4/4 Tempo_120 '
           '<bar> <melody> p_1/4 d_2 p_5/4 d_4 <bass> p_1/3 d_1 '
           '<melody> p_8/4 d_1 '
           '<bar> <bass> p_1/3 d_4 '
           '</s>')
    rep = repair_bar_durations(txt, v)
    mc = MusicConverter(mode='full')
    score = mc.str2score(rep, pitch_kind='midi', title='repair-rt')
    p = str(tmp_path / 'repair_rt.mxl')
    score.write_mxl(p)
    out = MusicExtractor(mode='full')(p)
    assert ' '.join(out.split()[:2]) == 'TimeSig_4/4 Tempo_120'
    # bar 1 round-trips token-exactly
    assert out.split('<bar>')[1] == rep.split('<bar>')[1]
    # bar 2 (one live channel): the extractor may swap which channel holds
    # the note (melody = highest line); the note content round-trips
    bar2 = out.split('<bar>')[2]
    assert 'p_1/3 d_4' in bar2 and 'p_r d_4' in bar2
