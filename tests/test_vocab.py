"""Golden tests for the token-language contract (reference music_vocab.py construction rules)."""
from fractions import Fraction

import numpy as np
import pytest

from musicnlp_tpu.vocab import (
    MusicVocabulary, MusicTokenizer, VocabType, Key, COMMON_TIME_SIGS,
    key_inkey_mask, N_KEY, nrp,
)


@pytest.fixture(scope='module')
def vocab_midi():
    return MusicVocabulary(pitch_kind='midi')


@pytest.fixture(scope='module')
def vocab_step():
    return MusicVocabulary(pitch_kind='step')


@pytest.fixture(scope='module')
def vocab_degree():
    return MusicVocabulary(pitch_kind='degree')


def test_vocab_sizes(vocab_midi, vocab_step, vocab_degree):
    # reference music_vocab.py:363-370: sizes 422 (midi) / 1190 (degree)
    assert len(vocab_midi) == 422
    assert len(vocab_degree) == 1190
    assert len(vocab_midi.toks['special']) == 8
    assert len(vocab_midi.toks['time_sig']) == 8
    assert len(vocab_midi.toks['tempo']) == 203
    assert len(vocab_midi.toks['key']) == 24
    assert len(vocab_midi.toks['pitch']) == 130
    assert len(vocab_midi.toks['duration']) == 49
    assert len(vocab_step.toks['pitch']) > 130  # spelled names add enharmonics


def test_special_token_order(vocab_midi):
    assert vocab_midi.decode(list(range(8))) == [
        '[OMIT]', '[PAD]', '<bar>', '</s>', '<melody>', '<bass>', '<tup>', '</tup>']


def test_time_sig_tokens(vocab_midi):
    # sorted by (denominator, numerator): reference music_vocab.py:354
    assert vocab_midi.toks['time_sig'] == [
        'TimeSig_rare', 'TimeSig_2/2', 'TimeSig_2/4', 'TimeSig_3/4', 'TimeSig_4/4',
        'TimeSig_5/4', 'TimeSig_6/8', 'TimeSig_12/8']


def test_duration_tokens(vocab_midi):
    durs = vocab_midi.toks['duration']
    assert durs[0] == 'd_rare'
    assert durs[1] == 'd_1/8'
    assert durs[-1] == 'd_6'
    assert 'd_1' in durs and 'd_1/2' in durs and 'd_3/4' in durs
    metas = vocab_midi.get_durations(exp='dur')
    assert metas[0] == Fraction(1, 8) and metas[-1] == 6 and len(metas) == 48


def test_pitch_meta_roundtrip(vocab_midi):
    # reference check_pitch_meta (music_vocab.py:1035-1046)
    for i in range(128):
        tok = vocab_midi.note2pitch_str(i)
        assert vocab_midi.tok2meta(tok) == i
        assert vocab_midi.meta2tok(VocabType.pitch, i) == tok
        assert tok in vocab_midi


def test_id_bijection(vocab_midi, vocab_step, vocab_degree):
    for v in (vocab_midi, vocab_step, vocab_degree):
        for tok, i in v.tok2id.items():
            assert v.id2tok[i] == tok
        # tok -> meta -> tok roundtrip for all meta-carrying tokens
        for i, tok in v.id2tok.items():
            if v.with_meta(tok):
                meta = v.tok2meta(tok, strict=False)
                kind = v.type(tok)
                assert v.meta2tok(kind, meta) == tok


def test_step_vocab_edge_cases(vocab_step):
    # out-of-range spelled pitches intentionally kept (reference music_vocab.py:588-598)
    assert 'p_1/-2_B' in vocab_step  # B# below midi 0 -> meta -12
    assert 'p_12/9_C' in vocab_step  # C- above midi 127 -> meta 131
    assert vocab_step.tok2meta('p_1/-2_B', strict=False) == (-12, 'B')
    assert vocab_step.tok2meta('p_12/9_C', strict=False) == (131, 'C')
    # rarest pitches are excluded
    assert 'p_12/10_C' not in vocab_step
    assert vocab_step.is_rarest_step_pitch('p_12/10_C')


def test_degree_vocab(vocab_degree):
    assert 'p_1/-1_1' in vocab_degree
    assert 'p_8/9_7' in vocab_degree  # midi 127
    assert vocab_degree.tok2meta('p_5/4_3') == (64, 3)
    assert vocab_degree.meta2tok(VocabType.pitch, (64, 3)) == 'p_5/4_3'


def test_tempo_tokens(vocab_midi):
    toks = vocab_midi.toks['tempo']
    assert toks[0] == 'Tempo_low' and toks[-1] == 'Tempo_high'
    assert toks[1] == 'Tempo_40' and toks[-2] == 'Tempo_240'
    assert vocab_midi.tok2meta('Tempo_120') == 120
    assert vocab_midi.tok2meta('Tempo_low') == 39
    assert vocab_midi.tok2meta('Tempo_high') == 241


def test_tempo_bin():
    # reference music_vocab.py:394-424: bins of 5 BPM, last group gets one extra
    v = MusicVocabulary(pitch_kind='degree', tempo_bin=5)
    toks = v.toks['tempo']
    assert toks[1] == 'Tempo_40/44'
    assert toks[-2] == 'Tempo_235/240'  # last bin inclusive of 240
    assert v.tok2meta('Tempo_40/44') == 42
    assert v.tempo_meta_map[120] == v.tok2meta(v.meta2tok(VocabType.tempo, v.tempo_meta_map[120]))
    # all 201 tempos are mapped
    assert all(t in v.tempo_meta_map for t in range(40, 241))


def test_sanitize_rare(vocab_midi, vocab_step):
    assert vocab_midi.sanitize_rare_token('TimeSig_7/8') == 'TimeSig_rare'
    assert vocab_midi.sanitize_rare_token('Tempo_30') == 'Tempo_low'
    assert vocab_midi.sanitize_rare_token('Tempo_300') == 'Tempo_high'
    assert vocab_midi.sanitize_rare_token('d_7') == 'd_rare'
    assert vocab_midi.sanitize_rare_token('Tempo_120') == 'Tempo_120'
    assert vocab_step.sanitize_rare_token('p_12/10_C') == 'p_rare'
    # for_midi folds pitch into [0, 127]
    assert vocab_step.sanitize_rare_token('p_12/10_C', for_midi=True) == 'p_12/8_C'


def test_key_tokens(vocab_midi):
    keys = vocab_midi.toks['key']
    assert len(keys) == 24
    assert keys == sorted(keys)
    assert vocab_midi.tok2meta('Key_CMajor') == Key.CMaj
    assert vocab_midi.meta2tok(VocabType.key, Key.GsMin) == 'Key_G#Minor'


def test_type_classification(vocab_midi):
    assert vocab_midi.type('p_5/4') == VocabType.pitch
    assert vocab_midi.type('d_1/2') == VocabType.duration
    assert vocab_midi.type('TimeSig_4/4') == VocabType.time_sig
    assert vocab_midi.type('Tempo_120') == VocabType.tempo
    assert vocab_midi.type('Key_CMajor') == VocabType.key
    assert vocab_midi.type('<bar>') == VocabType.special
    assert vocab_midi.type(vocab_midi.tok2id['p_5/4']) == VocabType.pitch


def test_nrp():
    assert nrp('p_5/4') and nrp('p_5/4_C') and nrp('p_5/4_3')
    assert not nrp('p_r') and not nrp('p_rare') and not nrp('d_1') and not nrp('<bar>')


def test_dense_tables(vocab_midi):
    tbl = vocab_midi.id_midi_table
    assert tbl[vocab_midi.tok2id['p_1/-1']] == 0
    assert tbl[vocab_midi.tok2id['p_8/9']] == 127
    assert tbl[vocab_midi.tok2id['p_r']] == -1
    assert tbl[vocab_midi.tok2id['p_rare']] == -2
    assert tbl[vocab_midi.tok2id['<bar>']] == -2
    pc = vocab_midi.id_pitch_class_table
    assert pc[vocab_midi.tok2id['p_1/-1']] == 0
    assert pc[vocab_midi.tok2id['p_8/9']] == 7  # midi 127 % 12
    dur = vocab_midi.id_duration_table
    assert dur[vocab_midi.tok2id['d_1/2']] == 0.5


def test_inkey_mask():
    # C major: diatonic pcs are {0,2,4,5,7,9,11}
    cmaj = key_inkey_mask[0]  # ordinal 0 is CMajor
    assert set(np.where(cmaj)[0].tolist()) == {0, 2, 4, 5, 7, 9, 11}
    assert key_inkey_mask.shape == (N_KEY, 12)


def test_tokenizer_roundtrip():
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=32)
    s = 'TimeSig_4/4 Tempo_120 <bar> p_5/4 d_1/2 p_r d_1/2 </s>'
    enc = tok(s, padding='max_length', truncation=True)
    assert len(enc['input_ids']) == 32
    assert sum(enc['attention_mask']) == 8
    assert tok.decode(enc['input_ids'][:8]) == s
    # batch mode
    enc_b = tok([s, s], padding='max_length')
    assert len(enc_b['input_ids']) == 2 and len(enc_b['input_ids'][0]) == 32


def test_ids2pitches():
    tok = MusicTokenizer(pitch_kind='midi')
    s = 'TimeSig_4/4 Tempo_120 <bar> p_5/4 d_1/2 p_r d_1/2 </s>'
    ids = tok(s)['input_ids']
    assert tok.ids2pitches(ids) == [64, -1]
    assert tok.ids2pitches(ids, include_rest_pitch=False) == [64]


def test_colorize_roundtrip():
    """ANSI colorizing decorates every token without altering content
    (reference music_vocab.py:749-763, music_tokenizer.py:109)."""
    import re
    from musicnlp_tpu.vocab import MusicTokenizer
    tok = MusicTokenizer(pitch_kind='degree')
    text = 'TimeSig_4/4 Tempo_120 Key_CMajor <bar> <melody> p_1/5_1 d_1 </s>'
    colored = tok.colorize(text)
    assert '\x1b[' in colored
    assert re.sub(r'\x1b\[[0-9]*m', '', colored) == text
