"""Transform-chain and dataset-pipeline tests: string API vs dense-table equivalence."""
import numpy as np
import pytest

from musicnlp_tpu.preprocess import MusicConverter
from musicnlp_tpu.preprocess import transform as tsf
from musicnlp_tpu.preprocess.dataset import (
    AugmentedDataset, ProportionMixingDataset, SongDataset,
)
from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary, N_KEY, key_ordinal2str

# step-pitch-kind sample (extraction with with_pitch_step=True produces these)
SAMPLE_STEP = (
    'TimeSig_4/4 Tempo_120 '
    '<bar> <melody> p_7/2_F d_1 p_2/4_C d_1/2 p_10/3_A d_1/2 p_3/2_D d_2 '
    '<bass> p_7/2_F d_2 p_3/2_D d_2 '
    '<bar> <melody> <tup> p_10/2_A p_5/3_E p_2/4_C d_1 </tup> p_9/3_G d_1 p_r d_2 '
    '<bass> p_10/2_A d_2 p_5/2_E d_2 </s>'
)
KEYS = {'CMajor': 0.8, 'AMinor': 0.5}


@pytest.fixture(scope='module')
def vocabs():
    return (MusicVocabulary(pitch_kind='midi'), MusicVocabulary(pitch_kind='step'),
            MusicVocabulary(pitch_kind='degree'))


def test_pitch_shift_string(vocabs):
    _, vs, vd = vocabs
    ak = tsf.AugmentKey(vocab=vd)
    out = ak((SAMPLE_STEP, 'CMajor'))
    toks = out.split()
    assert toks[2] == 'Key_CMajor'
    # F in C major is degree 4
    assert toks[5] == 'p_7/2_4'
    # all tokens in degree vocab
    assert all(t in vd for t in toks)


def test_s2d_table_matches_string_transform(vocabs):
    _, vs, vd = vocabs
    table = tsf.build_step2degree_table(vs, vd)
    for key_str in ('CMajor', 'G#Minor', 'BbMajor'):
        ordinal = [i for i in range(N_KEY) if key_ordinal2str[i] == key_str][0]
        # string path
        ak = tsf.AugmentKey(vocab=vd)
        want = ak((SAMPLE_STEP, key_str)).split()
        # table path: gather + key insert
        ids_step = np.array([vs.t2i(t) for t in SAMPLE_STEP.split()], dtype=np.int32)
        ids_deg = table[ordinal][ids_step]
        got = [vd.i2t(i) for i in ids_deg]
        got = got[:2] + [f'Key_{key_str}'] + got[2:]
        assert got == want


def test_s2m_table_matches_to_midi(vocabs):
    vm, vs, _ = vocabs
    table = tsf.build_step2midi_table(vs, vm)
    want = tsf.ToMidiPitch(vocab=vs)(SAMPLE_STEP).split()
    ids_step = np.array([vs.t2i(t) for t in SAMPLE_STEP.split()], dtype=np.int32)
    got = [vm.i2t(i) for i in table[ids_step]]
    assert got == want


def test_random_crop(vocabs):
    _, vs, _ = vocabs
    long_song = ('TimeSig_4/4 Tempo_120 ' + '<bar> p_5/4_E d_4 ' * 40 + '</s>')
    rc = tsf.RandomCrop(vocab=vs, min_seg_length=16, rng=np.random.default_rng(0))
    outs = {rc(long_song).count('<bar>') for _ in range(20)}
    assert all(16 <= n <= 40 for n in outs)
    assert len(outs) > 1  # actually random
    cropped = rc(long_song)
    if cropped.count('<bar>') < 40:
        assert '[OMIT]' in cropped


def test_channel_mixer_preserves_elements(vocabs):
    vm, _, _ = vocabs
    # channel mixup applies to midi-kind strings in the reference chain
    sample_midi = tsf.ToMidiPitch(vocab=MusicVocabulary(pitch_kind='step'))(SAMPLE_STEP)
    cm = tsf.ChannelMixer(vocab=vm, rng=np.random.default_rng(3))
    mixed = cm(sample_midi)
    mc = MusicConverter(mode='full')
    out_ori = mc.str2tok_elms(sample_midi)
    out_mix = mc.str2tok_elms(mixed)
    # per bar: the same multiset of elements per channel, order within channel kept
    for bar_o, bar_m in zip(out_ori.elms_by_bar, out_mix.elms_by_bar):
        def chan_split(elms):
            from musicnlp_tpu.vocab import Channel
            mel, bass, c = [], [], None
            for e in elms:
                if e == ['<melody>']:
                    c = 'm'
                elif e == ['<bass>']:
                    c = 'b'
                else:
                    (mel if c == 'm' else bass).append(e)
            return mel, bass
        mo, bo = chan_split(bar_o)
        mm, bm = chan_split(bar_m)
        assert mo == mm and bo == bm


def test_tempo_group():
    vg = MusicVocabulary(pitch_kind='step', tempo_bin=5)
    tg = tsf.TempoGroup(vocab_group=vg)
    out = tg(SAMPLE_STEP)
    assert out.split()[1] == 'Tempo_120/124'


def test_augmented_dataset_degree():
    tok = MusicTokenizer(pitch_kind='degree', model_max_length=64)
    sd = SongDataset.from_songs([
        dict(score=SAMPLE_STEP, keys=KEYS, title='t1'),
        dict(score=SAMPLE_STEP, keys=KEYS, title='t2'),
    ])
    ds = AugmentedDataset(sd, tokenizer=tok, insert_key=True, pitch_shift=True,
                          channel_mixup=True, random_crop=True)
    item = ds[0]
    assert item['input_ids'].shape == (64,)
    assert item['labels'].shape == (64,)
    assert item['key_scores'].shape == (N_KEY,)
    # pads masked in labels
    pad_id = tok.pad_token_id
    assert (item['labels'][item['input_ids'] == pad_id] == -100).all()
    # 3rd token is a key
    from musicnlp_tpu.vocab import VocabType
    assert tok.vocab.type(int(item['input_ids'][2])) == VocabType.key
    # decoded tokens are valid degree-vocab music
    toks = tok.decode(item['input_ids']).split()
    assert toks[0] == 'TimeSig_4/4'
    # batching
    b = next(ds.batches(2, shuffle=False))
    assert b['input_ids'].shape == (2, 64)


def test_augmented_dataset_midi_eval():
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    sd = SongDataset.from_songs([dict(score=SAMPLE_STEP, keys=KEYS, title='t')])
    ds = AugmentedDataset(sd, tokenizer=tok, dataset_split='eval', random_crop=True)
    item = ds[0]
    # eval: no crop, key_scores carried for IKR
    assert item['key_scores'][0] == pytest.approx(0.8)  # CMajor ordinal 0
    toks = tok.decode(item['input_ids']).split()
    assert all(t in tok.vocab for t in toks)


def test_augmented_dataset_midi_source_not_double_remapped():
    """A dataset MATERIALIZED midi-kind fed to a midi tokenizer must yield the
    same stream as a step-kind dataset remapped on the fly -- regression for
    the double-remap bug where midi ids were gathered through the step->midi
    table again (durations landed on pitch ids, silently corrupting any
    training run whose dataset was materialized in the tokenizer's kind)."""
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    sd_step = SongDataset.from_songs(
        [dict(score=SAMPLE_STEP, keys=KEYS, title='t')])
    midi_text = tsf.ToMidiPitch()(SAMPLE_STEP)
    sd_midi = SongDataset.from_songs(
        [dict(score=midi_text, keys=KEYS, title='t')],
        vocab=MusicVocabulary(pitch_kind='midi'))
    assert sd_midi.pitch_kind == 'midi'
    a = AugmentedDataset(sd_step, tokenizer=tok, random_crop=False)[0]
    b = AugmentedDataset(sd_midi, tokenizer=tok, random_crop=False)[0]
    np.testing.assert_array_equal(a['input_ids'], b['input_ids'])
    # and the stream is well-formed music: outside <tup> groups, a pitch is
    # always followed by a duration (the corruption turned durations into
    # pitches, so pitch-pitch outside tuplets is its signature)
    from musicnlp_tpu.vocab import VocabType
    toks = tok.decode(b['input_ids']).split()
    in_tup = False
    for t1, t2 in zip(toks, toks[1:]):
        in_tup = (in_tup or t1 == '<tup>') and t1 != '</tup>'
        if not in_tup and tok.vocab.type(t1) == VocabType.pitch:
            assert tok.vocab.type(t2) == VocabType.duration, (t1, t2)


def test_augmented_dataset_rejects_mismatched_kind():
    tok = MusicTokenizer(pitch_kind='degree', model_max_length=64)
    midi_text = tsf.ToMidiPitch()(SAMPLE_STEP)
    sd_midi = SongDataset.from_songs(
        [dict(score=midi_text, keys=KEYS, title='t')],
        vocab=MusicVocabulary(pitch_kind='midi'))
    with pytest.raises(ValueError, match='incompatible'):
        AugmentedDataset(sd_midi, tokenizer=tok)


def test_songdataset_save_load(tmp_path):
    sd = SongDataset.from_songs([dict(score=SAMPLE_STEP, keys=KEYS, title='t')])
    p = str(tmp_path / 'ds.npz')
    sd.save(p)
    back = SongDataset.load(p)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0].ids, sd[0].ids)
    np.testing.assert_array_equal(back[0].bar_starts, sd[0].bar_starts)
    assert back[0].title == 't'


def test_proportion_mixing():
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=32)
    sd_small = SongDataset.from_songs(
        [dict(score=SAMPLE_STEP, keys=KEYS, title=f's{i}') for i in range(3)])
    sd_big = SongDataset.from_songs(
        [dict(score=SAMPLE_STEP, keys=KEYS, title=f'b{i}') for i in range(10)])
    d1 = AugmentedDataset(sd_small, tokenizer=tok)
    d2 = AugmentedDataset(sd_big, tokenizer=tok)
    mix = ProportionMixingDataset([d1, d2], k=5)
    assert len(mix) == 3 + 5
    _ = [mix[i] for i in range(len(mix))]
    mix.resample()
    _ = mix[7]


def test_tempo_group_table_matches_string():
    from musicnlp_tpu.preprocess.transform import TempoGroup, build_tempo_group_table
    vp = MusicVocabulary(pitch_kind='midi')
    vb = MusicVocabulary(pitch_kind='midi', tempo_bin=5)
    table = build_tempo_group_table(vp, vb)
    song = 'TimeSig_4/4 Tempo_123 <bar> p_1/4 d_4 </s>'
    want = TempoGroup(vocab_none=vp, vocab_group=vb)(song).split()
    ids = np.array([vp.tok2id[t] for t in song.split()])
    got = [vb.i2t(i) for i in table[ids]]
    assert got == want
    assert 'Tempo_120/124' in got
