"""Learned-tokenizer tests: pair-merge + WordPiece (native C++ and Python)."""
import os

import numpy as np
import pytest

from musicnlp_tpu.native import load_wordpiece_lib
from musicnlp_tpu.native._py_wordpiece import PyEncoder, py_train
from musicnlp_tpu.trainer.pair_merge_tokenizer import (
    PairMergeTokenizer, PairMergeTokenizerTrainer,
)
from musicnlp_tpu.trainer.wordpiece_tokenizer import (
    Score2Word, WordPieceMusicTokenizer, WordPieceMusicTrainer,
)
from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary

SONGS = [
    ('TimeSig_4/4 Tempo_120 '
     '<bar> <melody> p_1/4 d_1 p_5/4 d_1 p_8/4 d_2 <bass> p_1/3 d_4 '
     '<bar> <melody> p_1/4 d_1 p_5/4 d_1 p_8/4 d_2 <bass> p_1/3 d_4 </s>'),
    ('TimeSig_4/4 Tempo_90 '
     '<bar> <melody> p_3/4 d_2 p_1/4 d_1 p_5/4 d_1 <bass> p_3/3 d_4 '
     '<bar> <melody> <tup> p_1/4 p_5/4 p_8/4 d_1 </tup> p_r d_3 <bass> p_1/3 d_4 </s>'),
    ('TimeSig_3/4 Tempo_120 '
     '<bar> <melody> p_1/4 d_1 p_5/4 d_1 p_8/4 d_1 <bass> p_1/3 d_3 </s>'),
]


# ----------------------------------------------------------------- pair-merge
def test_pair_merge_roundtrip_and_merges():
    tr = PairMergeTokenizerTrainer(pitch_kind='midi', mode='full')
    tok = tr(SONGS, coverage_ratio=0.95)
    assert len(tok.added_tok2id) > 0
    for s in SONGS:
        toks = tok.tokenize(s)
        ids = tok.convert_tokens_to_ids(toks)
        assert tok.decode(ids) == s          # exact reconstruction
    # the most frequent element became a single token
    merged_used = any(' ' in t for t in tok.tokenize(SONGS[0]))
    assert merged_used
    # tokenized form is shorter than base form
    assert len(tok.tokenize(SONGS[0])) < len(SONGS[0].split())


def test_pair_merge_vocab_size_mode(tmp_path):
    tr = PairMergeTokenizerTrainer(pitch_kind='midi', mode='full')
    base = len(MusicVocabulary(pitch_kind='midi'))
    path = str(tmp_path / 'pm.json')
    tok = tr(SONGS, vocab_size=base + 3, save=path)
    assert len(tok.added_tok2id) == 3
    assert tok.vocab_size == base + 3
    tok2 = PairMergeTokenizer.from_file(path)
    assert tok2.added_tok2id == tok.added_tok2id
    for s in SONGS:
        assert tok2.decode(tok2.convert_tokens_to_ids(tok2.tokenize(s))) == s


def test_pair_merge_ids2pitches_matches_base():
    tr = PairMergeTokenizerTrainer(pitch_kind='midi', mode='full')
    tok = tr(SONGS, coverage_ratio=0.9)
    base = MusicTokenizer(pitch_kind='midi')
    for s in SONGS:
        ids = tok.convert_tokens_to_ids(tok.tokenize(s))
        base_ids = base.convert_tokens_to_ids(base.tokenize(s))
        assert tok.ids2pitches(ids) == base.ids2pitches(base_ids)


def test_pair_merge_malformed_input_total():
    """encode() must be total over RAW model samples: grammar-violating text
    (duration where a pitch is required) falls back to unmerged base tokens
    instead of raising from the element parser."""
    tr = PairMergeTokenizerTrainer(pitch_kind='midi', mode='full')
    tok = tr(SONGS, coverage_ratio=0.95)
    bad = ('TimeSig_4/4 Tempo_120 '
           '<bar> <melody> p_1/4 d_1 d_4 p_5/4 <bass> p_1/3 d_4 </s>')
    ids = tok.encode(bad)                    # must not raise
    assert all(i < len(tok.vocab) for i in ids)   # nothing merged
    assert tok.decode(ids) == bad            # all tokens in-vocab -> exact
    # the fallback is counted (a parser regression routing CORPUS text here
    # would otherwise silently train without any merged tokens)
    assert tok.fallback_count == 1
    assert tok.decode(tok.encode(SONGS[0])) == SONGS[0]
    assert tok.fallback_count == 1           # grammatical text: no fallback


# ------------------------------------------------------------------ wordpiece
def test_score2word_boundaries():
    v = MusicVocabulary(pitch_kind='midi')
    words = Score2Word(v)(SONGS[1])
    flat = [t for w in words for t in w]
    assert flat == SONGS[1].split()          # lossless split
    # markers standalone
    for w in words:
        if len(w) > 1:
            assert all(t not in ('<bar>', '<melody>', '<bass>', '</s>',
                                 '<tup>', '</tup>') for t in w)
    assert ['TimeSig_4/4'] in words and ['Tempo_90'] in words


def test_py_wordpiece_train_and_encode():
    # toy corpus: symbols 0,1 in word "0 1 0 1"; pair (0,1) merges first
    words = [[0, 1, 0, 1], [0, 1]]
    counts = [2, 3]
    units = py_train(words, counts, n_base=2, n_merges=2)
    assert len(units) == 2 * 2 + 2
    enc = PyEncoder(units)
    ids = enc.encode([0, 1, 0, 1])
    assert ids is not None and len(ids) < 4   # merges applied
    # reconstruction
    rec = []
    for i in ids:
        rec += list(units[i][1])
    assert rec == [0, 1, 0, 1]


def test_native_matches_python():
    lib = load_wordpiece_lib()
    assert lib is not None, 'native wordpiece lib must build (g++ available)'
    from musicnlp_tpu.trainer.wordpiece_tokenizer import _train_native
    rng = np.random.default_rng(0)
    words = [list(rng.integers(0, 8, size=rng.integers(2, 9))) for _ in range(30)]
    counts = [int(rng.integers(1, 5)) for _ in range(30)]
    got = _train_native(words, counts, n_base=8, n_merges=12)
    want = py_train(words, counts, n_base=8, n_merges=12)
    assert [tuple(u) for u in got] == [tuple(u) for u in want]


def test_wordpiece_music_roundtrip(tmp_path):
    base = len(MusicVocabulary(pitch_kind='midi'))
    tr = WordPieceMusicTrainer(pitch_kind='midi')
    path = str(tmp_path / 'wp.json')
    tok = tr(SONGS, vocab_size=2 * base + 16, save=path)
    assert tok.vocab_size <= 2 * base + 16
    for s in SONGS:
        ids = tok.encode(s)
        assert tok.decode(ids) == s           # exact reconstruction
        assert len(ids) < len(s.split())      # merges compress
    tok2 = WordPieceMusicTokenizer.from_file(path)
    for s in SONGS:
        assert tok2.decode(tok2.encode(s)) == s
        assert tok2.encode(s) == tok.encode(s)


def test_wordpiece_ids2pitches_matches_base():
    tr = WordPieceMusicTrainer(pitch_kind='midi')
    tok = tr(SONGS, vocab_size=2 * len(MusicVocabulary(pitch_kind='midi')) + 8)
    base = MusicTokenizer(pitch_kind='midi')
    for s in SONGS:
        assert tok.ids2pitches(tok.encode(s)) == \
            base.ids2pitches(base.convert_tokens_to_ids(base.tokenize(s)))


def test_wordpiece_padding_truncation():
    tr = WordPieceMusicTrainer(pitch_kind='midi')
    tok = tr(SONGS, vocab_size=2 * len(MusicVocabulary(pitch_kind='midi')) + 8)
    ids = tok.encode(SONGS[0], padding='max_length', max_length=64)
    assert len(ids) == 64 and ids[-1] == tok.pad_token_id
    ids_t = tok.encode(SONGS[0], truncation=True, max_length=5)
    assert len(ids_t) == 5


def test_string_dataset_with_wordpiece():
    """Learned tokenizers train through the string pipeline (the id-space
    AugmentedDataset cannot represent merged ids)."""
    from musicnlp_tpu.preprocess.dataset import StringAugmentedDataset
    songs = [dict(score=s, keys={'CMajor': 0.8}) for s in SONGS]
    tr = WordPieceMusicTrainer(pitch_kind='midi')
    tok = tr(SONGS, vocab_size=2 * len(MusicVocabulary(pitch_kind='midi')) + 16)
    tok.model_max_length = 48
    ds = StringAugmentedDataset(songs, tok, random_crop=False,
                                channel_mixup=True)
    item = ds[0]
    assert item['input_ids'].shape == (48,)
    assert item['key_scores'].shape == (24,)
    assert (item['labels'][item['input_ids'] == tok.pad_token_id] == -100).all()
    # decoded ids reconstruct a valid token string over the base vocab
    n_real = int((item['input_ids'] != tok.pad_token_id).sum())
    dec = tok.decode(item['input_ids'][:n_real])
    base = MusicVocabulary(pitch_kind='midi')
    assert all(t in base for t in dec.split())
    batch = next(ds.batches(2, shuffle=False))
    assert batch['input_ids'].shape == (2, 48)


def test_string_dataset_with_pairmerge_degree_keyaug():
    from musicnlp_tpu.preprocess.dataset import StringAugmentedDataset
    # step-kind corpus for key augmentation
    step_songs = [
        ('TimeSig_4/4 Tempo_120 <bar> <melody> p_1/4_C d_1 p_5/4_E d_1 '
         'p_8/4_G d_2 <bass> p_1/3_C d_4 </s>'),
        ('TimeSig_3/4 Tempo_90 <bar> <melody> p_3/4_D d_1 p_8/4_G d_2 '
         '<bass> p_8/2_G d_3 </s>'),
    ]
    tr = PairMergeTokenizerTrainer(pitch_kind='degree', mode='full')
    # train over key-augmented copies (reference wordpiece flow)
    from musicnlp_tpu.preprocess import transform as tsf
    ak = tsf.AugmentKey()
    aug = [ak((s, k)) for s in step_songs for k in ('CMajor', 'GMajor')]
    tok = tr(aug, coverage_ratio=0.9)
    tok.model_max_length = 40
    ds = StringAugmentedDataset(
        [dict(score=s, keys={'CMajor': 0.7, 'GMajor': 0.3}) for s in step_songs],
        tok, random_crop=False, insert_key=True, pitch_shift=True)
    item = ds[0]
    assert item['input_ids'].shape == (40,)
    dec = tok.decode(item['input_ids'])
    assert 'Key_' in dec  # key token inserted at position 2


def test_wordpiece_key_augmented_corpus():
    """Degree-kind WordPiece trains over the song x candidate-keys corpus
    (the reference's flow, wordpiece_tokenizer.py:280-282)."""
    step_songs = [dict(score=('TimeSig_4/4 Tempo_120 <bar> <melody> p_1/4_C d_1 '
                              'p_5/4_E d_1 p_8/4_G d_2 <bass> p_1/3_C d_4 </s>'),
                       keys={'CMajor': 0.8, 'GMajor': 0.5}),
                 dict(score=('TimeSig_3/4 Tempo_90 <bar> <melody> p_3/4_D d_1 '
                             'p_8/4_G d_2 <bass> p_8/2_G d_3 </s>'),
                      keys={'GMajor': 0.9})]
    tr = WordPieceMusicTrainer(pitch_kind='degree')
    corpus = list(WordPieceMusicTrainer.key_augmented_corpus(step_songs))
    assert len(corpus) == 3           # 2 keys + 1 key
    assert all('Key_' in c.split()[2] for c in corpus)
    tok = tr(corpus, vocab_size=2 * len(tr.vocab) + 8)
    for c in corpus:
        assert tok.decode(tok.encode(c)) == c


def test_wordpiece_reference_scale_32k():
    """Train WordPiece at the reference's production tier (32,768; reference
    wordpiece_tokenizer.py:455-468) over a key-augmented corpus with the
    native trainer, and prove the trained tokenizer is exact and trains
    through a TF-XL step."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
    from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTrainer

    rng = np.random.default_rng(0)
    names = ['C', 'D', 'E', 'F', 'G', 'A', 'B']
    pcs = {'C': 1, 'D': 3, 'E': 5, 'F': 6, 'G': 8, 'A': 10, 'B': 12}
    durs = ['d_1', 'd_1/2', 'd_1/4', 'd_2', 'd_3/4', 'd_3/2']

    def note(o_lo, o_hi):
        nm = names[int(rng.integers(7))]
        return (f'p_{pcs[nm]}/{int(rng.integers(o_lo, o_hi))}_{nm} '
                f'{durs[int(rng.integers(6))]}')

    def song():
        bars = []
        for _ in range(int(rng.integers(8, 24))):
            notes = [note(3, 6) for _ in range(int(rng.integers(2, 8)))]
            bars.append('<bar> <melody> ' + ' '.join(notes)
                        + ' <bass> ' + note(2, 3))
        return 'TimeSig_4/4 Tempo_120 ' + ' '.join(bars) + ' </s>'

    songs = [dict(score=song(), keys={'CMajor': 0.9, 'GMajor': 0.4})
             for _ in range(3000)]
    tr = WordPieceMusicTrainer(pitch_kind='degree')
    aug = list(tr.key_augmented_corpus(songs))
    t0 = time.time()
    tok = tr(aug, vocab_size=32768)
    train_s = time.time() - t0
    assert tok.vocab_size == 32768
    assert train_s < 120, f'native 32k training too slow: {train_s:.0f}s'

    # exact decode(encode(x)) round trip on augmented songs (the reference's
    # _CheckTrainedSingle invariant, reference :471-523)
    for text in aug[:20]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    # merged units actually compress
    n_tok = sum(len(t.split()) for t in aug[:50])
    n_unit = sum(len(tok.encode(t)) for t in aug[:50])
    assert n_unit < n_tok

    # TF-XL trains one step over the 32k vocab (full-vocab head -- fine at 32k)
    cfg = TransfoXLConfig(vocab_size=tok.vocab_size, model_size='test',
                          d_model=32, n_head=2, d_head=16, d_inner=64,
                          n_layer=2, mem_len=16, clamp_len=32, max_length=64,
                          dropout=0.0, dtype='float32')
    model = TransfoXL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([tok.encode(aug[0])[:64], tok.encode(aug[1])[:64]],
                      jnp.int32)
    loss, _ = jax.jit(lambda p, i: model.loss(p, i, i))(params, ids)
    assert np.isfinite(float(loss)) and float(loss) < 12


def test_wordpiece_262k_artifact(tmp_path):
    """The shipped 262,144-vocab production-tier artifact (the reference's
    largest pinned tokenizer size, reference wordpiece_tokenizer.py:455-468;
    trained by scripts/train_wp_262k.py with the native trainer in 392s)
    loads through from_file AND the trainer's load_trained/rebuild_tokenizer
    path, and encodes/decodes exactly."""
    import json
    import shutil

    from musicnlp_tpu.trainer.train import rebuild_tokenizer
    from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTokenizer

    art = os.path.join(os.path.dirname(__file__), '..', 'artifacts',
                       'wordpiece_262144_degree.json.gz')
    if not os.path.exists(art):
        pytest.skip('262k artifact not present')
    tok = WordPieceMusicTokenizer.from_file(art)
    assert tok.vocab_size == 262144
    text = ('TimeSig_4/4 Tempo_120 Key_CMajor <bar> <melody> p_1/4_1 d_1 '
            'p_5/4_3 d_1/2 p_8/4_5 d_1/2 <bass> p_1/3_1 d_2 </s>')
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert max(ids) < 262144

    # load_trained's tokenizer identity path (trainer/train.py rebuild_tokenizer)
    out_dir = str(tmp_path / 'run')
    os.makedirs(out_dir)
    shutil.copy(art, os.path.join(out_dir, 'tokenizer.json.gz'))
    meta = dict(tokenizer=dict(scheme='wordpiece',
                               tokenizer_file='tokenizer.json.gz',
                               model_max_length=1024))
    tok2 = rebuild_tokenizer(meta, out_dir)
    assert tok2.vocab_size == 262144
    assert tok2.encode(text) == ids
