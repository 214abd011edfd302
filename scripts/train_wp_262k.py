"""Train the 262,144-vocab WordPiece tokenizer -- the reference's largest
production tier (reference musicnlp/trainer/wordpiece_tokenizer.py:455-468
pins trained tokenizers at 32,768-262,144).

No real corpus exists in this environment (zero egress), so the corpus is a
large deterministic synthetic degree-kind song set, key-augmented exactly like
the reference's training corpus (song x candidate keys via AugmentKey).  The
native C++ trainer (musicnlp_tpu/native/wordpiece.cpp) mints the ~260k merges.

Artifact: artifacts/wordpiece_262144_degree.json.gz -- loadable through
WordPieceMusicTokenizer.from_file (and therefore trainer.load_trained's
rebuild_tokenizer path), round-trip-checked here and in
tests/test_tokenizers.py::test_wordpiece_262k_artifact.

Usage: python scripts/train_wp_262k.py [n_songs]
"""
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from musicnlp_tpu.trainer.wordpiece_tokenizer import (
    WordPieceMusicTokenizer, WordPieceMusicTrainer,
)

VOCAB_SIZE = 262_144
OUT = os.path.join(os.path.dirname(__file__), '..', 'artifacts',
                   'wordpiece_262144_degree.json.gz')


def synthetic_corpus(n_songs: int, seed: int = 0):
    """Deterministic STEP-kind songs with melody+bass structure (the corpus
    layout AugmentKey consumes: it degree-shifts per candidate key)."""
    rng = np.random.default_rng(seed)
    names = ['C', 'D', 'E', 'F', 'G', 'A', 'B']
    pcs = {'C': 1, 'D': 3, 'E': 5, 'F': 6, 'G': 8, 'A': 10, 'B': 12}
    durs = ['d_1', 'd_1/2', 'd_1/4', 'd_2', 'd_3/4', 'd_3/2', 'd_1/8', 'd_3/8']

    def note(lo, hi):
        nm = names[int(rng.integers(7))]
        return (f'p_{pcs[nm]}/{int(rng.integers(lo, hi))}_{nm} '
                f'{durs[int(rng.integers(len(durs)))]}')

    def song():
        bars = []
        for _ in range(int(rng.integers(8, 32))):
            mel = ' '.join(note(3, 7) for _ in range(int(rng.integers(2, 9))))
            bas = ' '.join(note(1, 4) for _ in range(int(rng.integers(1, 4))))
            bars.append(f'<bar> <melody> {mel} <bass> {bas}')
        return 'TimeSig_4/4 Tempo_120 ' + ' '.join(bars) + ' </s>'

    keys = ['CMajor', 'GMajor', 'DMajor', 'AMinor', 'EMinor', 'FMajor']
    return [dict(score=song(),
                 keys={k: float(rng.uniform(0.3, 1.0))
                       for k in rng.choice(keys, size=3, replace=False)})
            for _ in range(n_songs)]


def main():
    n_songs = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    t0 = time.time()
    songs = synthetic_corpus(n_songs)
    tr = WordPieceMusicTrainer(pitch_kind='degree')
    aug = list(tr.key_augmented_corpus(songs))
    t_corpus = time.time() - t0
    print(f'corpus: {n_songs} songs -> {len(aug)} key-augmented texts '
          f'({t_corpus:.0f}s)')

    t0 = time.time()
    tok = tr(aug, vocab_size=VOCAB_SIZE)
    t_train = time.time() - t0
    print(f'trained vocab_size={tok.vocab_size} in {t_train:.0f}s '
          f'(native merges)')
    assert tok.vocab_size == VOCAB_SIZE, tok.vocab_size

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, 'wt') as f:
        json.dump(tok.meta, f)
    print(f'saved {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB gz)')

    # reload through the production path + exactness / compression checks
    tok2 = WordPieceMusicTokenizer.from_file(OUT)
    assert tok2.vocab_size == VOCAB_SIZE
    n_tok = n_unit = 0
    for text in aug[:50]:
        ids = tok2.encode(text)
        assert tok2.decode(ids) == text
        n_tok += len(text.split())
        n_unit += len(ids)
    print(f'reload ok; exact decode(encode(x)); compression '
          f'{n_tok / n_unit:.2f}x ({n_tok} tokens -> {n_unit} units)')
    print(json.dumps(dict(vocab_size=VOCAB_SIZE, n_songs=n_songs,
                          n_texts=len(aug), train_s=round(t_train, 1),
                          compression=round(n_tok / n_unit, 2))))


if __name__ == '__main__':
    main()
