"""Learning-quality anchor: overnight-scale synthetic run (round-2 verdict
weak #5 / task 10).

The reference anchors its trained models at ~73% next-token accuracy and
~0.95 IKR on real POP909 (reference musicnlp/trainer/metrics.py:239-244,
trainer/eval.py:545).  No real corpus exists in this environment, so the
anchor here is a STRUCTURED synthetic corpus built to have the same two
properties real pop does that make those numbers reachable: strong motif
repetition (high NTP ceiling -- the 64-song demo corpus was uniform-random
and capped NTP near 57%) and strict diatonicity (corpus ground-truth IKR
~1.0).  A `small` TF-XL trained over ~1.2k songs reports eval NTP-acc and
eval IKR vs the corpus's ground-truth IKR.

Usage: python scripts/train_anchor.py [--out /tmp/anchor] [--songs 1200]
       [--epochs 120] [--model-size small]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# per-bar rhythm patterns in quarter lengths (sum to 4)
RHYTHMS = [
    [1, 1, 1, 1],
    [2, 1, 1],
    [1, 1, 2],
    [2, 2],
    [1, Fraction(1, 2), Fraction(1, 2), 1, 1],
    [Fraction(1, 2)] * 4 + [1, 1],
    [1, 1, 1, Fraction(1, 2), Fraction(1, 2)],
]
# I-vi-IV-V style progressions as scale-degree roots
PROGRESSIONS = [[0, 5, 3, 4], [0, 3, 4, 0], [0, 4, 5, 3], [0, 0, 3, 4]]
SCALE = [0, 2, 4, 5, 7, 9, 11]
CHORD = {0: (0, 2, 4), 1: (1, 3, 5), 2: (2, 4, 6), 3: (3, 5, 0),
         4: (4, 6, 1), 5: (5, 0, 2), 6: (6, 1, 3)}


def _motif(rng, rhythm, chord_deg):
    """A 1-bar melodic cell: chord-tone anchored degrees with passing steps."""
    degs = []
    cur = int(rng.choice(CHORD[chord_deg]))
    for i in range(len(rhythm)):
        if i == 0 or rng.random() < 0.5:
            cur = int(rng.choice(CHORD[chord_deg]))       # chord tone
        else:
            cur = (cur + int(rng.choice([-1, 1]))) % 7    # passing step
        degs.append(cur)
    return degs


def make_song(rng, title):
    from musicnlp_tpu.io import Measure, Note, Part, Score

    root = int(rng.choice([60, 62, 65, 67, 57, 59]))      # C D F G A B keys
    tempo = int(rng.choice([90, 100, 120, 132]))
    prog = PROGRESSIONS[int(rng.integers(len(PROGRESSIONS)))]
    # two contrasting 4-bar phrases, each phrase = (rhythm, per-bar motifs)
    phrases = {}
    for ph in 'AB':
        rhythm = RHYTHMS[int(rng.integers(len(RHYTHMS)))]
        phrases[ph] = (rhythm, [_motif(rng, rhythm, prog[b]) for b in range(4)])
    form = ['A', 'A', 'B', 'A'] * int(rng.integers(2, 5))  # 16-32 bars
    measures = []
    for b, ph in enumerate(form):
        rhythm, motifs = phrases[ph]
        degs = list(motifs[b % 4])
        if rng.random() < 0.25:                            # small variation
            i = int(rng.integers(len(degs)))
            degs[i] = (degs[i] + int(rng.choice([-1, 1]))) % 7
        m = Measure(number=b, time_sig=(4, 4) if b == 0 else None,
                    tempo=tempo if b == 0 else None, offset=Fraction(4 * b))
        chord_root = root - 24 + SCALE[prog[b % 4]]
        notes = [Note(chord_root, 4, 0)]                   # bass: root note
        off = Fraction(0)
        for deg, dur in zip(degs, rhythm):
            notes.append(Note(root + SCALE[deg], dur, off))
            off += Fraction(dur)
        m.append(notes)
        measures.append(m)
    return Score(title=title, parts=[Part(name='Piano', measures=measures)])


def make_corpus(out_dir, n_song, seed=0):
    from musicnlp_tpu.io.musicxml import write_musicxml
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_song):
        p = os.path.join(out_dir, f'anchor - song{i:04d}.musicxml')
        write_musicxml(make_song(rng, f'anchor - song{i:04d}'), p)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/anchor')
    ap.add_argument('--songs', type=int, default=1200)
    ap.add_argument('--epochs', type=int, default=120)
    ap.add_argument('--model-size', default='small')
    ap.add_argument('--max-length', type=int, default=1024)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--platform', default=None,
                    help="e.g. 'cpu' to keep a smoke run off the TPU")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
    from musicnlp_tpu.preprocess.music_export import (
        MusicExport, combine_saved_songs, json2dataset,
    )
    from musicnlp_tpu.postprocess.train_plot import summarize_run
    from musicnlp_tpu.trainer.metrics import IkrMetric
    from musicnlp_tpu.trainer.train import TrainArgs, Trainer, get_model_n_tokenizer

    out = args.out
    t0 = time.time()
    print(f'[1/4] synthesizing {args.songs}-song corpus...', flush=True)
    paths = make_corpus(os.path.join(out, 'corpus'), n_song=args.songs)

    print('[2/4] extracting...', flush=True)
    MusicExport(mode='full')(paths, output_dir=os.path.join(out, 'json'),
                             save_each=True, parallel=8, parallel_mode='thread')
    combined = combine_saved_songs(
        glob.glob(os.path.join(out, 'json', '*.json')),
        out_path=os.path.join(out, 'combined.json'))
    ds_paths = json2dataset(combined, os.path.join(out, 'dataset'),
                            test_frac=0.05, pitch_kind='midi')
    train_sd = SongDataset.load(ds_paths['train'])
    test_sd = SongDataset.load(ds_paths['test'])
    print(f'    {len(train_sd)} train / {len(test_sd)} test songs', flush=True)

    print('[3/4] training...', flush=True)
    model, tok = get_model_n_tokenizer(
        'transf-xl', args.model_size, pitch_kind='midi',
        max_length=args.max_length)
    train = AugmentedDataset(train_sd, tok, random_crop=True,
                             channel_mixup=True, dataset_split='train')
    test = AugmentedDataset(test_sd, tok, random_crop=False,
                            dataset_split='test')
    targs = TrainArgs.from_preset('transf-xl', args.model_size,
                                  num_train_epochs=args.epochs,
                                  batch_size=args.batch_size,
                                  logging_steps=20, save_total_limit=3)
    trainer = Trainer(model, tok, train, test, args=targs,
                      out_dir=os.path.join(out, 'model'))
    res = trainer.train()
    summ = summarize_run(trainer.log_path)
    print('    run summary:', json.dumps(summ, indent=2), flush=True)

    ikr = IkrMetric(tok)
    items = [test[i] for i in range(len(test))]
    ids = np.stack([it['input_ids'] for it in items])
    ks = np.stack([it['key_scores'] for it in items])
    # the reference's published ~0.95 POP909 anchor uses the MOST-CONFIDENT
    # key (reference metrics.py:239-244 reduce_kind='most-confident-key');
    # the vanilla (confidence-weighted) form matches the training-eval IKR
    gt_ikr = ikr.ground_truth_ikr(ids, ks)
    gt_ikr_best = ikr.ground_truth_ikr(ids, ks, best_key_only=True)

    result = dict(best_eval_loss=res['best_eval_loss'],
                  best_eval_ntp_acc=summ['best_eval_ntp_acc'],
                  best_eval_ikr=summ['best_eval_ikr'],
                  gt_ikr=float(gt_ikr), gt_ikr_best_key=float(gt_ikr_best),
                  n_songs=args.songs, model_size=args.model_size,
                  epochs=args.epochs, wall_s=round(time.time() - t0, 1))
    with open(os.path.join(out, 'anchor.json'), 'w') as f:
        json.dump(result, f, indent=2)
    print('[4/4] anchor:', json.dumps(result, indent=2), flush=True)


if __name__ == '__main__':
    main()
