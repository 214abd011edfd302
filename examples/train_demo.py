"""End-to-end demo: synthetic corpus -> export -> train -> generate -> render.

Runs the whole framework on whatever JAX device is available (the real TPU
chip under axon; CPU works too).  Produces artifacts under --out:
  corpus .musicxml files, extraction JSONs, columnar dataset, checkpoints,
  train_log.jsonl (+ curves png), and generated .mid/.mxl songs.

Usage: python examples/train_demo.py [--out demo_out] [--epochs 8]
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


def make_corpus(out_dir: str, n_song: int = 48, seed: int = 0):
    """Simple diatonic songs: I-IV-V-I progressions with melodies in C/G/F."""
    from musicnlp_tpu.io import Measure, Note, Part, Score
    from musicnlp_tpu.io.musicxml import write_musicxml

    rng = np.random.default_rng(seed)
    scale = [0, 2, 4, 5, 7, 9, 11]
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_song):
        root = int(rng.choice([60, 62, 65, 67]))
        measures = []
        n_bar = int(rng.integers(8, 17))
        for b in range(n_bar):
            chord_root = root - 12 + [0, 5, 7, 0][b % 4]
            m = Measure(number=b, time_sig=(4, 4) if b == 0 else None,
                        tempo=int(rng.choice([90, 120, 140])) if b == 0 else None,
                        offset=Fraction(4 * b))
            notes = [Note(chord_root - 12, 4, 0)]           # bass root
            off = 0
            while off < 4:
                dur = int(rng.choice([1, 1, 2]))
                dur = min(dur, 4 - off)
                deg = int(rng.integers(7))
                notes.append(Note(root + scale[deg], dur, off))
                off += dur
            m.append(notes)
            measures.append(m)
        p = os.path.join(out_dir, f'demo - song{i:03d}.musicxml')
        write_musicxml(Score(title=f'demo - song{i:03d}',
                             parts=[Part(name='Piano', measures=measures)]), p)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='demo_out')
    ap.add_argument('--epochs', type=int, default=8)
    ap.add_argument('--songs', type=int, default=48)
    ap.add_argument('--model-size', default='debug-large')
    ap.add_argument('--max-length', type=int, default=512)
    ap.add_argument('--platform', default=None,
                    help="e.g. 'cpu' to keep a smoke run off the TPU "
                         "(env vars cannot switch platforms on this box)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)

    from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
    from musicnlp_tpu.preprocess.music_export import (
        MusicExport, combine_saved_songs, json2dataset,
    )
    from musicnlp_tpu.postprocess.train_plot import plot_train_curves, summarize_run
    from musicnlp_tpu.trainer.eval import MusicGenerator
    from musicnlp_tpu.trainer.metrics import IkrMetric
    from musicnlp_tpu.trainer.train import TrainArgs, Trainer, get_model_n_tokenizer

    out = args.out
    t0 = time.time()
    print('[1/5] synthesizing corpus...')
    paths = make_corpus(os.path.join(out, 'corpus'), n_song=args.songs)

    print('[2/5] extracting...')
    MusicExport(mode='full')(paths, output_dir=os.path.join(out, 'json'),
                             save_each=True, parallel=4, parallel_mode='thread')
    combined = combine_saved_songs(
        glob.glob(os.path.join(out, 'json', '*.json')),
        out_path=os.path.join(out, 'combined.json'))
    ds_paths = json2dataset(combined, os.path.join(out, 'dataset'),
                            test_frac=0.1, pitch_kind='midi')
    train_sd = SongDataset.load(ds_paths['train'])
    test_sd = SongDataset.load(ds_paths['test'])
    print(f'    {len(train_sd)} train / {len(test_sd)} test songs')

    print('[3/5] training...')
    model, tok = get_model_n_tokenizer(
        'transf-xl', args.model_size, pitch_kind='midi',
        max_length=args.max_length)
    train = AugmentedDataset(train_sd, tok, random_crop=True,
                             channel_mixup=True, dataset_split='train')
    test = AugmentedDataset(test_sd, tok, random_crop=False,
                            dataset_split='test')
    targs = TrainArgs.from_preset('transf-xl', 'debug-large',
                                  num_train_epochs=args.epochs, batch_size=8,
                                  logging_steps=5)
    trainer = Trainer(model, tok, train, test, args=targs,
                      out_dir=os.path.join(out, 'model'))
    res = trainer.train()
    summ = summarize_run(trainer.log_path)
    print('    run summary:', json.dumps(summ, indent=2))
    plot_train_curves(trainer.log_path)

    # data-side sanity: ground-truth IKR of the corpus (reference anchor ~0.95)
    ikr = IkrMetric(tok)
    items = [test[i] for i in range(len(test))]
    gt_ikr = ikr.ground_truth_ikr(
        np.stack([it['input_ids'] for it in items]),
        np.stack([it['key_scores'] for it in items]))
    print(f'    ground-truth corpus IKR: {gt_ikr:.3f}')

    print('[4/5] generating...')
    gen = MusicGenerator(model, tok, res['params'],
                         out_dir=os.path.join(out, 'generated'))
    outs = gen(mode='unconditional', strategy='sample', n_song=2,
               max_length=min(256, args.max_length), top_k=8, seed=42)
    outs += gen(mode='conditional', strategy='greedy', save=True,
                max_length=min(256, args.max_length),
                prompt_args=dict(songs=[combined['music'][0]['score']], n_bar=4))
    for o in outs:
        print('    wrote', o.get('midi'), f"({o['text'].count('<bar>')} bars)")

    print('[5/5] done in %.1fs' % (time.time() - t0))
    print(json.dumps(dict(best_eval_loss=res['best_eval_loss'],
                          eval=summ, gt_ikr=float(gt_ikr)), indent=2))


if __name__ == '__main__':
    main()
