"""Real-corpus training + generation evidence (round-4 verdict item 2).

The reference anchors its quality claims on real data: ~73% next-token
accuracy (reference musicnlp/trainer/eval.py:545), IKR ~0.95 on POP909
(reference trainer/metrics.py:239-244), and ~250 shipped generated MXLs
(reference generated-samples/).  40 real songs (80 .mid/.mxl) ship with the
reference in generated-samples/original/ -- this script trains on them and
compares generated continuations DISTRIBUTIONALLY against the reference's own
shipped 22-11 generations, scored by the same code path for both sides:

  extract   40 original .mxl -> step-kind token corpus -> train/test npz
  train     22-11 recipe (TF-XL, degree pitch, key-aug, proportional mixing)
            at --model-size {small,base}; reports eval NTP-acc + IKR
  generate  conditional 8-bar continuations of every original song (the
            reference's dominant setting: sample, #b=8, topk=8) + a set of
            unconditional songs; renders MXL/MIDI
  score     OUR generated MXLs and the reference's shipped 22-11 MXLs both go
            back through MusicExtractor + KeyFinder + MusicStats + IkrMetric;
            reports per-set stats and Jensen-Shannon distances between the
            duration / pitch-class / token-type distributions

Stages cache to --out; artifacts/real_corpus_eval.json gets the committed
summary.  TPU serialization: run only when no other TPU process is live.

Usage:
  python scripts/train_real.py --out /tmp/real --stage extract
  python scripts/train_real.py --out /tmp/real --stage train --model-size small
  python scripts/train_real.py --out /tmp/real --stage generate --model-size small
  python scripts/train_real.py --out /tmp/real --stage score
  python scripts/train_real.py --out /tmp/real            # all stages, small
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys
import time
from collections import Counter
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ORIGINALS = '/root/reference/generated-samples/original'
REF_GENERATED = ('/root/reference/generated-samples/'
                 '22-11_Transformer XL, degree-pitch')
ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'artifacts', 'real_corpus_eval.json')


# ------------------------------------------------------------------ extract
def stage_extract(out: str, test_frac: float = 0.25) -> dict:
    from musicnlp_tpu.preprocess.music_export import (
        MusicExport, combine_saved_songs, json2dataset,
    )
    paths = sorted(glob.glob(os.path.join(ORIGINALS, '*.mxl')))
    assert paths, f'no .mxl under {ORIGINALS}'
    print(f'[extract] {len(paths)} original songs', flush=True)
    jd = os.path.join(out, 'json')
    # step-kind (spelled) pitches: the degree-pitch 22-11 pipeline key-shifts
    # spelled pitches to scale degrees (PitchShift needs step, not midi)
    MusicExport(mode='full', extractor_args=dict(with_pitch_step=True))(
        paths, output_dir=jd, save_each=True, halt_on_error=False)
    combined = combine_saved_songs(
        sorted(glob.glob(os.path.join(jd, '*.json'))),
        out_path=os.path.join(out, 'combined.json'))
    # test_frac 0.25 -> 10 held-out songs of the 40: a 4-song eval split
    # (the round-4 default) makes best_eval_* noise-dominated
    ds = json2dataset(combined, os.path.join(out, 'dataset'),
                      test_frac=test_frac, pitch_kind='step')
    print(f'[extract] dataset: {ds}', flush=True)
    return ds


# ---------------------------------------------------------------- tokenizer
def _tag(model_size: str, scheme: str) -> str:
    """Model/generated dir tag: 'base', 'small_pairmerge', ..."""
    return model_size if scheme == 'vanilla' else f'{model_size}_{scheme}'


def stage_tokenizer(out: str, scheme: str, coverage: float = 0.95,
                    wp_vocab: int = 4096) -> str:
    # wp_vocab must exceed 2 * base vocab (2380 for degree kind): every base
    # token exists in word-initial and continuing form before any merge
    """Train a learned tokenizer on the real corpus (degree pitch, key-
    augmented copies -- the reference's deployment flow,
    reference wordpiece_tokenizer.py:246-336, pair_merge_tokenizer.py:41-153)."""
    from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTrainer

    assert scheme in ('pairmerge', 'wordpiece'), scheme
    with open(os.path.join(out, 'combined.json')) as f:
        songs = json.load(f)['music']
    corpus = list(WordPieceMusicTrainer.key_augmented_corpus(songs))
    path = os.path.join(out, f'tokenizer_{scheme}.json')
    if scheme == 'pairmerge':
        from musicnlp_tpu.trainer.pair_merge_tokenizer import (
            PairMergeTokenizerTrainer,
        )
        tok = PairMergeTokenizerTrainer(pitch_kind='degree', mode='full')(
            corpus, coverage_ratio=coverage, save=path)
    else:
        tok = WordPieceMusicTrainer(pitch_kind='degree')(
            corpus, vocab_size=wp_vocab, save=path)
    n_exact = sum(tok.decode(tok.encode(c)) == c for c in corpus[:16])
    print(f'[tokenizer] {scheme}: vocab {tok.vocab_size} '
          f'({len(corpus)} key-augmented songs), roundtrip-exact '
          f'{n_exact}/16 -> {path}', flush=True)
    assert n_exact == min(16, len(corpus)), 'learned tokenizer roundtrip broke'
    return path


# -------------------------------------------------------------------- train
def stage_train(out: str, model_size: str, epochs: int, batch_size: int,
                seed: int = 0, resume_from: str | None = None,
                save_every: int = 1, scheme: str = 'vanilla') -> dict:
    from musicnlp_tpu.postprocess.train_plot import summarize_run
    from musicnlp_tpu.preprocess.dataset import SongDataset
    from musicnlp_tpu.trainer.train import setup_recipe

    train_sd = SongDataset.load(os.path.join(out, 'dataset', 'train.npz'))
    test_sd = SongDataset.load(os.path.join(out, 'dataset', 'test.npz'))
    tag = _tag(model_size, scheme)
    run_dir = os.path.join(out, f'model_{tag}')
    print(f'[train] {tag}: {len(train_sd)} train / {len(test_sd)} test '
          f'songs, {epochs} epochs, bsz {batch_size}', flush=True)
    if scheme == 'vanilla':
        trainer = setup_recipe(
            '22-11', [train_sd], eval_datasets=test_sd, out_dir=run_dir,
            overrides=dict(model_size=model_size),
            train_args=dict(num_train_epochs=epochs, batch_size=batch_size,
                            logging_steps=50, seed=seed, save_total_limit=3,
                            save_every=save_every))
    else:
        # learned-tokenizer leg: merged ids need the STRING pipeline (the
        # id-space AugmentedDataset only represents base-vocab ids); model
        # shape/augmentations otherwise mirror the 22-11 recipe
        from musicnlp_tpu.preprocess.dataset import (
            StringAugmentedDataset, songdataset_to_dicts,
        )
        from musicnlp_tpu.trainer.train import (
            TrainArgs, Trainer, get_model_n_tokenizer,
        )
        model, tok = get_model_n_tokenizer(
            'transf-xl', model_size, max_length=1024,
            model_config=dict(mem_len=512), tokenizer_scheme=scheme,
            tokenizer_path=os.path.join(out, f'tokenizer_{scheme}.json'))
        aug = dict(insert_key=True, pitch_shift=True, channel_mixup=True)
        train_ds = StringAugmentedDataset(
            songdataset_to_dicts(train_sd), tok, random_crop=True,
            dataset_split='train', **aug)
        eval_ds = StringAugmentedDataset(
            songdataset_to_dicts(test_sd), tok, random_crop=False,
            dataset_split='test', **aug)
        targs = TrainArgs.from_preset(
            'transf-xl', model_size, num_train_epochs=epochs,
            batch_size=batch_size, weight_decay=0.1, logging_steps=50,
            seed=seed, save_total_limit=3, save_every=save_every)
        trainer = Trainer(model, tok, train_ds, eval_ds, args=targs,
                          out_dir=run_dir, ikr_mode='ins-key')
    t0 = time.time()
    res = trainer.train(resume_from=resume_from)
    summ = summarize_run(trainer.log_path)
    rec = dict(model_size=model_size, tokenizer_scheme=scheme, epochs=epochs,
               batch_size=batch_size,
               n_train_songs=len(train_sd), n_test_songs=len(test_sd),
               best_eval_loss=float(res['best_eval_loss']),
               best_eval_ntp_acc=summ.get('best_eval_ntp_acc'),
               best_eval_ikr=summ.get('best_eval_ikr'),
               wall_s=round(time.time() - t0, 1), run_dir=run_dir)
    with open(os.path.join(run_dir, 'train_summary.json'), 'w') as f:
        json.dump(rec, f, indent=2)
    print('[train] summary:', json.dumps(rec, indent=2), flush=True)
    return rec


# ----------------------------------------------------------------- generate
def stage_generate(out: str, tag: str, n_uncond: int = 16,
                   n_per_song: int = 3, top_k: int = 8, n_bar: int = 8,
                   seed: int = 0, max_length: int = 1024) -> dict:
    """Conditional continuations of every original song (sample, #b=8, topk=8
    -- the reference's dominant shipped setting) + unconditional songs."""
    from musicnlp_tpu.trainer.eval import MusicGenerator, load_trained

    run_dir = os.path.join(out, f'model_{tag}')
    model, params, tok = load_trained(run_dir)
    gen_dir = os.path.join(out, f'generated_{tag}')
    gen = MusicGenerator(model, tok, params, augment_key=True,
                         out_dir=gen_dir)

    with open(os.path.join(out, 'combined.json')) as f:
        songs = json.load(f)['music']
    rng = np.random.default_rng(seed)

    # conditional: n_per_song continuations per original song
    prompts, metas = [], []
    for s in songs:
        try:
            p = gen.conditional_prompt(s['score'], n_bar=n_bar,
                                       key=s.get('keys'), key_sample='max')
        except Exception as e:           # a song shorter than n_bar bars etc.
            print(f"[generate] prompt skip {s.get('title')}: {e}", flush=True)
            continue
        for j in range(n_per_song):
            prompts.append(p)
            metas.append(dict(mode='conditional', title=s.get('title'),
                              n_bar=n_bar, sample_idx=j))
    # unconditional: corpus-mode time-sig/tempo, corpus-sampled keys
    keys_pool = []
    for s in songs:
        ks = s.get('keys') or {}
        if ks:
            keys_pool.append(max(ks, key=ks.get))
    for j in range(n_uncond):
        key = keys_pool[int(rng.integers(len(keys_pool)))]
        prompts.append(gen.unconditional_prompt(time_sig=(4, 4), tempo=120,
                                                key=key))
        metas.append(dict(mode='unconditional', key=key, sample_idx=j))

    print(f'[generate] {len(prompts)} prompts '
          f'({len(prompts) - n_uncond} conditional + {n_uncond} uncond), '
          f'sample top_k={top_k}', flush=True)
    t0 = time.time()
    texts = gen.generate(prompts, strategy='sample', top_k=top_k, seed=seed,
                         max_length=max_length)
    dt = time.time() - t0
    print(f'[generate] {len(texts)} songs in {dt:.1f}s '
          f'({sum(len(t.split()) for t in texts)} tokens)', flush=True)

    from musicnlp_tpu.trainer.eval import (
        repair_bar_durations, repair_generated, truncate_last_bar,
    )
    os.makedirs(gen_dir, exist_ok=True)
    # decode(encode(text)) exactness -- for learned tokenizers (merged ids)
    # this certifies the unit table round-trips the model's own output
    # distribution, not just the train corpus.  Raw samples may violate the
    # song grammar (unsegmentable into elements), so exactness is asserted on
    # the grammar-repaired text; the raw-text rate is recorded alongside.
    learned = type(tok).__name__ != 'MusicTokenizer'

    def _roundtrips(t: str) -> bool:
        try:
            return tok.decode(tok.encode(t)) == t
        except Exception:
            return False

    n_rt_raw = sum(_roundtrips(t) for t in texts)
    n_render_fail = n_raw_valid = n_rt_rep = 0
    for i, (text, meta) in enumerate(zip(texts, metas)):
        text = truncate_last_bar(text, gen.vocab)
        text = repair_generated(text, gen.vocab)
        filled = repair_bar_durations(text, gen.vocab)
        raw_valid = filled == text
        n_raw_valid += raw_valid
        n_rt_rep += _roundtrips(filled)
        rec = dict(meta, text=filled, raw_text=text,
                   bar_durations_valid=raw_valid, prompt=prompts[i])
        stem = f'real_{tag}_{i:03d}'
        try:
            score = gen.converter.str2score(filled, pitch_kind=tok.pitch_kind,
                                            title=stem)
            score.write_mxl(os.path.join(gen_dir, f'{stem}.mxl'))
            score.write_midi(os.path.join(gen_dir, f'{stem}.mid'))
        except Exception as e:
            n_render_fail += 1
            rec['render_error'] = f'{type(e).__name__}: {e}'
        with open(os.path.join(gen_dir, f'{stem}.json'), 'w') as f:
            json.dump(rec, f)
    if learned:
        assert n_rt_rep == len(texts), (
            f'learned tokenizer roundtrip broke on {len(texts) - n_rt_rep} '
            f'repaired generated songs')
    rec = dict(n_generated=len(texts), n_render_fail=n_render_fail,
               n_raw_bar_valid=n_raw_valid,
               raw_bar_valid_ratio=round(n_raw_valid / max(len(texts), 1), 4),
               roundtrip_exact_repaired=n_rt_rep,
               roundtrip_exact_raw=n_rt_raw,
               gen_seconds=round(dt, 1), top_k=top_k, n_bar=n_bar,
               max_length=max_length, gen_dir=gen_dir)
    with open(os.path.join(gen_dir, 'generate_summary.json'), 'w') as f:
        json.dump(rec, f, indent=2)
    print('[generate]', json.dumps(rec), flush=True)
    return rec


# ----------------------------------------------------------------- rerender
def stage_rerender(out: str, tag: str) -> dict:
    """Re-render MXL/MIDI from the texts saved by an earlier generate stage,
    re-applying the current repair chain (CPU-only; no model needed).  Used
    to refresh renders after repair/render fixes without re-sampling."""
    from musicnlp_tpu.preprocess.music_converter import MusicConverter
    from musicnlp_tpu.trainer.eval import repair_bar_durations
    from musicnlp_tpu.vocab import MusicVocabulary

    gen_dir = os.path.join(out, f'generated_{tag}')
    v = MusicVocabulary(pitch_kind='degree')
    mc = MusicConverter(mode='full')
    paths = sorted(glob.glob(os.path.join(gen_dir,
                                          f'real_{tag}_*.json')))
    n_render_fail = n_raw_valid = n = 0
    for p in paths:
        with open(p) as f:
            rec = json.load(f)
        if 'text' not in rec:
            continue
        n += 1
        raw = rec.get('raw_text', rec['text'])
        filled = repair_bar_durations(raw, v)
        raw_valid = filled == raw
        n_raw_valid += raw_valid
        rec.update(text=filled, raw_text=raw, bar_durations_valid=raw_valid)
        rec.pop('render_error', None)
        stem = os.path.basename(p)[:-5]
        try:
            score = mc.str2score(filled, pitch_kind='degree', title=stem)
            score.write_mxl(os.path.join(gen_dir, f'{stem}.mxl'))
            score.write_midi(os.path.join(gen_dir, f'{stem}.mid'))
        except Exception as e:
            n_render_fail += 1
            rec['render_error'] = f'{type(e).__name__}: {e}'
        with open(p, 'w') as f:
            json.dump(rec, f)
    # drop the stale extraction cache so a following score stage re-extracts
    import shutil
    shutil.rmtree(os.path.join(out, f'our_gen_json_{tag}'),
                  ignore_errors=True)
    gs = os.path.join(gen_dir, 'generate_summary.json')
    summ = {}
    if os.path.exists(gs):
        with open(gs) as f:
            summ = json.load(f)
    summ.update(n_generated=n, n_render_fail=n_render_fail,
                n_raw_bar_valid=n_raw_valid,
                raw_bar_valid_ratio=round(n_raw_valid / max(n, 1), 4))
    with open(gs, 'w') as f:
        json.dump(summ, f, indent=2)
    print('[rerender]', json.dumps(summ), flush=True)
    return summ


# -------------------------------------------------------------------- score
def _extract_set(paths, out_json_dir) -> tuple:
    """MXL files -> extraction records (step-kind score + KeyFinder keys),
    cached per file; the SAME scoring entry for ours and the reference's.

    Returns (records, n_attempted).  Files whose bars fail extraction
    validation (e.g. a generated bar whose durations overflow the time
    signature) are counted but not scored -- the extract-ok ratio is itself
    a well-formedness metric, applied symmetrically to both sets."""
    from musicnlp_tpu.preprocess.music_export import MusicExport
    MusicExport(mode='full', extractor_args=dict(with_pitch_step=True))(
        paths, output_dir=out_json_dir, save_each=True, halt_on_error=False)
    recs = []
    for p in sorted(glob.glob(os.path.join(out_json_dir, '*.json'))):
        with open(p) as f:
            r = json.load(f)
        if 'score' in r:
            recs.append(r)
    return recs, len(paths)


def _score_records(recs) -> dict:
    """Shared scorer: token-type / duration / pitch-class distributions,
    per-song stats, and IKR (vanilla + most-confident-key, the reference's
    published reduce_kind -- reference metrics.py:239-244)."""
    from musicnlp_tpu.postprocess.music_stats import MusicStats
    from musicnlp_tpu.trainer.metrics import IkrMetric
    from musicnlp_tpu.vocab import MusicTokenizer, N_KEY, key_str2ordinal

    ms = MusicStats(pitch_kind='step')
    tok = MusicTokenizer(pitch_kind='step')
    ikr = IkrMetric(tok)

    type_counts: Counter = Counter()
    dur_counts: Counter = Counter()
    pc_dur: Counter = Counter()
    per_song = []
    ids_list, ks_list = [], []
    for r in recs:
        toks = r['score'].split()
        tc = ms.vocab_type_counts(toks, strict=False)
        for typ, c in tc.items():
            type_counts[typ] += sum(c.values())
            if typ == 'duration':
                dur_counts.update(c)
        for p, d in ms.weighted_pitch_counts(toks).items():
            pc_dur[p % 12] += float(d)
        per_song.append(ms.song_stats(toks))
        ids = np.asarray(tok.encode(r['score']), np.int32)
        ks = np.full(N_KEY, -1.0, np.float32)
        for k, v in (r.get('keys') or {}).items():
            ks[key_str2ordinal[k]] = v
        ids_list.append(ids)
        ks_list.append(ks)

    L = max(len(i) for i in ids_list)
    ids_mat = np.full((len(ids_list), L), tok.pad_token_id, np.int32)
    for i, v in enumerate(ids_list):
        ids_mat[i, :len(v)] = v
    ks_mat = np.stack(ks_list)
    gt_ikr = float(ikr.ground_truth_ikr(ids_mat, ks_mat))
    gt_ikr_best = float(ikr.ground_truth_ikr(ids_mat, ks_mat,
                                             best_key_only=True))
    # per-song spread: the aggregate IKR on a small set can hide a bimodal
    # population (a few atonal songs under high-IKR filler)
    song_ikr = np.array([ikr.ground_truth_ikr(ids_mat[i:i + 1], ks_mat[i:i + 1],
                                              best_key_only=True)
                         for i in range(len(ids_list))])
    qs = np.percentile(song_ikr, [0, 25, 50, 75, 100]) if len(song_ikr) else \
        np.zeros(5)
    ikr_spread = dict(mean=round(float(song_ikr.mean()), 4),
                      std=round(float(song_ikr.std()), 4),
                      min=round(float(qs[0]), 4), p25=round(float(qs[1]), 4),
                      median=round(float(qs[2]), 4), p75=round(float(qs[3]), 4),
                      max=round(float(qs[4]), 4))

    n = max(len(per_song), 1)
    return dict(
        n_songs=len(recs),
        ikr=gt_ikr, ikr_best_key=gt_ikr_best,
        ikr_best_key_per_song=ikr_spread,
        mean_bars=sum(s['n_bar'] for s in per_song) / n,
        mean_tokens=sum(s['n_token'] for s in per_song) / n,
        tuplet_per_song=sum(s['n_tuplet'] for s in per_song) / n,
        rare_ratio=sum(s['rare_ratio'] for s in per_song) / n,
        type_counts={k: int(v) for k, v in sorted(type_counts.items())},
        dur_hist={str(k): int(v) for k, v in sorted(
            dur_counts.items(), key=lambda kv: float(Fraction(str(kv[0]))))},
        pc_hist={str(k): round(float(v), 3) for k, v in sorted(pc_dur.items())},
    )


from musicnlp_tpu.utils.seq_metrics import js_divergence as _js_div  # noqa: E402


def stage_score(out: str, model_sizes) -> dict:
    ref_paths = sorted(glob.glob(os.path.join(REF_GENERATED, '*.mxl')))
    print(f'[score] extracting {len(ref_paths)} reference generations...',
          flush=True)
    ref_recs, n_ref = _extract_set(ref_paths, os.path.join(out, 'ref_gen_json'))
    ref_stats = _score_records(ref_recs)
    ref_stats['extract_ok_ratio'] = round(len(ref_recs) / max(n_ref, 1), 4)
    print(f'[score] reference set: {ref_stats["n_songs"]}/{n_ref} extracted, '
          f'IKR {ref_stats["ikr"]:.3f}/{ref_stats["ikr_best_key"]:.3f}',
          flush=True)

    # Merge into the committed artifact: model entries scored in earlier
    # sessions survive when their /tmp generations no longer exist.
    result = dict(reference=ref_stats, models={})
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            prev = json.load(f)
        result['models'].update(prev.get('models', {}))
    for size in model_sizes:
        gen_dir = os.path.join(out, f'generated_{size}')
        our_paths = sorted(glob.glob(os.path.join(gen_dir, '*.mxl')))
        if not our_paths:
            print(f'[score] no generations for {size}, skipping', flush=True)
            continue
        our_recs, n_our = _extract_set(
            our_paths, os.path.join(out, f'our_gen_json_{size}'))
        our = _score_records(our_recs)
        our['extract_ok_ratio'] = round(len(our_recs) / max(n_our, 1), 4)
        js = dict(duration=_js_div(our['dur_hist'], ref_stats['dur_hist']),
                  pitch_class=_js_div(our['pc_hist'], ref_stats['pc_hist']),
                  token_type=_js_div(our['type_counts'],
                                     ref_stats['type_counts']))
        tr_summ = {}
        ts = os.path.join(out, f'model_{size}', 'train_summary.json')
        if os.path.exists(ts):
            with open(ts) as f:
                tr_summ = json.load(f)
        gs = os.path.join(gen_dir, 'generate_summary.json')
        gen_summ = {}
        if os.path.exists(gs):
            with open(gs) as f:
                gen_summ = json.load(f)
        # Re-scoring a size whose /tmp train/generate summaries are gone
        # (score-only rerun in a later session) must not clobber the good
        # records already in the committed artifact -- but flag the fallback
        # so a mixed-session record is distinguishable from a same-run one.
        prev_entry = result['models'].get(size, {})
        entry = dict(
            train=tr_summ or prev_entry.get('train', {}),
            generate=gen_summ or prev_entry.get('generate', {}), stats=our,
            js_divergence_vs_reference={k: round(v, 4) for k, v in js.items()},
            scored_at=time.strftime('%Y-%m-%dT%H:%M:%S'))
        if not tr_summ and prev_entry.get('train'):
            entry['train_summary_from'] = 'prior_artifact'
        if not gen_summ and prev_entry.get('generate'):
            entry['generate_summary_from'] = 'prior_artifact'
        result['models'][size] = entry
        print(f'[score] {size}: IKR {our["ikr"]:.3f}/{our["ikr_best_key"]:.3f} '
              f'JS(dur/pc/type) = {js["duration"]:.3f}/{js["pitch_class"]:.3f}'
              f'/{js["token_type"]:.3f}', flush=True)

    os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
    with open(ARTIFACT, 'w') as f:
        json.dump(result, f, indent=2)
    print(f'[score] wrote {ARTIFACT}', flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='/tmp/real')
    ap.add_argument('--stage', default='all',
                    choices=['all', 'extract', 'tokenizer', 'train',
                             'generate', 'rerender', 'score'])
    ap.add_argument('--model-size', default='small')
    ap.add_argument('--tokenizer', default='vanilla',
                    choices=['vanilla', 'pairmerge', 'wordpiece'],
                    help='learned tokenizers run the string pipeline and tag '
                         "the artifact entry (e.g. 'small_pairmerge')")
    ap.add_argument('--test-frac', type=float, default=0.25,
                    help='held-out fraction at extract time (0.25 -> 10/40 '
                         'songs; the round-4 4-song split was noise-dominated)')
    ap.add_argument('--epochs', type=int, default=256)
    ap.add_argument('--batch-size', type=int, default=18)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--save-every', type=int, default=1,
                    help='checkpoint every N epochs (tunneled device_get of a'
                         ' base-size pytree costs ~50 s; 16 keeps a 256-epoch'
                         ' run tractable)')
    ap.add_argument('--resume-from', default=None,
                    help='epoch checkpoint dir to resume the train stage from'
                         ' (crash recovery)')
    ap.add_argument('--platform', default=None,
                    help="e.g. 'cpu' to keep a smoke run off the TPU")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update('jax_platforms', args.platform)
    os.makedirs(args.out, exist_ok=True)

    tag = _tag(args.model_size, args.tokenizer)
    if args.stage == 'tokenizer' and args.tokenizer == 'vanilla':
        ap.error("--stage tokenizer requires --tokenizer pairmerge|wordpiece "
                 "(the vanilla scheme has no tokenizer to train)")
    if args.stage in ('all', 'extract'):
        stage_extract(args.out, test_frac=args.test_frac)
    if (args.stage == 'tokenizer'
            or (args.stage == 'all' and args.tokenizer != 'vanilla')):
        stage_tokenizer(args.out, args.tokenizer)
    if args.stage in ('all', 'train'):
        stage_train(args.out, args.model_size, args.epochs, args.batch_size,
                    seed=args.seed, resume_from=args.resume_from,
                    save_every=args.save_every, scheme=args.tokenizer)
    if args.stage in ('all', 'generate'):
        stage_generate(args.out, tag, seed=args.seed)
    if args.stage == 'rerender':
        stage_rerender(args.out, tag)
    if args.stage in ('all', 'score'):
        tags = [tag] if args.stage != 'score' else \
            [d.split('_', 1)[1] for d in sorted(os.listdir(args.out))
             if d.startswith('generated_')]
        stage_score(args.out, tags or [tag])


if __name__ == '__main__':
    main()
