"""Batch extraction driver: corpora -> per-song JSON shards -> columnar dataset.

Rebuild of the reference `MusicExport` (reference musicnlp/preprocess/music_export.py:87-369):
file list or dataset name -> per-song JSON (`save_each`) or one combined JSON
(:102-211), parallel extraction with process/thread pools (:126-189),
resume-by-skipping-existing outputs (:53-56), per-song error isolation with
`halt_on_error` (:68-73), `combine_saved_songs` (:213-250), and
`json2dataset` (:252-369) materializing the training dataset with a
train/test split (fractional, or pre-determined per-title).

TPU-native difference: `json2dataset` materializes the COLUMNAR store
(preprocess/dataset.py `SongDataset` npz: int32 id arrays + bar offsets +
24-dim key scores) instead of a HF string dataset -- the training input
pipeline then never touches Python strings (SURVEY.md §7 steps 3-4).
"""
from __future__ import annotations

import glob
import json
import os
import re
import time
import traceback
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
from musicnlp_tpu.utils.config import SEED, sconfig, u

__all__ = ['SingleExport', 'MusicExport', 'combine_saved_songs', 'json2dataset']


def _safe_stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


@dataclass
class SingleExport:
    """Per-file extraction job (reference music_export.py:23-85); must be a
    top-level picklable callable for process pools."""
    extractor_args: Dict[str, Any] = field(default_factory=dict)
    output_dir: Optional[str] = None          # save-each mode when set
    halt_on_error: bool = True
    fast_midi: bool = False                   # native C++ kernel for .mid files

    def __call__(self, path: str) -> Optional[Dict[str, Any]]:
        out_path = None
        if self.output_dir:
            out_path = os.path.join(self.output_dir, f'{_safe_stem(path)}.json')
            if os.path.exists(out_path):      # resume (reference :53-56)
                return None
        try:
            rec = None
            if self.fast_midi and path.lower().endswith(('.mid', '.midi')):
                from musicnlp_tpu.preprocess.fast_extractor import (
                    FastMidiExtractor, fast_extract_available,
                )
                if fast_extract_available():
                    fx = FastMidiExtractor(
                        precision=self.extractor_args.get('precision', 5),
                        mode=self.extractor_args.get('mode', 'full'))
                    rec = dict(fx.extract_with_meta(path), song_path=path)
            if rec is None:
                extractor = MusicExtractor(**self.extractor_args)
                d = extractor(path, exp='str_join', return_meta=True,
                              return_key=True)
                rec = dict(score=d.score, title=d.title, duration=d.duration,
                           keys=d.keys, warnings=d.warnings, song_path=path)
        except Exception as e:
            if self.halt_on_error:
                raise
            return dict(error=f'{type(e).__name__}: {e}', song_path=path,
                        traceback=traceback.format_exc())
        if out_path:
            with open(out_path, 'w') as f:
                json.dump(rec, f)
            # distinct from the resume-skip None so the driver's n_done /
            # n_skipped counts are truthful
            return dict(saved=out_path)
        return rec


class MusicExport:
    """Batch driver with parallel modes + resume."""

    def __init__(self, mode: str = 'full', extractor_args: Dict = None,
                 verbose: Union[bool, str] = True):
        self.mode = mode
        self.extractor_args = dict(mode=mode, verbose=False,
                                   **(extractor_args or {}))
        self.verbose = verbose

    def __call__(
            self, songs: Union[str, Sequence[str]], output_dir: str = None,
            save_each: bool = True, parallel: Union[bool, int] = False,
            parallel_mode: str = 'process', halt_on_error: bool = None,
            subset: Optional[Tuple[int, int]] = None, fast_midi: bool = False,
    ) -> Dict[str, Any]:
        """songs: dataset name (registry) or explicit file list.

        Returns dict(n_done, n_skipped, errors, songs?) -- `songs` only when
        save_each=False (combined in memory).
        """
        if isinstance(songs, str):
            d = sconfig(f'datasets.{songs}')
            pattern = os.path.join(u.converted_dir(songs), '**', d['song_fmt'])
            paths = sorted(glob.glob(pattern, recursive=True))
        else:
            paths = list(songs)
        if subset:
            paths = paths[subset[0]:subset[1]]
        assert paths, 'no songs to export'
        if halt_on_error is None:
            halt_on_error = not parallel   # reference :68-73
        if save_each:
            assert output_dir, 'save_each needs an output_dir'
            os.makedirs(output_dir, exist_ok=True)

        job = SingleExport(extractor_args=self.extractor_args,
                           output_dir=output_dir if save_each else None,
                           halt_on_error=halt_on_error, fast_midi=fast_midi)
        t0 = time.time()
        results: List[Optional[Dict]] = []
        if parallel:
            n_worker = (os.cpu_count() or 4) if parallel is True else int(parallel)
            pool_cls = (ProcessPoolExecutor if parallel_mode == 'process'
                        else ThreadPoolExecutor)
            with pool_cls(max_workers=n_worker) as ex:
                futs = {ex.submit(job, p): p for p in paths}
                for fut in as_completed(futs):
                    results.append(fut.result())
        else:
            for p in paths:
                results.append(job(p))

        errors = [r for r in results if r and 'error' in r]
        done = [r for r in results if r and 'error' not in r]
        # a None result = output already existed (resume-by-skip, :53-56)
        n_skip = sum(1 for r in results if r is None)
        out = dict(
            n_total=len(paths), n_error=len(errors), errors=errors,
            seconds=round(time.time() - t0, 2))
        if save_each:
            out['n_skipped'] = n_skip
            out['n_done'] = len(paths) - len(errors) - n_skip
        else:
            out['songs'] = done
        return out


def combine_saved_songs(json_paths: Sequence[str], out_path: str = None,
                        extractor_meta: Dict = None) -> Dict[str, Any]:
    """Merge per-song JSON shards into one combined file
    (reference music_export.py:213-250)."""
    songs = []
    for p in sorted(json_paths):
        with open(p) as f:
            d = json.load(f)
        # keep only actual song records: error shards have 'error', and a
        # directory glob can pick up a previously written combined file
        # (music/n_song keys) -- silently ingesting it would nest a whole
        # corpus as one "song" and crash json2dataset later
        if 'error' not in d and 'score' in d:
            songs.append(d)
    combined = dict(music=songs, n_song=len(songs),
                    extractor_meta=extractor_meta or {})
    if out_path:
        os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
        with open(out_path, 'w') as f:
            json.dump(combined, f)
    return combined


def json2dataset(
        songs_or_combined: Union[Dict, List[Dict]], out_dir: str,
        test_frac: float = 0.02, split_map: Dict[str, str] = None,
        pitch_kind: str = 'step', seed: int = SEED,
) -> Dict[str, str]:
    """Songs -> columnar SongDataset npz with train/test split
    (reference music_export.py:252-369).

    split_map: optional title -> 'train'|'test' pre-determined split
    (MAESTRO/NES-MDB style, reference util/music.py:207-315); otherwise a
    seeded fractional split.
    """
    from musicnlp_tpu.preprocess.dataset import SongDataset
    from musicnlp_tpu.vocab import MusicVocabulary

    songs = (songs_or_combined.get('music')
             if isinstance(songs_or_combined, dict) else songs_or_combined)
    vocab = MusicVocabulary(pitch_kind=pitch_kind)
    # Corpora extracted the reference way are STEP-kind (spelled pitches,
    # p_<idx>/<oct>_<step>).  A midi materialization remaps them here --
    # key-independent, same table AugmentedDataset uses at load.  A degree
    # materialization is key-DEPENDENT (one id per key x pitch) and belongs
    # at train time, so asking for it on a step corpus is an error.
    step_pitch = re.compile(r'p_-?\d+/-?\d+_')
    if pitch_kind != 'step' and songs \
            and any(step_pitch.match(t) for t in songs[0]['score'].split()):
        if pitch_kind == 'degree':
            raise ValueError(
                "a step-kind corpus cannot materialize as 'degree' (degree "
                "pitch ids depend on the sampled key): materialize as 'step' "
                "and train with a degree tokenizer + key insertion "
                "(CLI: train --pitch-kind degree --insert-key)")
        from musicnlp_tpu.preprocess.transform import ToMidiPitch
        remap = ToMidiPitch(vocab=MusicVocabulary(pitch_kind='step'))
        songs = [dict(s, score=remap(s['score'])) for s in songs]
    if split_map:
        tr = [s for s in songs if split_map.get(s.get('title'), 'train') == 'train']
        te = [s for s in songs if split_map.get(s.get('title')) == 'test']
    else:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(songs))
        n_test = max(1, int(len(songs) * test_frac)) if len(songs) > 1 else 0
        test_idx = set(order[:n_test].tolist())
        tr = [s for i, s in enumerate(songs) if i not in test_idx]
        te = [s for i, s in enumerate(songs) if i in test_idx]
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for split, subset in (('train', tr), ('test', te)):
        if not subset:
            continue
        ds = SongDataset.from_songs(subset, vocab=vocab)
        p = os.path.join(out_dir, f'{split}.npz')
        ds.save(p)
        paths[split] = p
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(dict(n_train=len(tr), n_test=len(te), pitch_kind=pitch_kind,
                       seed=seed), f, indent=2)
    return paths
