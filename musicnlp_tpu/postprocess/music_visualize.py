"""Dataset visualization: extraction-output distributions and reports.

Rebuild of the reference `MusicVisualize` (reference
musicnlp/postprocess/music_visualize.py:70-862): token-length / bar-count /
tuplet / duration / time-sig / tempo / key / pitch distributions, rare-token
ratios, warning-type distributions, token-coverage curves -- computed per
dataset with a cache, plots via matplotlib.

Design difference: statistics are computed into plain dicts/DataFrames first
(`.stats()` / `.dist(kind)`) and plotting is a thin optional layer on top, so
reports work headless and feed tests without a display.
"""
from __future__ import annotations

import json
import math
import os
from collections import Counter
from typing import Any, Dict, Iterable, List, Optional, Union

import numpy as np

from musicnlp_tpu.postprocess.music_stats import MusicStats
from musicnlp_tpu.vocab import MusicVocabulary, VocabType

__all__ = ['MusicVisualize']


class MusicVisualize:
    DISTS = ('token_length', 'bar_count', 'tuplet_count', 'song_duration',
             'time_sig', 'tempo', 'key', 'pitch', 'note_duration',
             'rare_ratio', 'warning')

    def __init__(self, songs: Union[List[Dict], str], dataset_name: str = None,
                 pitch_kind: str = 'midi'):
        """songs: list of extraction dicts ({'score', 'keys', 'warnings', ...})
        or a path to a combined JSON."""
        if isinstance(songs, str):
            with open(songs) as f:
                d = json.load(f)
            songs = d.get('music', d) if isinstance(d, dict) else d
        self.songs = songs
        self.dataset_name = dataset_name or 'dataset'
        self.stats_helper = MusicStats(pitch_kind=pitch_kind)
        self.vocab = self.stats_helper.vocab
        self._cache: Optional[Dict[str, Any]] = None

    # ------------------------------------------------------------------ data
    def stats(self) -> Dict[str, Any]:
        if self._cache is not None:
            return self._cache
        v = self.vocab
        token_length, bar_count, tuplet_count, durations = [], [], [], Counter()
        time_sigs, tempos, keys, pitches = Counter(), Counter(), Counter(), Counter()
        rare_ratio, song_duration, warnings = [], [], Counter()
        for s in self.songs:
            toks = s['score'].split()
            st = self.stats_helper.song_stats(toks)
            token_length.append(st['n_token'])
            bar_count.append(st['n_bar'])
            tuplet_count.append(st['n_tuplet'])
            rare_ratio.append(st['rare_ratio'])
            if s.get('duration') is not None:
                song_duration.append(s['duration'])
            tc = self.stats_helper.vocab_type_counts(toks, strict=False)
            time_sigs.update(tc.get('time_sig', {}))
            tempos.update(tc.get('tempo', {}))
            durations.update(tc.get('duration', {}))
            pitches.update(tc.get('pitch', {}))
            for k, conf in (s.get('keys') or {}).items():
                if conf:
                    keys[k] += 1
            for w in (s.get('warnings') or []):
                warnings[w.get('warn_name', w) if isinstance(w, dict) else w] += 1
        self._cache = dict(
            n_song=len(self.songs),
            token_length=np.array(token_length),
            bar_count=np.array(bar_count),
            tuplet_count=np.array(tuplet_count),
            song_duration=np.array(song_duration),
            rare_ratio=np.array(rare_ratio),
            time_sig=time_sigs, tempo=tempos, key=keys, pitch=pitches,
            note_duration=durations, warning=warnings,
        )
        return self._cache

    def dist(self, kind: str):
        assert kind in MusicVisualize.DISTS, f'unknown dist {kind!r}'
        if kind == 'warning':
            return self.stats()['warning']
        return self.stats()[kind]

    def token_coverage_curve(self, max_vocab: int = None):
        """Cumulative corpus coverage by token frequency rank
        (reference music_visualize.py 'token-coverage curves')."""
        c = Counter()
        for s in self.songs:
            c.update(s['score'].split())
        counts = np.sort(np.fromiter(c.values(), dtype=np.int64))[::-1]
        if max_vocab:
            counts = counts[:max_vocab]
        return np.cumsum(counts) / counts.sum()

    def report(self) -> Dict[str, Any]:
        """Compact scalar summary (the reference's dataset table rows)."""
        st = self.stats()
        def _c(x):
            return dict(mean=float(np.mean(x)), p50=float(np.median(x)),
                        max=int(np.max(x))) if len(x) else {}
        return dict(
            dataset=self.dataset_name, n_song=st['n_song'],
            token_length=_c(st['token_length']),
            bar_count=_c(st['bar_count']),
            rare_token_ratio=float(np.mean(st['rare_ratio'])) if len(st['rare_ratio']) else 0.0,
            top_time_sigs=st['time_sig'].most_common(3),
            top_tempos=st['tempo'].most_common(3),
            top_keys=st['key'].most_common(3),
            n_warning=sum(st['warning'].values()),
            warning_types=dict(st['warning']),
        )

    # ------------------------------------------------------------------ plots
    def plot(self, kind: str, out_path: str = None, bins: int = 40):
        """Render one distribution to PNG (headless-safe)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        data = self.dist(kind)
        fig, ax = plt.subplots(figsize=(6, 3.5))
        if isinstance(data, Counter):
            items = data.most_common(24)
            ax.bar([str(k) for k, _ in items], [v for _, v in items])
            ax.tick_params(axis='x', rotation=60, labelsize=7)
        else:
            ax.hist(data, bins=bins)
        ax.set_title(f'{self.dataset_name}: {kind}')
        fig.tight_layout()
        out_path = out_path or f'{self.dataset_name}_{kind}.png'
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path

    def plot_all(self, out_dir: str) -> List[str]:
        os.makedirs(out_dir, exist_ok=True)
        return [self.plot(k, os.path.join(out_dir, f'{k}.png'))
                for k in MusicVisualize.DISTS
                if (len(self.dist(k)) if not isinstance(self.dist(k), Counter)
                    else sum(self.dist(k).values()))]
