"""Profiling/tracing utilities.

TPU-native replacement for the reference's ad-hoc cProfile sprinkles
(`profile_runtime` calls in __main__ blocks, reference
musicnlp/preprocess/music_extractor.py:1263-1272, SURVEY.md §5): a
`jax.profiler` trace context producing TensorBoard-viewable device traces,
plus a lightweight wall-clock step timer for throughput accounting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

__all__ = ['device_trace', 'StepTimer', 'profile_fn']


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with tokens/sec accounting.

    Note: on async backends only synchronizing steps measure real device
    time -- call `mark(synced=True)` after a host sync (e.g. metric fetch).
    """

    def __init__(self):
        self.t0 = time.perf_counter()
        self.t_last = self.t0
        self.n_tokens = 0
        self.laps: List[float] = []

    def mark(self, n_tokens: int = 0) -> float:
        now = time.perf_counter()
        lap = now - self.t_last
        self.t_last = now
        self.n_tokens += n_tokens
        self.laps.append(lap)
        return lap

    @property
    def tokens_per_sec(self) -> float:
        dt = self.t_last - self.t0
        return self.n_tokens / dt if dt > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        if not self.laps:
            return dict(steps=0)
        laps = sorted(self.laps)
        n = len(laps)
        return dict(steps=n, tokens_per_sec=self.tokens_per_sec,
                    p50_step_s=laps[n // 2], p90_step_s=laps[int(n * 0.9)],
                    total_s=self.t_last - self.t0)


def profile_fn(fn, *args, sort_by: str = 'cumulative', top: int = 30) -> str:
    """cProfile a host-side function (the reference `profile_runtime`
    equivalent for extraction/tokenizer code paths)."""
    import cProfile
    import io
    import pstats
    pr = cProfile.Profile()
    pr.enable()
    fn(*args)
    pr.disable()
    buf = io.StringIO()
    pstats.Stats(pr, stream=buf).sort_stats(sort_by).print_stats(top)
    return buf.getvalue()
