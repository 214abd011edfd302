"""Training RNG keys.

Dropout masks dominate the RNG cost of a train step: at base/1024 the three
per-layer masks cover ~62M elements/step, and JAX's default threefry2x32
generator computes them in software on the VPU -- measured 62 ms/step (21%!)
of the whole fused train step on v5e.  The `rbg` implementation lowers to the
TPU's hardware `RngBitGenerator` instruction instead and is effectively free.

`train_key` returns an rbg-implementation typed key; everything downstream
(`jax.random.split`, `bernoulli`, fold_in) works unchanged.  Quality: rbg is
not a cryptographic or splittable-counter PRNG, but dropout masks only need
statistical independence, which it provides (the reference uses torch's
Philox the same way).  Sampling/init paths keep the default threefry keys.
"""
from __future__ import annotations

import jax

__all__ = ['train_key']


def train_key(seed: int):
    """A PRNG key for train-step dropout: hardware-RNG backed where available."""
    try:
        return jax.random.key(seed, impl='rbg')
    except Exception:      # pragma: no cover - ancient jax or exotic backend
        return jax.random.PRNGKey(seed)
