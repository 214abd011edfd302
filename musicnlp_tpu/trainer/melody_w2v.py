"""Pitch embeddings over the time-slot melody representation.

Rebuild of the reference's obsolete word2vec exploration (reference
musicnlp/trainer/melody_w2v.py:19-82 `PitchEmbeddingModel`: gensim Word2Vec,
skip-gram / hierarchical-softmax over `MelodyLoader` id sequences,
vector_size=64, window=10).

TPU-native design: gensim's C hot loop is replaced by a jitted JAX skip-gram
with NEGATIVE SAMPLING -- the whole training step (positive + k negative
dot products, sigmoid losses, embedding updates) is one fused XLA program
over a [batch] of (center, context) pairs; pair generation and the unigram^0.75
negative table are vectorized numpy on the host.  Embedding updates use
dense one-hot matmul scatters (MXU-friendly; the repo-wide no-scatter rule,
see CLAUDE.md) rather than segment_sum gathers.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from musicnlp_tpu.preprocess.melody_grid import GridVocab

__all__ = ['PitchEmbedding']


def _pairs_from_seq(ids: np.ndarray, window: int) -> np.ndarray:
    """All (center, context) pairs within +-window, vectorized."""
    n = len(ids)
    if n < 2:
        return np.empty((0, 2), dtype=np.int32)
    out = []
    for d in range(1, window + 1):
        if d >= n:
            break
        a, b = ids[:-d], ids[d:]
        out.append(np.stack([a, b], axis=1))
        out.append(np.stack([b, a], axis=1))
    return np.concatenate(out, axis=0).astype(np.int32)


@partial(jax.jit, static_argnames=('lr',), donate_argnums=(0, 1))
def _sgns_step(emb_in: jnp.ndarray, emb_out: jnp.ndarray,
               centers: jnp.ndarray, contexts: jnp.ndarray,
               negatives: jnp.ndarray, lr: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One skip-gram negative-sampling SGD step over a pair batch.

    [B] centers/contexts, [B, K] negatives.  Gradients flow through one-hot
    matmuls so the backward is a dense MXU scatter, never a scatter-add.
    """
    v = emb_in.shape[0]

    def loss_fn(ein, eout):
        oh_c = jax.nn.one_hot(centers, v, dtype=ein.dtype)        # [B, V]
        ec = oh_c @ ein                                           # [B, D]
        oh_o = jax.nn.one_hot(contexts, v, dtype=eout.dtype)
        eo = oh_o @ eout                                          # [B, D]
        oh_n = jax.nn.one_hot(negatives, v, dtype=eout.dtype)     # [B, K, V]
        en = jnp.einsum('bkv,vd->bkd', oh_n, eout)                # [B, K, D]
        pos = jnp.einsum('bd,bd->b', ec, eo)
        neg = jnp.einsum('bd,bkd->bk', ec, en)
        l_pos = jax.nn.softplus(-pos)          # -log sigmoid(pos)
        l_neg = jax.nn.softplus(neg).sum(-1)   # -sum log sigmoid(-neg)
        # sum, not mean: classic SGNS applies lr PER PAIR; a batch-mean loss
        # would shrink every row's update by 1/B (gensim semantics).
        return (l_pos + l_neg).sum()

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(emb_in, emb_out)
    b = centers.shape[0]

    # Per-ROW mean: a row hit k times in the batch gets the average of its k
    # per-pair gradients (one representative lr-sized step), keeping updates
    # batch-size invariant without the divergence of raw summed steps.
    def row_counts(ids):
        return jax.nn.one_hot(ids.reshape(-1), v, dtype=jnp.float32).sum(0)

    cnt_in = jnp.maximum(row_counts(centers), 1.0)[:, None]
    cnt_out = jnp.maximum(row_counts(contexts) + row_counts(negatives), 1.0)[:, None]
    return (emb_in - lr * grads[0] / cnt_in,
            emb_out - lr * grads[1] / cnt_out, loss / b)


class PitchEmbedding:
    """Skip-gram pitch embeddings (the reference's `PitchEmbeddingModel`)."""

    def __init__(self, vector_size: int = 64, window: int = 10,
                 negatives: int = 5, lr: float = 0.05,
                 vocab_size: int = GridVocab.SIZE, seed: int = 77):
        self.dim = vector_size
        self.window = window
        self.k = negatives
        self.lr = lr
        self.vocab_size = vocab_size
        self.rng = np.random.default_rng(seed)
        self.emb_in: Optional[np.ndarray] = None
        self.emb_out: Optional[np.ndarray] = None
        self.losses: List[float] = []

    def __call__(self, songs: Iterable[Sequence[int]], epochs: int = 4,
                 batch_size: int = 4096) -> np.ndarray:
        """Train and return the [vocab, dim] input-embedding matrix."""
        seqs = [np.asarray(s, dtype=np.int32) for s in songs]
        seqs = [s[s != GridVocab.PAD] for s in seqs]
        pairs = np.concatenate(
            [_pairs_from_seq(s, self.window) for s in seqs if len(s) >= 2], axis=0)
        assert len(pairs), 'no training pairs'

        # unigram^0.75 negative-sampling table (word2vec's standard choice)
        counts = np.bincount(
            np.concatenate(seqs), minlength=self.vocab_size).astype(np.float64)
        probs = counts ** 0.75
        probs /= probs.sum()

        scale = 1.0 / self.dim
        emb_in = jnp.asarray(self.rng.normal(0, scale, (self.vocab_size, self.dim)),
                             dtype=jnp.float32)
        emb_out = jnp.zeros((self.vocab_size, self.dim), dtype=jnp.float32)

        n = len(pairs)
        # one fixed batch shape (jit caches a single program); small corpora
        # train whole-corpus batches, and the tail wraps around the permuted
        # order rather than being dropped
        bsz = min(batch_size, n)
        for _ in range(epochs):
            order = self.rng.permutation(n)
            epoch_losses = []
            for lo in range(0, n, bsz):
                idx = order[lo:lo + bsz]
                if len(idx) < bsz:
                    idx = np.concatenate([idx, order[:bsz - len(idx)]])
                batch = pairs[idx]
                negs = self.rng.choice(self.vocab_size, size=(bsz, self.k),
                                       p=probs).astype(np.int32)
                emb_in, emb_out, loss = _sgns_step(
                    emb_in, emb_out, jnp.asarray(batch[:, 0]),
                    jnp.asarray(batch[:, 1]), jnp.asarray(negs), self.lr)
                epoch_losses.append(loss)
            # aggregate over the epoch (a single final-batch sample is noise)
            self.losses.append(float(np.mean([float(l) for l in epoch_losses])))
        self.emb_in = np.asarray(emb_in)
        self.emb_out = np.asarray(emb_out)
        return self.emb_in

    # ------------------------------------------------------------ persistence
    def save(self, path: str):
        """npz snapshot (the reference's gensim `Word2Vec.save` analog)."""
        assert self.emb_in is not None, 'train before saving'
        np.savez(path, emb_in=self.emb_in, emb_out=self.emb_out,
                 losses=np.asarray(self.losses, dtype=np.float64),
                 meta=np.asarray([self.dim, self.window, self.k,
                                  self.vocab_size], dtype=np.int64))

    @classmethod
    def load(cls, path: str) -> 'PitchEmbedding':
        z = np.load(path)
        dim, window, k, vocab = (int(x) for x in z['meta'])
        pe = cls(vector_size=dim, window=window, negatives=k, vocab_size=vocab)
        pe.emb_in, pe.emb_out = z['emb_in'], z['emb_out']
        pe.losses = [float(x) for x in z['losses']]
        return pe

    # ------------------------------------------------------------------ query
    def vector(self, id_: int) -> np.ndarray:
        assert self.emb_in is not None, 'call the trainer first'
        return self.emb_in[id_]

    def similarity(self, a: int, b: int) -> float:
        va, vb = self.vector(a), self.vector(b)
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))

    def most_similar(self, id_: int, topn: int = 10) -> List[Tuple[int, float]]:
        assert self.emb_in is not None, 'call the trainer first'
        e = self.emb_in / (np.linalg.norm(self.emb_in, axis=1, keepdims=True) + 1e-12)
        sims = e @ e[id_]
        order = np.argsort(-sims)
        return [(int(i), float(sims[i])) for i in order if i != id_][:topn]
