"""Chunked local attention + LSH attention (Reformer-style), TPU-native.

These back the Reformer-capability model (reference musicnlp/models/reformer.py:13-127
wraps HF's ReformerModelWithLMHead: alternating local/LSH layers, shared-QK
attention, causal chunking with one look-back chunk, multi-round hashing).

TPU-first shape discipline: everything is fixed-shape tensor algebra --
bucketing is an argmax over random rotations, "grouping" is a single
sort-by-(bucket,position) permutation, and attention is batched dense
[n_chunk, chunk, 2*chunk] matmuls that tile cleanly onto the MXU.  No
dynamic shapes, no per-bucket loops.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ['local_attention', 'lsh_attention']

NEG_INF = -1e9
SELF_BIAS = -1e5   # shared-QK: self-attention only as a last resort


def _look_back(x: jnp.ndarray) -> jnp.ndarray:
    """[..., n_chunk, chunk, d] -> [..., n_chunk, 2*chunk, d]: prepend the
    previous chunk (zeros before the first)."""
    prev = jnp.roll(x, 1, axis=-3)
    prev = prev.at[..., 0, :, :].set(0.0)
    return jnp.concatenate([prev, x], axis=-2)


def _look_back_ids(t: jnp.ndarray, fill: int) -> jnp.ndarray:
    """[..., n_chunk, chunk] int -> [..., n_chunk, 2*chunk]."""
    prev = jnp.roll(t, 1, axis=-2)
    prev = prev.at[..., 0, :].set(fill)
    return jnp.concatenate([prev, t], axis=-1)


def local_attention(
        q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, chunk: int,
        pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Causal chunked local attention with one look-back chunk.

    q/k/v: [B, H, T, D] with T % chunk == 0.  pad_mask: bool [B, T] True=real.
    Each query attends to keys in its own and the previous chunk, causally.
    """
    B, H, T, D = q.shape
    assert T % chunk == 0
    n = T // chunk
    scale = 1.0 / (D ** 0.5)
    pos = jnp.arange(T).reshape(n, chunk)

    qc = q.reshape(B, H, n, chunk, D)
    kc = _look_back(k.reshape(B, H, n, chunk, D))          # [B,H,n,2c,D]
    vc = _look_back(v.reshape(B, H, n, chunk, D))
    kpos = _look_back_ids(pos, -1)                          # [n, 2c]

    score = jnp.einsum('bhncd,bhnkd->bhnck', qc, kc,
                       preferred_element_type=jnp.float32) * scale
    causal = kpos[:, None, :] <= pos[:, :, None]            # [n, c, 2c]
    valid = kpos >= 0
    mask = causal & valid[:, None, :]
    if pad_mask is not None:
        kp = _look_back_ids(pad_mask.reshape(B, n, chunk).astype(jnp.int32), 0)
        mask = mask[None, None] & (kp[:, None, :, None, :] > 0)
    else:
        mask = mask[None, None]
    score = jnp.where(mask, score, NEG_INF)
    probs = jax.nn.softmax(score, axis=-1).astype(q.dtype)
    out = jnp.einsum('bhnck,bhnkd->bhncd', probs, vc,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, H, T, D)


def _hash_vectors(x: jnp.ndarray, n_buckets: int, rot: jnp.ndarray) -> jnp.ndarray:
    """x [T, D], rot [D, n_buckets//2] -> int32 [T] bucket ids (argmax of
    [proj; -proj], the angular-LSH scheme)."""
    proj = jnp.einsum('td,db->tb', x.astype(jnp.float32), rot)
    return jnp.argmax(jnp.concatenate([proj, -proj], axis=-1), axis=-1).astype(jnp.int32)


def _lsh_one_round(qk: jnp.ndarray, v: jnp.ndarray, buckets: jnp.ndarray,
                   chunk: int, pad_mask: Optional[jnp.ndarray]):
    """Single-hash LSH attention for ONE sequence.

    qk [T, D] shared query/key, v [T, D], buckets int32 [T].
    Returns (out [T, D], logsumexp [T]) in original order.
    """
    T, D = qk.shape
    n = T // chunk
    t = jnp.arange(T, dtype=jnp.int32)
    # stable sort by (bucket, position): one permutation groups buckets while
    # keeping chronological order inside each bucket
    s_idx = jnp.argsort(buckets * T + t)                    # [T]
    undo = jnp.argsort(s_idx)

    qk_s = qk[s_idx]
    v_s = v[s_idx]
    pos_s = t[s_idx]
    bkt_s = buckets[s_idx]

    # normalized keys (shared-QK Reformer: key = qk / ||qk||)
    k_s = qk_s / jnp.maximum(
        jnp.linalg.norm(qk_s.astype(jnp.float32), axis=-1, keepdims=True),
        1e-6).astype(qk.dtype)

    qc = qk_s.reshape(n, chunk, D)
    kc = _look_back(k_s.reshape(n, chunk, D))               # [n, 2c, D]
    vc = _look_back(v_s.reshape(n, chunk, D))
    pc = pos_s.reshape(n, chunk)
    kp = _look_back_ids(pc, -1)                             # key original pos
    bq = bkt_s.reshape(n, chunk)
    bk = _look_back_ids(bq, -1)

    scale = 1.0 / (D ** 0.5)
    score = jnp.einsum('ncd,nkd->nck', qc, kc,
                       preferred_element_type=jnp.float32) * scale
    causal = kp[:, None, :] <= pc[:, :, None]
    valid = (kp >= 0)[:, None, :]
    self_m = kp[:, None, :] == pc[:, :, None]
    mask = causal & valid
    if pad_mask is not None:
        pm_s = pad_mask[s_idx].reshape(n, chunk)
        kpm = _look_back_ids(pm_s.astype(jnp.int32), 0)
        mask = mask & (kpm[:, None, :] > 0)
    score = jnp.where(mask, score, NEG_INF)
    score = jnp.where(self_m, score + SELF_BIAS, score)     # self only if alone

    lse = jax.nn.logsumexp(score, axis=-1)                  # [n, c]
    probs = jnp.exp(score - lse[..., None]).astype(qk.dtype)
    out_s = jnp.einsum('nck,nkd->ncd', probs, vc,
                       preferred_element_type=jnp.float32).astype(qk.dtype)
    return out_s.reshape(T, D)[undo], lse.reshape(T)[undo]


def lsh_attention(
        qk: jnp.ndarray, v: jnp.ndarray, *, chunk: int, n_hashes: int,
        n_buckets: int, rng_rot: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-round LSH attention, causal, shared-QK.

    qk/v: [B, H, T, D] with T % chunk == 0.  rng_rot: PRNG key for the random
    rotations (fixed per call; pass a fold of (layer, step) for determinism).
    Rounds are combined with logsumexp weights (the Reformer estimator).
    """
    B, H, T, D = qk.shape
    assert T % chunk == 0 and n_buckets % 2 == 0
    rots = jax.random.normal(rng_rot, (n_hashes, D, n_buckets // 2), jnp.float32)

    def per_seq(qk1, v1, pm1):
        outs, lses = [], []
        for r in range(n_hashes):
            buckets = _hash_vectors(qk1, n_buckets, rots[r])
            if pm1 is not None:
                # padding goes to a trailing pseudo-bucket so pad CONTENT can
                # never shift real tokens across sorted-chunk boundaries
                buckets = jnp.where(pm1, buckets, n_buckets)
            o, l = _lsh_one_round(qk1, v1, buckets, chunk, pm1)
            outs.append(o)
            lses.append(l)
        out = jnp.stack(outs)                               # [R, T, D]
        lse = jnp.stack(lses)                               # [R, T]
        w = jax.nn.softmax(lse, axis=0)[..., None].astype(qk1.dtype)
        return jnp.sum(out * w, axis=0)

    flat_qk = qk.reshape(B * H, T, D)
    flat_v = v.reshape(B * H, T, D)
    if pad_mask is not None:
        pm = jnp.repeat(pad_mask, H, axis=0)                # [B*H, T]
        out = jax.vmap(per_seq)(flat_qk, flat_v, pm)
    else:
        out = jax.vmap(lambda a, b: per_seq(a, b, None))(flat_qk, flat_v)
    return out.reshape(B, H, T, D)
