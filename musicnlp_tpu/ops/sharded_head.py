"""Vocab-sharded tied embedding + CE head (the 262k learned-tokenizer tier).

The reference bounds large-vocab softmax cost with adaptive softmax
(reference musicnlp/models/transformer_xl.py:56-66).  The TPU-native answer
at pod scale is different: shard the [V, d] tied table over the `model` mesh
axis so neither the ~200M-param table nor its gradient is ever replicated or
all-reduced in full.  Each device holds a [V/mp, d] row block; the CE is the
same exact tiled full-softmax as ops/losses.py::chunked_shifted_ce_loss,
computed shard-locally and combined with three tiny collectives per step
(running-logsumexp psum, target-logit psum, argmax pmax/pmin) -- O(B*T)
bytes on the wire instead of O(V*d).

Expressed with `jax.shard_map` (not bare GSPMD annotations) because the two
vocab-dim accesses XLA cannot partition well on its own are exactly the ones
that matter: the embedding row gather (SPMD fallback = all-gather the table)
and the per-tile `dynamic_slice` of the vocab scan (traced start index on a
sharded dim = all-gather).  Inside shard_map both become local dense ops.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from musicnlp_tpu.ops.losses import BIG_ARG, PT_LOSS_PAD, ce_tile_scan
from musicnlp_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ['vocab_sharded_embed', 'vocab_sharded_ce_loss']


def _batch_axes(mesh) -> tuple:
    """Every mesh axis except `model` (batch shards over all of them)."""
    return tuple(a for a in mesh.axis_names if a != MODEL_AXIS)


def _check_vocab(mesh, V: int):
    mp = mesh.shape[MODEL_AXIS]
    assert V % mp == 0, f'vocab {V} not divisible by model axis size {mp}'


def vocab_sharded_embed(input_ids: jnp.ndarray, embed_w: jnp.ndarray, *,
                        mesh, dtype=jnp.float32) -> jnp.ndarray:
    """Row lookup into a [V, d] table row-sharded over the `model` axis.

    Each shard looks up only the ids landing in its row block (others masked
    to zero) and one psum over `model` assembles the [B, T, d] embeddings.
    The backward is the transpose: a shard-local scatter-add into the local
    block -- the embedding gradient stays sharded end to end.
    """
    _check_vocab(mesh, embed_w.shape[0])
    baxes = _batch_axes(mesh)

    def local(ids, w):
        k = jax.lax.axis_index(MODEL_AXIS)
        vl = w.shape[0]
        lo = k * vl
        in_shard = (ids >= lo) & (ids < lo + vl)
        idx = jnp.clip(ids - lo, 0, vl - 1)
        emb = w.astype(dtype)[idx]
        emb = jnp.where(in_shard[..., None], emb, jnp.zeros((), dtype))
        return jax.lax.psum(emb, MODEL_AXIS)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(baxes or None, None),
                  jax.sharding.PartitionSpec(MODEL_AXIS, None)),
        out_specs=jax.sharding.PartitionSpec(baxes or None, None, None),
    )(input_ids, embed_w)


def vocab_sharded_ce_loss(
        h: jnp.ndarray, labels: jnp.ndarray, embed_w: jnp.ndarray,
        out_bias: jnp.ndarray, *, mesh, chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact tied-head CE with the [V, d] table sharded over `model`.

    Same contract as losses.py::chunked_shifted_ce_loss -- (mean_loss,
    n_valid, preds [B, T] full-vocab argmax) with the CLM shift and -100
    masking -- but each shard only ever touches its own [V/mp, d] rows.
    Cross-shard combines: logsumexp-of-partials (max-shifted psum), target
    logit (exactly one shard contributes; psum), argmax (pmax of partial
    maxima + pmin index tie-break, matching the replicated path's
    lowest-index-wins).  Scalars psum over the batch axes too, so the
    returned loss is fully replicated.
    """
    _check_vocab(mesh, embed_w.shape[0])
    baxes = _batch_axes(mesh)
    P = jax.sharding.PartitionSpec

    def local(h, labels, w, b):
        k = jax.lax.axis_index(MODEL_AXIS)
        vl = w.shape[0]
        lb = labels[:, 1:]
        valid = lb != PT_LOSS_PAD
        lb_safe = jnp.where(valid, lb, 0)
        lse_l, tgt_l, mx_l, arg_l = ce_tile_scan(
            h[:, :-1], lb_safe, w, b, chunk=chunk, lo_base=k * vl,
            vary_axes=tuple(mesh.axis_names))

        # the max shift is only for numerical stability -- any constant works,
        # so stop_gradient keeps the combine exact while pmax (which has no
        # differentiation rule) stays out of the grad trace
        m = jax.lax.pmax(jax.lax.stop_gradient(lse_l), MODEL_AXIS)
        lse = jnp.log(jax.lax.psum(jnp.exp(lse_l - m), MODEL_AXIS)) + m
        tgt = jax.lax.psum(tgt_l, MODEL_AXIS)
        mx_sg = jax.lax.stop_gradient(mx_l)
        gmax = jax.lax.pmax(mx_sg, MODEL_AXIS)
        arg = jax.lax.pmin(
            jax.lax.stop_gradient(jnp.where(mx_sg >= gmax, arg_l, BIG_ARG)),
            MODEL_AXIS)

        nll = jnp.where(valid, lse - tgt, 0.0)
        n = jax.lax.psum(jnp.sum(valid), baxes) if baxes else jnp.sum(valid)
        n = jnp.maximum(n, 1).astype(jnp.float32)
        loss_sum = (jax.lax.psum(jnp.sum(nll), baxes) if baxes
                    else jnp.sum(nll))
        preds = jnp.concatenate([arg, arg[:, -1:]], axis=1)
        return loss_sum / n, n, preds

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(baxes or None, None, None), P(baxes or None, None),
                  P(MODEL_AXIS, None), P(MODEL_AXIS)),
        out_specs=(P(), P(), P(baxes or None, None)),
    )(h, labels, embed_w, out_bias)
