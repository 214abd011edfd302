"""Loss and training-metric ops, fully vectorized for TPU.

Replaces the reference's loss path (HF adaptive log-softmax + python-side
metric loops):
  * masked next-token CE with PT_LOSS_PAD=-100 label semantics
    (reference musicnlp/util/train/train_util_wrap.py:22,
     musicnlp/models/transformer_xl.py:176-200 -- padding masked from loss);
  * next-token-prediction accuracy with the CLM shift
    (reference musicnlp/trainer/train.py:255-284);
  * in-key-ratio (IKR) as pure table gathers
    (reference musicnlp/trainer/metrics.py:18-117's per-song numpy loop
     becomes id->pitch-class gather + [24,12] in-key mask gather).

The adaptive softmax (reference transformer_xl.py:56-66 sets cutoffs for
vocab>=1000) is deliberately replaced by a single full-vocab matmul: on the
MXU a dense [T, d] x [d, V] is faster than the gather/scatter-heavy adaptive
clusters for every vocab size this project uses (<=262k), and it keeps the
whole loss XLA-fusable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'PT_LOSS_PAD', 'BIG_ARG', 'shifted_ce_loss', 'ce_tile_scan',
    'chunked_shifted_ce_loss', 'ntp_accuracy', 'ikr_from_ids',
]

PT_LOSS_PAD = -100
# argmax sentinel: larger than any vocab id, so a pmin tie-break across
# shards (ops/sharded_head.py) can discard non-winning shards' indices.
# Deliberately a NUMPY scalar, not jnp: a jnp constant here dispatches an
# eager op at module import, which initializes whatever jax backend the
# environment presets -- fatal for __graft_entry__.dryrun_multichip, which
# must force the virtual CPU platform BEFORE any backend exists.
BIG_ARG = np.int32(2 ** 30)


def ce_tile_scan(hq: jnp.ndarray, lb_safe: jnp.ndarray, embed_w: jnp.ndarray,
                 out_bias: jnp.ndarray, *, chunk: Optional[int],
                 lo_base=0, vary_axes: tuple = ()):
    """Running (logsumexp, target-logit, max, argmax) over a [Vl, d] row
    block scanned in `chunk`-column tiles -- the shared core of the exact
    large-vocab CE, used by BOTH the replicated path
    (chunked_shifted_ce_loss) and the vocab-row-sharded path
    (ops/sharded_head.py, where `lo_base` is the shard's global row offset).

    Each tile is one MXU-friendly [B*Tq, d] x [d, chunk] matmul;
    `jax.checkpoint` on the tile body keeps backward memory at one tile.
    Rows padded up to a chunk multiple get -1e30 bias so they can never win
    argmax/lse.  Labels outside [lo_base, lo_base + Vl) contribute 0 to the
    target partial, so a psum over shards combines exactly.  `vary_axes`:
    under shard_map the scan carry must be cast device-varying (VMA typing).
    Returns (lse, tgt, run_max, run_arg), each [B, Tq] (run_arg in GLOBAL
    vocab ids; init sentinel BIG_ARG never survives -- every tile has a
    finite max, so the first tile always wins).
    """
    B, Tq, d = hq.shape
    vl = embed_w.shape[0]
    hi_cap = lo_base + vl   # pad rows must not claim the NEXT shard's labels
    chunk = min(chunk or vl, vl)
    n_chunk = -(-vl // chunk)
    v_pad = n_chunk * chunk
    if v_pad != vl:
        embed_w = jnp.pad(embed_w, ((0, v_pad - vl), (0, 0)))
        out_bias = jnp.pad(out_bias, (0, v_pad - vl), constant_values=-1e30)

    def tile(carry, ci):
        lse, tgt, run_max, run_arg = carry
        lo = ci * chunk

        @jax.checkpoint
        def tile_logits(hq, w, b):
            return (jnp.einsum('btd,vd->btv', hq, w.astype(hq.dtype),
                               preferred_element_type=jnp.float32)
                    + b.astype(jnp.float32))

        w_c = jax.lax.dynamic_slice(embed_w, (lo, 0), (chunk, d))
        b_c = jax.lax.dynamic_slice(out_bias, (lo,), (chunk,))
        lg = tile_logits(hq, w_c, b_c)                 # [B, Tq, chunk] f32
        lse = jnp.logaddexp(lse, jax.nn.logsumexp(lg, axis=-1))
        glo = lo_base + lo
        in_c = (lb_safe >= glo) & (lb_safe < glo + chunk) & (lb_safe < hi_cap)
        idx = jnp.clip(lb_safe - glo, 0, chunk - 1)
        got = jnp.take_along_axis(lg, idx[..., None], axis=-1)[..., 0]
        tgt = jnp.where(in_c, got, tgt)
        c_max = jnp.max(lg, axis=-1)
        c_arg = jnp.argmax(lg, axis=-1).astype(jnp.int32) + glo
        better = c_max > run_max
        run_max = jnp.where(better, c_max, run_max)
        run_arg = jnp.where(better, c_arg, run_arg)
        return (lse, tgt, run_max, run_arg), None

    neg = jnp.full((B, Tq), -jnp.inf, jnp.float32)
    init = (neg, jnp.zeros((B, Tq), jnp.float32), neg,
            jnp.full((B, Tq), BIG_ARG))
    if vary_axes:
        init = jax.tree.map(
            lambda x: jax.lax.pcast(x, vary_axes, to='varying'), init)
    (lse, tgt, run_max, run_arg), _ = jax.lax.scan(
        tile, init, jnp.arange(n_chunk, dtype=jnp.int32))
    return lse, tgt, run_max, run_arg


def shifted_ce_loss(
        logits: jnp.ndarray, labels: jnp.ndarray, *, z_loss: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal-LM loss: CE(logits[:, :-1], labels[:, 1:]) with -100 masked.

    logits: f32 [B, T, V]; labels: int32 [B, T] (-100 = ignore).
    Returns (mean_loss scalar f32, n_valid scalar f32).  Guards the
    all-padding case (reference transformer_xl.py:176-182) by clamping the
    denominator.
    """
    lg = logits[:, :-1].astype(jnp.float32)
    lb = labels[:, 1:]
    valid = lb != PT_LOSS_PAD
    lb_safe = jnp.where(valid, lb, 0)
    logz = jax.nn.logsumexp(lg, axis=-1)
    tok_logit = jnp.take_along_axis(lg, lb_safe[..., None], axis=-1)[..., 0]
    nll = logz - tok_logit
    if z_loss:
        nll = nll + z_loss * jnp.square(logz)
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n
    return loss, n


def chunked_shifted_ce_loss(
        h: jnp.ndarray, labels: jnp.ndarray, embed_w: jnp.ndarray,
        out_bias: jnp.ndarray, *, chunk: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact tied-head CE for HUGE vocabs without a [B, T, V] logits tensor.

    The reference switches to adaptive softmax above vocab 1000
    (reference musicnlp/models/transformer_xl.py:56-66) to bound softmax cost;
    on TPU the binding constraint is logits MEMORY, not FLOPs (a 262k-vocab
    [16, 1024, 262144] f32 tensor is 17 GB).  This computes the identical
    full-softmax loss by scanning the vocab in `chunk`-column tiles: each tile
    is one MXU-friendly [B*T, d] x [d, chunk] matmul; a running logsumexp, the
    gathered target logit, and a running (max, argmax) for predictions are the
    only state.  `jax.checkpoint` on the tile body keeps backward memory at
    one tile.  Exact -- unlike sampled/adaptive softmax, no approximation.

    h:        [B, T, d] final hidden states (any dtype; matmul accumulates f32).
    labels:   int32 [B, T], -100 = ignore (CLM shift applied internally).
    embed_w:  [V, d] tied embedding.
    out_bias: [V].
    Returns (mean_loss, n_valid, preds int32 [B, T]) with preds = argmax over
    the full vocab at every position (for NTP-acc/IKR).
    """
    lb = labels[:, 1:]
    valid = lb != PT_LOSS_PAD
    lb_safe = jnp.where(valid, lb, 0)
    hq = h[:, :-1]                                     # positions that predict
    lse, tgt, _, run_arg = ce_tile_scan(hq, lb_safe, embed_w, out_bias,
                                        chunk=chunk)

    nll = lse - tgt
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n
    # preds for metric parity with the full-logits path: [B, T] where column
    # t is the argmax of position t's logits (last column unused by metrics)
    preds = jnp.concatenate([run_arg, run_arg[:, -1:]], axis=1)
    return loss, n, preds


def ntp_accuracy(logits_or_preds: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Next-token-prediction accuracy with CLM shift; -100 labels excluded.

    Accepts full logits [B, T, V] or pre-argmaxed predictions [B, T] (the
    reference's `max_out_logits` RAM-bound trick, train.py:248-252, is free
    here -- argmax stays on device either way).
    """
    preds = (jnp.argmax(logits_or_preds, axis=-1)
             if logits_or_preds.ndim == 3 else logits_or_preds)
    preds = preds[:, :-1]
    lb = labels[:, 1:]
    valid = lb != PT_LOSS_PAD
    correct = (preds == lb) & valid
    n = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    return jnp.sum(correct).astype(jnp.float32) / n


def ikr_from_ids(
        ids: jnp.ndarray, key_scores: jnp.ndarray,
        id_pitch_class: jnp.ndarray, key_inkey_mask: jnp.ndarray,
        *, valid: Optional[jnp.ndarray] = None,
        key_ordinal: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched in-key ratio, one gather chain (reference metrics.py:43-117).

    ids:            int32 [B, T] token ids (predictions, shifted by caller).
    key_scores:     f32 [B, 24] KeyFinder confidences, -1 where key absent.
    id_pitch_class: int8/int32 [V] vocab table: pitch class per id, -1 = none.
    key_inkey_mask: bool [24, 12] diatonic mask per key ordinal.
    valid:          optional bool [B, T] position mask (label != -100).
    key_ordinal:    optional int32 [B]; when given, uses that single key per
                    song ('ins-key' mode, reference metrics.py:60-66);
                    otherwise confidence-weighted over candidate keys
                    ('vanilla' mode, metrics.py:53-59).
    Returns scalar f32: mean over songs with >=1 pitch of the per-song IKR.
    """
    pc = id_pitch_class[jnp.clip(ids, 0, id_pitch_class.shape[0] - 1)]   # [B, T]
    is_pitch = pc >= 0
    if valid is not None:
        is_pitch = is_pitch & valid
    pc_safe = jnp.where(is_pitch, pc, 0).astype(jnp.int32)

    # inkey[b, k, t] = pitch t diatonic to key k
    inkey = key_inkey_mask.T[pc_safe]                                    # [B, T, 24]
    inkey = jnp.where(is_pitch[..., None], inkey, False)
    n_pitch = jnp.sum(is_pitch, axis=1).astype(jnp.float32)              # [B]
    per_key_ratio = jnp.sum(inkey, axis=1) / jnp.maximum(n_pitch[:, None], 1.0)  # [B, 24]

    if key_ordinal is not None:
        ratio = jnp.take_along_axis(per_key_ratio, key_ordinal[:, None], axis=1)[:, 0]
    else:
        w = jnp.maximum(key_scores, 0.0)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-9)
        ratio = jnp.sum(per_key_ratio * w, axis=1)                       # [B]

    has_pitch = n_pitch > 0
    n_song = jnp.maximum(jnp.sum(has_pitch), 1).astype(jnp.float32)
    return jnp.sum(jnp.where(has_pitch, ratio, 0.0)) / n_song
