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

__all__ = [
    'PT_LOSS_PAD', 'shifted_ce_loss', 'ntp_accuracy', 'ikr_from_ids',
]

PT_LOSS_PAD = -100


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
