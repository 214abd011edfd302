"""Training/eval metrics: next-token accuracy + In-Key Ratio (IKR).

Rebuild of the reference metric stack (reference musicnlp/trainer/metrics.py:18-117
`IkrMetric`, musicnlp/trainer/train.py:255-284 `ComputeMetrics`).  The
reference computes IKR in a per-song Python loop over decoded pitch lists;
here the whole metric is two table gathers (vocab id -> pitch class, key
ordinal -> diatonic mask) so it runs inside the jitted train/eval step
(ops/losses.py:ikr_from_ids).

Modes (reference metrics.py:53-66):
  * 'vanilla': confidence-weighted average over the 24 candidate keys;
  * 'ins-key': the key is read from the 3rd token of each label sequence
    (the `Key_*` token inserted by the KeyInsert augmentation).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from musicnlp_tpu.ops.losses import PT_LOSS_PAD, ikr_from_ids, ntp_accuracy
from musicnlp_tpu.vocab import (
    MusicTokenizer, N_KEY, key_inkey_mask, key_ordinal2str,
)

__all__ = ['IkrMetric', 'ComputeMetrics']


class IkrMetric:
    def __init__(self, tokenizer: MusicTokenizer, mode: str = 'vanilla'):
        assert mode in ('vanilla', 'ins-key')
        self.tokenizer = tokenizer
        self.mode = mode
        vocab = tokenizer.vocab
        self.id_pitch_class = np.asarray(vocab.id_pitch_class_table, np.int32)
        self.key_inkey_mask = np.asarray(key_inkey_mask)
        # id -> key ordinal table (for 'ins-key' key extraction); -1 = not a key token
        self.id2key_ordinal = np.full(len(vocab), -1, np.int32)
        for o in range(N_KEY):
            tok = f'Key_{key_ordinal2str[o]}'
            if tok in vocab.tok2id:
                self.id2key_ordinal[vocab.tok2id[tok]] = o

    def key_ordinals_from_labels(self, labels: np.ndarray) -> np.ndarray:
        """int32 [B]: key ordinal read from the 3rd label token (ins-key mode,
        reference metrics.py:60-66); 0 where absent."""
        key_ids = np.asarray(labels)[:, 2]
        ords = self.id2key_ordinal[np.clip(key_ids, 0, len(self.id2key_ordinal) - 1)]
        return np.maximum(ords, 0).astype(np.int32)

    def __call__(
            self, preds: np.ndarray, labels: np.ndarray,
            key_scores: Optional[np.ndarray] = None,
    ) -> float:
        """preds int [B, T] predicted ids (already argmaxed), labels int [B, T]
        with -100 pads, key_scores f32 [B, 24]."""
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        # CLM shift: prediction at t is for label t+1 (reference train.py:268-271)
        p, l = preds[:, :-1], labels[:, 1:]
        valid = l != PT_LOSS_PAD
        key_ordinal = None
        if self.mode == 'ins-key':
            key_ordinal = self.key_ordinals_from_labels(labels)
            key_scores = np.zeros((preds.shape[0], N_KEY), np.float32)
        assert key_scores is not None, 'vanilla IKR needs key_scores'
        return float(ikr_from_ids(
            p, np.asarray(key_scores, np.float32), self.id_pitch_class,
            self.key_inkey_mask, valid=valid,
            key_ordinal=key_ordinal))

    def ground_truth_ikr(self, ids: np.ndarray, key_scores: np.ndarray,
                         best_key_only: bool = False) -> float:
        """IKR of the data itself (reference metrics.py:207-247 sanity anchor,
        ~0.95 on POP909)."""
        ids = np.asarray(ids)
        ks = np.asarray(key_scores, np.float32)
        if best_key_only:
            best = ks.argmax(axis=1)
            onehot = np.zeros_like(ks)
            onehot[np.arange(len(ks)), best] = 1.0
            ks = onehot
        return float(ikr_from_ids(ids, ks, self.id_pitch_class, self.key_inkey_mask))


class ComputeMetrics:
    """Eval-loop metric bundle (reference train.py:255-284): NTP acc + IKR."""

    def __init__(self, tokenizer: MusicTokenizer, mode: str = 'vanilla'):
        self.ikr = IkrMetric(tokenizer, mode=mode)

    def __call__(self, preds: np.ndarray, labels: np.ndarray,
                 key_scores: Optional[np.ndarray] = None) -> Dict[str, float]:
        import jax.numpy as jnp
        acc = float(ntp_accuracy(jnp.asarray(preds), jnp.asarray(labels)))
        ikr = self.ikr(preds, labels, key_scores)
        return dict(ntp_acc=acc, ikr=ikr)
