"""int8 decode-cache certification over FULL generations (both models).

The int8 KV caches are the decode bench default; the unit tests pin one-step
closeness, but rounding could in principle drift over hundreds of steps of
cache reuse (every step re-reads every quantized row).  This suite trains a
tiny model to a peaked distribution, then generates full songs bf16-cache vs
int8-cache from the SAME seeds and pins sequence-level agreement and
distribution-level closeness.  Measured on CPU/f32 at debug size the paired
outputs are token-identical (max per-step logit delta ~5e-5 vs the dense
cache); thresholds below leave room for platform jitter without letting real
drift pass.

Reference counterpart: the reference decodes from an fp32 HF cache and has no
quantized path (reference musicnlp/trainer/eval.py:333) -- this certifies the
TPU-native bandwidth optimization preserves its output quality.
"""
import dataclasses

import jax
import numpy as np
import pytest

from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
from musicnlp_tpu.trainer.eval import MusicGenerator
from musicnlp_tpu.trainer.train import TrainArgs, Trainer
from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary

from tests.test_trainer import _songs

N_SONGS = 32
MAX_LEN = 48          # generation length; models are built at max_length 64


def _train(model, tok, out_dir):
    sd = SongDataset.from_songs(_songs(), vocab=MusicVocabulary(
        pitch_kind='step'))
    train = AugmentedDataset(sd, tok, random_crop=True, dataset_split='train')
    evald = AugmentedDataset(sd, tok, random_crop=False, dataset_split='test')
    args = TrainArgs(batch_size=8, learning_rate=3e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=4,
                     logging_steps=100)
    tr = Trainer(model, tok, train, evald, args=args, out_dir=out_dir)
    tr.train()
    from musicnlp_tpu.trainer.eval import load_trained
    _, params, _ = load_trained(out_dir)
    return params


from musicnlp_tpu.utils.seq_metrics import (    # noqa: E402
    js_divergence, norm_edit_distance as _norm_edit,
)


def _type_js(texts_a, texts_b, vocab):
    from collections import Counter

    def hist(texts):
        c = Counter()
        for t in texts:
            for w in t.split():
                c[str(vocab.type(w))] += 1
        return c

    return js_divergence(hist(texts_a), hist(texts_b))


def _certify(model_dense, model_int8, tok, params):
    gen_d = MusicGenerator(model_dense, tok, params, augment_key=False)
    gen_q = MusicGenerator(model_int8, tok, params, augment_key=False)
    prompts = [gen_d.unconditional_prompt(tempo=[90, 120, 150, 180][i % 4])
               for i in range(N_SONGS)]
    for strat, kw in (('greedy', {}), ('sample', dict(top_k=8))):
        td = gen_d.generate(prompts, strategy=strat, max_length=MAX_LEN,
                            seed=7, **kw)
        tq = gen_q.generate(prompts, strategy=strat, max_length=MAX_LEN,
                            seed=7, **kw)
        exact = float(np.mean([a == b for a, b in zip(td, tq)]))
        edit = float(np.mean([_norm_edit(a, b) for a, b in zip(td, tq)]))
        len_d = np.mean([len(t.split()) for t in td])
        len_q = np.mean([len(t.split()) for t in tq])
        js = _type_js(td, tq, gen_d.vocab)
        # measured: exact=1.0, edit=0.0, js=0.0 on CPU/f32 -- margins below
        # tolerate an occasional near-tie token flip, not systematic drift
        assert exact >= 0.9, (strat, exact)
        assert edit <= 0.05, (strat, edit)
        assert abs(len_d - len_q) <= 2.0, (strat, len_d, len_q)
        assert js <= 0.01, (strat, js)


def test_tfxl_int8_full_generation_certified(tmp_path):
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    cfg = TransfoXLConfig(
        vocab_size=tok.vocab_size, model_size='test', d_model=32, n_head=2,
        d_head=16, d_inner=64, n_layer=2, mem_len=16, clamp_len=32,
        max_length=64, dropout=0.0, dtype='float32')
    model = TransfoXL(cfg)
    params = _train(model, tok, str(tmp_path / 'tfxl'))
    mq = TransfoXL(dataclasses.replace(cfg, decode_cache_quant='int8'))
    assert mq.init_decode_state(1).cache_k.dtype == jax.numpy.int8
    _certify(model, mq, tok, params)


def test_reformer_int8_full_generation_certified(tmp_path):
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    rcfg = ReformerConfig.from_size(
        'debug', vocab_size=tok.vocab_size, max_length=64,
        dtype='float32', local_chunk=16, lsh_chunk=16, n_hashes=2,
        dropout=0.0)
    model = Reformer(rcfg)
    params = _train(model, tok, str(tmp_path / 'ref'))
    mq = Reformer(dataclasses.replace(rcfg, decode_cache_quant='int8'))
    assert mq.init_decode_state(1).lsh_k.dtype == jax.numpy.int8
    _certify(model, mq, tok, params)
