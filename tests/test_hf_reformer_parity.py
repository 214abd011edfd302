"""Cross-framework parity: HF ReformerModelWithLMHead <-> this framework.

HF Reformer draws its LSH rotations from unseeded torch RNG, so bit parity
across frameworks is only testable where bucketing cannot change the result:
sequences within ONE LSH chunk (the sort permutes inside the chunk; masking
is by original position, so attention is permutation-invariant there).
Local layers are deterministic and are tested across chunk boundaries.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import jax
import jax.numpy as jnp
from transformers import ReformerConfig as HFConfig
from transformers import ReformerModelWithLMHead

from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
from musicnlp_tpu.utils.hf_import import from_hf_reformer, to_hf_reformer

T = 16


def _hf_model(seed=0, attn_layers=('local', 'lsh', 'local')):
    cfg = HFConfig(
        vocab_size=100, hidden_size=64, num_attention_heads=2,
        attention_head_size=32, feed_forward_size=128,
        attn_layers=list(attn_layers), axial_pos_shape=[4, 4],
        axial_pos_embds_dim=[16, 48], max_position_embeddings=T,
        local_attn_chunk_length=8,      # 2 chunks: look-back exercised
        lsh_attn_chunk_length=16,       # 1 chunk: bucket-independent
        num_hashes=2, num_buckets=4, is_decoder=True,
        hidden_dropout_prob=0.0, local_attention_probs_dropout_prob=0.0,
        lsh_attention_probs_dropout_prob=0.0, hidden_act='relu')
    torch.manual_seed(seed)
    return ReformerModelWithLMHead(cfg).eval()


def _ours_logits(cfg, params, ids):
    model = Reformer(cfg)
    params = jax.tree.map(jnp.asarray, params)
    return np.asarray(model.forward(params, jnp.asarray(ids)))


def test_import_logit_parity():
    hf = _hf_model()
    cfg, params = from_hf_reformer(hf, dtype='float32')
    assert cfg.hf_compat and cfg.attn_layers == ('local', 'lsh', 'local')
    ids = np.random.default_rng(1).integers(0, 100, (2, T)).astype(np.int32)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long()).logits.numpy()
    got = _ours_logits(cfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_export_roundtrip():
    cfg = ReformerConfig(
        vocab_size=80, model_size='test', d_model=64, n_head=2, d_head=32,
        d_ff=128, attn_layers=('local', 'lsh'), max_length=T,
        axial_pos_shape=(4, 4), local_chunk=8, lsh_chunk=16, n_hashes=1,
        n_buckets=4, dropout=0.0, dtype='float32', hf_compat=True)
    model = Reformer(cfg)
    params = jax.device_get(model.init(jax.random.PRNGKey(3)))
    hf = to_hf_reformer(cfg, params).eval()
    ids = np.random.default_rng(2).integers(0, 80, (2, T)).astype(np.int32)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids).long()).logits.numpy()
    got = _ours_logits(cfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_imported_model_trains():
    """loss/grads flow through the reversible stack (remat on)."""
    from dataclasses import replace
    hf = _hf_model(seed=7)
    cfg, params = from_hf_reformer(hf, dtype='float32')
    cfg = replace(cfg, remat=True)
    model = Reformer(cfg)
    params = jax.tree.map(jnp.asarray, params)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 100, (2, T)),
                      jnp.int32)
    labels = jnp.where(ids % 7 == 0, -100, ids)

    def lf(p):
        loss, _ = model.loss(p, ids, labels)
        return loss
    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    gnorm = float(jax.tree.reduce(
        lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_exact_decode_scores_match_forward():
    """Imported checkpoints generate via decode_step_exact == forward."""
    hf = _hf_model(seed=9, attn_layers=('local', 'lsh'))
    cfg, params = from_hf_reformer(hf, dtype='float32')
    model = Reformer(cfg)
    params = jax.tree.map(jnp.asarray, params)
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 100, (1, 6)),
                      jnp.int32)
    st = model.init_decode_state_exact(1)
    outs = []
    for t in range(6):
        lg, st = model.decode_step_exact(params, ids[:, t], st)
        outs.append(lg)
    dec = jnp.stack(outs, axis=1)
    pm = jnp.concatenate([jnp.ones((1, 6), bool),
                          jnp.zeros((1, T - 6), bool)], axis=1)
    fwd = model.forward(params, jnp.pad(ids, ((0, 0), (0, T - 6))),
                        pad_mask=pm)[:, :6]
    np.testing.assert_allclose(np.asarray(dec), np.asarray(fwd),
                               rtol=3e-4, atol=3e-4)


def test_imported_incremental_decode_matches_forward():
    """Incremental (cached) decode now carries the reversible streams: within
    the first chunk it is exact vs the forward."""
    hf = _hf_model(seed=13, attn_layers=('local', 'lsh'))
    cfg, params = from_hf_reformer(hf, dtype='float32')
    model = Reformer(cfg)
    params = jax.tree.map(jnp.asarray, params)
    ids = jnp.asarray(np.random.default_rng(8).integers(0, 100, (2, 6)),
                      jnp.int32)
    st = model.init_decode_state(2)
    outs = []
    for t in range(6):
        lg, st = model.decode_step(params, ids[:, t], st)
        outs.append(lg)
    dec = jnp.stack(outs, axis=1)
    pm = jnp.concatenate([jnp.ones((2, 6), bool),
                          jnp.zeros((2, T - 6), bool)], axis=1)
    fwd = model.forward(params, jnp.pad(ids, ((0, 0), (0, T - 6))),
                        pad_mask=pm)[:, :6]
    np.testing.assert_allclose(np.asarray(dec), np.asarray(fwd),
                               rtol=3e-4, atol=3e-4)
