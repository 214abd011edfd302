"""Transformer-XL model tests: attention math, memory, decode-cache equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
from musicnlp_tpu.ops.attention import rel_shift
from musicnlp_tpu.ops.losses import PT_LOSS_PAD, ntp_accuracy, shifted_ce_loss


@pytest.fixture(scope='module')
def tiny():
    cfg = TransfoXLConfig(
        vocab_size=128, model_size='test', d_model=64, n_head=4, d_head=16,
        d_inner=128, n_layer=2, mem_len=32, clamp_len=64, max_length=64,
        dropout=0.1, dtype='float32')
    model = TransfoXL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_config_presets():
    cfg = TransfoXLConfig.from_size('base', vocab_size=1190)
    assert cfg.d_model == 768 and cfg.n_layer == 12 and cfg.n_head == 12
    assert cfg.d_head * cfg.n_head == cfg.d_model
    assert cfg.max_length == 2048 and cfg.mem_len == 256 and cfg.clamp_len == 1024
    dbg = TransfoXLConfig.from_size('debug', vocab_size=422)
    assert dbg.mem_len == 64 and dbg.max_length == 64


def test_rel_shift_matches_naive():
    B, N, Q, K = 1, 2, 4, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, Q, K))
    got = rel_shift(x)
    M = K - Q
    # want[i, j] = x[i, (Q - 1) - i + j]  (i.e. r at distance M + i - j)
    want = np.zeros((B, N, Q, K), np.float32)
    for i in range(Q):
        for j in range(K):
            t = Q - 1 - i + j
            if 0 <= t < K:
                want[:, :, i, j] = np.asarray(x)[:, :, i, t]
    # only causal+memory region matters (j <= M + i)
    for i in range(Q):
        for j in range(M + i + 1):
            np.testing.assert_allclose(np.asarray(got)[:, :, i, j],
                                       want[:, :, i, j], rtol=1e-6)


def test_forward_shapes_and_determinism(tiny):
    model, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    lg1, mems, valid = model.forward(params, ids)
    assert lg1.shape == (2, 16, 128) and mems is None
    lg2, _, _ = model.forward(params, ids)
    np.testing.assert_array_equal(np.asarray(lg1), np.asarray(lg2))
    # dropout path changes outputs
    lg3, _, _ = model.forward(params, ids, rng=jax.random.PRNGKey(2),
                              deterministic=False)
    assert not np.allclose(np.asarray(lg1), np.asarray(lg3))


def test_memory_carries_context(tiny):
    """Feeding segment 2 with memory must differ from feeding it cold."""
    model, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, 128)
    seg1, seg2 = ids[:, :16], ids[:, 16:]
    mems, valid = model.init_mems(1)
    _, mems, valid = model.forward(params, seg1, mems=mems, mem_valid=valid)
    lg_with, _, _ = model.forward(params, seg2, mems=mems, mem_valid=valid)
    lg_cold, _, _ = model.forward(params, seg2)
    assert not np.allclose(np.asarray(lg_with), np.asarray(lg_cold), atol=1e-4)


def test_segment_scan_matches_manual_memory(tiny):
    model, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 32), 0, 128)
    lg_scan = model.forward_segments(params, ids, n_seg=2)
    mems, valid = model.init_mems(2)
    lg1, mems, valid = model.forward(params, ids[:, :16], mems=mems, mem_valid=valid)
    lg2, _, _ = model.forward(params, ids[:, 16:], mems=mems, mem_valid=valid)
    manual = jnp.concatenate([lg1, lg2], axis=1)
    np.testing.assert_allclose(np.asarray(lg_scan), np.asarray(manual),
                               rtol=2e-4, atol=2e-4)


def test_decode_matches_forward(tiny):
    """KV ring-cache decode == full forward (prefix < mem_len)."""
    model, params = tiny
    B, T = 2, 24
    ids = jax.random.randint(jax.random.PRNGKey(5), (B, T), 0, 128)
    logits, _, _ = model.forward(params, ids)
    st = model.init_decode_state(B)
    step = jax.jit(model.decode_step)
    outs = []
    for t in range(T):
        lg, st = step(params, ids[:, t], st)
        outs.append(lg)
    dec = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(logits),
                               rtol=5e-3, atol=5e-3)
    # next-token choice identical
    np.testing.assert_array_equal(np.asarray(jnp.argmax(dec, -1)),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_decode_int8_cache_matches_dense(tiny):
    """decode_cache_quant='int8' tracks the dense-cache decode closely and
    survives ring wrap + beam expand/select (per-row scales factor exactly
    out of the contractions, so the only error is the int8 rounding)."""
    model, params = tiny
    import dataclasses
    qcfg = dataclasses.replace(model.cfg, decode_cache_quant='int8')
    qmodel = TransfoXL(qcfg)
    B, T = 2, 40  # > mem_len=32: exercises the wrapped ring too
    ids = jax.random.randint(jax.random.PRNGKey(11), (B, T), 0, 128)
    st_d = model.init_decode_state(B)
    st_q = qmodel.init_decode_state(B)
    assert st_q.cache_k.dtype == jnp.int8 and st_q.k_scale is not None
    step_d = jax.jit(model.decode_step)
    step_q = jax.jit(qmodel.decode_step)
    agree = 0
    for t in range(T):
        lg_d, st_d = step_d(params, ids[:, t], st_d)
        lg_q, st_q = step_q(params, ids[:, t], st_q)
        # probabilities must be close step by step
        pd = jax.nn.softmax(lg_d, -1)
        pq = jax.nn.softmax(lg_q, -1)
        assert float(jnp.max(jnp.abs(pd - pq))) < 0.02, f'step {t}'
        agree += int(np.all(np.asarray(jnp.argmax(lg_d, -1))
                            == np.asarray(jnp.argmax(lg_q, -1))))
    assert agree >= T - 2  # greedy choice essentially unchanged

    # beam-state helpers carry the scale buffers
    ex = TransfoXL.expand_decode_state(st_q, 2)
    assert ex.k_scale.shape[1] == 2 * B
    sel = TransfoXL.select_decode_state(ex, jnp.array([0, 3]))
    assert sel.v_scale.shape[1] == 2


def test_decode_ring_wraps(tiny):
    """Decoding past mem_len keeps running (window attention) without error."""
    model, params = tiny
    B = 1
    st = model.init_decode_state(B)
    step = jax.jit(model.decode_step)
    tok = jnp.zeros((B,), jnp.int32)
    for t in range(model.cfg.mem_len + 8):
        lg, st = step(params, tok, st)
        tok = jnp.argmax(lg, -1).astype(jnp.int32)
    assert int(st.step) == model.cfg.mem_len + 8
    assert np.all(np.asarray(st.cache_pos) >= 0)  # ring fully populated


def test_loss_masks_padding(tiny):
    model, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 16), 0, 128)
    labels = np.asarray(ids).copy()
    labels[:, 8:] = PT_LOSS_PAD
    loss_masked, _ = model.loss(params, ids, jnp.asarray(labels))
    loss_full, _ = model.loss(params, ids, ids)
    assert not np.isclose(float(loss_masked), float(loss_full))
    # all-padding labels don't NaN (reference transformer_xl.py:176-182 guard)
    all_pad = jnp.full_like(ids, PT_LOSS_PAD)
    loss_pad, _ = model.loss(params, ids, all_pad)
    assert np.isfinite(float(loss_pad))


def test_ntp_accuracy_shift():
    # perfect prediction of the NEXT token -> acc 1
    labels = jnp.array([[5, 6, 7, PT_LOSS_PAD]])
    logits = jax.nn.one_hot(jnp.array([[6, 7, 9, 0]]), 10) * 10.0
    assert float(ntp_accuracy(logits, labels)) == 1.0
    logits_bad = jax.nn.one_hot(jnp.array([[6, 8, 9, 0]]), 10) * 10.0
    assert float(ntp_accuracy(logits_bad, labels)) == 0.5


def test_shifted_ce_matches_manual():
    V = 7
    rng = jax.random.PRNGKey(7)
    logits = jax.random.normal(rng, (1, 4, V))
    labels = jnp.array([[1, 2, PT_LOSS_PAD, 3]])
    loss, n = shifted_ce_loss(logits, labels)
    lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), -1)
    manual = -(lp[0, 2] + lp[2, 3]) / 2  # positions with valid next-label
    assert float(n) == 2.0
    np.testing.assert_allclose(float(loss), float(manual), rtol=1e-6)


def test_segment_loss_matches_full_logits(tiny):
    """In-scan segment loss == shifted CE over stacked segment logits."""
    model, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(8), (2, 32), 0, 128)
    labels = np.asarray(ids).copy()
    labels[:, 20:] = PT_LOSS_PAD
    labels = jnp.asarray(labels)
    loss_seg, mets = model.loss(params, ids, labels, n_seg=2)
    logits = model.forward_segments(params, ids, n_seg=2)
    loss_ref, n_ref = shifted_ce_loss(logits, labels)
    np.testing.assert_allclose(float(loss_seg), float(loss_ref), rtol=1e-5)
    assert float(mets['n_tok']) == float(n_ref)
    acc_ref = ntp_accuracy(logits, labels)
    np.testing.assert_allclose(float(mets['ntp_acc']), float(acc_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mets['preds']),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_chunked_large_vocab_loss_matches_full():
    """head_chunk tiles the tied-head CE over the vocab without materializing
    [B,T,V] logits; loss/preds/grads must match the full-logits path exactly
    (the TPU-native replacement for the reference's adaptive softmax,
    reference transformer_xl.py:56-66)."""
    from dataclasses import replace
    cfg = TransfoXLConfig(vocab_size=300, model_size='test', d_model=32,
                          n_head=2, d_head=16, d_inner=64, n_layer=2,
                          mem_len=16, clamp_len=32, max_length=64,
                          dropout=0.0, dtype='float32')
    m_f = TransfoXL(cfg)
    m_c = TransfoXL(replace(cfg, head_chunk=128))  # 300 -> 3 tiles, padded
    params = m_f.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0, 300)
    labels = jnp.where(ids % 7 == 0, -100, ids)
    lf, mf = m_f.loss(params, ids, labels)
    lc, mc = m_c.loss(params, ids, labels)
    np.testing.assert_allclose(float(lf), float(lc), rtol=1e-5)
    np.testing.assert_allclose(float(mf['ntp_acc']), float(mc['ntp_acc']))
    np.testing.assert_array_equal(np.asarray(mf['preds'][:, :-1]),
                                  np.asarray(mc['preds'][:, :-1]))
    gf = jax.grad(lambda p: m_f.loss(p, ids, labels)[0])(params)
    gc = jax.grad(lambda p: m_c.loss(p, ids, labels)[0])(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_262k_vocab_loss_path_functional():
    """The 262k learned-tokenizer tier (reference wordpiece_tokenizer.py:455-468)
    trains through the tiled head: finite ~ln(V) loss, flowing grads, bounded
    memory (no [B,T,262144] tensor exists anywhere in the program)."""
    cfg = TransfoXLConfig(vocab_size=262144, model_size='test', d_model=64,
                          n_head=2, d_head=32, d_inner=128, n_layer=2,
                          mem_len=16, clamp_len=32, max_length=64,
                          dropout=0.0, dtype='float32', head_chunk=16384)
    model = TransfoXL(cfg)
    params = model.init(jax.random.PRNGKey(2))
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 64), 0, 262144)
    loss, mets = jax.jit(lambda p, i: model.loss(p, i, i))(params, ids)
    assert abs(float(loss) - np.log(262144)) < 0.5
    g = jax.jit(jax.grad(lambda p: model.loss(p, ids, ids)[0]))(params)
    assert float(jnp.linalg.norm(g['embed']['weight'])) > 0
