"""Decode-loop tests: logits warpers + fixed-shape generate scan."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
from musicnlp_tpu.ops.sampling import SampleConfig, generate_scan, process_logits


def test_top_k_filter():
    logits = jnp.array([[1.0, 3.0, 2.0, 0.5, -1.0]])
    out = process_logits(logits, SampleConfig(strategy='sample', top_k=2))
    probs = np.asarray(jax.nn.softmax(out, -1))[0]
    assert probs[1] > 0 and probs[2] > 0
    assert probs[0] < 1e-9 and probs[3] < 1e-9 and probs[4] < 1e-9


def test_top_p_filter():
    # probs ~ [0.643, 0.237, 0.087, 0.032]
    logits = jnp.log(jnp.array([[0.643, 0.237, 0.087, 0.032]]))
    out = process_logits(logits, SampleConfig(top_p=0.5))
    probs = np.asarray(jax.nn.softmax(out, -1))[0]
    assert probs[0] > 0.99  # only the top token kept (cum before it = 0 < .5)
    out2 = process_logits(logits, SampleConfig(top_p=0.7))
    probs2 = np.asarray(jax.nn.softmax(out2, -1))[0]
    assert probs2[0] > 0 and probs2[1] > 0 and probs2[2] < 1e-9


def test_repetition_penalty():
    logits = jnp.array([[2.0, 1.0, -1.0]])
    counts = jnp.array([[3, 0, 1]], jnp.int32)
    out = process_logits(logits, SampleConfig(repetition_penalty=2.0), counts)
    out = np.asarray(out)[0]
    assert np.isclose(out[0], 1.0)    # positive logit divided
    assert np.isclose(out[1], 1.0)    # unseen untouched
    assert np.isclose(out[2], -2.0)   # negative logit multiplied


def test_temperature_and_typical():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 50))
    cold = process_logits(logits, SampleConfig(temperature=0.5))
    np.testing.assert_allclose(np.asarray(cold), np.asarray(logits) * 2, rtol=1e-6)
    typ = process_logits(logits, SampleConfig(typical_p=0.9))
    # some tokens filtered, at least one survivor per row
    surv = np.asarray(typ) > -1e29
    assert surv.any(axis=1).all() and not surv.all()


@pytest.fixture(scope='module')
def tiny_lm():
    cfg = TransfoXLConfig(
        vocab_size=64, model_size='test', d_model=32, n_head=2, d_head=16,
        d_inner=64, n_layer=2, mem_len=16, clamp_len=32, max_length=48,
        dropout=0.0, dtype='float32')
    model = TransfoXL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _gen(model, params, prompt, plen, cfg, max_length=32, rng_seed=0):
    st = model.init_decode_state(prompt.shape[0])
    return generate_scan(
        lambda tok, s: model.decode_step(params, tok, s), st,
        prompt, plen, max_length=max_length, eos_id=3, pad_id=1,
        sample_cfg=cfg, vocab_size=model.cfg.vocab_size,
        rng=jax.random.PRNGKey(rng_seed))


def test_generate_prompt_preserved(tiny_lm):
    model, params = tiny_lm
    prompt = jnp.array([[5, 6, 7, 8, 1, 1], [9, 10, 1, 1, 1, 1]], jnp.int32)
    plen = jnp.array([4, 2], jnp.int32)
    ids, out_len = _gen(model, params, prompt, plen, SampleConfig(strategy='greedy'))
    ids = np.asarray(ids)
    np.testing.assert_array_equal(ids[0, :4], [5, 6, 7, 8])
    np.testing.assert_array_equal(ids[1, :2], [9, 10])
    assert ids.shape == (2, 32)


def test_generate_greedy_deterministic(tiny_lm):
    model, params = tiny_lm
    prompt = jnp.array([[5, 6, 7, 8]], jnp.int32)
    plen = jnp.array([4], jnp.int32)
    a, _ = _gen(model, params, prompt, plen, SampleConfig(strategy='greedy'), rng_seed=0)
    b, _ = _gen(model, params, prompt, plen, SampleConfig(strategy='greedy'), rng_seed=9)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_sampling_varies_with_seed(tiny_lm):
    model, params = tiny_lm
    prompt = jnp.array([[5, 6, 7, 8]], jnp.int32)
    plen = jnp.array([4], jnp.int32)
    a, _ = _gen(model, params, prompt, plen,
                SampleConfig(strategy='sample', temperature=2.0), rng_seed=0)
    b, _ = _gen(model, params, prompt, plen,
                SampleConfig(strategy='sample', temperature=2.0), rng_seed=1)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_generate_eos_stops_and_pads(tiny_lm):
    """Force eos as the argmax by biasing the output head."""
    model, params = tiny_lm
    params = jax.tree.map(lambda x: x, params)
    params['out_bias'] = params['out_bias'].at[3].add(100.0)
    prompt = jnp.array([[5, 6]], jnp.int32)
    plen = jnp.array([2], jnp.int32)
    ids, out_len = _gen(model, params, prompt, plen, SampleConfig(strategy='greedy'))
    ids = np.asarray(ids)
    assert int(out_len[0]) == 3              # 2 prompt + eos
    assert ids[0, 2] == 3
    assert (ids[0, 3:] == 1).all()           # pad after eos


def test_generate_matches_stepwise_greedy(tiny_lm):
    """Scan-generate greedy == naive python decode loop."""
    model, params = tiny_lm
    params = dict(params, out_bias=params['out_bias'].at[3].add(-100.0))  # no eos
    prompt = jnp.array([[5, 6, 7]], jnp.int32)
    plen = jnp.array([3], jnp.int32)
    ids, _ = _gen(model, params, prompt, plen, SampleConfig(strategy='greedy'),
                  max_length=12)
    st = model.init_decode_state(1)
    seq = [5, 6, 7]
    for t in range(11):
        lg, st = model.decode_step(params, jnp.array([seq[t]], jnp.int32), st)
        if t + 1 < 3:
            continue
        seq.append(int(jnp.argmax(lg, -1)[0]))
        if len(seq) == 12:
            break
    np.testing.assert_array_equal(np.asarray(ids)[0], np.array(seq)[:12])


def test_beam_default_reorder_handles_axis1_state(tiny_lm):
    """Without an explicit reorder_state, beam search must still reorder
    TF-XL's DecodeState caches, which carry the batch on AXIS 1
    ([L, B*W, M, N, H]) -- a direct caller omitting reorder_state used to get
    never-reordered caches (silently wrong beams)."""
    from musicnlp_tpu.models.transformer_xl import DecodeState
    from musicnlp_tpu.ops.sampling import beam_generate
    model, params = tiny_lm
    prompt = jnp.array([[5, 9, 4], [7, 2, 8]], jnp.int32)
    plen = jnp.array([3, 3], jnp.int32)

    def reorder(st: DecodeState, idx):
        return DecodeState(st.cache_k[:, idx], st.cache_v[:, idx],
                           st.cache_pos, st.step)

    kw = dict(prompt_ids=prompt, prompt_len=plen, max_length=24, eos_id=3,
              pad_id=1, num_beams=4)
    with_reorder = beam_generate(
        lambda t, s: model.decode_step(params, t, s), model.init_decode_state,
        reorder_state=reorder, **kw)
    default = beam_generate(
        lambda t, s: model.decode_step(params, t, s), model.init_decode_state,
        **kw)
    np.testing.assert_array_equal(np.asarray(with_reorder[0]),
                                  np.asarray(default[0]))
    np.testing.assert_array_equal(np.asarray(with_reorder[1]),
                                  np.asarray(default[1]))


@pytest.mark.parametrize('chunk', [4, 5, 31, 128])
def test_generate_early_exit_bit_identical(tiny_lm, chunk):
    """The chunked early-exit while_loop path returns the exact (ids,
    out_len) of the plain fixed-length scan -- with and without an early
    finish, chunk dividing n_steps or not, greedy and sampled."""
    model, params = tiny_lm
    prompt = jnp.array([[5, 6, 7, 8], [9, 10, 1, 1]], jnp.int32)
    plen = jnp.array([4, 2], jnp.int32)
    eos_params = dict(params, out_bias=params['out_bias'].at[3].add(100.0))
    for p, cfg in [(params, SampleConfig(strategy='sample', temperature=2.0)),
                   (params, SampleConfig(strategy='greedy')),
                   (eos_params, SampleConfig(strategy='greedy'))]:
        def run(ch):
            st = model.init_decode_state(2)
            return generate_scan(
                lambda tok, s: model.decode_step(p, tok, s), st,
                prompt, plen, max_length=32, eos_id=3, pad_id=1,
                sample_cfg=cfg, vocab_size=model.cfg.vocab_size,
                rng=jax.random.PRNGKey(7), early_exit_chunk=ch)
        plain = run(None)
        early = jax.jit(lambda: run(chunk))()
        np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(early[0]))
        np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(early[1]))


@pytest.mark.parametrize('bias', [100.0, -100.0])   # early finish vs full run
def test_beam_and_contrastive_early_exit_bit_identical(tiny_lm, bias):
    from musicnlp_tpu.ops.sampling import (
        beam_generate, contrastive_generate, diverse_beam_generate,
    )
    model, params = tiny_lm
    params = dict(params, out_bias=params['out_bias'].at[3].add(bias))
    prompt = jnp.array([[5, 6, 7], [9, 10, 1]], jnp.int32)
    plen = jnp.array([3, 2], jnp.int32)
    kw = dict(max_length=24, eos_id=3, pad_id=1)

    def beam(ch):
        return beam_generate(
            lambda t, s: model.decode_step(params, t, s),
            model.init_decode_state, prompt, plen, num_beams=4,
            early_exit_chunk=ch, **kw)

    def dbeam(ch):
        return diverse_beam_generate(
            lambda t, s: model.decode_step(params, t, s),
            model.init_decode_state, prompt, plen, num_beams=4,
            num_beam_groups=2, early_exit_chunk=ch, **kw)

    def contr(ch):
        return contrastive_generate(
            lambda t, s: model.decode_step_with_hidden(params, t, s),
            model.init_decode_state(2), prompt, plen, top_k=3,
            penalty_alpha=0.6, d_model=model.cfg.d_model,
            expand_state=model.expand_decode_state,
            select_state=model.select_decode_state,
            early_exit_chunk=ch, **kw)

    for fn in (beam, dbeam, contr):
        plain, early = fn(None), jax.jit(lambda: fn(7))()
        np.testing.assert_array_equal(np.asarray(plain[0]), np.asarray(early[0]))
        np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(early[1]))
