"""Fused (Pallas) TF-XL attention vs the reference jnp path, interpret mode."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicnlp_tpu.ops.attention import rel_attn, rel_attn_init
from musicnlp_tpu.ops.pallas.flash_attention import fused_rel_attn


def _mk(d_model=128, n_head=4, seed=0):
    p = rel_attn_init(jax.random.PRNGKey(seed), d_model, n_head,
                      d_model // n_head)
    # non-zero biases so the BD decomposition is actually exercised
    p['r_w_bias'] = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                      p['r_w_bias'].shape) * 0.1
    p['r_r_bias'] = jax.random.normal(jax.random.PRNGKey(seed + 2),
                                      p['r_r_bias'].shape) * 0.1
    return p


FUSED = functools.partial(fused_rel_attn, bq=64, bk=64, interpret=True)


@pytest.mark.parametrize('clamp', [1024, 96, 17])
def test_fused_matches_reference_no_mem(clamp):
    p = _mk()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 128), jnp.float32)
    want = rel_attn(p, x, None, 0, clamp_len=clamp)
    got = FUSED(p, x, None, 0, clamp_len=clamp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fused_matches_reference_with_memory():
    p = _mk(seed=7)
    B, T, M, d = 2, 64, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, d), jnp.float32)
    mems = jax.random.normal(jax.random.PRNGKey(5), (B, M, d), jnp.float32)
    for valid in (0, 17, 64):
        want = rel_attn(p, x, mems, valid, clamp_len=80)
        got = FUSED(p, x, mems, jnp.asarray(valid), clamp_len=80)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3, err_msg=f'valid={valid}')


def test_fused_gradients_match():
    p = _mk(seed=11)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 128, 128), jnp.float32)

    def loss_ref(p, x):
        return jnp.sum(rel_attn(p, x, None, 0, clamp_len=96) ** 2)

    def loss_fused(p, x):
        return jnp.sum(FUSED(p, x, None, 0, clamp_len=96) ** 2)

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=5e-3, atol=5e-3)
    for key in ('qkv', 'r', 'o', 'r_w_bias', 'r_r_bias'):
        np.testing.assert_allclose(
            np.asarray(gf_p[key]), np.asarray(gr_p[key]),
            rtol=5e-3, atol=5e-3, err_msg=key)
    for key in ('scale', 'bias'):
        np.testing.assert_allclose(
            np.asarray(gf_p['ln'][key]), np.asarray(gr_p['ln'][key]),
            rtol=5e-3, atol=5e-3, err_msg=f'ln.{key}')


@pytest.mark.parametrize('window,with_mem', [(16, False), (40, True)])
def test_fused_matches_reference_window(window, with_mem):
    """Sliding-window (HF same_length) masking: fused == jnp, fwd + grads."""
    p = _mk(seed=17)
    B, T, M, d = 1, 128, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(10), (B, T, d), jnp.float32)
    mems = (jax.random.normal(jax.random.PRNGKey(11), (B, M, d), jnp.float32)
            if with_mem else None)
    valid = M if with_mem else 0
    want = rel_attn(p, x, mems, valid, clamp_len=96, window=window)
    got = FUSED(p, x, mems, jnp.asarray(valid), clamp_len=96, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    gr = jax.grad(lambda x: jnp.sum(
        rel_attn(p, x, mems, valid, clamp_len=96, window=window) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(
        FUSED(p, x, mems, jnp.asarray(valid), clamp_len=96,
              window=window) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=5e-3, atol=5e-3)


def test_fused_gradients_match_with_memory():
    p = _mk(seed=13)
    B, T, M, d = 1, 64, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(8), (B, T, d), jnp.float32)
    mems = jax.random.normal(jax.random.PRNGKey(9), (B, M, d), jnp.float32)

    gr = jax.grad(lambda x: jnp.sum(
        rel_attn(p, x, mems, 40, clamp_len=64) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(
        FUSED(p, x, mems, jnp.asarray(40), clamp_len=64) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=5e-3, atol=5e-3)
