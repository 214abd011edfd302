"""Fused chunked-window attention kernel vs a dense oracle (interpret mode)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicnlp_tpu.ops.pallas.chunked_attention_kernel import (
    chunked_window_attn)

def ATTN(*a, form='windows', **kw):
    return chunked_window_attn(*a, interpret=True, form=form, **kw)


def dense_oracle(q, k, v, qpos, kpos, *, chunk, scale, self_bias=0.0):
    """[G, T, D] dense attention restricted to the (own + look-back chunk)
    window with position masking -- the semantics the kernel must match."""
    G, T, D = q.shape
    t = np.arange(T)
    cq, ck = t[:, None] // chunk, t[None, :] // chunk
    window = (ck == cq) | (ck == cq - 1)                    # [T, T] slots
    s = jnp.einsum('gtd,gud->gtu', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    mask = window[None] & (kpos[:, None, :] <= qpos[:, :, None])
    s = jnp.where(mask, s, -1e9)
    s = jnp.where(mask & (kpos[:, None, :] == qpos[:, :, None]),
                  s + self_bias, s)
    lse = jax.nn.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    return jnp.einsum('gtu,gud->gtd', p, v.astype(jnp.float32)), lse


def _mk(G=3, T=256, D=32, chunk=32, seed=0, perm=False, pads=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (G, T, D), jnp.float32)
    k = jax.random.normal(ks[1], (G, T, D), jnp.float32)
    v = jax.random.normal(ks[2], (G, T, D), jnp.float32)
    if perm:  # LSH-like: positions are a per-sequence permutation
        qpos = jnp.stack([jax.random.permutation(kk, T)
                          for kk in jax.random.split(ks[3], G)]).astype(jnp.int32)
    else:
        qpos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (G, T))
    kpos = qpos
    if pads:  # mark the trailing `pads` slots as padding on the key side
        kpos = kpos.at[:, T - pads:].set(T)
    return q, k, v, qpos, kpos


@pytest.mark.parametrize('form', ['windows', 'twodot'])
@pytest.mark.parametrize('perm,self_bias,pads', [
    (False, 0.0, 0), (False, 0.0, 40), (True, -1e5, 0), (True, -1e5, 24),
])
def test_kernel_matches_dense(perm, self_bias, pads, form):
    chunk = 32
    q, k, v, qpos, kpos = _mk(perm=perm, pads=pads)
    got, got_lse = ATTN(q, k, v, qpos, kpos, chunk=chunk, scale=0.125,
                        self_bias=self_bias, form=form)
    want, want_lse = dense_oracle(q, k, v, qpos, kpos, chunk=chunk,
                                  scale=0.125, self_bias=self_bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('form', ['windows', 'twodot'])
def test_kernel_single_block(form):
    """T == m*chunk edge: one grid block, no look-back block exists."""
    q, k, v, qpos, kpos = _mk(G=2, T=64, D=32, chunk=32, seed=3)
    got, _ = ATTN(q, k, v, qpos, kpos, chunk=32, scale=0.2, form=form)
    want, _ = dense_oracle(q, k, v, qpos, kpos, chunk=32, scale=0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('form', ['windows', 'twodot'])
@pytest.mark.parametrize('perm', [False, True])
def test_kernel_gradients_match(perm, form):
    chunk = 32
    q, k, v, qpos, kpos = _mk(G=2, T=128, D=32, chunk=chunk, seed=7,
                              perm=perm, pads=8)
    w = jax.random.normal(jax.random.PRNGKey(9), (2, 128, 32))

    def loss_k(q, k, v):
        ctx, lse = ATTN(q, k, v, qpos, kpos, chunk=chunk, scale=0.125,
                        self_bias=-1e5 if perm else 0.0, form=form)
        return jnp.sum(ctx * w) + jnp.sum(lse)

    def loss_o(q, k, v):
        ctx, lse = dense_oracle(q, k, v, qpos, kpos, chunk=chunk, scale=0.125,
                                self_bias=-1e5 if perm else 0.0)
        return jnp.sum(ctx * w) + jnp.sum(lse)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, go, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=name)
