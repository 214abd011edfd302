"""Core neural-net layers as pure functions over explicit param pytrees.

TPU-native from-scratch layer kit (replaces the reference's dependence on HF
`transformers` torch modules, reference musicnlp/models/transformer_xl.py:127,
musicnlp/models/reformer.py:90).  Design rules:
  * params are plain nested dicts of jnp arrays (easy `PartitionSpec` mapping);
  * params live in float32, compute runs in a configurable dtype (bfloat16 on
    TPU) -- every matmul passes through the MXU at the compute dtype with
    float32 accumulation (`preferred_element_type`);
  * no data-dependent Python control flow; shapes are static everywhere.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = [
    'Params', 'dense_init', 'layer_norm_init', 'layer_norm', 'dense',
    'embedding_init', 'ffn_init', 'ffn', 'sinusoid_pos_emb', 'dropout',
]

Params = Dict[str, Any]


def dense_init(rng, d_in: int, d_out: int, *, std: float = 0.02, bias: bool = True) -> Params:
    w = jax.random.normal(rng, (d_in, d_out), dtype=jnp.float32) * std
    p = dict(w=w)
    if bias:
        p['b'] = jnp.zeros((d_out,), dtype=jnp.float32)
    return p


def dense(p: Params, x: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    dtype = dtype or x.dtype
    y = jnp.dot(x.astype(dtype), p['w'].astype(dtype),
                preferred_element_type=jnp.float32)
    if 'b' in p:
        y = y + p['b'].astype(jnp.float32)
    return y.astype(dtype)


def layer_norm_init(d: int) -> Params:
    return dict(scale=jnp.ones((d,), jnp.float32), bias=jnp.zeros((d,), jnp.float32))


def layer_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm in float32 (numerics-sensitive), output cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p['scale'] + p['bias']).astype(x.dtype)


def embedding_init(rng, vocab_size: int, d: int, *, std: float = 0.02) -> Params:
    return dict(weight=jax.random.normal(rng, (vocab_size, d), jnp.float32) * std)


def ffn_init(rng, d_model: int, d_inner: int, *, std: float = 0.02) -> Params:
    r1, r2 = jax.random.split(rng)
    return dict(
        w1=dense_init(r1, d_model, d_inner, std=std),
        w2=dense_init(r2, d_inner, d_model, std=std),
        ln=layer_norm_init(d_model),
    )


def ffn(p: Params, x: jnp.ndarray, *, activation: str = 'relu', pre_lnorm: bool = False,
        dropout_rate: float = 0.0, rng=None, deterministic: bool = True) -> jnp.ndarray:
    """Position-wise FFN with residual + layernorm (post-norm default, matching
    TF-XL `PositionwiseFF` semantics)."""
    inp = x
    if pre_lnorm:
        x = layer_norm(p['ln'], x)
    r1 = r2 = None
    if rng is not None and not deterministic:
        r1, r2 = jax.random.split(rng)
    h = dense(p['w1'], x)
    h = jax.nn.relu(h) if activation == 'relu' else jax.nn.gelu(h)
    h = dropout(h, dropout_rate, r1, deterministic)
    h = dense(p['w2'], h)
    h = dropout(h, dropout_rate, r2, deterministic)
    out = inp + h
    if not pre_lnorm:
        out = layer_norm(p['ln'], out)
    return out


def sinusoid_pos_emb(pos_seq: jnp.ndarray, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal relative-position embedding R_d for each distance in `pos_seq`.

    pos_seq: float[K] relative distances (already clamped by the caller).
    Returns [K, d_model] = [sin(d * inv_freq) ; cos(d * inv_freq)].
    Computed on the fly -- cheap on the VPU, removes any table-gather on the
    decode path (distances there come from a ring-buffer cache).
    """
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model))
    sinusoid = pos_seq.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1).astype(dtype)


def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
