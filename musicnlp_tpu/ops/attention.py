"""Relative-position attention with segment memory (Transformer-XL style).

From-scratch JAX implementation of the attention mechanism behind the
reference's HF `TransfoXLLMHeadModel` (reference musicnlp/models/transformer_xl.py:127;
the mechanism itself is Dai et al. 2019 "RelPartialLearnableMultiHeadAttn").

TPU-native design decisions:
  * memory is a FIXED-SHAPE right-aligned buffer [B, M, d] with a scalar
    `mem_valid` count, so the whole train/decode program has static shapes
    (XLA requirement; the reference's torch mems grow dynamically);
  * the BD relative-position term uses the standard rel-shift trick for the
    train path (one [K, d] sinusoid table, no q*k*d materialization), and an
    explicit per-slot distance computation for the 1-token decode path where
    keys come from a ring buffer and the shift trick does not apply;
  * matmuls run at the compute dtype (bf16 on TPU) with f32 accumulation;
    softmax in f32.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from musicnlp_tpu.ops.layers import (
    Params, layer_norm, layer_norm_init, sinusoid_pos_emb, dropout,
)

__all__ = ['rel_attn_init', 'rel_attn', 'rel_attn_decode_step', 'rel_shift',
           'quantize_kv_rows']


def quantize_kv_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization over the LAST axis (d_head).

    Returns (q int8 same shape, scale f32 without the last axis).  Decode KV
    ring caches are pure HBM-bandwidth (the decode step streams the whole
    [L, B, M, N, H] cache per token); a per-(slot, head) scale factors EXACTLY
    out of both attention contractions -- scores over the head axis
    (q . s*K = s * (q . K)) and the value sum over slots (p . s*V = (p*s) . V)
    -- so int8 storage halves decode traffic with no extra matmuls."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale[..., 0]

NEG_INF = -1e30


def rel_attn_init(rng, d_model: int, n_head: int, d_head: int, *, std: float = 0.02) -> Params:
    """One Transformer-XL attention block's params.

    qkv is stored [d_model, 3, n_head, d_head] (q/k/v and head axes explicit so a
    tensor-parallel mesh can shard the head axis cleanly); r projection
    [d_model, n_head, d_head]; output [n_head, d_head, d_model].
    Per-layer untied r_w/r_r biases (HF `untie_r=True` default).
    """
    rs = jax.random.split(rng, 3)
    return dict(
        qkv=jax.random.normal(rs[0], (d_model, 3, n_head, d_head), jnp.float32) * std,
        r=jax.random.normal(rs[1], (d_model, n_head, d_head), jnp.float32) * std,
        o=jax.random.normal(rs[2], (n_head, d_head, d_model), jnp.float32) * std,
        r_w_bias=jnp.zeros((n_head, d_head), jnp.float32),
        r_r_bias=jnp.zeros((n_head, d_head), jnp.float32),
        ln=layer_norm_init(d_model),
    )


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """TF-XL relative shift: BD[b,n,i,j] <- BD[b,n,i, j - i + Q - 1] alignment.

    x: [B, N, Q, K] scores against pos_emb ordered by distance K-1..0.
    """
    b, n, q, k = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, n, k + 1, q)
    x = x[:, :, 1:, :]
    return x.reshape(b, n, q, k)


def _project_qkv(p: Params, cat: jnp.ndarray, qlen: int, dtype):
    """cat: [B, K, d] (memory ++ current).  Returns q [B,Q,N,H], k/v [B,K,N,H]."""
    w = p['qkv'].astype(dtype)
    heads = jnp.einsum('bkd,dcnh->bkcnh', cat.astype(dtype), w,
                       preferred_element_type=jnp.float32).astype(dtype)
    q = heads[:, -qlen:, 0]
    k = heads[:, :, 1]
    v = heads[:, :, 2]
    return q, k, v


def rel_attn(
        p: Params, x: jnp.ndarray, mems: Optional[jnp.ndarray], mem_valid,
        *, clamp_len: int = -1, pre_lnorm: bool = False, scale: Optional[float] = None,
        dropout_rate: float = 0.0, dropatt_rate: float = 0.0, rng=None,
        deterministic: bool = True, attn_mask: Optional[jnp.ndarray] = None,
        window: Optional[int] = None,
) -> jnp.ndarray:
    """Full-sequence relative attention with optional fixed-size memory.

    x:    [B, Q, d_model] current segment (compute dtype).
    mems: [B, M, d_model] right-aligned memory or None.
    mem_valid: scalar int -- how many of the M memory slots are real.
    attn_mask: optional [B, Q] bool, True = position is a real token (padding
               mask for the keys of the current segment).
    window: sliding attention window (keys at distance >= window masked) --
            HF `same_length=True` semantics, which the reference uses by
            default (window = its mem_len); None = full causal.
    Returns [B, Q, d_model] (residual + layernorm applied).
    """
    dtype = x.dtype
    B, Q, d_model = x.shape
    n_head, d_head = p['r_w_bias'].shape
    scale = scale if scale is not None else 1.0 / (d_head ** 0.5)

    inp = x
    if pre_lnorm:
        x = layer_norm(p['ln'], x)

    if mems is not None:
        M = mems.shape[1]
        cat = jnp.concatenate([mems.astype(dtype), x], axis=1)
    else:
        M = 0
        cat = x
    K = M + Q

    q, k, v = _project_qkv(p, cat, Q, dtype)

    # positional term: distances K-1 .. 0, clamped
    pos_seq = jnp.arange(K - 1, -1, -1, dtype=jnp.float32)
    if clamp_len > 0:
        pos_seq = jnp.minimum(pos_seq, float(clamp_len))
    r = sinusoid_pos_emb(pos_seq, d_model, dtype)                       # [K, d]
    r_head = jnp.einsum('kd,dnh->knh', r, p['r'].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)

    rw = (q + p['r_w_bias'].astype(dtype))
    rr = (q + p['r_r_bias'].astype(dtype))
    AC = jnp.einsum('bqnh,bknh->bnqk', rw, k, preferred_element_type=jnp.float32)
    BD = jnp.einsum('bqnh,knh->bnqk', rr, r_head, preferred_element_type=jnp.float32)
    BD = rel_shift(BD)
    score = (AC + BD) * scale                                            # f32 [B,N,Q,K]

    # causal mask over current segment + validity mask over memory slots
    i = jnp.arange(Q)[:, None]
    j = jnp.arange(K)[None, :]
    causal = j <= (i + M)                                                # [Q, K]
    mem_ok = j >= (M - mem_valid)                                        # mask out empty slots
    mask = causal & mem_ok
    if window is not None:
        mask = mask & ((i + M - j) < window)
    mask = jnp.broadcast_to(mask[None, None], (B, 1, Q, K))
    if attn_mask is not None:
        key_ok = jnp.concatenate(
            [jnp.ones((B, M), dtype=bool), attn_mask.astype(bool)], axis=1)
        mask = mask & key_ok[:, None, None, :]
    score = jnp.where(mask, score, NEG_INF)

    probs = jax.nn.softmax(score, axis=-1)
    r_att = r_out = None
    if rng is not None and not deterministic:
        r_att, r_out = jax.random.split(rng)
    probs = dropout(probs, dropatt_rate, r_att, deterministic).astype(dtype)

    ctx = jnp.einsum('bnqk,bknh->bqnh', probs, v,
                     preferred_element_type=jnp.float32).astype(dtype)
    out = jnp.einsum('bqnh,nhd->bqd', ctx, p['o'].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    out = dropout(out, dropout_rate, r_out, deterministic)

    out = inp + out
    if not pre_lnorm:
        out = layer_norm(p['ln'], out)
    return out


def rel_attn_decode_step(
        p: Params, x: jnp.ndarray, cache_k: jnp.ndarray, cache_v: jnp.ndarray,
        cache_pos: jnp.ndarray, step: jnp.ndarray, *, clamp_len: int = -1,
        pre_lnorm: bool = False, scale: Optional[float] = None,
        window: Optional[int] = None,
        cache_k_scale: Optional[jnp.ndarray] = None,
        cache_v_scale: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token decode attention against a KV ring-buffer cache.

    Faster-than-reference design: the reference (HF TransfoXL `mems`,
    reference models/transformer_xl.py:223-241) caches layer-input hiddens and
    re-projects ALL memory slots to k/v every step.  In TF-XL the key content
    term is position-independent (position enters only through the separate
    BD term), so caching k/v directly is exact and removes that O(M*d^2)
    re-projection per layer per token.

    Per-step cost discipline (the decode scan is HBM-latency-bound):
      * the cache is attended IN PLACE -- no [B, M+1, N, H] concat copy of
        the ring buffers per layer per step (measured ~50 MB/layer/step of
        pure memcpy at 64-way base decode); the current token's attention
        score/value ride as a separate length-1 term;
      * the positional projection uses a distance-indexed table
        R_head[d] = W_r^T R(d), d in [0, clamp_len]: the table depends only
        on params, so XLA hoists it out of the decode scan, and each step
        pays one [M] row gather instead of an [M+1, d_model] sinusoid +
        einsum re-projection.

    x:         [B, 1, d_model] current token hidden (input to this layer).
    cache_k/v: [B, M, n_head, d_head] ring buffers.  May be int8 (from
               `quantize_kv_rows`), in which case cache_k_scale/cache_v_scale
               carry the per-row f32 scales [B, M, n_head]; the scales factor
               exactly out of the contractions, so the math is the quantized
               cache's exact attention (only the storage rounds).
    cache_pos: int32[M] absolute position per slot (-1 = empty).
    step:      scalar int32 absolute position of the current token.
    Returns (out [B,1,d], k_cur [B,1,N,H], v_cur [B,1,N,H]); the caller writes
    k_cur/v_cur into slot `step % M`.
    """
    dtype = x.dtype
    B, _, d_model = x.shape
    n_head, d_head = p['r_w_bias'].shape
    scale = scale if scale is not None else 1.0 / (d_head ** 0.5)
    M = cache_k.shape[1]

    inp = x
    if pre_lnorm:
        x = layer_norm(p['ln'], x)

    q, k_cur, v_cur = _project_qkv(p, x, 1, dtype)                       # all [B,1,N,H]

    # distance-indexed positional table (loop-invariant: hoisted out of the
    # decode scan by XLA); clamp folds distances > clamp_len onto the last row
    C = int(clamp_len) if clamp_len > 0 else M
    r_all = sinusoid_pos_emb(jnp.arange(C + 1, dtype=jnp.float32), d_model,
                             dtype)                                      # [C+1, d]
    r_head_all = jnp.einsum('kd,dnh->knh', r_all, p['r'].astype(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
    idx = jnp.clip(step - cache_pos, 0, C)                               # [M]
    r_head = r_head_all[idx]                                             # [M, N, H]

    rw = q + p['r_w_bias'].astype(dtype)
    rr = q + p['r_r_bias'].astype(dtype)
    kc = cache_k.astype(dtype)
    AC = jnp.einsum('bqnh,bknh->bnqk', rw, kc,
                    preferred_element_type=jnp.float32)                  # [B,N,1,M]
    if cache_k_scale is not None:       # fold the int8 row scales back in
        AC = AC * cache_k_scale.transpose(0, 2, 1)[:, :, None, :]
    BD = jnp.einsum('bqnh,knh->bnqk', rr, r_head,
                    preferred_element_type=jnp.float32)
    score_c = (AC + BD) * scale
    slot_ok = cache_pos >= 0
    if window is not None:
        slot_ok = slot_ok & ((step - cache_pos) < window)
    score_c = jnp.where(slot_ok[None, None, None, :], score_c, NEG_INF)
    # current token: distance 0, always valid
    s_self = (jnp.sum(rw * k_cur, axis=-1)                               # [B,1,N]
              + jnp.einsum('bqnh,nh->bqn', rr, r_head_all[0])
              ).transpose(0, 2, 1)[..., None] * scale                    # [B,N,1,1]
    score = jnp.concatenate([score_c, s_self], axis=-1)                  # [B,N,1,M+1]

    probs = jax.nn.softmax(score, axis=-1).astype(dtype)
    p_mem = probs[..., :M]
    if cache_v_scale is not None:       # fold scales into the probabilities
        p_mem = p_mem * cache_v_scale.transpose(0, 2, 1)[:, :, None, :].astype(dtype)
    ctx = jnp.einsum('bnqk,bknh->bqnh', p_mem, cache_v.astype(dtype),
                     preferred_element_type=jnp.float32)
    p_self = probs[..., M].transpose(0, 2, 1)[..., None]     # [B,1,N,1]
    ctx = (ctx + p_self.astype(jnp.float32)
           * v_cur.astype(jnp.float32)).astype(dtype)
    out = jnp.einsum('bqnh,nhd->bqd', ctx, p['o'].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    out = inp + out
    if not pre_lnorm:
        out = layer_norm(p['ln'], out)
    return out, k_cur, v_cur
