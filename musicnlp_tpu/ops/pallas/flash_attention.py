"""Fused Transformer-XL relative attention as Pallas TPU kernels.

Why: the jnp path materializes f32 [B, N, Q, K] score tensors in HBM (AC, BD,
masked scores, probs) and pays a full-tensor relayout for the rel-shift --
measured ~23 ms/layer forward at base/1024 on v5e vs ~1 ms of matmul FLOPs.
This kernel computes attention blockwise with an online softmax (flash
attention) and never materializes a score tensor.

The TF-XL positional term BD[q,k] = rr_q . R(d), d = (M+q) - k, cannot use the
rel-shift trick blockwise (lane-crossing reshapes don't lower in Mosaic), so
it is decomposed via the sine angle-addition identity into PLAIN MATMULS:
    R(d)    = W_sin sin(d w) + W_cos cos(d w)
    BD[q,k] = U[q] . Vk[k]
      U[q]  = [gs sin_q + gc cos_q ; -gs cos_q + gc sin_q]   content  [T, D]
      Vk[k] = [cos(k w) ; sin(k w)]                          position [S, D]
      gs/gc = rr @ W_r(sin/cos halves);  sin_q/cos_q = sin/cos((M+q) w)
exact for d <= clamp_len.  Clamped distances collapse to the same expression
evaluated at d = L: BD(q, k_far) = U[q] . Vk[(M+q) - L], so the kernel takes a
second position-only table VkL[q] = Vk[(M+q)-L] and computes the clamped bias
as an in-register row-wise dot -- no per-query f32 HBM vectors (a [BN, T, 1]
array tiles to (8,128) on TPU: a 128x padding explosion, measured OOM).

For the same reason the softmax statistics ride inside the lane padding of
the main tensors: the forward output is packed [BN, T, PAD] with the context
in columns [0, H) and the LSE in column H (H=64 pads to 128 lanes anyway);
the backward kernels receive dO packed the same way with LSE and delta in
columns H and H+1.

Backward = ONE fused Pallas kernel behind a custom VJP: scores recompute
once per block pair; drw/dU accumulate in scratch over the k sweep while
dk/dv emit as per-q-block partials summed outside.  The U/gs/gc construction
stays ordinary jnp, so JAX autodiff composes the W_r / bias gradients
automatically (the clamped-bias grad flows through dU exactly, since the
clamped bias is linear in U).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from musicnlp_tpu.ops.layers import Params, dropout, layer_norm

__all__ = ['flash_rel_attn', 'fused_rel_attn', 'fused_rel_attn_available']

NEG_INF = -1e30
DEFAULT_BQ = 512
DEFAULT_BK = 512


def _pad_to(h: int) -> int:
    """Lane padding that fits H context columns + LSE + delta."""
    return 128 * ((h + 2 + 127) // 128)


def fused_rel_attn_available(T: int, S: int, *, bq: int = DEFAULT_BQ,
                             bk: int = DEFAULT_BK) -> bool:
    return T % bq == 0 and S % bk == 0


# ------------------------------------------------------------------ kernels
def _interior(q0, k0, M, clamp_len, mem_valid, bq, bk):
    """Is block pair (q0, k0) free of any masking / clamping?  Interior blocks
    skip the per-element iota/compare/where chains entirely."""
    d_min = M + q0 - (k0 + bk - 1)
    d_max = M + q0 + bq - 1 - k0
    return (d_min >= 0) & (d_max <= clamp_len) & (k0 >= M - mem_valid)


def _score_block(rw, u, kb, vkb, far_col, q0, k0, M, scale, clamp_len,
                 mem_valid, bq, bk, masked, with_far=True):
    """Masked, scaled scores [bq, bk] f32 (+ d when masked).

    `with_far` is a trace-time flag: whether any distance in this block pair
    can exceed clamp_len (static given q0/k0 bounds); skipping the clamp
    select + per-query far dot on the many blocks that can't saves real VPU
    time -- masked-block elementwise work is the kernel's hot spot."""
    s = jax.lax.dot_general(rw, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    bd = jax.lax.dot_general(u, vkb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if not masked:
        return (s + bd) * scale, None
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + (M + q0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k0
    d = qpos - kpos
    if with_far:
        bd = jnp.where(d > clamp_len, far_col, bd)
    s = (s + bd) * scale
    valid = (d >= 0) & (kpos >= (M - mem_valid))
    return jnp.where(valid, s, NEG_INF), d


def _far_col(u, vkl):
    """Clamped-distance bias per query: rowwise dot U[q] . VkL[q] -> [bq, 1]."""
    return jnp.sum(u.astype(jnp.float32) * vkl.astype(jnp.float32),
                   axis=1, keepdims=True)


def _make_fwd(M, scale, clamp_len, bq, bk, n_kb, H, out_dtype):
    def kernel(mv_ref, rw_ref, u_ref, k_ref, v_ref, vk_ref, vkl_ref,
               o_ref, acc, m_i, l_i):
        ki, qi = pl.program_id(2), pl.program_id(1)
        q0, k0 = qi * bq, ki * bk

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_i[:] = jnp.full_like(m_i, NEG_INF)
            l_i[:] = jnp.zeros_like(l_i)

        def _update(masked, with_far=True):
            far = (_far_col(u_ref[0], vkl_ref[:])
                   if masked and with_far else None)
            s, _ = _score_block(
                rw_ref[0], u_ref[0], k_ref[0], vk_ref[:], far,
                q0, k0, M, scale, clamp_len, mv_ref[0], bq, bk, masked,
                with_far=with_far)
            m_prev = m_i[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_i[:] = l_i[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_i[:] = m_new
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc[:] = acc[:] * alpha + pv

        visited = k0 <= M + q0 + bq - 1          # skip fully-future blocks
        interior = _interior(q0, k0, M, clamp_len, mv_ref[0], bq, bk)
        may_clamp = (M + q0 + bq - 1 - k0) > clamp_len   # any d > clamp here?

        @pl.when(visited & interior)
        def _():
            _update(masked=False)

        @pl.when(visited & jnp.logical_not(interior) & may_clamp)
        def _():
            _update(masked=True, with_far=True)

        @pl.when(visited & jnp.logical_not(interior)
                 & jnp.logical_not(may_clamp))
        def _():
            _update(masked=True, with_far=False)

        @pl.when(ki == n_kb - 1)
        def _():
            l = jnp.maximum(l_i[:], 1e-30)
            P = o_ref.shape[-1]
            ctx = acc[:] / l                                   # [bq, H] f32
            lse = m_i[:] + jnp.log(l)                          # [bq, 1]
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, P), 1)
            packed = jnp.where(cols < H,
                               jnp.pad(ctx, ((0, 0), (0, P - H))),
                               jnp.where(cols == H,
                                         jnp.broadcast_to(lse, (bq, P)), 0.0))
            o_ref[0] = packed.astype(out_dtype)
    return kernel


def _make_bwd_fused(M, scale, clamp_len, bq, bk, n_kb, H, grad_dtype):
    """Grid (BN, n_qb, n_kb), k minor: ONE score recompute per block pair.

    drw/du accumulate in scratch across the k sweep; dk/dv contributions are
    written directly as per-q-block PARTIALS (each (qi, ki) output block is
    visited exactly once, so there is no revisit-order conflict) and summed
    over the small n_qb axis outside the kernel.
    """
    def kernel(mv_ref, rw_ref, u_ref, k_ref, v_ref, vk_ref, vkl_ref,
               dod_ref, drw_ref, du_ref, dkp_ref, dvp_ref, drw_acc, du_acc):
        ki, qi = pl.program_id(2), pl.program_id(1)
        q0, k0 = qi * bq, ki * bk

        @pl.when(ki == 0)
        def _():
            drw_acc[:] = jnp.zeros_like(drw_acc)
            du_acc[:] = jnp.zeros_like(du_acc)

        def _update(masked, with_far=True):
            far = (_far_col(u_ref[0], vkl_ref[:])
                   if masked and with_far else None)
            s, d = _score_block(
                rw_ref[0], u_ref[0], k_ref[0], vk_ref[:], far,
                q0, k0, M, scale, clamp_len, mv_ref[0], bq, bk, masked,
                with_far=with_far)
            dod = dod_ref[0].astype(jnp.float32)               # [bq, P]
            lse = dod[:, H:H + 1]
            delta = dod[:, H + 1:H + 2]
            do = dod[:, :H].astype(grad_dtype)
            p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta) * scale                      # [bq, bk] f32
            drw_acc[:] += jax.lax.dot_general(
                ds.astype(grad_dtype), k_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # k/v-side partials for this block pair
            dvp_ref[0, 0] = jax.lax.dot_general(
                p.astype(grad_dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dvp_ref.dtype)
            dkp_ref[0, 0] = jax.lax.dot_general(
                ds.astype(grad_dtype), rw_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dkp_ref.dtype)
            if masked and with_far:
                is_far = d > clamp_len
                ds_near = jnp.where(is_far, 0.0, ds)
                du_acc[:] += jax.lax.dot_general(
                    ds_near.astype(grad_dtype), vk_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # clamped-bias grad flows through U: dU += dfar * VkL
                dfar = jnp.sum(jnp.where(is_far, ds, 0.0), axis=1,
                               keepdims=True)
                du_acc[:] += dfar * vkl_ref[:].astype(jnp.float32)
            else:
                du_acc[:] += jax.lax.dot_general(
                    ds.astype(grad_dtype), vk_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        visited = k0 <= M + q0 + bq - 1
        interior = _interior(q0, k0, M, clamp_len, mv_ref[0], bq, bk)
        may_clamp = (M + q0 + bq - 1 - k0) > clamp_len

        @pl.when(visited & interior)
        def _():
            _update(masked=False)

        @pl.when(visited & jnp.logical_not(interior) & may_clamp)
        def _():
            _update(masked=True, with_far=True)

        @pl.when(visited & jnp.logical_not(interior)
                 & jnp.logical_not(may_clamp))
        def _():
            _update(masked=True, with_far=False)

        @pl.when(jnp.logical_not(visited))
        def _():
            # every (qi, ki) partial block is written exactly once
            dkp_ref[0, 0] = jnp.zeros_like(dkp_ref[0, 0])
            dvp_ref[0, 0] = jnp.zeros_like(dvp_ref[0, 0])

        @pl.when(ki == n_kb - 1)
        def _():
            drw_ref[0] = drw_acc[:].astype(drw_ref.dtype)
            du_ref[0] = du_acc[:].astype(du_ref.dtype)
    return kernel


# ------------------------------------------------------------- pallas calls
def _in_specs(bq, bk, H, D):
    return [
        pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),    # rw
        pl.BlockSpec((1, bq, D), lambda b, i, j, mv: (b, i, 0)),    # u
        pl.BlockSpec((1, bk, H), lambda b, i, j, mv: (b, j, 0)),    # k
        pl.BlockSpec((1, bk, H), lambda b, i, j, mv: (b, j, 0)),    # v
        pl.BlockSpec((bk, D), lambda b, i, j, mv: (j, 0)),          # vk
        pl.BlockSpec((bq, D), lambda b, i, j, mv: (i, 0)),          # vkl
    ]


def _fwd_call(rw3, u3, k3, v3, vk, vkl, mem_valid, *, M, scale, clamp_len,
              bq, bk, interpret=False):
    BN, T, H = rw3.shape
    D = u3.shape[-1]
    S = k3.shape[1]
    n_qb, n_kb = T // bq, S // bk
    P = _pad_to(H)
    mv = jnp.asarray(mem_valid, jnp.float32).astype(jnp.int32).reshape(1)
    kernel = _make_fwd(M, scale, clamp_len, bq, bk, n_kb, H, rw3.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BN, n_qb, n_kb),
        in_specs=_in_specs(bq, bk, H, D),
        out_specs=pl.BlockSpec((1, bq, P), lambda b, i, j, mv: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, H), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
    )
    packed = pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((BN, T, P), rw3.dtype),
    )(mv, rw3, u3, k3, v3, vk, vkl)
    return packed


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def flash_rel_attn(rw3, u3, k3, v3, vk, vkl, mem_valid,
                   M, scale, clamp_len, bq, bk, interpret):
    """Fused TF-XL attention core.

    rw3: [BN, T, H] queries + r_w_bias.        u3: [BN, T, D] factor U.
    k3/v3: [BN, S, H] (S = M + T with memory). vk: [S, D] position factor.
    vkl: [T, D] position factor at the clamp distance (Vk[(M+q)-clamp_len]).
    mem_valid: f32 scalar.  Returns ctx [BN, T, H].
    """
    packed = _fwd_call(rw3, u3, k3, v3, vk, vkl, mem_valid, M=M, scale=scale,
                       clamp_len=clamp_len, bq=bq, bk=bk, interpret=interpret)
    return packed[..., :rw3.shape[-1]]


def _flash_fwd(rw3, u3, k3, v3, vk, vkl, mem_valid,
               M, scale, clamp_len, bq, bk, interpret):
    packed = _fwd_call(rw3, u3, k3, v3, vk, vkl, mem_valid, M=M, scale=scale,
                       clamp_len=clamp_len, bq=bq, bk=bk, interpret=interpret)
    H = rw3.shape[-1]
    out = packed[..., :H]
    return out, (rw3, u3, k3, v3, vk, vkl, mem_valid, packed)


def _flash_bwd(M, scale, clamp_len, bq, bk, interpret, res, g):
    rw3, u3, k3, v3, vk, vkl, mem_valid, packed = res
    BN, T, H = rw3.shape
    D = u3.shape[-1]
    S = k3.shape[1]
    n_qb, n_kb = T // bq, S // bk
    P = _pad_to(H)
    g = g.astype(rw3.dtype)
    out = packed[..., :H]
    lse = packed[..., H:H + 1].astype(jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    # pack dO | lse | delta into the lane padding (no [BN,T,1] HBM tensors --
    # those tile to (8,128) with a 128x padding explosion)
    dod = jnp.concatenate([
        g.astype(jnp.float32), lse, delta,
        jnp.zeros((BN, T, P - H - 2), jnp.float32)], axis=-1).astype(rw3.dtype)
    mv = jnp.asarray(mem_valid, jnp.float32).astype(jnp.int32).reshape(1)

    kf = _make_bwd_fused(M, scale, clamp_len, bq, bk, n_kb, H, rw3.dtype)
    drw, du, dkp, dvp = pl.pallas_call(
        kf,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(BN, n_qb, n_kb),
            in_specs=_in_specs(bq, bk, H, D) + [
                pl.BlockSpec((1, bq, P), lambda b, i, j, mv: (b, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),
                pl.BlockSpec((1, bq, D), lambda b, i, j, mv: (b, i, 0)),
                pl.BlockSpec((1, 1, bk, H), lambda b, i, j, mv: (b, i, j, 0)),
                pl.BlockSpec((1, 1, bk, H), lambda b, i, j, mv: (b, i, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, H), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((BN, T, H), rw3.dtype),
            jax.ShapeDtypeStruct((BN, T, D), rw3.dtype),
            jax.ShapeDtypeStruct((BN, n_qb, S, H), rw3.dtype),
            jax.ShapeDtypeStruct((BN, n_qb, S, H), rw3.dtype),
        ],
    )(mv, rw3, u3, k3, v3, vk, vkl, dod)
    dk = jnp.sum(dkp.astype(jnp.float32), axis=1).astype(rw3.dtype)
    dv = jnp.sum(dvp.astype(jnp.float32), axis=1).astype(rw3.dtype)

    return (drw, du, dk, dv, jnp.zeros_like(vk), jnp.zeros_like(vkl),
            jnp.zeros((), jnp.float32))


flash_rel_attn.defvjp(_flash_fwd, _flash_bwd)


# ----------------------------------------------------------------- wrapper
def _sin_cos(pos: jnp.ndarray, d_model: int):
    inv = 1.0 / (10000.0 ** (jnp.arange(0, d_model, 2, dtype=jnp.float32)
                             / d_model))
    ang = pos.astype(jnp.float32)[:, None] * inv[None]
    return jnp.sin(ang), jnp.cos(ang)           # each [len, D/2]


def fused_rel_attn(
        p: Params, x: jnp.ndarray, mems: Optional[jnp.ndarray], mem_valid,
        *, clamp_len: int, pre_lnorm: bool = False,
        scale: Optional[float] = None, bq: int = DEFAULT_BQ,
        bk: int = DEFAULT_BK, interpret: bool = False,
        dropout_rate: float = 0.0, rng=None, deterministic: bool = True,
) -> jnp.ndarray:
    """Drop-in fused replacement for ops.attention.rel_attn.  Output dropout
    supported; attention-PROB dropout is not (the presets use dropatt=0)."""
    dtype = x.dtype
    B, T, d_model = x.shape
    n_head, d_head = p['r_w_bias'].shape
    scale = scale if scale is not None else 1.0 / (d_head ** 0.5)
    F = d_model // 2

    inp = x
    if pre_lnorm:
        x = layer_norm(p['ln'], x)

    if mems is not None:
        M = mems.shape[1]
        cat = jnp.concatenate([mems.astype(dtype), x], axis=1)
    else:
        M = 0
        cat = x
    S = M + T

    w = p['qkv'].astype(dtype)
    heads = jnp.einsum('bkd,dcnh->bkcnh', cat, w,
                       preferred_element_type=jnp.float32).astype(dtype)
    q = heads[:, -T:, 0]                                    # [B, T, N, H]
    k = heads[:, :, 1]
    v = heads[:, :, 2]

    rw = q + p['r_w_bias'].astype(dtype)
    rr = q + p['r_r_bias'].astype(dtype)

    # BD factors (see module docstring); the whole chain stays in the compute
    # dtype -- f32 intermediates here are [B,N,T,F] tensors whose HBM traffic
    # would rival the attention kernel itself
    Wr = p['r'].astype(dtype)                               # [D, N, H]
    gs = jnp.einsum('btnh,fnh->bntf', rr, Wr[:F],
                    preferred_element_type=jnp.float32).astype(dtype)
    gc = jnp.einsum('btnh,fnh->bntf', rr, Wr[F:],
                    preferred_element_type=jnp.float32).astype(dtype)
    sin_q, cos_q = _sin_cos(jnp.arange(M, M + T), d_model)  # [T, F]
    sin_q, cos_q = sin_q.astype(dtype), cos_q.astype(dtype)
    u = jnp.concatenate([gs * sin_q + gc * cos_q,
                         -gs * cos_q + gc * sin_q], axis=-1)  # [B,N,T,D]
    sin_k, cos_k = _sin_cos(jnp.arange(S), d_model)
    vk = jnp.concatenate([cos_k, sin_k], axis=-1).astype(dtype)   # [S, D]
    sin_l, cos_l = _sin_cos(jnp.arange(M, M + T) - clamp_len, d_model)
    vkl = jnp.concatenate([cos_l, sin_l], axis=-1).astype(dtype)  # [T, D]

    BN = B * n_head
    rw3 = rw.transpose(0, 2, 1, 3).reshape(BN, T, d_head)
    k3 = k.transpose(0, 2, 1, 3).reshape(BN, S, d_head)
    v3 = v.transpose(0, 2, 1, 3).reshape(BN, S, d_head)
    u3 = u.reshape(BN, T, d_model)

    ctx3 = flash_rel_attn(rw3, u3, k3, v3, vk, vkl,
                          jnp.asarray(mem_valid, jnp.float32),
                          M, scale, int(clamp_len), bq, bk, interpret)
    ctx = ctx3.reshape(B, n_head, T, d_head).transpose(0, 2, 1, 3)
    out = jnp.einsum('bqnh,nhd->bqd', ctx, p['o'].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    out = dropout(out, dropout_rate, rng, deterministic)
    out = inp + out
    if not pre_lnorm:
        out = layer_norm(p['ln'], out)
    return out
