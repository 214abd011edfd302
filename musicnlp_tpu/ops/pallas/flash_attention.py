"""Fused Transformer-XL relative attention as Pallas TPU kernels.

Why: the jnp path materializes f32 [B, N, Q, K] score tensors in HBM (AC, BD,
masked scores, probs) and pays a full-tensor relayout for the rel-shift --
measured ~29 ms/layer forward at base/1024 on v5e vs ~1 ms of matmul FLOPs.
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
exact for d <= clamp_len; clamped distances collapse to a per-query constant
far[q] = rr_q . R(clamp_len), selected by an iota comparison in-kernel.  The
extra MXU FLOPs (contraction D instead of H) are far cheaper than the HBM
relayout they replace.

Backward = two more Pallas kernels (dq/dU-side, dk/dv-side) behind a custom
VJP.  The U/gs/gc construction stays ordinary jnp, so JAX autodiff composes
the W_r / bias gradients automatically around the core.
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


def fused_rel_attn_available(T: int, S: int, *, bq: int = DEFAULT_BQ,
                             bk: int = DEFAULT_BK) -> bool:
    return T % bq == 0 and S % bk == 0


# ------------------------------------------------------------------ kernels
def _interior(q0, k0, M, clamp_len, mem_valid, bq, bk):
    """Is block pair (q0, k0) free of any masking / clamping?

    Interior blocks skip the per-element iota/compare/where chains entirely --
    those VPU ops, not the matmuls, dominate kernel time (only diagonal and
    clamp-band blocks pay them)."""
    d_min = M + q0 - (k0 + bk - 1)
    d_max = M + q0 + bq - 1 - k0
    return (d_min >= 0) & (d_max <= clamp_len) & (k0 >= M - mem_valid)


def _score_block(rw, u, kb, vkb, far_col, q0, k0, M, scale, clamp_len,
                 mem_valid, bq, bk, masked):
    """Shared score computation: returns (scaled scores [bq, bk] f32, d)."""
    s = jax.lax.dot_general(rw, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    bd = jax.lax.dot_general(u, vkb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if not masked:
        return (s + bd) * scale, None
    qpos = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + (M + q0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k0
    d = qpos - kpos
    bd = jnp.where(d > clamp_len, far_col, bd)
    s = (s + bd) * scale
    valid = (d >= 0) & (kpos >= (M - mem_valid))
    return jnp.where(valid, s, NEG_INF), d


def _make_fwd(M, scale, clamp_len, bq, bk, n_kb, out_dtype):
    def kernel(mv_ref, rw_ref, u_ref, k_ref, v_ref, vk_ref, far_ref,
               o_ref, lse_ref, acc, m_i, l_i):
        ki, qi = pl.program_id(2), pl.program_id(1)
        q0, k0 = qi * bq, ki * bk

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_i[:] = jnp.full_like(m_i, NEG_INF)
            l_i[:] = jnp.zeros_like(l_i)

        def _update(masked):
            s, _ = _score_block(
                rw_ref[0], u_ref[0], k_ref[0], vk_ref[:],
                far_ref[0], q0, k0, M, scale, clamp_len,
                mv_ref[0], bq, bk, masked)
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

        @pl.when(visited & interior)
        def _():
            _update(masked=False)

        @pl.when(visited & jnp.logical_not(interior))
        def _():
            _update(masked=True)

        @pl.when(ki == n_kb - 1)
        def _():
            l = jnp.maximum(l_i[:], 1e-30)
            o_ref[0] = (acc[:] / l).astype(out_dtype)
            lse_ref[0] = m_i[:] + jnp.log(l)
    return kernel


def _make_bwd_q(M, scale, clamp_len, bq, bk, n_kb, grad_dtype):
    """Grid (BN, n_qb, n_kb): d_rw [bq,H], dU [bq,D], d_far [bq]."""
    def kernel(mv_ref, rw_ref, u_ref, k_ref, v_ref, vk_ref, far_ref,
               do_ref, lse_ref, delta_ref,
               drw_ref, du_ref, dfar_ref, drw_acc, du_acc, dfar_acc):
        ki, qi = pl.program_id(2), pl.program_id(1)
        q0, k0 = qi * bq, ki * bk

        @pl.when(ki == 0)
        def _():
            drw_acc[:] = jnp.zeros_like(drw_acc)
            du_acc[:] = jnp.zeros_like(du_acc)
            dfar_acc[:] = jnp.zeros_like(dfar_acc)

        def _update(masked):
            s, d = _score_block(
                rw_ref[0], u_ref[0], k_ref[0], vk_ref[:],
                far_ref[0], q0, k0, M, scale, clamp_len,
                mv_ref[0], bq, bk, masked)
            p = jnp.exp(s - lse_ref[0])
            do = do_ref[0]
            dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta_ref[0]) * scale   # [bq, bk] f32
            drw_acc[:] += jax.lax.dot_general(
                ds.astype(grad_dtype), k_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds_near = ds if not masked else jnp.where(d > clamp_len, 0.0, ds)
            du_acc[:] += jax.lax.dot_general(
                ds_near.astype(grad_dtype), vk_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            if masked:
                dfar_acc[:] += jnp.sum(jnp.where(d > clamp_len, ds, 0.0),
                                       axis=1, keepdims=True)

        visited = k0 <= M + q0 + bq - 1
        interior = _interior(q0, k0, M, clamp_len, mv_ref[0], bq, bk)

        @pl.when(visited & interior)
        def _():
            _update(masked=False)

        @pl.when(visited & jnp.logical_not(interior))
        def _():
            _update(masked=True)

        @pl.when(ki == n_kb - 1)
        def _():
            drw_ref[0] = drw_acc[:].astype(drw_ref.dtype)
            du_ref[0] = du_acc[:].astype(du_ref.dtype)
            dfar_ref[0] = dfar_acc[:]
    return kernel


def _make_bwd_kv(M, scale, clamp_len, bq, bk, n_qb, grad_dtype):
    """Grid (BN, n_kb, n_qb): dk [bk,H], dv [bk,H]."""
    def kernel(mv_ref, rw_ref, u_ref, k_ref, v_ref, vk_ref, far_ref,
               do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc):
        qi, ki = pl.program_id(2), pl.program_id(1)
        q0, k0 = qi * bq, ki * bk

        @pl.when(qi == 0)
        def _():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

        def _update(masked):
            s, _ = _score_block(
                rw_ref[0], u_ref[0], k_ref[0], vk_ref[:],
                far_ref[0], q0, k0, M, scale, clamp_len,
                mv_ref[0], bq, bk, masked)
            p = jnp.exp(s - lse_ref[0])
            do = do_ref[0]
            dv_acc[:] += jax.lax.dot_general(
                p.astype(grad_dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = (p * (dp - delta_ref[0]) * scale).astype(grad_dtype)
            dk_acc[:] += jax.lax.dot_general(
                ds, rw_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        visited = k0 <= M + q0 + bq - 1
        interior = _interior(q0, k0, M, clamp_len, mv_ref[0], bq, bk)

        @pl.when(visited & interior)
        def _():
            _update(masked=False)

        @pl.when(visited & jnp.logical_not(interior))
        def _():
            _update(masked=True)

        @pl.when(qi == n_qb - 1)
        def _():
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)
    return kernel


# ------------------------------------------------------------- pallas calls
def _q_specs(bq, bk, H, D):
    return [
        pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),    # rw
        pl.BlockSpec((1, bq, D), lambda b, i, j, mv: (b, i, 0)),    # u
        pl.BlockSpec((1, bk, H), lambda b, i, j, mv: (b, j, 0)),    # k
        pl.BlockSpec((1, bk, H), lambda b, i, j, mv: (b, j, 0)),    # v
        pl.BlockSpec((bk, D), lambda b, i, j, mv: (j, 0)),          # vk
        pl.BlockSpec((1, bq, 1), lambda b, i, j, mv: (b, i, 0)),    # far
    ]


def _fwd_call(rw3, u3, k3, v3, vk, far3, mem_valid, *, M, scale, clamp_len,
              bq, bk, interpret=False):
    BN, T, H = rw3.shape
    D = u3.shape[-1]
    S = k3.shape[1]
    n_qb, n_kb = T // bq, S // bk
    mv = jnp.asarray(mem_valid, jnp.float32).astype(jnp.int32).reshape(1)
    kernel = _make_fwd(M, scale, clamp_len, bq, bk, n_kb, rw3.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BN, n_qb, n_kb),
        in_specs=_q_specs(bq, bk, H, D),
        out_specs=[
            pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda b, i, j, mv: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, H), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((BN, T, H), rw3.dtype),
            jax.ShapeDtypeStruct((BN, T, 1), jnp.float32),
        ],
    )(mv, rw3, u3, k3, v3, vk, far3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def flash_rel_attn(rw3, u3, k3, v3, vk, far3, mem_valid,
                   M, scale, clamp_len, bq, bk, interpret):
    """Fused TF-XL attention core.

    rw3: [BN, T, H] queries + r_w_bias.        u3: [BN, T, D] factor U.
    k3/v3: [BN, S, H] (S = M + T with memory). vk: [S, D] position factor.
    far3: [BN, T] f32 = rr_q . R(clamp_len).   mem_valid: f32 scalar.
    Returns [BN, T, H].
    """
    out, _ = _fwd_call(rw3, u3, k3, v3, vk, far3, mem_valid, M=M, scale=scale,
                       clamp_len=clamp_len, bq=bq, bk=bk, interpret=interpret)
    return out


def _flash_fwd(rw3, u3, k3, v3, vk, far3, mem_valid,
               M, scale, clamp_len, bq, bk, interpret):
    out, lse = _fwd_call(rw3, u3, k3, v3, vk, far3, mem_valid, M=M,
                         scale=scale, clamp_len=clamp_len, bq=bq, bk=bk,
                         interpret=interpret)
    return out, (rw3, u3, k3, v3, vk, far3, mem_valid, out, lse)


def _flash_bwd(M, scale, clamp_len, bq, bk, interpret, res, g):
    rw3, u3, k3, v3, vk, far3, mem_valid, out, lse = res
    BN, T, H = rw3.shape
    D = u3.shape[-1]
    S = k3.shape[1]
    n_qb, n_kb = T // bq, S // bk
    g = g.astype(rw3.dtype)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    mv = jnp.asarray(mem_valid, jnp.float32).astype(jnp.int32).reshape(1)

    extra = [
        pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),    # dO
        pl.BlockSpec((1, bq, 1), lambda b, i, j, mv: (b, i, 0)),    # lse
        pl.BlockSpec((1, bq, 1), lambda b, i, j, mv: (b, i, 0)),    # delta
    ]
    kq = _make_bwd_q(M, scale, clamp_len, bq, bk, n_kb, rw3.dtype)
    drw, du, dfar = pl.pallas_call(
        kq,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(BN, n_qb, n_kb),
            in_specs=_q_specs(bq, bk, H, D) + extra,
            out_specs=[
                pl.BlockSpec((1, bq, H), lambda b, i, j, mv: (b, i, 0)),
                pl.BlockSpec((1, bq, D), lambda b, i, j, mv: (b, i, 0)),
                pl.BlockSpec((1, bq, 1), lambda b, i, j, mv: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, H), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
            ],
        ),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((BN, T, H), rw3.dtype),
            jax.ShapeDtypeStruct((BN, T, D), rw3.dtype),
            jax.ShapeDtypeStruct((BN, T, 1), jnp.float32),
        ],
    )(mv, rw3, u3, k3, v3, vk, far3, g, lse, delta)

    kv_specs = [
        pl.BlockSpec((1, bq, H), lambda b, j, i, mv: (b, i, 0)),    # rw
        pl.BlockSpec((1, bq, D), lambda b, j, i, mv: (b, i, 0)),    # u
        pl.BlockSpec((1, bk, H), lambda b, j, i, mv: (b, j, 0)),    # k
        pl.BlockSpec((1, bk, H), lambda b, j, i, mv: (b, j, 0)),    # v
        pl.BlockSpec((bk, D), lambda b, j, i, mv: (j, 0)),          # vk
        pl.BlockSpec((1, bq, 1), lambda b, j, i, mv: (b, i, 0)),    # far
        pl.BlockSpec((1, bq, H), lambda b, j, i, mv: (b, i, 0)),    # dO
        pl.BlockSpec((1, bq, 1), lambda b, j, i, mv: (b, i, 0)),    # lse
        pl.BlockSpec((1, bq, 1), lambda b, j, i, mv: (b, i, 0)),    # delta
    ]
    kkv = _make_bwd_kv(M, scale, clamp_len, bq, bk, n_qb, rw3.dtype)
    dk, dv = pl.pallas_call(
        kkv,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(BN, n_kb, n_qb),
            in_specs=kv_specs,
            out_specs=[
                pl.BlockSpec((1, bk, H), lambda b, j, i, mv: (b, j, 0)),
                pl.BlockSpec((1, bk, H), lambda b, j, i, mv: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, H), jnp.float32),
                pltpu.VMEM((bk, H), jnp.float32),
            ],
        ),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((BN, S, H), rw3.dtype),
            jax.ShapeDtypeStruct((BN, S, H), rw3.dtype),
        ],
    )(mv, rw3, u3, k3, v3, vk, far3, g, lse, delta)

    return (drw, du, dk, dv, jnp.zeros_like(vk), dfar,
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

    # BD factors (see module docstring)
    Wr = p['r'].astype(dtype)                               # [D, N, H]
    gs = jnp.einsum('btnh,fnh->bntf', rr, Wr[:F],
                    preferred_element_type=jnp.float32)
    gc = jnp.einsum('btnh,fnh->bntf', rr, Wr[F:],
                    preferred_element_type=jnp.float32)
    sin_q, cos_q = _sin_cos(jnp.arange(M, M + T), d_model)  # [T, F]
    u = jnp.concatenate([gs * sin_q + gc * cos_q,
                         -gs * cos_q + gc * sin_q], axis=-1)  # [B,N,T,D] f32
    sin_k, cos_k = _sin_cos(jnp.arange(S), d_model)
    vk = jnp.concatenate([cos_k, sin_k], axis=-1).astype(dtype)   # [S, D]
    sL, cL = _sin_cos(jnp.full((1,), float(clamp_len)), d_model)
    r_far = (jnp.einsum('of,fnh->onh', sL, Wr[:F].astype(jnp.float32))
             + jnp.einsum('of,fnh->onh', cL, Wr[F:].astype(jnp.float32)))[0]
    far = jnp.einsum('btnh,nh->bnt', rr.astype(jnp.float32), r_far)  # [B,N,T]

    BN = B * n_head
    rw3 = rw.transpose(0, 2, 1, 3).reshape(BN, T, d_head)
    k3 = k.transpose(0, 2, 1, 3).reshape(BN, S, d_head)
    v3 = v.transpose(0, 2, 1, 3).reshape(BN, S, d_head)
    u3 = u.astype(dtype).reshape(BN, T, d_model)
    far3 = far.reshape(BN, T, 1)

    ctx3 = flash_rel_attn(rw3, u3, k3, v3, vk, far3,
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
