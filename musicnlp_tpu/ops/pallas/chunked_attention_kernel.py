"""Fused chunked attention (Reformer local/LSH window) as Pallas TPU kernels.

The Reformer-capability model attends within (own chunk + one look-back
chunk) windows, both for local layers and for LSH layers after the bucket
sort (ops/chunked_attention.py; reference musicnlp/models/reformer.py wraps
HF's Reformer which uses the same windowing).  The jnp formulation
materializes [G, R, n, c, 2c] f32 score tensors plus look-back concats in
HBM -- measured ~8 ms/layer forward at base/2048 for ~13 GFLOP of matmul,
i.e. pure memory traffic.  This kernel computes each chunk's [c, 2c] scores
in VMEM and writes only the [T, D] context (softmax statistics packed into
the lane padding, same scheme as flash_attention.py).

Masking is position-driven so ONE kernel serves both layer kinds:
    mask[q, k]  = kpos[k] <= qpos[q]   (& look-back chunk exists)
    self-bias   = added where kpos == qpos (shared-QK LSH; 0 for local)
Padding is encoded by the CALLER as kpos = T (an unreachable future
position) so pad keys are invisible to real queries while pad queries keep
their true position and still attend their window -- byte-compatible with
the jnp path's explicit pad mask.

Layout notes:
  * query-side positions arrive pre-transposed as [G, c, n] (chunk index on
    the minor axis); the whole tiny plane stays resident and the kernel
    extracts chunk J's [c, 1] column by a mask+lane-reduce -- no
    lane-crossing relayout, no unaligned lane slicing (Mosaic lowers
    neither);
  * key-side positions arrive chunk-major as [G, n, c] so per-chunk rows
    are sublane slices;
  * the look-back chunk is read through a SECOND BlockSpec of the same k/v
    tensors with index map (g, i-1) -- no [*, 2c, D] concat copies anywhere.

The backward kernel recomputes each window's scores once; dk/dv accumulate
into full-[T, D] output blocks resident in VMEM across each sequence's grid
window (index map ignores i), so no scatter or per-chunk partials hit HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ['chunked_window_attn', 'chunked_attn_available']

NEG_INF = -1e9


def _pad_to(d: int) -> int:
    """Lane padding fitting D context cols + lse (+ delta + dlse in bwd)."""
    return 128 * ((d + 3 + 127) // 128)


def chunked_attn_available(T: int, chunk: int, D: int) -> bool:
    if T % chunk or chunk % 8 or D % 8:
        return False
    return _pick_m(T, chunk) > 0


def _pick_m(T: int, chunk: int) -> int:
    """Chunks per grid block: largest m with m*chunk <= 512 dividing T."""
    m = max(1, min(T // chunk, 512 // chunk))
    while m > 1 and T % (m * chunk):
        m -= 1
    return m if T % (m * chunk) == 0 else 0


def _col_j(x, j):
    """Column j of a small [c, m] block as [c, 1], without lane slicing
    (unaligned lane offsets don't lower in Mosaic): mask + lane reduce."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.sum(jnp.where(lane == j, x, 0), axis=1, keepdims=True)


def _window(ref, prev_ref, j, c, m):
    """(self_chunk, prev_chunk) rows for local chunk j of the block.
    Row (sublane) slices only -- 64-row offsets are tile-legal."""
    cur = ref[0, j * c:(j + 1) * c]
    prev = (prev_ref[0, (m - 1) * c:m * c] if j == 0
            else ref[0, (j - 1) * c:j * c])
    return cur, prev


def _pos_rows(kpos_ref, kposp_ref, j, m):
    """Self/prev chunk key positions as [1, c] rows from [1, m, c] blocks."""
    cur = kpos_ref[0, j]
    prev = kposp_ref[0, m - 1] if j == 0 else kpos_ref[0, j - 1]
    return cur.reshape(1, -1), prev.reshape(1, -1)


def _scores(qj, k_self, k_prev, qp, kp_self, kp_prev, prev_ok, scale,
            self_bias, c):
    """Masked scaled scores for one chunk: ([c,c] self, [c,c] prev) f32."""
    s_self = jax.lax.dot_general(qj, k_self, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    s_prev = jax.lax.dot_general(qj, k_prev, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
    m_self = kp_self <= qp                       # [c, c] via broadcast
    m_prev = (kp_prev <= qp) & prev_ok
    s_self = jnp.where(m_self, s_self, NEG_INF)
    s_prev = jnp.where(m_prev, s_prev, NEG_INF)
    if self_bias:
        s_self = jnp.where(kp_self == qp, s_self + self_bias, s_self)
    return s_self, s_prev


def _make_fwd(c, m, scale, self_bias, D, out_dtype):
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpc_ref, o_ref):
        i = pl.program_id(1)
        P = o_ref.shape[-1]
        for j in range(m):
            qj = q_ref[0, j * c:(j + 1) * c]
            ks, kpv = _window(k_ref, kp_ref, j, c, m)
            vs, vpv = _window(v_ref, vp_ref, j, c, m)
            kp_s, kp_p = _pos_rows(kpos_ref, kposp_ref, j, m)
            qp = _col_j(qpc_ref[0], i * m + j)
            prev_ok = (i > 0) if j == 0 else True
            s_self, s_prev = _scores(qj, ks, kpv, qp, kp_s, kp_p, prev_ok,
                                     scale, self_bias, c)
            mx = jnp.maximum(jnp.max(s_self, axis=1, keepdims=True),
                             jnp.max(s_prev, axis=1, keepdims=True))
            p_self = jnp.exp(s_self - mx)
            p_prev = jnp.exp(s_prev - mx)
            l = (jnp.sum(p_self, axis=1, keepdims=True)
                 + jnp.sum(p_prev, axis=1, keepdims=True))
            l = jnp.maximum(l, 1e-30)
            ctx = (jax.lax.dot_general(
                       p_self.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       p_prev.astype(vs.dtype), vpv, (((1,), (0,)), ((), ())),
                       preferred_element_type=jnp.float32)) / l
            lse = mx + jnp.log(l)
            cols = jax.lax.broadcasted_iota(jnp.int32, (c, P), 1)
            packed = jnp.where(cols < D, jnp.pad(ctx, ((0, 0), (0, P - D))),
                               jnp.where(cols == D,
                                         jnp.broadcast_to(lse, (c, P)), 0.0))
            o_ref[0, j * c:(j + 1) * c] = packed.astype(out_dtype)
    return kernel


def _make_bwd(c, m, scale, self_bias, D, T, grad_dtype):
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpc_ref, dod_ref, dq_ref, dk_ref, dv_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])

        for j in range(m):
            qj = q_ref[0, j * c:(j + 1) * c]
            ks, kpv = _window(k_ref, kp_ref, j, c, m)
            vs, vpv = _window(v_ref, vp_ref, j, c, m)
            kp_s, kp_p = _pos_rows(kpos_ref, kposp_ref, j, m)
            qp = _col_j(qpc_ref[0], i * m + j)
            prev_ok = (i > 0) if j == 0 else True
            s_self, s_prev = _scores(qj, ks, kpv, qp, kp_s, kp_p, prev_ok,
                                     scale, self_bias, c)
            dod = dod_ref[0, j * c:(j + 1) * c].astype(jnp.float32)
            lse = dod[:, D:D + 1]
            delta = dod[:, D + 1:D + 2]
            dlse = dod[:, D + 2:D + 3]     # lse is a REAL output (LSH rounds)
            do = dod[:, :D].astype(grad_dtype)
            p_self = jnp.exp(s_self - lse)
            p_prev = jnp.exp(s_prev - lse)
            dp_self = jax.lax.dot_general(do, vs, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            dp_prev = jax.lax.dot_general(do, vpv, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            ds_self = (p_self * (dp_self - delta + dlse)
                       * scale).astype(grad_dtype)
            ds_prev = (p_prev * (dp_prev - delta + dlse)
                       * scale).astype(grad_dtype)
            dq = (jax.lax.dot_general(ds_self, ks, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(ds_prev, kpv, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
            dq_ref[0, j * c:(j + 1) * c] = dq.astype(dq_ref.dtype)
            # k/v-side: self chunk accumulates at J*c, look-back at (J-1)*c
            off = (i * m + j) * c
            dkb = jax.lax.dot_general(ds_self, qj, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dvb = jax.lax.dot_general(p_self.astype(grad_dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dk_ref[0, pl.ds(off, c), :] += dkb.astype(dk_ref.dtype)
            dv_ref[0, pl.ds(off, c), :] += dvb.astype(dv_ref.dtype)
            dkp = jax.lax.dot_general(ds_prev, qj, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dvp = jax.lax.dot_general(p_prev.astype(grad_dtype), do,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            offp = jnp.maximum(off - c, 0)
            if j == 0:
                @pl.when(i > 0)
                def _(dkp=dkp, dvp=dvp, offp=offp):
                    dk_ref[0, pl.ds(offp, c), :] += dkp.astype(dk_ref.dtype)
                    dv_ref[0, pl.ds(offp, c), :] += dvp.astype(dv_ref.dtype)
            else:
                dk_ref[0, pl.ds(offp, c), :] += dkp.astype(dk_ref.dtype)
                dv_ref[0, pl.ds(offp, c), :] += dvp.astype(dv_ref.dtype)
    return kernel


# ------------------------------------------------------------- pallas calls
def _specs(bq, c, m, D, n):
    prev = lambda g, i: (g, jnp.maximum(i - 1, 0), 0)
    cur = lambda g, i: (g, i, 0)
    return [
        pl.BlockSpec((1, bq, D), cur),                       # q
        pl.BlockSpec((1, bq, D), cur),                       # k (self block)
        pl.BlockSpec((1, bq, D), prev),                      # k (prev block)
        pl.BlockSpec((1, bq, D), cur),                       # v
        pl.BlockSpec((1, bq, D), prev),                      # v prev
        pl.BlockSpec((1, m, c), lambda g, i: (g, i, 0)),     # kpos rows
        pl.BlockSpec((1, m, c), lambda g, i: (g, jnp.maximum(i - 1, 0), 0)),
        # whole [c, n] qpos plane resident (tiny); column J selected in-kernel
        pl.BlockSpec((1, c, n), lambda g, i: (g, 0, 0)),     # qpos columns
    ]


def _fwd_call(q, k, v, kpos_rows, qpos_col, *, chunk, m, scale, self_bias,
              interpret):
    G, T, D = q.shape
    bq = m * chunk
    P = _pad_to(D)
    kernel = _make_fwd(chunk, m, scale, self_bias, D, q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(G, T // bq),
        in_specs=_specs(bq, chunk, m, D, T // chunk),
        out_specs=pl.BlockSpec((1, bq, P), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, T, P), q.dtype),
        interpret=interpret,
    )(q, k, k, v, v, kpos_rows, kpos_rows, qpos_col)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _chunked_core(q, k, v, kpos, qpos_col, chunk, m, scale, self_bias,
                  interpret):
    return _fwd_call(q, k, v, kpos, qpos_col, chunk=chunk, m=m, scale=scale,
                     self_bias=self_bias, interpret=interpret)


def _core_fwd(q, k, v, kpos, qpos_col, chunk, m, scale, self_bias, interpret):
    packed = _fwd_call(q, k, v, kpos, qpos_col, chunk=chunk, m=m, scale=scale,
                       self_bias=self_bias, interpret=interpret)
    return packed, (q, k, v, kpos, qpos_col, packed)


def _core_bwd(chunk, m, scale, self_bias, interpret, res, g):
    q, k, v, kpos, qpos_col, packed = res
    G, T, D = q.shape
    bq = m * chunk
    P = _pad_to(D)
    gD = g[..., :D].astype(jnp.float32)
    dlse = g[..., D:D + 1].astype(jnp.float32)   # cotangent of the lse column
    out = packed[..., :D].astype(jnp.float32)
    lse = packed[..., D:D + 1].astype(jnp.float32)
    delta = jnp.sum(gD * out, axis=-1, keepdims=True)
    dod = jnp.concatenate(
        [gD, lse, delta, dlse, jnp.zeros((G, T, P - D - 3), jnp.float32)],
        axis=-1).astype(q.dtype)
    kernel = _make_bwd(chunk, m, scale, self_bias, D, T, q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G, T // bq),
        in_specs=_specs(bq, chunk, m, D, T // chunk) + [
            pl.BlockSpec((1, bq, P), lambda g, i: (g, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, T, D), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, T, D), lambda g, i: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, T, D), q.dtype),
            jax.ShapeDtypeStruct((G, T, D), jnp.float32),
            jax.ShapeDtypeStruct((G, T, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, k, v, v, kpos, kpos, qpos_col, dod)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None


_chunked_core.defvjp(_core_fwd, _core_bwd)


def chunked_window_attn(q, k, v, qpos, kpos, *, chunk, scale,
                        self_bias: float = 0.0, interpret: bool = False):
    """Windowed (own + look-back chunk) causal attention.

    q/k/v: [G, T, D]; qpos/kpos: int32 [G, T] (kpos = T for padding).
    Returns (ctx [G, T, D], lse f32 [G, T])."""
    G, T, D = q.shape
    m = _pick_m(T, chunk)
    n = T // chunk
    qpos_col = qpos.reshape(G, n, chunk).transpose(0, 2, 1)  # [G, c, n]
    kpos_rows = kpos.reshape(G, n, chunk)                    # [G, n, c]
    packed = _chunked_core(q, k, v, kpos_rows, qpos_col, chunk, m, scale,
                           float(self_bias), interpret)
    return packed[..., :D], packed[..., D].astype(jnp.float32)
