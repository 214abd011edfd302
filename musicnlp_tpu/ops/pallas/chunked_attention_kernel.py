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

Execution shape (the round-3 restructure; the original form looped over the
m chunks of a block with a [c, c] matmul + mask + exp chain PER CHUNK,
serializing tiny MXU issues against the VPU): all m windows of a block are
assembled once into [m, 2c, D] stacks from a [(m+1)c, D] extended-rows
buffer, scores/probabilities/context run as SINGLE batched `dot_general`s
([m, c, D] x [m, 2c, D] -> [m, c, 2c]) and one [m, c, 2c] VPU
masking/softmax pass, and the whole [bq, P] block writes out at once.  The
backward accumulates its overlapping [m, 2c, D] dk/dv windows into a
[(m+1)c, D] VMEM scratch with STATIC row slices, then lands them on the
resident full-[T, D] accumulators with ONE dynamic-offset RMW per program
(the accumulators' index map ignores i, so no per-chunk partials ever hit
HBM).  A full-banded [bq, (m+1)c] single-matmul variant was also measured:
its ~5x band overcompute exactly cancels the bigger-matmul win (366 vs 354
ms/step at base/2048/bsz16) -- the windowed-batched form here is the knee.

Layout notes:
  * q/k-side positions both arrive chunk-major as [G, n, c] so per-chunk
    rows are sublane slices; the [m, 2c] per-window key positions build
    from rolls + masked selects (Mosaic cannot concatenate operands whose
    layouts carry mismatched sublane/lane offsets);
  * the look-back chunk is read through a SECOND BlockSpec of the same k/v
    tensors with index map (g, i-1) -- no HBM-side concat copies; the
    in-VMEM [(m+1)c, D] extended-rows concat is one 64-row sublane copy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['chunked_window_attn', 'chunked_attn_available']

NEG_INF = -1e9

# Kernel form when callers don't pass one: 'windows' ([m, 2c, D] stacked
# windows, one [m, c, 2c] dot per side) or 'twodot' (chunk-major halves,
# two [m, c, c] dots, no window stacking).  Env knob for benching
# (MUSICNLP_CHUNK_FORM=twodot bench.py ...); both forms are oracle-tested.
import os as _os
DEFAULT_FORM = _os.environ.get('MUSICNLP_CHUNK_FORM') or 'windows'


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


def _ext_rows(cur_ref, prev_ref, c, m):
    """[(m+1)c, D] extended rows: the previous block's LAST chunk, then the
    current block.  Sublane concat at a 64-row (tile-legal) offset."""
    return jnp.concatenate([prev_ref[0, (m - 1) * c:], cur_ref[0]], axis=0)


def _windows(ext, c, m):
    """[m, 2c, D] overlapping (prev, self) windows of [(m+1)c, D] rows."""
    return jnp.stack([ext[j * c:(j + 2) * c] for j in range(m)])


def _pos_windows(kpos_ref, kposp_ref, i, c, m):
    """[m, 2c] key positions per window from the [1, m, c] chunk-major
    blocks: column half [0, c) is the look-back chunk, [c, 2c) is self.
    Built from rolls + masked selects -- Mosaic cannot concatenate operands
    whose layouts carry mismatched sublane/lane offsets.

    The first chunk of the FIRST block has no look-back chunk; its prev rows
    come from the clamped (g, 0) index map, so their positions are poisoned
    to INT32_MAX here: the ordinary ``kpos <= qpos`` compare then masks them
    with NO dedicated [m, c, 2c] lane/chunk-index mask passes in the score
    kernel (those were ~6 extra VPU vreg passes per program, and the kernel
    is VPU-mask-bound -- see the module docstring's round-3 notes)."""
    kp_self = kpos_ref[0]                                     # [m, c]
    kp_prev = _prev_pos(kpos_ref, kposp_ref, i, c, m)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 2 * c), 1)
    pad = ((0, 0), (0, c))
    kp_prev_w = jnp.pad(kp_prev, pad)
    kp_self_w = pltpu.roll(jnp.pad(kp_self, pad), c, 1)
    return jnp.where(lane < c, kp_prev_w, kp_self_w)


def _masked_scores(qc, kc, qp, kp, c, m, scale, self_bias):
    """Batched masked scaled scores [m, c, 2c] f32 for all windows.

    Only the causal ``kpos <= qpos`` compare runs at [m, c, 2c]: padding
    arrives as kpos = T and the missing first look-back as INT32_MAX
    (_pos_windows), so ONE compare covers causality, padding, and the
    no-look-back corner."""
    s = jax.lax.dot_general(
        qc, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    qp3 = qp[:, :, None]
    kp3 = kp[:, None, :]
    if self_bias:
        # kpos == qpos only at a query's own entry (self half; subset of the
        # valid region) -- nest inside the causal select, branchless
        s = jnp.where(kp3 <= qp3,
                      jnp.where(kp3 == qp3, s + self_bias, s), NEG_INF)
    else:
        s = jnp.where(kp3 <= qp3, s, NEG_INF)
    return s


def _prev_pos(kpos_ref, kposp_ref, i, c, m):
    """[m, c] look-back-chunk key positions: row j holds chunk j-1's
    positions (row 0: the previous BLOCK's last chunk, poisoned to INT32_MAX
    on the first block where no look-back exists)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, c), 0)
    kp_prev = pltpu.roll(kpos_ref[0], 1, 0)                   # row j <- j-1
    prev_last = kposp_ref[0, m - 1].reshape(1, c)
    no_lookback = jnp.iinfo(jnp.int32).max
    first_row = jnp.where(i > 0, jnp.broadcast_to(prev_last, (m, c)),
                          no_lookback)
    return jnp.where(rows == 0, first_row, kp_prev)


def _half_scores(qc, kc, qp3, kp, scale, self_bias, with_self):
    """Masked scaled scores [m, c, c] for one (prev | self) half.  The
    self-equality bias only ever fires in the self half (positions within a
    G row are distinct, so a q position cannot reappear in the look-back
    chunk) -- the prev half skips that compare entirely."""
    s = jax.lax.dot_general(
        qc, kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    kp3 = kp[:, None, :]
    if with_self and self_bias:
        s = jnp.where(kp3 <= qp3,
                      jnp.where(kp3 == qp3, s + self_bias, s), NEG_INF)
    else:
        s = jnp.where(kp3 <= qp3, s, NEG_INF)
    return s


def _make_fwd2(c, m, scale, self_bias, D, out_dtype):
    """Two-dot form: no [m, 2c, D] window stacking.  Each half of the
    window ([prev | self] chunk) is a direct [m, c, D] chunk-major view --
    self straight off the input block, prev as rows [0, mc) of the
    extended-rows buffer -- and scores/context run as TWO batched
    [m, c, c] dot_generals with a joint online max.  Eliminates the k/v
    window-stack copies and _pos_windows' [m, 2c] roll/pad/select build;
    VPU mask/exp element count is unchanged."""
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpos_ref, o_ref):
        i = pl.program_id(1)
        P = o_ref.shape[-1]
        bq = m * c
        ext_k = _ext_rows(k_ref, kp_ref, c, m)                # [(m+1)c, D]
        ext_v = _ext_rows(v_ref, vp_ref, c, m)
        k_self = k_ref[0].reshape(m, c, D)
        v_self = v_ref[0].reshape(m, c, D)
        k_prev = ext_k[:m * c].reshape(m, c, D)
        v_prev = ext_v[:m * c].reshape(m, c, D)
        qc = q_ref[0].reshape(m, c, D)
        qp3 = qpos_ref[0][:, :, None]                         # [m, c, 1]
        kp_self = kpos_ref[0]                                 # [m, c]
        kp_prev = _prev_pos(kpos_ref, kposp_ref, i, c, m)
        s_self = _half_scores(qc, k_self, qp3, kp_self, scale, self_bias,
                              True)
        s_prev = _half_scores(qc, k_prev, qp3, kp_prev, scale, self_bias,
                              False)
        mx = jnp.maximum(jnp.max(s_self, axis=2, keepdims=True),
                         jnp.max(s_prev, axis=2, keepdims=True))
        p_self = jnp.exp(s_self - mx)
        p_prev = jnp.exp(s_prev - mx)
        l = jnp.maximum(jnp.sum(p_self, axis=2, keepdims=True)
                        + jnp.sum(p_prev, axis=2, keepdims=True), 1e-30)
        ctx = (jax.lax.dot_general(
                   p_self.astype(v_self.dtype), v_self,
                   (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   p_prev.astype(v_prev.dtype), v_prev,
                   (((2,), (1,)), ((0,), (0,))),
                   preferred_element_type=jnp.float32)) / l
        lse = (mx + jnp.log(l)).reshape(bq, 1)
        ctx2 = ctx.reshape(bq, D)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, P), 1)
        packed = jnp.where(cols < D, jnp.pad(ctx2, ((0, 0), (0, P - D))),
                           jnp.where(cols == D,
                                     jnp.broadcast_to(lse, (bq, P)), 0.0))
        o_ref[0] = packed.astype(out_dtype)
    return kernel


def _make_bwd2(c, m, scale, self_bias, D, T, grad_dtype):
    """Two-dot backward: per-half [m, c, c] recompute + [m, c, D] window
    grads (half the scratch-accumulate traffic of the [m, 2c, D] form)."""
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpos_ref, dod_ref, dq_ref, dk_ref, dv_ref, acc_k, acc_v):
        i = pl.program_id(1)
        bq = m * c

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])

        ext_k = _ext_rows(k_ref, kp_ref, c, m)
        ext_v = _ext_rows(v_ref, vp_ref, c, m)
        k_self = k_ref[0].reshape(m, c, D)
        v_self = v_ref[0].reshape(m, c, D)
        k_prev = ext_k[:m * c].reshape(m, c, D)
        v_prev = ext_v[:m * c].reshape(m, c, D)
        qc = q_ref[0].reshape(m, c, D)
        qp3 = qpos_ref[0][:, :, None]
        kp_self = kpos_ref[0]
        kp_prev = _prev_pos(kpos_ref, kposp_ref, i, c, m)
        s_self = _half_scores(qc, k_self, qp3, kp_self, scale, self_bias,
                              True)
        s_prev = _half_scores(qc, k_prev, qp3, kp_prev, scale, self_bias,
                              False)

        dod = dod_ref[0].reshape(m, c, -1).astype(jnp.float32)
        lse = dod[:, :, D:D + 1]
        delta = dod[:, :, D + 1:D + 2]
        dlse = dod[:, :, D + 2:D + 3]   # lse is a REAL output (LSH rounds)
        do = dod[:, :, :D].astype(grad_dtype)
        p_self = jnp.exp(s_self - lse)
        p_prev = jnp.exp(s_prev - lse)
        dp_self = jax.lax.dot_general(
            do, v_self, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dp_prev = jax.lax.dot_general(
            do, v_prev, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds_self = (p_self * (dp_self - delta + dlse) * scale).astype(
            grad_dtype)
        ds_prev = (p_prev * (dp_prev - delta + dlse) * scale).astype(
            grad_dtype)
        dq = (jax.lax.dot_general(
                  ds_self, k_self, (((2,), (1,)), ((0,), (0,))),
                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(
                  ds_prev, k_prev, (((2,), (1,)), ((0,), (0,))),
                  preferred_element_type=jnp.float32))
        dq_ref[0] = dq.reshape(bq, D).astype(dq_ref.dtype)
        dk_s = jax.lax.dot_general(
            ds_self, qc, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # [m, c, D]
        dk_p = jax.lax.dot_general(
            ds_prev, qc, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dv_s = jax.lax.dot_general(
            p_self.astype(grad_dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dv_p = jax.lax.dot_general(
            p_prev.astype(grad_dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_k[:] = jnp.zeros_like(acc_k)
        acc_v[:] = jnp.zeros_like(acc_v)
        for j in range(m):
            acc_k[j * c:(j + 1) * c, :] += dk_p[j]
            acc_k[(j + 1) * c:(j + 2) * c, :] += dk_s[j]
            acc_v[j * c:(j + 1) * c, :] += dv_p[j]
            acc_v[(j + 1) * c:(j + 2) * c, :] += dv_s[j]

        @pl.when(i == 0)
        def _():
            dk_ref[0, 0:bq, :] += acc_k[c:, :].astype(dk_ref.dtype)
            dv_ref[0, 0:bq, :] += acc_v[c:, :].astype(dv_ref.dtype)

        if T > bq:   # single-block grids never take the i > 0 branch
            @pl.when(i > 0)
            def _():
                off = i * bq - c
                dk_ref[0, pl.ds(off, (m + 1) * c), :] += acc_k[:].astype(
                    dk_ref.dtype)
                dv_ref[0, pl.ds(off, (m + 1) * c), :] += acc_v[:].astype(
                    dv_ref.dtype)
    return kernel


def _make_fwd(c, m, scale, self_bias, D, out_dtype):
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpos_ref, o_ref):
        i = pl.program_id(1)
        P = o_ref.shape[-1]
        bq = m * c
        kc = _windows(_ext_rows(k_ref, kp_ref, c, m), c, m)
        vc = _windows(_ext_rows(v_ref, vp_ref, c, m), c, m)
        qc = q_ref[0].reshape(m, c, D)
        qp = qpos_ref[0]
        kp = _pos_windows(kpos_ref, kposp_ref, i, c, m)
        s = _masked_scores(qc, kc, qp, kp, c, m, scale, self_bias)
        mx = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.maximum(jnp.sum(p, axis=2, keepdims=True), 1e-30)
        ctx = jax.lax.dot_general(
            p.astype(vc.dtype), vc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / l
        lse = (mx + jnp.log(l)).reshape(bq, 1)
        ctx2 = ctx.reshape(bq, D)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, P), 1)
        packed = jnp.where(cols < D, jnp.pad(ctx2, ((0, 0), (0, P - D))),
                           jnp.where(cols == D,
                                     jnp.broadcast_to(lse, (bq, P)), 0.0))
        o_ref[0] = packed.astype(out_dtype)
    return kernel


def _make_bwd(c, m, scale, self_bias, D, T, grad_dtype):
    def kernel(q_ref, k_ref, kp_ref, v_ref, vp_ref, kpos_ref, kposp_ref,
               qpos_ref, dod_ref, dq_ref, dk_ref, dv_ref, acc_k, acc_v):
        i = pl.program_id(1)
        bq = m * c

        @pl.when(i == 0)
        def _():
            dk_ref[0] = jnp.zeros_like(dk_ref[0])
            dv_ref[0] = jnp.zeros_like(dv_ref[0])

        kc = _windows(_ext_rows(k_ref, kp_ref, c, m), c, m)
        vc = _windows(_ext_rows(v_ref, vp_ref, c, m), c, m)
        qc = q_ref[0].reshape(m, c, D)
        qp = qpos_ref[0]
        kp = _pos_windows(kpos_ref, kposp_ref, i, c, m)
        s = _masked_scores(qc, kc, qp, kp, c, m, scale, self_bias)

        dod = dod_ref[0].reshape(m, c, -1).astype(jnp.float32)
        lse = dod[:, :, D:D + 1]
        delta = dod[:, :, D + 1:D + 2]
        dlse = dod[:, :, D + 2:D + 3]   # lse is a REAL output (LSH rounds)
        do = dod[:, :, :D].astype(grad_dtype)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vc, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta + dlse) * scale).astype(grad_dtype)
        dq = jax.lax.dot_general(
            ds, kc, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dq_ref[0] = dq.reshape(bq, D).astype(dq_ref.dtype)
        # window-side grads [m, 2c, D]; overlapping windows accumulate into
        # the [(m+1)c, D] scratch with STATIC row slices, then ONE dynamic
        # RMW lands them on the resident [T, D] accumulators
        dkw = jax.lax.dot_general(
            ds, qc, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dvw = jax.lax.dot_general(
            p.astype(grad_dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_k[:] = jnp.zeros_like(acc_k)
        acc_v[:] = jnp.zeros_like(acc_v)
        for j in range(m):
            acc_k[j * c:(j + 2) * c, :] += dkw[j]
            acc_v[j * c:(j + 2) * c, :] += dvw[j]

        @pl.when(i == 0)
        def _():
            # no block before the first: its prev-window contribution is
            # already zero through the mask; land rows [0, bq)
            dk_ref[0, 0:bq, :] += acc_k[c:, :].astype(dk_ref.dtype)
            dv_ref[0, 0:bq, :] += acc_v[c:, :].astype(dv_ref.dtype)

        if T > bq:   # single-block grids never take the i > 0 branch
            @pl.when(i > 0)
            def _():
                off = i * bq - c
                dk_ref[0, pl.ds(off, (m + 1) * c), :] += acc_k[:].astype(
                    dk_ref.dtype)
                dv_ref[0, pl.ds(off, (m + 1) * c), :] += acc_v[:].astype(
                    dv_ref.dtype)
    return kernel


# ------------------------------------------------------------- pallas calls
def _specs(bq, c, m, D):
    prev = lambda g, i: (g, jnp.maximum(i - 1, 0), 0)
    cur = lambda g, i: (g, i, 0)
    return [
        pl.BlockSpec((1, bq, D), cur),                       # q
        pl.BlockSpec((1, bq, D), cur),                       # k (self block)
        pl.BlockSpec((1, bq, D), prev),                      # k (prev block)
        pl.BlockSpec((1, bq, D), cur),                       # v
        pl.BlockSpec((1, bq, D), prev),                      # v prev
        pl.BlockSpec((1, m, c), cur),                        # kpos rows
        pl.BlockSpec((1, m, c), prev),                       # kpos prev rows
        pl.BlockSpec((1, m, c), cur),                        # qpos rows
    ]


def _fwd_call(q, k, v, kpos_rows, qpos_rows, *, chunk, m, scale, self_bias,
              interpret, form):
    G, T, D = q.shape
    bq = m * chunk
    P = _pad_to(D)
    mk = _make_fwd2 if form == 'twodot' else _make_fwd
    kernel = mk(chunk, m, scale, self_bias, D, q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(G, T // bq),
        in_specs=_specs(bq, chunk, m, D),
        out_specs=pl.BlockSpec((1, bq, P), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, T, P), q.dtype),
        interpret=interpret,
    )(q, k, k, v, v, kpos_rows, kpos_rows, qpos_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _chunked_core(q, k, v, kpos, qpos_rows, chunk, m, scale, self_bias,
                  interpret, form):
    return _fwd_call(q, k, v, kpos, qpos_rows, chunk=chunk, m=m, scale=scale,
                     self_bias=self_bias, interpret=interpret, form=form)


def _core_fwd(q, k, v, kpos, qpos_rows, chunk, m, scale, self_bias,
              interpret, form):
    packed = _fwd_call(q, k, v, kpos, qpos_rows, chunk=chunk, m=m,
                       scale=scale, self_bias=self_bias, interpret=interpret,
                       form=form)
    return packed, (q, k, v, kpos, qpos_rows, packed)


def _core_bwd(chunk, m, scale, self_bias, interpret, form, res, g):
    q, k, v, kpos, qpos_rows, packed = res
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
    mk = _make_bwd2 if form == 'twodot' else _make_bwd
    kernel = mk(chunk, m, scale, self_bias, D, T, q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G, T // bq),
        in_specs=_specs(bq, chunk, m, D) + [
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
        scratch_shapes=[
            pltpu.VMEM(((m + 1) * chunk, D), jnp.float32),
            pltpu.VMEM(((m + 1) * chunk, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, k, v, v, kpos, kpos, qpos_rows, dod)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None


_chunked_core.defvjp(_core_fwd, _core_bwd)


def chunked_window_attn(q, k, v, qpos, kpos, *, chunk, scale,
                        self_bias: float = 0.0, interpret: bool = False,
                        form: str = None):
    """Windowed (own + look-back chunk) causal attention.

    q/k/v: [G, T, D]; qpos/kpos: int32 [G, T] (kpos = T for padding).
    Returns (ctx [G, T, D], lse f32 [G, T]).

    form: 'windows' assembles [m, 2c, D] stacked key/value windows and runs
    one [m, c, 2c] dot per side; 'twodot' skips the window stacking and
    runs each (prev | self) half as a direct chunk-major [m, c, c] dot with
    a joint online max -- mathematically identical, different VMEM-staging
    profile (tests cross-check both against the dense oracle)."""
    form = form or DEFAULT_FORM
    assert form in ('windows', 'twodot'), form
    G, T, D = q.shape
    m = _pick_m(T, chunk)
    n = T // chunk
    qpos_rows = qpos.reshape(G, n, chunk)                    # [G, n, c]
    kpos_rows = kpos.reshape(G, n, chunk)                    # [G, n, c]
    packed = _chunked_core(q, k, v, kpos_rows, qpos_rows, chunk, m, scale,
                           float(self_bias), interpret, form)
    return packed[..., :D], packed[..., D].astype(jnp.float32)
