"""VPU roofline for the chunked-attention kernel's mask/softmax chain.

The round-3 ablation measured the chunked LSH train kernel (base/2048/bsz16:
[m, c, 2c] = [8, 64, 128] per program) as VPU-mask-bound: ~2.7 us of
position-compare / exp / softmax vreg passes inside each ~3.9 us program
(CLAUDE.md perf notes).  The open question (round-3 verdict, Reformer train
item): is 2.7 us the FLOOR for that math on this VPU, or is there headroom?

This script answers it empirically, the same way the 110-TFLOP/s matmul
calibration anchors the MFU numbers: it runs the kernel's EXACT mask chain
(scale-mul, causal <=, self ==, nested selects, max-reduce, sub, exp,
sum-reduce, guard-max, divide, bf16 cast) in isolation -- same [8, 64, 128]
f32 shapes, VMEM-resident, no matmuls -- K times per pallas program via a
data-dependent fori_loop (XLA/Mosaic cannot hoist it), differences two K
values to cancel program-launch overhead, and prints ns per chain pass next
to the in-situ 2.7 us.  A second leg times a minimal mul-add chain to report
the VPU's raw elementwise rate for context.

Run on the real TPU: python scripts/vpu_roofline.py
Writes artifacts/vpu_roofline.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

M, C, W = 8, 64, 128          # [m, c, 2c] of the base/2048 LSH kernel
G = 64                        # grid programs per timing (sequential on TPU)


def _mask_chain_kernel(K):
    """K passes of the fwd kernel's exact VPU chain (no dots)."""
    def kernel(s_ref, kp_ref, qp_ref, o_ref):
        s0 = s_ref[0]
        kp3 = kp_ref[0][:, None, :]                       # [m, 1, 2c] int32
        qp3 = qp_ref[0][:, :, None]                       # [m, c, 1] int32

        def body(_, acc):
            # data dependence: fold a term of the previous pass back in so
            # Mosaic cannot hoist the loop-invariant chain
            s = s0 + acc * 1e-6
            s = s * 0.125                                  # scale mul
            s = jnp.where(kp3 <= qp3,
                          jnp.where(kp3 == qp3, s + 1e4, s), -1e9)
            mx = jnp.max(s, axis=2, keepdims=True)
            p = jnp.exp(s - mx)
            l = jnp.maximum(jnp.sum(p, axis=2, keepdims=True), 1e-30)
            ctx = (p / l).astype(jnp.bfloat16)             # cast pass
            return ctx.astype(jnp.float32)

        o_ref[0] = jax.lax.fori_loop(0, K, body, s0)
    return kernel


def _muladd_kernel(K):
    """K passes of one fused mul-add: the VPU's raw elementwise rate."""
    def kernel(s_ref, o_ref):
        s0 = s_ref[0]

        def body(_, acc):
            return acc * 1.0000001 + s0

        o_ref[0] = jax.lax.fori_loop(0, K, body, s0)
    return kernel


def _time(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))  # tunnel sync
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return time.perf_counter() - t0


def run_chain(K, interpret=False):
    s = jax.random.normal(jax.random.PRNGKey(0), (G, M, C, W), jnp.float32)
    kp = jnp.tile((jnp.arange(W, dtype=jnp.int32) - C)[None, None, :],
                  (G, M, 1))
    qp = jnp.tile(jnp.arange(C, dtype=jnp.int32)[None, None, :], (G, M, 1))
    call = pl.pallas_call(
        _mask_chain_kernel(K),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, C, W), lambda g: (g, 0, 0, 0)),
                  pl.BlockSpec((1, M, W), lambda g: (g, 0, 0)),
                  pl.BlockSpec((1, M, C), lambda g: (g, 0, 0))],
        out_specs=pl.BlockSpec((1, M, C, W), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, M, C, W), jnp.float32),
        interpret=interpret,
    )

    def squeeze(s, kp, qp):
        return call(s, kp, qp)

    fn = jax.jit(lambda a, b, c: squeeze(
        a.reshape(G, M, C, W), b.reshape(G, M, W), c.reshape(G, M, C)))
    return _time(fn, s, kp, qp)


def run_muladd(K, interpret=False):
    s = jax.random.normal(jax.random.PRNGKey(1), (G, M, C, W), jnp.float32)
    call = pl.pallas_call(
        _muladd_kernel(K),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, M, C, W), lambda g: (g, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, M, C, W), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, M, C, W), jnp.float32),
        interpret=interpret,
    )
    fn = jax.jit(call)
    return _time(fn, s)


def main():
    dev = jax.devices()[0]
    print('device:', dev)
    k1, k2 = 256, 1024
    t1, t2 = run_chain(k1), run_chain(k2)
    per_pass = (t2 - t1) / (G * (k2 - k1))
    m1, m2 = run_muladd(k1), run_muladd(k2)
    per_muladd = (m2 - m1) / (G * (k2 - k1))
    elems = M * C * W
    res = dict(
        shape=[M, C, W], grid=G,
        mask_chain_ns_per_pass=round(per_pass * 1e9, 1),
        muladd_ns_per_pass=round(per_muladd * 1e9, 1),
        muladd_elems_per_sec=round(elems / per_muladd / 1e9, 2),
        insitu_mask_us=2.7,
        insitu_program_us=3.9,
        note=('mask_chain_ns_per_pass is the isolated floor for the fwd '
              'kernel\'s exact compare/exp/softmax chain on [8,64,128]; '
              'compare against the 2.7 us in-situ ablation'),
    )
    print(json.dumps(res, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'artifacts', 'vpu_roofline.json')
    with open(out, 'w') as f:
        json.dump(res, f, indent=2)
    print('wrote', out)


if __name__ == '__main__':
    main()
