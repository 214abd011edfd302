"""`large` preset reality check: TPU train bench + HBM-fit record.

VERDICT r4 #4: prove the `large` preset tables aren't paper.  Measures train
tokens/sec/chip + MFU for TF-XL large (d1024 / 18L, reference
musicnlp/models/transformer_xl.py:16-23) and Reformer large on the real
chip, using the same measurement harness as bench.py (scan-looped jit
steps), and records device memory stats (peak HBM) for the fit statement.

Run one model per process (one TPU process at a time; XLA frees buffers on
process exit):

    python scripts/large_preset_bench.py --model tfxl
    python scripts/large_preset_bench.py --model reformer

Each run merges its record into artifacts/large_preset.json.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, 'artifacts', 'large_preset.json')


def mem_stats():
    """Device memory stats when the runtime exposes them (the tunneled axon
    backend reports none -- fields then read 0.0 and the fit evidence is the
    successful run itself plus the analytic state sizes)."""
    import jax
    d = jax.local_devices()[0]
    try:
        s = d.memory_stats() or {}
    except Exception:
        s = {}
    gb = 1024 ** 3
    return dict(
        peak_hbm_gb=round(s.get('peak_bytes_in_use', 0) / gb, 2),
        hbm_limit_gb=round(s.get('bytes_limit', 0) / gb, 2),
    )


def analytic_state(model, size, seq, vocab):
    """Parameter count + f32 param/adam-moment bytes: the dominant resident
    HBM after activations (which remat keeps bounded)."""
    import numpy as np
    if model == 'tfxl':
        from musicnlp_tpu.models.transformer_xl import (
            TransfoXL, TransfoXLConfig,
        )
        m = TransfoXL(TransfoXLConfig.from_size(size, vocab, max_length=seq))
    else:
        from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
        m = Reformer(ReformerConfig.from_size(size, vocab, max_length=seq))
    import jax
    params = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0)))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    return dict(params_millions=round(n / 1e6, 1),
                f32_param_plus_adam_gb=round(3 * 4 * n / 1024 ** 3, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', choices=['tfxl', 'reformer'], default='tfxl')
    ap.add_argument('--seq', type=int, default=None)
    ap.add_argument('--bsz', type=int, default=None)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--remat', action='store_true',
                    help='jax.checkpoint per block (Reformer only)')
    args = ap.parse_args()

    import bench

    if args.model == 'tfxl':
        if args.remat:
            ap.error('--remat applies only to --model reformer '
                     '(measure_ours takes no remat override)')
        seq = args.seq or 1024          # 22-11 shape at large scale
        bsz = args.bsz or 16
        vocab = 1190                    # measure_ours' degree-kind default
        tps = bench.measure_ours('large', seq, bsz, args.steps)
        fpt = bench.tfxl_train_flops_per_token('large', seq, vocab)
    else:
        seq = args.seq or 2048          # Reformer presets are long-seq
        bsz = args.bsz or 16
        vocab = 422                     # measure_reformer_train hardcodes the
        tps = bench.measure_reformer_train(  # midi-kind vocab (bench.py:319)
            'large', seq, bsz, args.steps,
            **(dict(remat=True) if args.remat else {}))
        fpt = bench.reformer_train_flops_per_token('large', seq, vocab)

    rec = dict(
        model=args.model, size='large', seq=seq, batch_size=bsz,
        vocab_size=vocab,
        steps=args.steps, tokens_per_sec_per_chip=round(tps, 1),
        **bench.mfu_fields(tps, fpt), **mem_stats(),
        **analytic_state(args.model, 'large', seq, vocab),
        remat=bool(args.remat),
        fit='ran to completion at this (batch, seq) on one v5e chip',
    )
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[args.model] = rec
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        json.dump(data, f, indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
