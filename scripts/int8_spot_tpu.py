"""TPU spot-check of the int8 decode caches over full generations.

The CPU certification (tests/test_int8_generation_cert.py) pins paired
bf16-vs-int8 generations token-identical at debug size / f32 compute.  This
script repeats the check ON THE REAL CHIP at bf16 compute with a real trained
model (the real-corpus run of scripts/train_real.py), where quantization
rounding rides on top of bf16 noise -- the worst case the bench default
actually ships.  Writes artifacts/int8_spot_tpu.json.

Usage: python scripts/int8_spot_tpu.py [--run-dir /tmp/real/model_small]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


from musicnlp_tpu.utils.seq_metrics import norm_edit_distance as norm_edit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', default='/tmp/real/model_small')
    ap.add_argument('--n', type=int, default=32)
    ap.add_argument('--max-length', type=int, default=512)
    args = ap.parse_args()

    from musicnlp_tpu.trainer.eval import MusicGenerator, load_trained
    model, params, tok = load_trained(args.run_dir)
    cfg = model.cfg
    mq = type(model)(dataclasses.replace(cfg, decode_cache_quant='int8'))
    gen_d = MusicGenerator(model, tok, params, augment_key=False)
    gen_q = MusicGenerator(mq, tok, params, augment_key=False)
    prompts = [gen_d.unconditional_prompt(tempo=[90, 120, 150, 180][i % 4])
               for i in range(args.n)]
    res = {'run_dir': args.run_dir, 'n': args.n,
           'max_length': args.max_length, 'model': type(model).__name__,
           'compute_dtype': str(cfg.compute_dtype)}
    for strat, kw in (('greedy', {}), ('sample', dict(top_k=8))):
        td = gen_d.generate(prompts, strategy=strat,
                            max_length=args.max_length, seed=7, **kw)
        tq = gen_q.generate(prompts, strategy=strat,
                            max_length=args.max_length, seed=7, **kw)
        exact = float(np.mean([a == b for a, b in zip(td, tq)]))
        edit = float(np.mean([norm_edit(a, b) for a, b in zip(td, tq)]))
        res[strat] = dict(
            exact_match=round(exact, 4),
            mean_norm_edit=round(edit, 4),
            mean_len_bf16=round(float(np.mean(
                [len(t.split()) for t in td])), 1),
            mean_len_int8=round(float(np.mean(
                [len(t.split()) for t in tq])), 1))
        print(strat, json.dumps(res[strat]), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'artifacts', 'int8_spot_tpu.json')
    with open(out, 'w') as f:
        json.dump(res, f, indent=2)
    print('wrote', out)


if __name__ == '__main__':
    main()
