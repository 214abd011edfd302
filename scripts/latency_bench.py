"""p50/p90 song-generation latency on a trained real-corpus model.

The third BASELINE.md north-star metric ("p50 song-generation latency";
reference timing logs musicnlp/trainer/eval.py:331-335).  Measures the
end-to-end latency of unconditional 22-11-style generation (sample, top-k 8,
max_length 1024) at batch sizes {1, 32, 512} on the real TPU.

Latency semantics match the decode driver's early-exit rule
(trainer/eval.py::MusicGenerator.generate, early_exit_chunk=128): the scan
stops in 128-step chunks once every song has emitted </s>, so a song is
*releasable* at the end of the chunk containing its EOS.  Per-song latency is
therefore  wall * chunks(song_i) / chunks(batch)  — the wall-clock share up
to song i's releasing chunk — plus the full wall for the prompt/prefill
(folded in, it is one jit program).  b=1 runs several seeds for a
distribution; larger batches get per-song spread from one batch.

Writes artifacts/latency_p50.json and prints one JSON line per batch size.

Usage:  python scripts/latency_bench.py [--run-dir /tmp/real/model_base]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 128
KEYS = ['CMajor', 'GMajor', 'DMajor', 'AMinor', 'EMinor', 'FMajor',
        'BbMajor', 'DMinor']


def _device_platform() -> str:
    import jax
    return jax.devices()[0].platform


def measure(gen, bsz: int, max_length: int, seeds, tempo=120):
    """Generate `bsz` unconditional songs per seed; return per-song latencies.

    Returns (lat_s, toks_per_s, walls): per-song chunk-release latencies in
    seconds across all seeds, aggregate decode throughput, raw walls.
    """
    prompts = [gen.unconditional_prompt(key=KEYS[i % len(KEYS)], tempo=tempo)
               for i in range(bsz)]
    plen = max(len(gen.tokenizer.encode(p)) for p in prompts)
    # warm-up compile at this (bsz, P) shape -- not timed
    gen.generate(prompts, strategy='sample', top_k=8, seed=0,
                 max_length=max_length)
    lats, walls, n_tok = [], [], 0
    for seed in seeds:
        t0 = time.time()
        texts = gen.generate(prompts, strategy='sample', top_k=8, seed=seed,
                             max_length=max_length)
        wall = time.time() - t0
        walls.append(wall)
        out_len = np.array([len(t.split()) for t in texts])
        n_tok += int(out_len.sum()) - len(prompts) * plen
        chunks = np.maximum(np.ceil((out_len - plen) / CHUNK), 1)
        total = max(int(chunks.max()),
                    1)  # chunks the batch actually executed
        lats.extend(wall * chunks / total)
    return np.array(lats), n_tok / sum(walls), walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--run-dir', default='/tmp/real/model_base')
    ap.add_argument('--max-length', type=int, default=1024)
    ap.add_argument('--batch-sizes', type=int, nargs='+',
                    default=[1, 32, 512])
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'artifacts', 'latency_p50.json'))
    args = ap.parse_args()

    from musicnlp_tpu.trainer.eval import MusicGenerator, load_trained
    model, params, tok = load_trained(args.run_dir)
    gen = MusicGenerator(model, tok, params, augment_key=True)

    recs = {}
    for b in args.batch_sizes:
        seeds = list(range(1, 9)) if b == 1 else ([1, 2] if b <= 32 else [1])
        lat, tps, walls = measure(gen, b, args.max_length, seeds)
        rec = dict(
            batch_size=b, n_songs=len(lat), n_runs=len(seeds),
            p50_s=round(float(np.percentile(lat, 50)), 3),
            p90_s=round(float(np.percentile(lat, 90)), 3),
            mean_s=round(float(lat.mean()), 3),
            max_s=round(float(lat.max()), 3),
            batch_wall_s=[round(w, 3) for w in walls],
            decode_tok_per_s=round(tps, 1),
        )
        recs[str(b)] = rec
        print(json.dumps(dict(metric='song_gen_latency', **rec)), flush=True)

    meta = dict(
        run_dir=args.run_dir, max_length=args.max_length,
        strategy='sample top_k=8 (22-11)', early_exit_chunk=CHUNK,
        semantics='per-song latency = wall * release_chunk/total_chunks; '
                  'b=1 over 8 seeds, b>=32 per-song spread within batches',
        # the JAX_PLATFORMS env var does NOT reflect the actual platform
        # here (the axon sitecustomize overrides it; see CLAUDE.md) -- ask
        # the initialized backend instead
        device=_device_platform(),
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(dict(meta=meta, by_batch_size=recs), f, indent=2)
    print(f'wrote {args.out}', flush=True)


if __name__ == '__main__':
    main()
