#!/usr/bin/env python
"""Headline benchmark: Transformer-XL training MIDI-tokens/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- Ours: the full jitted train step (forward + masked CE + grad + AdamW) on the
  default JAX platform (the real TPU chip under axon; JAX_PLATFORMS=cpu for a
  smoke run), flagship 22-11 shape by default (TF-XL base, seq 1024,
  degree-pitch vocab 1190, bf16).
- Baseline: the reference's actual model path -- HF `TransfoXLLMHeadModel`
  with the reference's preset config (reference musicnlp/models/transformer_xl.py:16-66)
  on CPU torch (the reference has no TPU path and explicitly no DDP,
  reference trainer/train.py:219-220).  Measured once and cached in
  `baseline_ref.json` (keyed by size/seq), since a CPU step takes ~minutes.

Env knobs: BENCH_SIZE (base), BENCH_SEQ (1024), BENCH_BSZ (16),
BENCH_STEPS (10), BENCH_REMEASURE_BASELINE=1 to refresh the cache.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, 'baseline_ref.json')

# measured chip calibration: ~110 TFLOP/s bf16 on an 8192^3 matmul (CLAUDE.md)
CHIP_PEAK_TFLOPS = 110.0


def _env_int(name: str, default: int) -> int:
    """Parse an integer env knob; tolerate empty/garbage values (ADVICE r3)."""
    v = os.environ.get(name)
    if v is None or not v.strip():
        return default
    try:
        return int(v)
    except ValueError:
        raise SystemExit(f'bench: {name}={v!r} is not an integer')


def tfxl_train_flops_per_token(size: str, seq: int, vocab_size: int) -> float:
    """Analytic train FLOPs/token for the TF-XL step (fwd+bwd = 3x fwd).

    Matmul params: per layer QKV (3d^2) + out (d^2) + rel-pos r proj (d^2)
    + FFN (8d^2) = 13d^2; tied head V*d.  Fwd+bwd over params = 6P/token.
    Attention contractions (not in P): per query the AC score, the BD
    rel-pos score, and the AV sum each cost 2*ctx*d fwd, ctx = average
    causally-attended length = (seq+1)/2 (bench runs n_seg=1, no mems)
    clamped by attn_window when set -> 18 * n_layer * ctx * d per token
    for the train step.
    """
    from musicnlp_tpu.models.transformer_xl import TransfoXLConfig
    cfg = TransfoXLConfig.from_size(size, vocab_size=vocab_size,
                                    max_length=seq)
    d, nl = cfg.d_model, cfg.n_layer
    ctx = (seq + 1) / 2
    if cfg.attn_window:
        ctx = min(ctx, cfg.attn_window)
    p_matmul = nl * 13 * d * d + vocab_size * d
    return 6.0 * p_matmul + 18.0 * nl * ctx * d


def reformer_train_flops_per_token(size: str, seq: int,
                                   vocab_size: int) -> float:
    """Analytic train FLOPs/token for the Reformer step (fwd+bwd = 3x fwd).

    Matmuls: local layer 3d^2 (qkv) + d^2 (out), LSH layer 2d^2 (shared
    qk + v) + d^2 (out), FFN 8d^2 each; tied head V*d.  Attention
    contractions: local attends ~2*local_chunk per query; LSH attends
    ~2*lsh_chunk per hash round (n_hashes rounds); score+AV = 4*cols*d
    fwd each.  Hashing: d x (n_hashes * n_buckets/2) matmul per LSH query.
    """
    from musicnlp_tpu.models.reformer import ReformerConfig, _auto_buckets
    cfg = ReformerConfig.from_size(size, vocab_size=vocab_size,
                                   max_length=seq)
    d = cfg.d_model
    n_local = sum(1 for k in cfg.attn_layers if k == 'local')
    n_lsh = len(cfg.attn_layers) - n_local
    nb = cfg.n_buckets or _auto_buckets(seq, cfg.lsh_chunk)
    p_matmul = (n_local * (4 + 8) + n_lsh * (3 + 8)) * d * d + vocab_size * d
    fwd_attn = (n_local * 4 * (2 * cfg.local_chunk) * d
                + n_lsh * (cfg.n_hashes * 4 * (2 * cfg.lsh_chunk) * d
                           + 2 * d * cfg.n_hashes * nb / 2))
    return 6.0 * p_matmul + 3.0 * fwd_attn


def mfu_fields(tokens_per_sec: float, flops_per_token: float) -> dict:
    tf = tokens_per_sec * flops_per_token / 1e12
    return dict(tflops_per_sec=round(tf, 2),
                mfu_vs_110tf=round(tf / CHIP_PEAK_TFLOPS, 3))


def measure_ours(size: str, seq: int, bsz: int, steps: int,
                 vocab_size: int = 1190, head_chunk: int = None,
                 shard_vocab: bool = False) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
    from musicnlp_tpu.utils.rng import train_key

    cfg = TransfoXLConfig.from_size(size, vocab_size=vocab_size, max_length=seq,
                                    dtype='bfloat16', head_chunk=head_chunk,
                                    shard_vocab=shard_vocab)
    if shard_vocab:
        # exercise the vocab-row-sharded head code path (shard_map CE); on
        # the single bench chip the mesh is (1, 1) and collectives are no-ops
        from musicnlp_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(n_data=1, n_model=1)
        model = TransfoXL(cfg, mesh=mesh)
        params = model.init(jax.random.PRNGKey(0))
        params = mesh_lib.shard_pytree(
            params, mesh_lib.param_specs(params, shard_vocab=True), mesh)
    else:
        model = TransfoXL(cfg)
        params = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(3e-4, weight_decay=1e-2))
    opt_state = jax.jit(tx.init)(params)

    ids = jax.random.randint(jax.random.PRNGKey(1), (bsz, seq), 0,
                             cfg.vocab_size, dtype=jnp.int32)
    labels = jnp.where(ids % 13 == 0, -100, ids)

    def train_step(params, opt_state, ids, labels, rng):
        def loss_fn(p):
            loss, _ = model.loss(p, ids, labels, rng=rng, deterministic=False)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # scan `steps` train steps inside ONE device program: the per-call RPC
    # overhead of the tunneled backend (~28 ms, measured) would otherwise
    # dominate; a real training loop dispatches asynchronously and never
    # pays a per-step host sync.  Donation matters at the 262k-vocab tier
    # (params+opt state alone are ~4 GB).
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_steps(params, opt_state, ids, labels, rng):
        def body(carry, r):
            params, opt_state = carry
            params, opt_state, loss = train_step(params, opt_state, ids,
                                                 labels, r)
            return (params, opt_state), loss
        rngs = jax.random.split(rng, steps)
        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                                   rngs)
        return params, opt_state, losses[-1]

    params, opt_state, loss = run_steps(params, opt_state, ids, labels,
                                        train_key(2))
    float(loss)   # compile + warmup sync
    t0 = time.perf_counter()
    params, opt_state, loss = run_steps(params, opt_state, ids, labels,
                                        train_key(3))
    float(loss)
    dt = time.perf_counter() - t0
    n_chip = 1  # single-chip benchmark; dp scales per-chip throughput ~linearly
    return bsz * seq * steps / dt / n_chip


def measure_reference_baseline(size: str, seq: int) -> float:
    """HF TransfoXL on CPU torch, reference preset config; tokens/sec."""
    import torch
    from transformers import TransfoXLConfig as HFConfig
    from transformers import TransfoXLLMHeadModel

    # transformers 4.57's deprecated TransfoXL calls `.type_as(dtype=...)`
    # (invalid since torch 2.x); shim it so the TRUE reference path runs
    # (the reference repo pins transformers==4.25.1 where this worked)
    _orig_type_as = torch.Tensor.type_as
    def _type_as(self, other=None, dtype=None):
        return self.to(dtype if dtype is not None else other.dtype)
    torch.Tensor.type_as = _type_as

    presets = {  # reference models/transformer_xl.py:16-35
        'debug': dict(d_model=128, n_head=8, n_layer=4),
        'tiny': dict(d_model=256, n_head=8, n_layer=6),
        'small': dict(d_model=512, n_head=8, n_layer=12),
        'base': dict(d_model=768, n_head=12, n_layer=12),
        'large': dict(d_model=1024, n_head=16, n_layer=18),
    }
    p = presets[size]
    d = p['d_model']
    cfg = HFConfig(
        vocab_size=1190, d_model=d, d_embed=d, n_head=p['n_head'],
        d_head=d // p['n_head'], d_inner=d * 4, n_layer=p['n_layer'],
        mem_len=max(128, seq // 8), clamp_len=max(1024, seq // 2),
        div_val=1, cutoffs=[1000])
    model = TransfoXLLMHeadModel(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=1e-2)
    bsz = 2
    ids = torch.randint(0, 1190, (bsz, seq))
    steps = 2
    # warmup
    out = model(input_ids=ids, labels=ids)
    out.losses.mean().backward()
    opt.step(); opt.zero_grad()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = model(input_ids=ids, labels=ids)
        out.losses.mean().backward()
        opt.step(); opt.zero_grad()
    dt = time.perf_counter() - t0
    return bsz * seq * steps / dt


def get_baseline(size: str, seq: int) -> float:
    key = f'{size}-seq{seq}'
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if key not in cache or os.environ.get('BENCH_REMEASURE_BASELINE'):
        cache[key] = dict(
            tokens_per_sec=measure_reference_baseline(size, seq),
            what='HF TransfoXLLMHeadModel fwd+bwd+AdamW, torch CPU, bsz 2',
            measured_at=time.strftime('%Y-%m-%d %H:%M:%S'))
        with open(BASELINE_CACHE, 'w') as f:
            json.dump(cache, f, indent=2)
    return cache[key]['tokens_per_sec']


def measure_decode_ours(size: str, gen_len: int, bsz: int,
                        kv_quant: str = None) -> dict:
    """Batched sampling decode via the KV-ring scan; tokens/sec + p50 latency."""
    import jax
    import jax.numpy as jnp

    from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
    from musicnlp_tpu.ops.sampling import SampleConfig, generate_scan

    cfg = TransfoXLConfig.from_size(size, vocab_size=1190, max_length=gen_len,
                                    dtype='bfloat16',
                                    decode_cache_quant=kv_quant)
    model = TransfoXL(cfg)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (bsz, 4), 8,
                                cfg.vocab_size, dtype=jnp.int32)
    plen = jnp.full((bsz,), 4, jnp.int32)
    scfg = SampleConfig(strategy='sample', top_k=8)

    @jax.jit
    def run(params, prompt, plen, rng):
        st = model.init_decode_state(bsz)
        return generate_scan(
            lambda t, s: model.decode_step(params, t, s), st, prompt, plen,
            max_length=gen_len, eos_id=3, pad_id=1, sample_cfg=scfg,
            vocab_size=cfg.vocab_size, rng=rng)

    ids, _ = run(params, prompt, plen, jax.random.PRNGKey(2))
    int(ids[0, 0])
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        ids, _ = run(params, prompt, plen, jax.random.PRNGKey(3 + i))
        int(ids[0, 0])
    dt = (time.perf_counter() - t0) / reps
    # the whole batch decodes as ONE program, so dt is the latency of a full
    # batch of songs (every song in it finishes together), not a per-song p50
    return dict(tokens_per_sec=bsz * gen_len / dt, batch_latency_s=dt)


def measure_decode_baseline(size: str, gen_len: int) -> float:
    """Reference decode: HF TransfoXL mems-as-past loop, torch CPU, tokens/s.
    (transformers 4.57 removed `generate` from TransfoXL, so this drives the
    same last-token + mems loop `prepare_inputs_for_generation` set up,
    reference models/transformer_xl.py:223-241.)"""
    import torch
    from transformers import TransfoXLConfig as HFConfig
    from transformers import TransfoXLLMHeadModel

    _orig_type_as = torch.Tensor.type_as
    def _type_as(self, other=None, dtype=None):
        return self.to(dtype if dtype is not None else other.dtype)
    torch.Tensor.type_as = _type_as

    presets = {'debug': (128, 8, 4), 'tiny': (256, 8, 6), 'small': (512, 8, 12),
               'base': (768, 12, 12), 'large': (1024, 16, 18)}
    d, nh, nl = presets[size]
    cfg = HFConfig(vocab_size=1190, d_model=d, d_embed=d, n_head=nh,
                   d_head=d // nh, d_inner=d * 4, n_layer=nl,
                   mem_len=max(128, gen_len // 8), clamp_len=1024,
                   div_val=1, cutoffs=[1000])
    model = TransfoXLLMHeadModel(cfg).eval()
    n = min(48, gen_len)
    with torch.no_grad():
        tok = torch.randint(8, 1190, (1, 4))
        out = model(input_ids=tok)
        mems = out.mems
        tok = out.prediction_scores[:, -1].argmax(-1, keepdim=True)
        t0 = time.perf_counter()
        for _ in range(n):
            out = model(input_ids=tok, mems=mems)
            mems = out.mems
            tok = out.prediction_scores[:, -1].argmax(-1, keepdim=True)
        dt = time.perf_counter() - t0
    return n / dt


def measure_reformer_train(size: str, seq: int, bsz: int, steps: int,
                           **cfg_overrides) -> float:
    """Our Reformer (22-04 recipe shape) jitted train step, tokens/sec/chip.

    cfg_overrides reach ReformerConfig (e.g. remat=True -- required to fit
    `large` on one 16 GB chip, see scripts/large_preset_bench.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
    from musicnlp_tpu.utils.rng import train_key

    cfg = ReformerConfig.from_size(size, vocab_size=422, max_length=seq,
                                   dtype='bfloat16', **cfg_overrides)
    model = Reformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(3e-4, weight_decay=1e-2))
    opt_state = jax.jit(tx.init)(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (bsz, seq), 0,
                             cfg.vocab_size, dtype=jnp.int32)
    labels = jnp.where(ids % 13 == 0, -100, ids)

    @jax.jit
    def run_steps(params, opt_state, ids, labels, rng):
        def body(carry, r):
            params, opt_state = carry

            def loss_fn(p):
                loss, _ = model.loss(p, ids, labels, rng=r,
                                     deterministic=False)
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(rng, steps))
        return params, opt_state, losses[-1]

    params, opt_state, loss = run_steps(params, opt_state, ids, labels,
                                        train_key(2))
    float(loss)
    t0 = time.perf_counter()
    params, opt_state, loss = run_steps(params, opt_state, ids, labels,
                                        train_key(3))
    float(loss)
    return bsz * seq * steps / (time.perf_counter() - t0)


def measure_reformer_train_baseline(size: str, seq: int) -> float:
    """HF Reformer on CPU torch, reference preset config; tokens/sec."""
    import torch
    from transformers import ReformerConfig as HFConfig
    from transformers import ReformerModelWithLMHead

    presets = {  # reference models/reformer.py:15-55
        'debug': dict(d=128, nh=8, pairs=3, axial=(8, 8), seq=64),
        'tiny': dict(d=256, nh=8, pairs=3, axial=(32, 32), seq=1024),
        'small': dict(d=512, nh=8, pairs=3, axial=(32, 64), seq=2048),
        'base': dict(d=768, nh=12, pairs=6, axial=(32, 64), seq=2048),
        'large': dict(d=1024, nh=16, pairs=12, axial=(32, 64), seq=2048),
    }
    p = presets[size]
    d = p['d']
    n1 = seq // 64 if seq % 64 == 0 else p['axial'][0]
    cfg = HFConfig(
        vocab_size=422, hidden_size=d, num_attention_heads=p['nh'],
        attention_head_size=d // p['nh'], feed_forward_size=d * 4,
        attn_layers=['local', 'lsh'] * p['pairs'],
        axial_pos_shape=(n1, 64), axial_pos_embds_dim=(d // 4, 3 * d // 4),
        max_position_embeddings=seq, num_hashes=2 if size in ('base', 'large') else 1,
        is_decoder=True)
    model = ReformerModelWithLMHead(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=1e-2)
    bsz, steps = 2, 2
    ids = torch.randint(0, 422, (bsz, seq))
    out = model(input_ids=ids, labels=ids)   # warmup
    out.loss.backward()
    opt.step(); opt.zero_grad()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = model(input_ids=ids, labels=ids)
        out.loss.backward()
        opt.step(); opt.zero_grad()
    return bsz * seq * steps / (time.perf_counter() - t0)


def measure_reformer_decode(size: str, gen_len: int, bsz: int,
                            kv_quant: str = None) -> dict:
    """Incremental (bucket-cached) Reformer decode vs the exact-but-quadratic
    full-prefix re-forward oracle it replaced (round-1 capability gap)."""
    import jax
    import jax.numpy as jnp

    from musicnlp_tpu.models.reformer import Reformer, ReformerConfig
    from musicnlp_tpu.ops.sampling import SampleConfig, generate_scan

    scan_chunk = _env_int('BENCH_SCAN_CHUNK', 0) or None
    if scan_chunk and gen_len % scan_chunk:
        raise SystemExit(f'bench: BENCH_SCAN_CHUNK={scan_chunk} must divide '
                         f'gen_len={gen_len}')
    cfg = ReformerConfig.from_size(size, vocab_size=422, max_length=gen_len,
                                   dtype='bfloat16',
                                   decode_cache_quant=kv_quant,
                                   decode_scan_chunk=scan_chunk)
    # Fail FAST on configs whose decode caches overflow HBM: an on-device
    # OOM crashes the TPU worker, and a crashed worker can wedge the tunnel
    # for hours (CLAUDE.md).  Measured: base/2048 bf16 b256 (~11 GB K/V +
    # buckets) crashed the worker twice in the round-4 sweep; int8 b256
    # (~6 GB) ran.  Estimate and refuse rather than crash.
    n_lsh = sum(1 for a in cfg.attn_layers if a == 'lsh')
    kv_bytes = 1 if kv_quant == 'int8' else 2
    cache_gb = (2 * n_lsh * bsz * cfg.n_head * cfg.d_head * gen_len * kv_bytes
                + n_lsh * bsz * cfg.n_head * cfg.n_hashes * gen_len * 2) / 2**30
    limit_gb = float(os.environ.get('BENCH_HBM_LIMIT_GB') or 8.0)
    if cache_gb > limit_gb:
        raise SystemExit(
            f'bench: decode caches ~{cache_gb:.1f} GB exceed the '
            f'{limit_gb:.0f} GB guard (an on-device OOM crashes the TPU '
            f'worker and can wedge the tunnel); shrink BENCH_BSZ or use '
            f'BENCH_KV=int8, or raise BENCH_HBM_LIMIT_GB')
    model = Reformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (bsz, 4), 8,
                                cfg.vocab_size, dtype=jnp.int32)
    plen = jnp.full((bsz,), 4, jnp.int32)
    scfg = SampleConfig(strategy='sample', top_k=8)

    @jax.jit
    def run(params, prompt, plen, rng):
        return generate_scan(
            lambda t, s: model.decode_step(params, t, s),
            model.init_decode_state(bsz), prompt, plen, max_length=gen_len,
            eos_id=3, pad_id=1, sample_cfg=scfg, vocab_size=cfg.vocab_size,
            rng=rng)

    ids, _ = run(params, prompt, plen, jax.random.PRNGKey(2))
    int(ids[0, 0])
    t0 = time.perf_counter()
    ids, _ = run(params, prompt, plen, jax.random.PRNGKey(3))
    int(ids[0, 0])
    dt = time.perf_counter() - t0
    inc_tps = bsz * gen_len / dt

    # exact oracle: constant full-prefix re-forward cost per token; measure a
    # few steps inside one scan (per-token cost is step-independent)
    n_probe = 4

    @jax.jit
    def run_exact(params, toks):
        def body(st, tok):
            logits, st = model.decode_step_exact(params, tok, st)
            return st, logits[:, 0]
        st = model.init_decode_state_exact(bsz)
        _, ls = jax.lax.scan(body, st, toks)
        return ls[-1].sum()
    toks = jax.random.randint(jax.random.PRNGKey(4), (n_probe, bsz), 8,
                              cfg.vocab_size, dtype=jnp.int32)
    float(run_exact(params, toks))  # compile+warm
    t0 = time.perf_counter()
    float(run_exact(params, toks))
    dt_exact = time.perf_counter() - t0
    exact_tps = bsz * n_probe / dt_exact
    return dict(tokens_per_sec=inc_tps, batch_latency_s=dt,
                exact_oracle_tokens_per_sec=exact_tps,
                speedup_vs_exact=inc_tps / exact_tps)


def measure_extraction(n_song: int = 64) -> dict:
    """Native C++ vs Python extraction throughput on synthetic MIDI files
    (the reference's music21 path is its stated bottleneck and isn't
    installable here; the Python path is the conservative baseline)."""
    import tempfile
    from fractions import Fraction

    from musicnlp_tpu.io import Measure, Note, Part, Score, read_midi, write_midi
    from musicnlp_tpu.preprocess.fast_extractor import FastMidiExtractor
    from musicnlp_tpu.preprocess.music_extractor import MusicExtractor

    tmp = tempfile.mkdtemp()
    import numpy as np
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_song):
        measures = []
        for b in range(48):
            m = Measure(number=b, time_sig=(4, 4) if b == 0 else None,
                        tempo=120 if b == 0 else None, offset=Fraction(4 * b))
            notes = [Note(40 + int(rng.integers(12)), 4, 0)]
            off = 0
            while off < 4:
                d = min(int(rng.integers(1, 3)), 4 - off)
                notes.append(Note(60 + int(rng.integers(24)), d, off))
                off += d
            m.append(notes)
            measures.append(m)
        p = os.path.join(tmp, f's{i}.mid')
        write_midi(Score(title=f's{i}', parts=[Part(name='P', measures=measures)]), p)
        paths.append(p)

    fx = FastMidiExtractor(mode='full')
    t0 = time.perf_counter()
    n_tok = sum(len(fx(p, exp='str')) for p in paths)
    t_native = time.perf_counter() - t0
    me = MusicExtractor(mode='full', warn_logger=True)
    t0 = time.perf_counter()
    for p in paths[:8]:
        me(read_midi(p), exp='str_join')
    t_py = (time.perf_counter() - t0) * (n_song / 8)
    return dict(native_songs_per_sec=n_song / t_native,
                native_tokens_per_sec=n_tok / t_native,
                python_songs_per_sec=n_song / t_py)


def main():
    size = os.environ.get('BENCH_SIZE', 'base')
    mode = os.environ.get('BENCH_MODE', 'train')
    model_kind = os.environ.get('BENCH_MODEL', 'tfxl')
    if model_kind == 'reformer':
        if mode == 'decode':
            gen_len = _env_int('BENCH_SEQ', 2048)
            # Round-4 sweep (artifacts/decode_sweep_r4.jsonl): b128 is the
            # knee -- int8 full-chunk scan 9.2k tok/s @128 vs 8.9k @256; the
            # bf16 cache OOM-crashes the worker at 256, and sub-L scan
            # chunks regress (reformer.py decode_scan_chunk docstring).
            bsz = _env_int('BENCH_BSZ', 128)
            kv = os.environ.get('BENCH_KV', 'int8')
            r = measure_reformer_decode(size, gen_len, bsz,
                                        kv_quant=None if kv == 'bf16' else kv)
            print(json.dumps(dict(
                metric=f'reformer_{size}_decode_tokens_per_sec_per_chip',
                value=round(r['tokens_per_sec'], 1), unit='tokens/sec/chip',
                vs_baseline=round(r['speedup_vs_exact'], 1),
                baseline='round-1 exact full-prefix re-forward decoder',
                exact_oracle_tokens_per_sec=round(
                    r['exact_oracle_tokens_per_sec'], 2),
                kv_cache=kv,
                batch_latency_s=round(r['batch_latency_s'], 3))))
            return
        seq = _env_int('BENCH_SEQ', 2048)
        bsz = _env_int('BENCH_BSZ', 16)
        steps = _env_int('BENCH_STEPS', 10)
        key = f'reformer-{size}-seq{seq}'
        cache = {}
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
        if key not in cache or os.environ.get('BENCH_REMEASURE_BASELINE'):
            cache[key] = dict(
                tokens_per_sec=measure_reformer_train_baseline(size, seq),
                what='HF ReformerModelWithLMHead fwd+bwd+AdamW, torch CPU, bsz 2',
                measured_at=time.strftime('%Y-%m-%d %H:%M:%S'))
            with open(BASELINE_CACHE, 'w') as f:
                json.dump(cache, f, indent=2)
        ours = measure_reformer_train(size, seq, bsz, steps)
        print(json.dumps(dict(
            metric=f'reformer_{size}_train_tokens_per_sec_per_chip',
            value=round(ours, 1), unit='tokens/sec/chip',
            vs_baseline=round(ours / cache[key]['tokens_per_sec'], 2),
            **mfu_fields(ours, reformer_train_flops_per_token(size, seq, 422)))))
        return
    if mode == 'extract':
        r = measure_extraction()
        print(json.dumps(dict(
            metric='extraction_songs_per_sec',
            value=round(r['native_songs_per_sec'], 1), unit='songs/sec',
            vs_baseline=round(r['native_songs_per_sec']
                              / r['python_songs_per_sec'], 2),
            native_tokens_per_sec=round(r['native_tokens_per_sec'], 0))))
        return
    if mode == 'decode':
        gen_len = _env_int('BENCH_SEQ', 1024)
        # 512-way int8 is the measured winner (round-4 sweep): bf16
        # 64->28.5k, 128->56.0k, 256->62.0k, 512->64.2k tok/s; int8 KV ring
        # 256->90.5k, 512->95.1k (batch-latency 2.9s vs 5.5s -- flip to 256
        # when per-batch latency matters more than throughput); round-5:
        # 768->71.6k (non-power-of-two batch pads badly; don't retry)
        bsz = _env_int('BENCH_BSZ', 512)
        key = f'decode-{size}-len{gen_len}'
        cache = {}
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
        if key not in cache or os.environ.get('BENCH_REMEASURE_BASELINE'):
            cache[key] = dict(
                tokens_per_sec=measure_decode_baseline(size, gen_len),
                what='HF TransfoXL mems decode loop, torch CPU, bsz 1',
                measured_at=time.strftime('%Y-%m-%d %H:%M:%S'))
            with open(BASELINE_CACHE, 'w') as f:
                json.dump(cache, f, indent=2)
        # int8 KV ring cache (BENCH_KV=int8|bf16): the decode scan is
        # bandwidth-bound streaming the cache, so int8 halves the traffic;
        # per-row scales keep the attention math exact up to storage rounding
        kv = os.environ.get('BENCH_KV', 'int8')
        ours = measure_decode_ours(size, gen_len, bsz,
                                   kv_quant=None if kv == 'bf16' else kv)
        print(json.dumps(dict(
            metric=f'tfxl_{size}_decode_tokens_per_sec_per_chip',
            value=round(ours['tokens_per_sec'], 1), unit='tokens/sec/chip',
            vs_baseline=round(ours['tokens_per_sec']
                              / cache[key]['tokens_per_sec'], 2),
            kv_cache=kv,
            batch_latency_s=round(ours['batch_latency_s'], 3))))
        return
    seq = _env_int('BENCH_SEQ', 1024)
    bsz = _env_int('BENCH_BSZ', 16)
    steps = _env_int('BENCH_STEPS', 10)
    vocab = _env_int('BENCH_VOCAB', 1190)
    head_chunk = _env_int('BENCH_HEAD_CHUNK', 0) or None
    shard_vocab = bool(_env_int('BENCH_SHARD_VOCAB', 0))
    baseline = get_baseline(size, seq)
    ours = measure_ours(size, seq, bsz, steps, vocab_size=vocab,
                        head_chunk=head_chunk, shard_vocab=shard_vocab)
    extra = {} if vocab == 1190 else dict(vocab_size=vocab)
    if shard_vocab:
        extra['shard_vocab'] = True
    # the driver records only this one line per round; fold the decode
    # headline (512-way int8 KV ring, the measured round-4 winner) into the
    # same JSON so BENCH_r{N}.json carries train AND decode.  BENCH_DECODE=0
    # skips it (e.g. for CPU smoke runs or parameter sweeps).
    if (vocab == 1190 and not shard_vocab
            and _env_int('BENCH_DECODE', 1)):
        dkey = f'decode-{size}-len{seq}'
        dcache = {}
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                dcache = json.load(f)
        if dkey not in dcache:
            dcache[dkey] = dict(
                tokens_per_sec=measure_decode_baseline(size, seq),
                what='HF TransfoXL mems decode loop, torch CPU, bsz 1',
                measured_at=time.strftime('%Y-%m-%d %H:%M:%S'))
            with open(BASELINE_CACHE, 'w') as f:
                json.dump(dcache, f, indent=2)
        dec = measure_decode_ours(size, seq, _env_int('BENCH_BSZ_DECODE', 512),
                                  kv_quant='int8')
        extra.update(
            decode_tokens_per_sec=round(dec['tokens_per_sec'], 1),
            decode_vs_baseline=round(
                dec['tokens_per_sec'] / dcache[dkey]['tokens_per_sec'], 2),
            decode_kv_cache='int8',
            decode_batch_latency_s=round(dec['batch_latency_s'], 3))
    print(json.dumps(dict(
        metric=f'tfxl_{size}_train_tokens_per_sec_per_chip',
        value=round(ours, 1), unit='tokens/sec/chip',
        vs_baseline=round(ours / baseline, 2), **extra,
        **mfu_fields(ours, tfxl_train_flops_per_token(size, seq, vocab)))))


if __name__ == '__main__':
    main()
