"""Reformer-capability music LM, from scratch in JAX.

Capability-parity rebuild of the reference's HF wrapper
(reference musicnlp/models/reformer.py:13-127): same size presets
(alternating local/LSH attention layers x3-12, axial position embeddings with
axial_pos_shape whose product = max_position_embeddings, axial dims
(d/4, 3d/4), num_hashes=2 for base/large, shared-QK attention in LSH layers
with a separate key projection in local layers -- HF's layout -- and
feed-forward 4x), untied LM head, causal decoder.  Decode is incremental via
per-layer caches (ReformerDecodeState): local layers keep a lossless 2*chunk
KV ring; LSH layers cache keys/values/bucket-ids and a new query attends over
same-bucket history + the current chunk (HF's past_buckets_states scheme),
exact within the first chunk and O(1) forwards per token thereafter; the
full-prefix re-forward survives as `decode_step_exact`, the tested oracle.

TPU-native substitutions (same capability, better mapping to XLA):
  * reversible residuals -> optional `jax.checkpoint` rematerialization
    (same O(1)-activations goal, no custom backward plumbing);
  * bucketing/sorting/chunking in the LSH layers are fixed-shape tensor ops
    (ops/chunked_attention.py) -- no data-dependent shapes anywhere;
  * LSH rotations derive from a deterministic fold of (seed, layer), so eval
    is reproducible (the reference leaves torch RNG unseeded for LSH,
    reference trainer/train.py:418-419).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from musicnlp_tpu.ops.attention import quantize_kv_rows
from musicnlp_tpu.ops.chunked_attention import local_attention, lsh_attention
from musicnlp_tpu.ops.layers import (
    Params, dense, dense_init, dropout, embedding_init, layer_norm,
    layer_norm_init,
)
from musicnlp_tpu.ops.losses import ntp_accuracy, shifted_ce_loss

__all__ = ['ReformerConfig', 'Reformer', 'ReformerDecodeState']


class ReformerDecodeState(NamedTuple):
    """Incremental decode state (the HF `past_buckets_states` scheme,
    reference musicnlp/models/reformer.py:90-127 decodes through HF generate
    which caches per-layer states + bucket assignments).

    Local layers keep a 2*chunk ring of projected K/V (their attention window
    is exactly own-chunk + one look-back chunk, so the ring is lossless).
    LSH layers cache normalized keys and values; a new query attends causally
    over same-bucket history plus the current position-chunk in full (HF's
    unprocessed-chunk rule).  Two estimators share this state
    (ReformerConfig.decode_mode):

      * 'scan' (default): mask-and-scan the full cache with the
        per-position bucket ids (lsh_buckets).  O(L) traffic per step, but
        all of it STREAMING -- on TPU this measures 4.65 ms/step at
        base/2048/bsz 32 where 'bounded' measures 18.0 (lane gathers run
        ~1 element/cycle; cutting work 10x loses to streaming 1x).
      * 'bounded': per-(head, round, bucket) POSITION RINGS hold the
        `decode_window` most recent members of each bucket; a step gathers
        only those candidates + the current chunk (S = R*W + chunk keys) --
        the same bounded-window idea as HF's
        `_get_relevant_hid_states_and_buckets` (which keeps the 2*chunk
        sorted-neighborhood), but with recency rings instead of a per-step
        argsort.  The right estimator where random access is cheap (CPU).
        When window * n_buckets >= L the candidate set equals the full
        match set and the two estimators coincide (pinned by test).

    Exact vs the training forward while t < chunk in both modes.  All leaves
    carry batch on AXIS 1; fields unused by the active mode are allocated
    with singleton trailing dims.  Every cache keeps its TIME axis minor
    ([.., H, L]) so no lane dim is narrower than 128.
    """
    local_k: jnp.ndarray      # [n_local, B, N, H, 2c]
    local_v: jnp.ndarray      # [n_local, B, N, H, 2c]
    lsh_k: jnp.ndarray        # [n_lsh, B, N, H, L] normalized keys
    lsh_v: jnp.ndarray        # [n_lsh, B, N, H, L]
    lsh_buckets: jnp.ndarray  # [n_lsh, B, N, R, L] int16, -1 = unwritten ('scan')
    lsh_ring: jnp.ndarray     # [n_lsh, B, N, R, NB*W] int32 positions ('bounded')
    lsh_cnt: jnp.ndarray      # [n_lsh, B, N, R, NB] int32 per-bucket writes
    step: jnp.ndarray         # int32 scalar: next write position
    # per-position f32 scales when decode_cache_quant='int8' (lsh_k/lsh_v
    # then store int8; the scan decode is HBM-streaming-bound, so int8
    # halves its traffic; scales factor exactly out of both contractions --
    # ops/attention.py::quantize_kv_rows).  None in the bf16 default.
    lsh_k_scale: Optional[jnp.ndarray] = None   # [n_lsh, B, N, L]
    lsh_v_scale: Optional[jnp.ndarray] = None   # [n_lsh, B, N, L]


class ReformerExactDecodeState(NamedTuple):
    """Oracle decode state: the token buffer itself; each step re-forwards the
    whole padded prefix.  Exact but O(T) forwards per song -- kept as the
    reference implementation the incremental decoder is tested against."""
    buf: jnp.ndarray    # int32 [B, L]
    step: jnp.ndarray   # int32 scalar: next write position


def _auto_buckets(T: int, chunk: int) -> int:
    """HF heuristic: ~2 * T / chunk, rounded up to an even power of 2."""
    target = max(2, 2 * T // chunk)
    n = 2
    while n < target:
        n *= 2
    return n


@dataclass(frozen=True)
class ReformerConfig:
    """Presets mirror the reference table (reformer.py:15-55)."""
    vocab_size: int = 1190
    model_size: str = 'base'
    d_model: int = 768
    n_head: int = 12
    d_head: int = 64
    d_ff: int = 3072
    attn_layers: Tuple[str, ...] = ('local', 'lsh') * 6
    max_length: int = 2048
    axial_pos_shape: Tuple[int, int] = (32, 64)
    local_chunk: int = 64
    lsh_chunk: int = 64
    n_hashes: int = 1
    n_buckets: Optional[int] = None
    dropout: float = 0.05
    lsh_seed: int = 77
    remat: bool = False
    init_std: float = 0.02
    dtype: str = 'bfloat16'
    ln_eps: float = 1e-5      # HF Reformer uses 1e-12; set on import
    # incremental-decode estimator (ReformerDecodeState docstring):
    # 'scan' (default) masks the full cache -- O(L) HBM STREAMING per step,
    # which on TPU beats 'bounded''s O(R*W) RANDOM access: the per-element
    # lane gathers run ~1 elem/cycle, measured 18.0 vs 4.65 ms/step at
    # base/2048/bsz 32.  'bounded' (per-bucket recency rings, the HF
    # sorted-neighborhood idea) remains the gather-cheap choice on CPU and
    # the semantic model for a future sparse-friendly backend.
    decode_mode: str = 'scan'
    decode_window: int = 32
    # int8 LSH decode caches ('scan' mode only): halves the streamed K/V
    # traffic of the bandwidth-bound cache scan; per-position row scales
    # keep the attention exact up to the int8 storage rounding.  Local
    # rings stay at compute dtype (they are 2*chunk wide -- negligible).
    decode_cache_quant: Optional[str] = None    # None | 'int8'
    # 'scan' streams the cache in CH-wide chunks with a DYNAMIC trip count
    # t//CH + 1 (only the live prefix is read); None = max_length (ONE
    # full-cache chunk).  Must divide max_length.  Round-4 TPU sweep
    # (artifacts/decode_sweep_r4.jsonl): chunked streaming is a measured
    # REGRESSION despite the ~2x average-traffic cut -- 6.5k vs 9.2k tok/s
    # at base/2048/b128/int8 (and the TPU worker crashes at b256/c512):
    # the dynamic-trip fori_loop serializes per-chunk online-softmax
    # rescales on the critical path, while the single full-L einsum is one
    # fused streaming pass XLA pipelines freely.  Keep the knob for
    # hardware where traffic wins; default to the measured winner.
    decode_scan_chunk: Optional[int] = None
    # HF `ReformerModelWithLMHead` weight-compatible mode, for importing
    # reference-trained checkpoints (utils/hf_import.py): reversible
    # two-stream residuals (Y1 = X1 + attn(LN X2); Y2 = X2 + ff(LN Y1)),
    # final layer norm + untied LM head over the CONCATENATED [2*d] streams,
    # and a separate query projection in local layers.  Native training
    # keeps the standard pre-norm residual stack (same capability; remat
    # replaces reversibility's memory trick, module docstring).
    hf_compat: bool = False

    presets = {
        'debug': dict(max_length=64, axial_pos_shape=(8, 8), d_model=128,
                      n_head=8, n_pairs=3),
        'debug-large': dict(max_length=512, axial_pos_shape=(16, 32), d_model=128,
                            n_head=8, n_pairs=3),
        'tiny': dict(max_length=1024, axial_pos_shape=(32, 32), d_model=256,
                     n_head=8, n_pairs=3),
        'small': dict(max_length=2048, axial_pos_shape=(32, 64), d_model=512,
                      n_head=8, n_pairs=3),
        'base': dict(max_length=2048, axial_pos_shape=(32, 64), d_model=768,
                     n_head=12, n_pairs=6, n_hashes=2),
        'large': dict(max_length=2048, axial_pos_shape=(32, 64), d_model=1024,
                      n_head=16, n_pairs=12, n_hashes=2),
    }

    @classmethod
    def from_size(cls, model_size: str, vocab_size: int, max_length: int = None,
                  **kwargs) -> 'ReformerConfig':
        p = dict(cls.presets[model_size])
        n_pairs = p.pop('n_pairs')
        d = p['d_model']
        cfg = dict(
            vocab_size=vocab_size, model_size=model_size,
            d_head=d // p['n_head'], d_ff=d * 4,
            attn_layers=('local', 'lsh') * n_pairs, **p)
        if max_length and max_length != cfg['max_length']:
            cfg['max_length'] = max_length
            if 'axial_pos_shape' not in kwargs:
                # near-square factorization (the reference attempted
                # 4096 = 64 x 64, reference trainer/train.py:431-434)
                a = 1
                while a * a < max_length:
                    a *= 2
                assert max_length % a == 0, \
                    f'max_length {max_length} must be a power-of-two-ish product'
                cfg['axial_pos_shape'] = (max_length // a, a)
        cfg.update(kwargs)
        c = cls(**cfg)
        n1, n2 = c.axial_pos_shape
        assert n1 * n2 == c.max_length, \
            f'axial_pos_shape {c.axial_pos_shape} must multiply to {c.max_length}'
        assert c.max_length % c.local_chunk == 0 and c.max_length % c.lsh_chunk == 0
        return c

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def axial_dims(self) -> Tuple[int, int]:
        return self.d_model // 4, 3 * self.d_model // 4  # reference reformer.py:52

    @property
    def model_meta(self) -> Dict[str, Any]:
        return dict(axial_pos_shape=self.axial_pos_shape,
                    n_layer=len(self.attn_layers), hidden_size=self.d_model,
                    ff_size=self.d_ff,
                    attention_shape=f'{self.n_head}x{self.d_head}',
                    vocab_size=self.vocab_size)


class Reformer:
    def __init__(self, config: ReformerConfig):
        self.cfg = config

    # ------------------------------------------------------------------ init
    def init(self, rng) -> Params:
        cfg = self.cfg
        n1, n2 = cfg.axial_pos_shape
        d1, d2 = cfg.axial_dims
        keys = jax.random.split(rng, 4 + len(cfg.attn_layers))
        layers = []
        for i, kind in enumerate(cfg.attn_layers):
            k = keys[4 + i]
            ka, kv, ko, kf1, kf2, kk = jax.random.split(k, 6)
            attn = dict(
                qk=jax.random.normal(ka, (cfg.d_model, cfg.n_head, cfg.d_head),
                                     jnp.float32) * cfg.init_std,
                v=jax.random.normal(kv, (cfg.d_model, cfg.n_head, cfg.d_head),
                                    jnp.float32) * cfg.init_std,
                o=jax.random.normal(ko, (cfg.n_head, cfg.d_head, cfg.d_model),
                                    jnp.float32) * cfg.init_std,
                ln=layer_norm_init(cfg.d_model),
            )
            if kind == 'local':
                # HF-Reformer parity: only LSH layers share QK; local layers
                # have a separate key projection (the round-1 shared-QK local
                # design was a capacity deviation flagged by review)
                attn['k'] = jax.random.normal(
                    kk, (cfg.d_model, cfg.n_head, cfg.d_head),
                    jnp.float32) * cfg.init_std
                if cfg.hf_compat:   # HF local layers also split the query
                    attn['q'] = jax.random.normal(
                        jax.random.fold_in(kk, 1),
                        (cfg.d_model, cfg.n_head, cfg.d_head),
                        jnp.float32) * cfg.init_std
            ffn = dict(
                w1=dense_init(kf1, cfg.d_model, cfg.d_ff, std=cfg.init_std),
                w2=dense_init(kf2, cfg.d_ff, cfg.d_model, std=cfg.init_std),
                ln=layer_norm_init(cfg.d_model),
            )
            layers.append(dict(attn=attn, ffn=ffn))
        d_out = 2 * cfg.d_model if cfg.hf_compat else cfg.d_model
        return dict(
            embed=embedding_init(keys[0], cfg.vocab_size, cfg.d_model,
                                 std=cfg.init_std),
            axial1=jax.random.normal(keys[1], (n1, 1, d1), jnp.float32) * cfg.init_std,
            axial2=jax.random.normal(keys[2], (1, n2, d2), jnp.float32) * cfg.init_std,
            ln_f=layer_norm_init(d_out),
            lm_head=dense_init(keys[3], d_out, cfg.vocab_size,
                               std=cfg.init_std),
            layers=layers,
        )

    def _pos_emb(self, params: Params, T: int, dtype) -> jnp.ndarray:
        cfg = self.cfg
        n1, n2 = cfg.axial_pos_shape
        a1 = jnp.broadcast_to(params['axial1'], (n1, n2, cfg.axial_dims[0]))
        a2 = jnp.broadcast_to(params['axial2'], (n1, n2, cfg.axial_dims[1]))
        pos = jnp.concatenate([a1, a2], axis=-1).reshape(n1 * n2, cfg.d_model)
        return pos[:T].astype(dtype)

    # --------------------------------------------------------------- forward
    def forward(
            self, params: Params, input_ids: jnp.ndarray,
            pad_mask: Optional[jnp.ndarray] = None, rng=None,
            deterministic: bool = True,
    ) -> jnp.ndarray:
        """input_ids int32 [B, T] (T must be a multiple of the chunk sizes;
        pad with pad_mask=False beyond real length) -> logits f32 [B, T, V]."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        B, T = input_ids.shape
        assert T % cfg.local_chunk == 0 and T % cfg.lsh_chunk == 0, \
            f'T={T} must be a multiple of chunk sizes'

        h = params['embed']['weight'].astype(dtype)[input_ids]
        h = h + self._pos_emb(params, T, dtype)[None]
        rngs = (jax.random.split(rng, 2 * len(params['layers']))
                if rng is not None and not deterministic else None)

        if cfg.hf_compat:
            # reversible two-stream residuals (HF _ReversibleFunction):
            #   Y1 = X1 + attn(LN(X2));  Y2 = X2 + ff(LN(Y1))
            # autodiff handles the backward; cfg.remat recovers the O(1)-
            # activations property reversibility exists for
            x1 = x2 = h
            for li, layer in enumerate(params['layers']):
                kind = cfg.attn_layers[li]
                blk = self._attn_block(layer['attn'], kind, li, pad_mask)
                ff = self._ffn_block(layer['ffn'])
                if cfg.remat:
                    blk = jax.checkpoint(blk)
                    ff = jax.checkpoint(ff)
                a = blk(x2)
                if rngs is not None:
                    a = dropout(a, cfg.dropout, rngs[2 * li], deterministic)
                x1 = x1 + a
                f = ff(x1)
                if rngs is not None:
                    f = dropout(f, cfg.dropout, rngs[2 * li + 1],
                                deterministic)
                x2 = x2 + f
            h = jnp.concatenate([x1, x2], axis=-1)
        else:
            for li, layer in enumerate(params['layers']):
                kind = cfg.attn_layers[li]
                blk = self._attn_block(layer['attn'], kind, li, pad_mask)
                ff = self._ffn_block(layer['ffn'])
                if cfg.remat:
                    blk = jax.checkpoint(blk)
                    ff = jax.checkpoint(ff)
                a = blk(h)
                if rngs is not None:
                    a = dropout(a, cfg.dropout, rngs[2 * li], deterministic)
                h = h + a
                f = ff(h)
                if rngs is not None:
                    f = dropout(f, cfg.dropout, rngs[2 * li + 1], deterministic)
                h = h + f

        h = layer_norm(params['ln_f'], h, eps=cfg.ln_eps)
        logits = jnp.dot(h, params['lm_head']['w'].astype(dtype),
                         preferred_element_type=jnp.float32)
        return logits + params['lm_head']['b'].astype(jnp.float32)

    def _attn_block(self, p: Params, kind: str, layer_idx: int, pad_mask):
        cfg = self.cfg

        def blk(h):
            dtype = h.dtype
            x = layer_norm(p['ln'], h, eps=cfg.ln_eps)
            qk = jnp.einsum('btd,dnh->bnth', x, p['qk'].astype(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
            v = jnp.einsum('btd,dnh->bnth', x, p['v'].astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
            if kind == 'local':
                q = (jnp.einsum('btd,dnh->bnth', x, p['q'].astype(dtype),
                                preferred_element_type=jnp.float32
                                ).astype(dtype)
                     if 'q' in p else qk)   # HF layout: separate local query
                k = jnp.einsum('btd,dnh->bnth', x, p['k'].astype(dtype),
                               preferred_element_type=jnp.float32).astype(dtype)
                ctx = local_attention(q, k, v, chunk=cfg.local_chunk,
                                      pad_mask=pad_mask)
            else:
                T = h.shape[1]
                nb = cfg.n_buckets or _auto_buckets(T, cfg.lsh_chunk)
                rot = jax.random.fold_in(jax.random.PRNGKey(cfg.lsh_seed), layer_idx)
                ctx = lsh_attention(qk, v, chunk=cfg.lsh_chunk,
                                    n_hashes=cfg.n_hashes, n_buckets=nb,
                                    rng_rot=rot, pad_mask=pad_mask)
            return jnp.einsum('bnth,nhd->btd', ctx, p['o'].astype(dtype),
                              preferred_element_type=jnp.float32).astype(dtype)
        return blk

    def _ffn_block(self, p: Params):
        cfg = self.cfg
        def ff(h):
            x = layer_norm(p['ln'], h, eps=cfg.ln_eps)
            x = jax.nn.relu(dense(p['w1'], x))
            return dense(p['w2'], x)
        return ff

    # ---------------------------------------------------------------- decode
    def _n_kind(self) -> Tuple[int, int]:
        kinds = self.cfg.attn_layers
        return kinds.count('local'), kinds.count('lsh')

    def init_decode_state(self, batch_size: int) -> ReformerDecodeState:
        cfg = self.cfg
        assert cfg.decode_mode in ('bounded', 'scan'), cfg.decode_mode
        quant = cfg.decode_cache_quant == 'int8'
        assert not (quant and cfg.decode_mode == 'bounded'), \
            "decode_cache_quant='int8' supports only decode_mode='scan' " \
            "(the bounded gather path reads individual rows, not streams)"
        n_local, n_lsh = self._n_kind()
        B, N, H, L = batch_size, cfg.n_head, cfg.d_head, cfg.max_length
        R = cfg.n_hashes
        dt = cfg.compute_dtype
        lsh_dt = jnp.int8 if quant else dt
        scales = (jnp.zeros((n_lsh, B, N, L), jnp.float32) if quant else None)
        if cfg.decode_mode == 'bounded':
            nb = cfg.n_buckets or _auto_buckets(L, cfg.lsh_chunk)
            buckets = jnp.zeros((n_lsh, B, 1, 1, 1), jnp.int32)   # unused
            ring = jnp.full((n_lsh, B, N, R, nb * cfg.decode_window), -1,
                            jnp.int32)
            cnt = jnp.zeros((n_lsh, B, N, R, nb), jnp.int32)
        else:
            # int16: bucket ids < n_buckets (~2L/chunk << 32767 at any real
            # config; asserted) and -1 sentinel fit, and the bucket stream is
            # pure bandwidth alongside K/V -- int16 halves it, exactly
            nb = cfg.n_buckets or _auto_buckets(L, cfg.lsh_chunk)
            assert nb < 32767, nb
            buckets = jnp.full((n_lsh, B, N, R, L), -1, jnp.int16)
            ring = jnp.zeros((n_lsh, B, 1, 1, 1), jnp.int32)      # unused
            cnt = jnp.zeros((n_lsh, B, 1, 1, 1), jnp.int32)
        return ReformerDecodeState(
            local_k=jnp.zeros((n_local, B, N, H, 2 * cfg.local_chunk), dt),
            local_v=jnp.zeros((n_local, B, N, H, 2 * cfg.local_chunk), dt),
            lsh_k=jnp.zeros((n_lsh, B, N, H, L), lsh_dt),
            lsh_v=jnp.zeros((n_lsh, B, N, H, L), lsh_dt),
            lsh_buckets=buckets, lsh_ring=ring, lsh_cnt=cnt,
            step=jnp.zeros((), jnp.int32),
            lsh_k_scale=scales, lsh_v_scale=scales)

    def reorder_decode_state(self, state: ReformerDecodeState, idx):
        """Gather the batch axis (axis 1 of every cache leaf) -- for beam."""
        sel = lambda x: None if x is None else x[:, idx]
        return ReformerDecodeState(
            state.local_k[:, idx], state.local_v[:, idx],
            state.lsh_k[:, idx], state.lsh_v[:, idx],
            state.lsh_buckets[:, idx], state.lsh_ring[:, idx],
            state.lsh_cnt[:, idx], state.step,
            sel(state.lsh_k_scale), sel(state.lsh_v_scale))

    def _pos_emb_row(self, params: Params, t, dtype) -> jnp.ndarray:
        cfg = self.cfg
        n1, n2 = cfg.axial_pos_shape
        a1 = params['axial1'][t // n2, 0]                     # [d1]
        a2 = params['axial2'][0, t % n2]                      # [d2]
        return jnp.concatenate([a1, a2], axis=-1).astype(dtype)

    def decode_step(self, params: Params, token_ids: jnp.ndarray,
                    state: ReformerDecodeState):
        """One incremental decode step: O(window + cache-scan) per layer, no
        prefix re-forward.  Same duck-typed API as TransfoXL.decode_step,
        usable by ops.sampling.generate_scan / MusicGenerator."""
        logits, _, state = self._decode_step_impl(params, token_ids, state)
        return logits, state

    def _decode_step_impl(self, params: Params, token_ids: jnp.ndarray,
                          state: ReformerDecodeState):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        B = token_ids.shape[0]
        t = state.step
        L = cfg.max_length
        scale = 1.0 / (cfg.d_head ** 0.5)
        from musicnlp_tpu.ops.chunked_attention import NEG_INF, SELF_BIAS

        h = params['embed']['weight'].astype(dtype)[token_ids]
        h = h + self._pos_emb_row(params, t, dtype)[None]
        # hf_compat: reversible two-stream residuals, per forward()
        x1 = h

        lk, lv = state.local_k, state.local_v
        sk, sv, sb = state.lsh_k, state.lsh_v, state.lsh_buckets
        ring, cnt = state.lsh_ring, state.lsh_cnt
        sks, svs = state.lsh_k_scale, state.lsh_v_scale
        quant = sks is not None
        il = ish = 0
        for li, layer in enumerate(params['layers']):
            p = layer['attn']
            x = layer_norm(p['ln'], h, eps=cfg.ln_eps)                        # [B, D]
            q = jnp.einsum('bd,dnh->bnh', x,
                           p.get('q', p['qk']).astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype) \
                if cfg.attn_layers[li] == 'local' else \
                jnp.einsum('bd,dnh->bnh', x, p['qk'].astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
            v = jnp.einsum('bd,dnh->bnh', x, p['v'].astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
            if cfg.attn_layers[li] == 'local':
                k = jnp.einsum('bd,dnh->bnh', x, p['k'].astype(dtype),
                               preferred_element_type=jnp.float32).astype(dtype)
                c = cfg.local_chunk
                W = 2 * c
                slot = t % W
                lk = jax.lax.dynamic_update_slice(
                    lk, k[None, ..., None], (il, 0, 0, 0, slot))  # [n,B,N,H,W]
                lv = jax.lax.dynamic_update_slice(
                    lv, v[None, ..., None], (il, 0, 0, 0, slot))
                slots = jnp.arange(W)
                # position currently held by each ring slot
                pos_slot = t - ((t - slots) % W)
                valid = (pos_slot >= (t // c - 1) * c) & (pos_slot >= 0)
                score = jnp.einsum('bnh,bnhw->bnw', q, lk[il],
                                   preferred_element_type=jnp.float32) * scale
                score = jnp.where(valid[None, None, :], score, NEG_INF)
                probs = jax.nn.softmax(score, axis=-1)
                ctx = jnp.einsum('bnw,bnhw->bnh', probs.astype(dtype), lv[il],
                                 preferred_element_type=jnp.float32).astype(dtype)
                il += 1
            else:
                qf = q.astype(jnp.float32)
                # HF _len_and_dim_norm: rms-normalized keys carrying the
                # 1/sqrt(H); scores then take NO further scale (matches
                # ops/chunked_attention.lsh_attention)
                kn = (qf * jax.lax.rsqrt(
                    jnp.mean(qf * qf, axis=-1, keepdims=True) + 1e-6)
                    * (1.0 / (cfg.d_head ** 0.5))).astype(dtype)
                if quant:
                    kn_w, k_sc = quantize_kv_rows(kn)         # int8 [B,N,H], [B,N]
                    v_w, v_sc = quantize_kv_rows(v)
                    sks = jax.lax.dynamic_update_slice(
                        sks, k_sc[None, ..., None], (ish, 0, 0, t))
                    svs = jax.lax.dynamic_update_slice(
                        svs, v_sc[None, ..., None], (ish, 0, 0, t))
                else:
                    kn_w, v_w = kn, v
                sk = jax.lax.dynamic_update_slice(
                    sk, kn_w[None, ..., None], (ish, 0, 0, 0, t))  # [n,B,N,H,L]
                sv = jax.lax.dynamic_update_slice(
                    sv, v_w[None, ..., None], (ish, 0, 0, 0, t))
                nb = cfg.n_buckets or _auto_buckets(L, cfg.lsh_chunk)
                rot = jax.random.fold_in(jax.random.PRNGKey(cfg.lsh_seed), li)
                rots = jax.random.normal(
                    rot, (cfg.n_hashes, cfg.d_head, nb // 2), jnp.float32)
                proj = jnp.einsum('bnh,rhm->rbnm', qf, rots)
                b_t = jnp.argmax(jnp.concatenate([proj, -proj], axis=-1),
                                 axis=-1).astype(jnp.int32)   # [R, B, N]
                R, c = cfg.n_hashes, cfg.lsh_chunk
                chunk_start = (t // c) * c
                if cfg.decode_mode == 'bounded':
                    ctx, ring, cnt = self._lsh_attend_bounded(
                        q, sk, sv, ring, cnt, b_t, t, chunk_start, ish, nb,
                        NEG_INF, SELF_BIAS)
                else:
                    # one [B, N, R] write per step (not R scatters); cache
                    # layout keeps L minor (R-minor would lane-pad 2 -> 128)
                    sb = jax.lax.dynamic_update_slice(
                        sb, b_t.transpose(1, 2, 0)[None, :, :, :, None]
                        .astype(sb.dtype),
                        (ish, 0, 0, 0, t))                    # [n, B, N, R, L]
                    # Default CH = L: ONE fused full-cache pass.  Sub-L
                    # chunks stream via a fori_loop with DYNAMIC trip count
                    # t//CH + 1 (only the live prefix is read), exact
                    # per-round online softmax (flash-style m/l/acc
                    # accumulators) -- kept as a knob, but the round-4 TPU
                    # sweep measured it SLOWER than the single pass despite
                    # its ~2x traffic cut (config docstring).
                    CH = cfg.decode_scan_chunk or L
                    assert L % CH == 0, (CH, L)
                    N, H = q.shape[1], q.shape[2]
                    # cast the SMALL side of the bucket compare to the cache
                    # dtype (int16) so the streamed bs chunks never upcast
                    bt = b_t.transpose(1, 2, 0).astype(sb.dtype)  # [B, N, R]
                    sk_l, sv_l, sb_l = sk[ish], sv[ish], sb[ish]
                    if quant:
                        sks_l, svs_l = sks[ish], svs[ish]     # [B, N, L] f32
                    if CH == L:
                        # Fused single-pass form (the round-2 measured shape,
                        # 15.7k tok/s @ b128 bf16): no fori_loop -- a
                        # full-size dynamic_slice inside the loop body
                        # materializes a COPY of the cache, doubling the HBM
                        # traffic of this bandwidth-bound step -- and the R
                        # hash rounds collapse into the probability tensor
                        # BEFORE the V contraction (sum_r w_r*softmax_r then
                        # one [bnl]x[bnhl] einsum), so V streams exactly once.
                        pos = jnp.arange(L)
                        sc0 = jnp.einsum(
                            'bnh,bnhl->bnl', q, sk_l.astype(dtype),
                            preferred_element_type=jnp.float32)  # keys carry scale
                        if quant:   # fold the int8 row scales back in
                            sc0 = sc0 * sks_l
                        sc0 = jnp.where((pos == t)[None, None],
                                        sc0 + SELF_BIAS, sc0)
                        mask = (pos <= t)[None, None, None] & \
                            ((sb_l == bt[..., None])
                             | (pos >= chunk_start)[None, None, None])
                        sc = jnp.where(mask, sc0[:, :, None], NEG_INF)
                        lse = jax.nn.logsumexp(sc, axis=-1)       # [B, N, R]
                        pr = jnp.exp(sc - lse[..., None])
                        if R > 1:
                            pr = pr * jax.nn.softmax(lse, axis=-1)[..., None]
                        prc = pr.sum(axis=2)                      # [B, N, L]
                        if quant:   # fold v scales into the probabilities
                            prc = prc * svs_l
                        ctx = jnp.einsum('bnl,bnhl->bnh', prc.astype(dtype),
                                         sv_l.astype(dtype),
                                         preferred_element_type=jnp.float32
                                         ).astype(dtype)
                    else:
                        def chunk_body(j, carry):
                            m_run, l_run, acc = carry
                            off = j * CH
                            ks = jax.lax.dynamic_slice(
                                sk_l, (0, 0, 0, off), (B, N, H, CH))
                            vs = jax.lax.dynamic_slice(
                                sv_l, (0, 0, 0, off), (B, N, H, CH))
                            bs = jax.lax.dynamic_slice(
                                sb_l, (0, 0, 0, off), (B, N, R, CH))
                            pos = off + jnp.arange(CH)
                            sc0 = jnp.einsum(
                                'bnh,bnhl->bnl', q, ks.astype(dtype),
                                preferred_element_type=jnp.float32)  # keys carry scale
                            if quant:   # fold the int8 row scales back in
                                sc0 = sc0 * jax.lax.dynamic_slice(
                                    sks_l, (0, 0, off), (B, N, CH))
                            sc0 = jnp.where((pos == t)[None, None],
                                            sc0 + SELF_BIAS, sc0)
                            mask = (pos <= t)[None, None, None] & \
                                ((bs == bt[..., None])
                                 | (pos >= chunk_start)[None, None, None])
                            sc = jnp.where(mask, sc0[:, :, None], NEG_INF)
                            m_new = jnp.maximum(m_run, jnp.max(sc, axis=-1))
                            # explicit mask on p: an all-masked chunk would
                            # otherwise exp(NEG_INF - NEG_INF) = 1 before any
                            # valid key raises m_run above the mask floor
                            p = jnp.where(mask,
                                          jnp.exp(sc - m_new[..., None]), 0.0)
                            alpha = jnp.exp(m_run - m_new)
                            l_run = l_run * alpha + jnp.sum(p, axis=-1)
                            pv = p
                            if quant:   # fold v scales into the probabilities
                                pv = p * jax.lax.dynamic_slice(
                                    svs_l, (0, 0, off), (B, N, CH))[:, :, None]
                            acc = acc * alpha[..., None] + jnp.einsum(
                                'bnrl,bnhl->bnrh', pv.astype(dtype),
                                vs.astype(dtype),
                                preferred_element_type=jnp.float32)
                            return m_new, l_run, acc

                        init = (jnp.full((B, N, R), NEG_INF, jnp.float32),
                                jnp.zeros((B, N, R), jnp.float32),
                                jnp.zeros((B, N, R, cfg.d_head), jnp.float32))
                        m_run, l_run, acc = jax.lax.fori_loop(
                            0, t // CH + 1, chunk_body, init)
                        lse = m_run + jnp.log(jnp.maximum(l_run, 1e-30))
                        ctx_r = acc / jnp.maximum(l_run, 1e-30)[..., None]
                        if R > 1:
                            # round combine: sum_r softmax_r(lse) * ctx_r
                            ctx = jnp.sum(
                                jax.nn.softmax(lse, axis=-1)[..., None]
                                * ctx_r, axis=2).astype(dtype)
                        else:
                            ctx = ctx_r[:, :, 0].astype(dtype)
                ctx = ctx.astype(dtype)
                ish += 1
            a = jnp.einsum('bnh,nhd->bd', ctx, p['o'].astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
            fp = layer['ffn']
            if cfg.hf_compat:
                # Y1 = X1 + attn(LN X2); Y2 = X2 + ff(LN Y1)
                x1 = x1 + a
                xf = layer_norm(fp['ln'], x1, eps=cfg.ln_eps)
                h = h + dense(fp['w2'], jax.nn.relu(dense(fp['w1'], xf)))
            else:
                h = h + a
                xf = layer_norm(fp['ln'], h, eps=cfg.ln_eps)
                h = h + dense(fp['w2'], jax.nn.relu(dense(fp['w1'], xf)))

        if cfg.hf_compat:
            h = jnp.concatenate([x1, h], axis=-1)
        h = layer_norm(params['ln_f'], h, eps=cfg.ln_eps)
        logits = jnp.dot(h, params['lm_head']['w'].astype(dtype),
                         preferred_element_type=jnp.float32)
        logits = logits + params['lm_head']['b'].astype(jnp.float32)
        return logits, h, ReformerDecodeState(lk, lv, sk, sv, sb, ring, cnt,
                                              t + 1, sks, svs)

    def _lsh_attend_bounded(self, q, sk, sv, ring, cnt, b_t, t, chunk_start,
                            ish, nb, NEG_INF, SELF_BIAS):
        """Bounded-candidate LSH decode attend (decode_mode='bounded').

        Gathers, per hash round, the `decode_window` most recent same-bucket
        positions from the per-bucket recency rings, plus the current chunk;
        attends over those S = R*W + chunk keys only, then appends position t
        to its bucket's ring.  O(S) HBM traffic vs the full-cache scan's
        O(L).  See ReformerDecodeState for the estimator contract."""
        cfg = self.cfg
        R, W, c = cfg.n_hashes, cfg.decode_window, cfg.lsh_chunk
        B, N = q.shape[0], cfg.n_head
        bt = b_t.transpose(1, 2, 0)                           # [B, N, R]
        ring_l, cnt_l = ring[ish], cnt[ish]                   # [B,N,R,nb*W], [B,N,R,nb]

        # candidates: ring slots of this query's bucket, every round
        slot_idx = bt[..., None] * W + jnp.arange(W)          # [B, N, R, W]
        cand = jnp.take_along_axis(ring_l, slot_idx, axis=-1)  # [B, N, R, W]
        cand_ok = (cand >= 0) & (cand < chunk_start)          # chunk covers rest
        ccpos = chunk_start + jnp.arange(c)                   # [c]
        chunk_ok = ccpos <= t
        posS = jnp.concatenate(
            [cand.reshape(B, N, R * W),
             jnp.broadcast_to(ccpos, (B, N, c))], axis=-1)    # [B, N, S]
        S = R * W + c
        k_sel = jnp.take_along_axis(
            sk[ish], jnp.clip(posS, 0)[:, :, None, :], axis=-1)  # [B,N,H,S]
        v_sel = jnp.take_along_axis(
            sv[ish], jnp.clip(posS, 0)[:, :, None, :], axis=-1)
        s = jnp.einsum('bnh,bnhs->bns', q, k_sel,
                       preferred_element_type=jnp.float32)    # keys carry scale
        s = jnp.where(posS == t, s + SELF_BIAS, s)
        lses, prs = [], []
        for r in range(R):
            m = jnp.concatenate(
                [cand_ok[:, :, r] if rr == r
                 else jnp.zeros((B, N, W), bool) for rr in range(R)]
                + [jnp.broadcast_to(chunk_ok, (B, N, c))], axis=-1)
            sc = jnp.where(m, s, NEG_INF)
            lse = jax.nn.logsumexp(sc, axis=-1)               # [B, N]
            lses.append(lse)
            prs.append(jnp.exp(sc - lse[..., None]))
        if R == 1:
            pr = prs[0]
        else:
            w = jax.nn.softmax(jnp.stack(lses, axis=-1), axis=-1)  # [B,N,R]
            pr = sum(w[..., r:r + 1] * prs[r] for r in range(R))
        ctx = jnp.einsum('bns,bnhs->bnh', pr.astype(sv.dtype), v_sel,
                         preferred_element_type=jnp.float32)

        # append t to its bucket ring (one-hot select, no scatter)
        cnt_b = jnp.take_along_axis(cnt_l, bt[..., None], axis=-1)[..., 0]
        j = bt * W + cnt_b % W                                # [B, N, R]
        ring_new = jnp.where(
            jnp.arange(nb * W) == j[..., None], t, ring_l)
        cnt_new = jnp.where(jnp.arange(nb) == bt[..., None],
                            cnt_b[..., None] + 1, cnt_l)
        ring = jax.lax.dynamic_update_slice(
            ring, ring_new[None], (ish, 0, 0, 0, 0))
        cnt = jax.lax.dynamic_update_slice(
            cnt, cnt_new[None], (ish, 0, 0, 0, 0))
        return ctx, ring, cnt

    def decode_step_with_hidden(self, params: Params, token_ids: jnp.ndarray,
                                state: ReformerDecodeState):
        """(logits, pre-head hidden, state) -- the contrastive-search surface
        (same duck-typed API as TransfoXL.decode_step_with_hidden).  The
        hidden is the final-norm output feeding lm_head: [B, 2*d_model] under
        hf_compat (two-stream concat), else [B, d_model]."""
        return self._decode_step_impl(params, token_ids, state)

    @property
    def hidden_dim(self) -> int:
        """Width of decode_step_with_hidden's hidden output."""
        return (2 if self.cfg.hf_compat else 1) * self.cfg.d_model

    @staticmethod
    def expand_decode_state(state: ReformerDecodeState, k: int) -> ReformerDecodeState:
        """Repeat the batch axis (axis 1 of every cache leaf) k times -- for
        contrastive candidate expansion."""
        rep = lambda x: None if x is None else jnp.repeat(x, k, axis=1)
        return ReformerDecodeState(rep(state.local_k), rep(state.local_v),
                                   rep(state.lsh_k), rep(state.lsh_v),
                                   rep(state.lsh_buckets), rep(state.lsh_ring),
                                   rep(state.lsh_cnt), state.step,
                                   rep(state.lsh_k_scale), rep(state.lsh_v_scale))

    def select_decode_state(self, state: ReformerDecodeState, idx):
        return self.reorder_decode_state(state, idx)

    # ------------------------------------------------------ exact decode oracle
    def init_decode_state_exact(self, batch_size: int) -> ReformerExactDecodeState:
        return ReformerExactDecodeState(
            buf=jnp.zeros((batch_size, self.cfg.max_length), jnp.int32),
            step=jnp.zeros((), jnp.int32))

    def decode_step_exact(self, params: Params, token_ids: jnp.ndarray,
                          state: ReformerExactDecodeState):
        """Full-prefix re-forward per step: the exactness oracle."""
        buf = jax.lax.dynamic_update_slice(
            state.buf, token_ids[:, None], (0, state.step))
        pad_mask = (jnp.arange(self.cfg.max_length) <= state.step)[None, :]
        pad_mask = jnp.broadcast_to(pad_mask, buf.shape)
        logits = self.forward(params, buf, pad_mask=pad_mask)
        cur = jnp.take_along_axis(
            logits, state.step[None, None, None].repeat(buf.shape[0], 0),
            axis=1)[:, 0]
        return cur, ReformerExactDecodeState(buf=buf, step=state.step + 1)

    # ------------------------------------------------------------ train loss
    def loss(self, params: Params, input_ids: jnp.ndarray, labels: jnp.ndarray,
             rng=None, deterministic: bool = True, n_seg: int = 1,
             pad_id: Optional[int] = None):
        pad_mask = (input_ids != pad_id) if pad_id is not None else None
        logits = self.forward(params, input_ids, pad_mask=pad_mask, rng=rng,
                              deterministic=deterministic)
        loss, n_tok = shifted_ce_loss(logits, labels)
        acc = ntp_accuracy(logits, labels)
        return loss, dict(ntp_acc=acc, n_tok=n_tok,
                          preds=jnp.argmax(logits, axis=-1))
