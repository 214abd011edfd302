"""Transformer-XL music LM, from scratch in JAX.

Capability-parity rebuild of the reference's HF wrapper
(reference musicnlp/models/transformer_xl.py:15-241): same size presets
(debug/tiny/small/base/large, d_model 128->1024, n_layer 4->18, per-size
max_length/mem_len/clamp_len derivation :16-35), tied embedding/softmax,
relative-position attention with segment memory, padding masked from the loss
(PT_LOSS_PAD), and a mems-as-past decode path.

TPU-native differences (design, not behavior):
  * fixed-shape right-aligned memory + `mem_valid` scalar instead of torch's
    dynamically-growing mems list -- every program has static shapes;
  * optional segment-scan training (`forward_segments`): the actual TF-XL
    training scheme (stop-gradient memory carried across segments) expressed
    as one `lax.scan`, so long sequences train at fixed per-segment attention
    cost instead of O(T^2);
  * decode uses an exact KV ring cache (see ops/attention.py) -- no per-step
    re-projection of the memory;
  * full-vocab tied softmax head instead of adaptive clusters (MXU-friendly;
    see ops/losses.py docstring).
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from musicnlp_tpu.ops.attention import (
    quantize_kv_rows, rel_attn, rel_attn_decode_step, rel_attn_init,
)
from musicnlp_tpu.ops.layers import (
    Params, embedding_init, ffn, ffn_init, dropout,
)
from musicnlp_tpu.ops.losses import (
    PT_LOSS_PAD, chunked_shifted_ce_loss, ntp_accuracy, shifted_ce_loss,
)

__all__ = ['TransfoXLConfig', 'TransfoXL', 'DecodeState']


@dataclass(frozen=True)
class TransfoXLConfig:
    """Size presets mirror the reference table (transformer_xl.py:16-35)."""
    vocab_size: int = 1190
    model_size: str = 'base'
    d_model: int = 768
    n_head: int = 12
    d_head: int = 64
    d_inner: int = 3072
    n_layer: int = 12
    mem_len: int = 256
    clamp_len: int = 1024
    max_length: int = 2048
    dropout: float = 0.1
    dropatt: float = 0.0
    pre_lnorm: bool = False
    init_std: float = 0.02
    dtype: str = 'bfloat16'
    # fused Pallas attention (ops/pallas/flash_attention.py); auto-falls back
    # to the jnp path off-TPU, for non-block-divisible shapes, or dropatt>0
    use_flash: bool = True
    flash_block_q: int = 512
    flash_block_k: int = 512
    # rematerialize attention in the backward pass: drops the U-factor
    # residuals (~D/H x the usual activation size) at the cost of one extra
    # forward kernel per layer -- enables large-batch training
    remat_attn: bool = False
    # large-vocab head: compute the training CE in vocab tiles of this many
    # columns so the [B, T, V] logits tensor is never materialized (exact;
    # replaces the reference's adaptive-softmax memory workaround for the
    # 32k-262k learned-tokenizer tiers, reference transformer_xl.py:56-66).
    # None = full-logits path (right for the base <=32k vocabs).
    head_chunk: Optional[int] = None
    # shard the tied [V, d] embedding/head over the mesh `model` axis
    # (ops/sharded_head.py): the 262k tier's ~200M-param table then never
    # replicates or all-reduces in full.  Requires constructing the model
    # with `mesh=` and placing params via param_specs(shard_vocab=True);
    # training only (n_seg == 1); composes with head_chunk for tiling.
    shard_vocab: bool = False
    # HF-compatible adaptive softmax head (cluster factorization), for
    # importing reference-trained checkpoints (the reference sets
    # cutoffs=[1000] for vocab >= 1000, reference transformer_xl.py:56-66).
    # When set, the "logits" this model produces are the adaptive LOG-PROBS,
    # exactly as HF's ProjectedAdaptiveLogSoftmax emits them -- CE/metrics/
    # sampling compose unchanged.  Natively-trained models keep None (the
    # dense tied head is faster on TPU at every vocab this project uses).
    adaptive_cutoffs: Optional[Tuple[int, ...]] = None
    # int8 decode KV cache: the decode step is HBM-bandwidth-bound streaming
    # the [L, B, M, N, H] ring buffers (e.g. ~2.4 GB/step at base/256-way in
    # bf16); per-(slot, head) symmetric int8 storage halves that traffic and
    # the row scales factor exactly out of both attention contractions
    # (ops/attention.py::quantize_kv_rows).  Training is unaffected.
    decode_cache_quant: Optional[str] = None    # None | 'int8'
    # sliding attention window (keys with distance >= attn_window are
    # masked).  The reference leaves HF's `same_length=True` DEFAULT, so
    # its models actually train AND decode with a fixed mem_len-wide
    # window, not full causal attention -- imported checkpoints set this
    # to mem_len for faithful behavior.  None = full causal (the native
    # recipes; strictly more context).
    attn_window: Optional[int] = None

    presets = {
        'debug': dict(d_model=128, n_head=8, n_layer=4),
        'debug-large': dict(d_model=128, n_head=8, n_layer=4),
        'tiny': dict(d_model=256, n_head=8, n_layer=6),
        'small': dict(d_model=512, n_head=8, n_layer=12),
        'base': dict(d_model=768, n_head=12, n_layer=12),
        'large': dict(d_model=1024, n_head=16, n_layer=18),
    }
    size2max_length = {'debug': 64, 'debug-large': 128, 'tiny': 512,
                       'small': 1024, 'base': 2048, 'large': 2048}

    @classmethod
    def from_size(cls, model_size: str, vocab_size: int, max_length: int = None,
                  **kwargs) -> 'TransfoXLConfig':
        p = dict(cls.presets[model_size])
        max_len = max_length or cls.size2max_length[model_size]
        if 'debug' in model_size:
            m_len, c_len = 64, 64
        else:
            m_len = max(128, cls.size2max_length[model_size] // 8)
            c_len = max(1024, cls.size2max_length[model_size] // 2)
        d = p['d_model']
        cfg = dict(
            vocab_size=vocab_size, model_size=model_size, d_model=d,
            n_head=p['n_head'], d_head=d // p['n_head'], d_inner=d * 4,
            n_layer=p['n_layer'], mem_len=m_len, clamp_len=c_len, max_length=max_len,
        )
        cfg.update(kwargs)
        return cls(**cfg)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def model_meta(self) -> Dict[str, Any]:
        return dict(n_layer=self.n_layer, hidden_size=self.d_model,
                    ff_size=self.d_inner, seg_len=self.mem_len,
                    max_len=self.max_length, vocab_size=self.vocab_size)


class DecodeState(NamedTuple):
    """Per-step autoregressive decode state (all fixed shapes)."""
    cache_k: jnp.ndarray    # [L, B, M, N, H] compute dtype, or int8 (quant)
    cache_v: jnp.ndarray    # [L, B, M, N, H]
    cache_pos: jnp.ndarray  # int32 [M]  absolute position per slot, -1 empty
    step: jnp.ndarray       # int32 scalar
    # per-row f32 scales when decode_cache_quant='int8', else None
    k_scale: Optional[jnp.ndarray] = None   # [L, B, M, N]
    v_scale: Optional[jnp.ndarray] = None   # [L, B, M, N]


class TransfoXL:
    """Stateless model namespace: `init` -> params pytree, pure `apply` fns."""

    def __init__(self, config: TransfoXLConfig, mesh=None):
        self.cfg = config
        # mesh is only consulted when cfg.shard_vocab (vocab-row-sharded
        # embedding/head); every other sharding decision stays external
        # (param_specs + jit in_shardings), keeping the model mesh-free.
        self.mesh = mesh
        # NB: cfg.shard_vocab needs a mesh, but it may be attached after
        # construction (Trainer does: train.py::Trainer.__init__), so the
        # requirement is enforced lazily where the mesh is consulted.

    def _require_mesh(self):
        assert self.mesh is not None, \
            'shard_vocab=True needs a mesh: pass TransfoXL(cfg, mesh=mesh) ' \
            'or set model.mesh before the first forward (Trainer does this)'
        return self.mesh

    # ------------------------------------------------------------------ init
    def init(self, rng) -> Params:
        cfg = self.cfg
        r_emb, *r_layers = jax.random.split(rng, cfg.n_layer + 1)
        layers = []
        for rl in r_layers:
            ra, rf = jax.random.split(rl)
            layers.append(dict(
                attn=rel_attn_init(ra, cfg.d_model, cfg.n_head, cfg.d_head,
                                   std=cfg.init_std),
                ffn=ffn_init(rf, cfg.d_model, cfg.d_inner, std=cfg.init_std),
            ))
        params = dict(
            embed=embedding_init(r_emb, cfg.vocab_size, cfg.d_model, std=cfg.init_std),
            layers=layers,
            out_bias=jnp.zeros((cfg.vocab_size,), jnp.float32),
        )
        if cfg.adaptive_cutoffs:
            n_cl = len(cfg.adaptive_cutoffs)
            params['adaptive'] = dict(
                cluster_w=jnp.zeros((n_cl, cfg.d_model), jnp.float32),
                cluster_b=jnp.zeros((n_cl,), jnp.float32))
        return params

    def init_mems(self, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        mems = jnp.zeros((cfg.n_layer, batch_size, cfg.mem_len, cfg.d_model),
                         cfg.compute_dtype)
        return mems, jnp.zeros((), jnp.int32)

    # --------------------------------------------------------------- forward
    def forward(
            self, params: Params, input_ids: jnp.ndarray,
            mems: Optional[jnp.ndarray] = None, mem_valid=0,
            attn_mask: Optional[jnp.ndarray] = None, rng=None,
            deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """input_ids int32 [B, Q] -> (logits f32 [B, Q, V], new_mems, new_valid).

        mems: [L, B, M, d] right-aligned memory or None (plain causal LM).
        """
        h, new_mems, new_valid = self.forward_hidden(
            params, input_ids, mems=mems, mem_valid=mem_valid,
            attn_mask=attn_mask, rng=rng, deterministic=deterministic)
        return self._lm_head(params, h), new_mems, new_valid

    def forward_hidden(
            self, params: Params, input_ids: jnp.ndarray,
            mems: Optional[jnp.ndarray] = None, mem_valid=0,
            attn_mask: Optional[jnp.ndarray] = None, rng=None,
            deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """Trunk only: final hidden states [B, Q, d] (for the chunked
        large-vocab loss, which applies the tied head tile by tile)."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        B, Q = input_ids.shape

        emb_scale = cfg.d_model ** 0.5
        if cfg.shard_vocab:
            from musicnlp_tpu.ops.sharded_head import vocab_sharded_embed
            h = vocab_sharded_embed(input_ids, params['embed']['weight'],
                                    mesh=self._require_mesh(), dtype=dtype)
        else:
            h = params['embed']['weight'].astype(dtype)[input_ids]
        h = h * jnp.asarray(emb_scale, dtype)
        rngs = (jax.random.split(rng, cfg.n_layer * 2 + 1)
                if (rng is not None and not deterministic) else None)
        h = dropout(h, cfg.dropout, rngs[-1] if rngs is not None else None,
                    deterministic)

        new_mems = [] if mems is not None else None
        mem_valid = jnp.asarray(mem_valid, jnp.int32)
        for li, layer in enumerate(params['layers']):
            if mems is not None:
                # memory stores this layer's INPUT hiddens (TF-XL semantics)
                new_mems.append(jax.lax.stop_gradient(
                    jnp.concatenate([mems[li], h], axis=1)[:, -cfg.mem_len:]))
                layer_mems = mems[li]
            else:
                layer_mems = None
            r_a = rngs[2 * li] if rngs is not None else None
            r_f = rngs[2 * li + 1] if rngs is not None else None
            S = (mems.shape[2] if mems is not None else 0) + Q
            if self._flash_ok(Q, S, attn_mask):
                from musicnlp_tpu.ops.pallas.flash_attention import fused_rel_attn
                import functools
                attn_fn = functools.partial(
                    fused_rel_attn,
                    clamp_len=cfg.clamp_len, pre_lnorm=cfg.pre_lnorm,
                    dropout_rate=cfg.dropout, deterministic=deterministic,
                    window=cfg.attn_window,
                    bq=self._pick_block(Q, cfg.flash_block_q),
                    bk=self._pick_block(S, cfg.flash_block_k))
                if cfg.remat_attn:
                    run = jax.checkpoint(
                        lambda p_, h_, m_, v_, r_: attn_fn(p_, h_, m_, v_, rng=r_),
                        static_argnums=())
                    h = run(layer['attn'], h, layer_mems, mem_valid, r_a)
                else:
                    h = attn_fn(layer['attn'], h, layer_mems, mem_valid, rng=r_a)
            else:
                h = rel_attn(
                    layer['attn'], h, layer_mems, mem_valid,
                    clamp_len=cfg.clamp_len, pre_lnorm=cfg.pre_lnorm,
                    dropout_rate=cfg.dropout, dropatt_rate=cfg.dropatt,
                    rng=r_a, deterministic=deterministic, attn_mask=attn_mask,
                    window=cfg.attn_window)
            h = ffn(layer['ffn'], h, pre_lnorm=cfg.pre_lnorm,
                    dropout_rate=cfg.dropout, rng=r_f, deterministic=deterministic)

        if mems is not None:
            new_mems = jnp.stack(new_mems)
            new_valid = jnp.minimum(mem_valid + Q, cfg.mem_len)
            return h, new_mems, new_valid
        return h, None, jnp.zeros((), jnp.int32)

    @staticmethod
    def _pick_block(n: int, cap: int) -> int:
        """Largest power-of-two block <= cap that divides n (0 if none)."""
        b = cap
        while b >= 128:
            if n % b == 0:
                return b
            b //= 2
        return 0

    def _flash_ok(self, Q: int, S: int, attn_mask) -> bool:
        cfg = self.cfg
        if not cfg.use_flash or attn_mask is not None or cfg.dropatt > 0:
            return False
        if cfg.d_head < 32 or cfg.d_model < 256:
            # debug-size models: the backward kernel's Mosaic compile is
            # pathologically slow at sub-32 head dims (~6 min, measured);
            # the jnp path is plenty fast at these sizes anyway
            return False
        if not self._pick_block(Q, cfg.flash_block_q) \
                or not self._pick_block(S, cfg.flash_block_k):
            return False
        try:
            return jax.devices()[0].platform == 'tpu'
        except Exception:
            return False

    def _lm_head(self, params: Params, h: jnp.ndarray) -> jnp.ndarray:
        """Tied full-vocab softmax head; logits returned in f32.

        With `adaptive_cutoffs` set, returns the cluster-factorized adaptive
        LOG-PROBS instead (HF ProjectedAdaptiveLogSoftmax semantics,
        div_val=1, d_proj==d_embed -- the reference's configuration), so
        imported reference checkpoints score tokens identically.  Log-probs
        compose with the CE/argmax/sampling paths unchanged (their
        logsumexp is exactly 0)."""
        w = params['embed']['weight'].astype(h.dtype)
        bias = params['out_bias'].astype(jnp.float32)
        if not self.cfg.adaptive_cutoffs:
            logits = jnp.einsum('bqd,vd->bqv', h, w,
                                preferred_element_type=jnp.float32)
            return logits + bias
        V = self.cfg.vocab_size
        cuts = (0,) + tuple(self.cfg.adaptive_cutoffs) + (V,)
        c0, n_cl = cuts[1], len(cuts) - 2
        ad = params['adaptive']
        head_w = jnp.concatenate([w[:c0], ad['cluster_w'].astype(h.dtype)], 0)
        head_b = jnp.concatenate([bias[:c0], ad['cluster_b'].astype(jnp.float32)])
        head_lp = jax.nn.log_softmax(
            jnp.einsum('bqd,vd->bqv', h, head_w,
                       preferred_element_type=jnp.float32) + head_b, axis=-1)
        parts = [head_lp[..., :c0]]
        for i in range(n_cl):
            lo, hi = cuts[i + 1], cuts[i + 2]
            tail_lp = jax.nn.log_softmax(
                jnp.einsum('bqd,vd->bqv', h, w[lo:hi],
                           preferred_element_type=jnp.float32)
                + bias[lo:hi], axis=-1)
            parts.append(head_lp[..., c0 + i:c0 + i + 1] + tail_lp)
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------ train loss
    def loss(
            self, params: Params, input_ids: jnp.ndarray, labels: jnp.ndarray,
            rng=None, deterministic: bool = True, n_seg: int = 1,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """CLM loss + aux metrics.  n_seg > 1 trains via segment-scan memory."""
        assert not ((self.cfg.head_chunk or self.cfg.shard_vocab)
                    and self.cfg.adaptive_cutoffs), \
            'head_chunk/shard_vocab train over the dense tied head while ' \
            'forward/decode would score through the adaptive clusters -- ' \
            'training and scoring would disagree for an imported adaptive ' \
            'checkpoint'
        if n_seg <= 1:
            if self.cfg.shard_vocab:
                from musicnlp_tpu.ops.sharded_head import vocab_sharded_ce_loss
                h, _, _ = self.forward_hidden(params, input_ids, rng=rng,
                                              deterministic=deterministic)
                loss, n_tok, preds = vocab_sharded_ce_loss(
                    h, labels, params['embed']['weight'], params['out_bias'],
                    mesh=self._require_mesh(), chunk=self.cfg.head_chunk)
                acc = ntp_accuracy(preds, labels)
                return loss, dict(ntp_acc=acc, n_tok=n_tok, preds=preds)
            if self.cfg.head_chunk:
                h, _, _ = self.forward_hidden(params, input_ids, rng=rng,
                                              deterministic=deterministic)
                loss, n_tok, preds = chunked_shifted_ce_loss(
                    h, labels, params['embed']['weight'], params['out_bias'],
                    chunk=self.cfg.head_chunk)
                acc = ntp_accuracy(preds, labels)
                return loss, dict(ntp_acc=acc, n_tok=n_tok, preds=preds)
            logits, _, _ = self.forward(params, input_ids, rng=rng,
                                        deterministic=deterministic)
            loss, n_tok = shifted_ce_loss(logits, labels)
            acc = ntp_accuracy(logits, labels)
            return loss, dict(ntp_acc=acc, n_tok=n_tok,
                              preds=jnp.argmax(logits, axis=-1))
        assert not (self.cfg.head_chunk or self.cfg.shard_vocab), \
            'head_chunk/shard_vocab (large-vocab tiled CE) require ' \
            'n_seg == 1; segment-scan training materializes per-segment logits'
        return self._loss_segments(params, input_ids, labels, rng=rng,
                                   deterministic=deterministic, n_seg=n_seg)

    def _loss_segments(
            self, params: Params, input_ids: jnp.ndarray, labels: jnp.ndarray,
            *, n_seg: int, rng=None, deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Segment-scan training loss, accumulated INSIDE the scan.

        Mathematically identical to shifted_ce_loss over the full-sequence
        logits (the cross-boundary prediction -- last token of segment s
        predicting the first label of segment s+1 -- is carried explicitly),
        but never materializes [n_seg, B, seg, V] stacked logits, which both
        wastes memory and breaks the grad-of-scan Mosaic compile at scale.
        """
        from musicnlp_tpu.ops.losses import PT_LOSS_PAD
        cfg = self.cfg
        fwd_model = self
        if cfg.use_flash and not cfg.remat_attn:
            # scan-saved pallas residuals acquire non-standard layouts that
            # crash the Mosaic compile at scale; rematerializing attention in
            # the backward pass keeps operand layouts canonical (and saves
            # the memory anyway)
            fwd_model = TransfoXL(replace(cfg, remat_attn=True))
        B, T = input_ids.shape
        assert T % n_seg == 0
        seg = T // n_seg
        segs = input_ids.reshape(B, n_seg, seg).transpose(1, 0, 2)
        lab_segs = labels.reshape(B, n_seg, seg).transpose(1, 0, 2)
        mems, valid = self.init_mems(B)
        seg_rngs = (jax.random.split(rng, n_seg)
                    if rng is not None and not deterministic else None)

        def seg_terms(logits, lb, prev_last, prev_w):
            """(nll_sum, n_valid, n_correct) within + across boundary."""
            lg = logits[:, :-1].astype(jnp.float32)
            nxt = lb[:, 1:]
            ok = nxt != PT_LOSS_PAD
            safe = jnp.where(ok, nxt, 0)
            logz = jax.nn.logsumexp(lg, axis=-1)
            tok = jnp.take_along_axis(lg, safe[..., None], -1)[..., 0]
            nll = jnp.sum(jnp.where(ok, logz - tok, 0.0))
            n = jnp.sum(ok).astype(jnp.float32)
            correct = jnp.sum((jnp.argmax(lg, -1) == nxt) & ok).astype(jnp.float32)
            # boundary: prev segment's last logits predict this segment's
            # first label (weight 0 on the first segment)
            b_lb = lb[:, 0]
            b_ok = (b_lb != PT_LOSS_PAD) & (prev_w > 0)
            b_safe = jnp.where(b_ok, b_lb, 0)
            b_logz = jax.nn.logsumexp(prev_last, axis=-1)
            b_tok = jnp.take_along_axis(prev_last, b_safe[:, None], -1)[:, 0]
            nll += jnp.sum(jnp.where(b_ok, b_logz - b_tok, 0.0))
            n += jnp.sum(b_ok).astype(jnp.float32)
            correct += jnp.sum((jnp.argmax(prev_last, -1) == b_lb)
                               & b_ok).astype(jnp.float32)
            return nll, n, correct

        def body(carry, xs):
            mems, valid, prev_last, prev_w, nll, n, correct = carry
            if seg_rngs is not None:
                ids_s, lb_s, r = xs
            else:
                (ids_s, lb_s), r = xs, None
            logits, mems, valid = fwd_model.forward(
                params, ids_s, mems=mems, mem_valid=valid, rng=r,
                deterministic=deterministic)
            d_nll, d_n, d_c = seg_terms(logits, lb_s, prev_last, prev_w)
            carry = (mems, valid, logits[:, -1].astype(jnp.float32),
                     jnp.ones((), jnp.float32), nll + d_nll, n + d_n,
                     correct + d_c)
            return carry, jnp.argmax(logits, axis=-1)

        init = (mems, valid, jnp.zeros((B, cfg.vocab_size), jnp.float32),
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        xs = ((segs, lab_segs, seg_rngs) if seg_rngs is not None
              else (segs, lab_segs))
        (_, _, _, _, nll, n, correct), preds = jax.lax.scan(body, init, xs)
        n = jnp.maximum(n, 1.0)
        preds = preds.transpose(1, 0, 2).reshape(B, T)
        return nll / n, dict(ntp_acc=correct / n, n_tok=n, preds=preds)

    def forward_segments(
            self, params: Params, input_ids: jnp.ndarray, *, n_seg: int,
            rng=None, deterministic: bool = True,
    ) -> jnp.ndarray:
        """Segment-level recurrence training: scan segments, carry stop-grad
        memory.  input_ids [B, T] with T % n_seg == 0; returns logits [B,T,V]."""
        cfg = self.cfg
        B, T = input_ids.shape
        assert T % n_seg == 0, f'seq len {T} not divisible by n_seg {n_seg}'
        seg = T // n_seg
        segs = input_ids.reshape(B, n_seg, seg).transpose(1, 0, 2)  # [S, B, seg]
        mems, valid = self.init_mems(B)
        seg_rngs = (jax.random.split(rng, n_seg)
                    if rng is not None and not deterministic else None)

        def body(carry, xs):
            mems, valid = carry
            ids, r = xs if seg_rngs is not None else (xs, None)
            logits, mems, valid = self.forward(
                params, ids, mems=mems, mem_valid=valid, rng=r,
                deterministic=deterministic)
            return (mems, valid), logits

        xs = (segs, seg_rngs) if seg_rngs is not None else segs
        _, logits = jax.lax.scan(body, (mems, valid), xs)
        return logits.transpose(1, 0, 2, 3).reshape(B, T, -1)

    # ---------------------------------------------------------------- decode
    def init_decode_state(self, batch_size: int) -> DecodeState:
        cfg = self.cfg
        shape = (cfg.n_layer, batch_size, cfg.mem_len, cfg.n_head, cfg.d_head)
        quant = cfg.decode_cache_quant == 'int8'
        cache_dt = jnp.int8 if quant else cfg.compute_dtype
        scales = (jnp.zeros(shape[:-1], jnp.float32) if quant else None)
        return DecodeState(
            cache_k=jnp.zeros(shape, cache_dt),
            cache_v=jnp.zeros(shape, cache_dt),
            cache_pos=jnp.full((cfg.mem_len,), -1, jnp.int32),
            step=jnp.zeros((), jnp.int32),
            k_scale=scales, v_scale=scales,
        )

    def decode_step(
            self, params: Params, token_ids: jnp.ndarray, state: DecodeState,
    ) -> Tuple[jnp.ndarray, DecodeState]:
        logits, _, state = self.decode_step_with_hidden(params, token_ids, state)
        return logits, state

    def decode_step_with_hidden(
            self, params: Params, token_ids: jnp.ndarray, state: DecodeState,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
        """One autoregressive step: token_ids int32 [B] -> (logits f32 [B, V],
        final hidden [B, d], next state).  Exactly equivalent to forward() on
        the full prefix with mem_len-window attention."""
        cfg = self.cfg
        dtype = cfg.compute_dtype
        B = token_ids.shape[0]
        slot = state.step % cfg.mem_len

        emb_scale = cfg.d_model ** 0.5
        h = params['embed']['weight'].astype(dtype)[token_ids][:, None, :]
        h = h * jnp.asarray(emb_scale, dtype)

        ck, cv = state.cache_k, state.cache_v
        ks, vs = state.k_scale, state.v_scale
        quant = ks is not None
        for li, layer in enumerate(params['layers']):
            h, k_cur, v_cur = rel_attn_decode_step(
                layer['attn'], h, ck[li], cv[li], state.cache_pos, state.step,
                clamp_len=cfg.clamp_len, pre_lnorm=cfg.pre_lnorm,
                window=cfg.attn_window,
                cache_k_scale=ks[li] if quant else None,
                cache_v_scale=vs[li] if quant else None)
            if quant:
                k_cur, k_sc = quantize_kv_rows(k_cur)
                v_cur, v_sc = quantize_kv_rows(v_cur)
                ks = jax.lax.dynamic_update_slice(
                    ks, k_sc[None], (li, 0, slot, 0))
                vs = jax.lax.dynamic_update_slice(
                    vs, v_sc[None], (li, 0, slot, 0))
            ck = jax.lax.dynamic_update_slice(
                ck, k_cur[None], (li, 0, slot, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v_cur[None], (li, 0, slot, 0, 0))
            h = ffn(layer['ffn'], h, pre_lnorm=cfg.pre_lnorm)

        logits = self._lm_head(params, h)[:, 0]
        new_pos = state.cache_pos.at[slot].set(state.step)
        return logits, h[:, 0], DecodeState(ck, cv, new_pos, state.step + 1,
                                            ks, vs)

    # state helpers for beam / contrastive search (batch axis of the caches
    # is axis 1; positions/step are shared across the batch)
    @staticmethod
    def expand_decode_state(state: DecodeState, k: int) -> DecodeState:
        rep = lambda x: None if x is None else jnp.repeat(x, k, axis=1)
        return DecodeState(rep(state.cache_k), rep(state.cache_v),
                           state.cache_pos, state.step,
                           rep(state.k_scale), rep(state.v_scale))

    @staticmethod
    def select_decode_state(state: DecodeState, idx: jnp.ndarray) -> DecodeState:
        sel = lambda x: None if x is None else x[:, idx]
        return DecodeState(sel(state.cache_k), sel(state.cache_v),
                           state.cache_pos, state.step,
                           sel(state.k_scale), sel(state.v_scale))

    # alias under the generic name MusicGenerator looks up on any model
    reorder_decode_state = select_decode_state
