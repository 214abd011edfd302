"""Autoregressive decoding: logits processors + fixed-shape XLA generate loop.

Replaces the reference's HF `model.generate` call (reference
musicnlp/trainer/eval.py:279-333: greedy / sample with top-k / top-p /
typical / temperature / repetition-penalty) with a single `lax.scan` program:
every step has static shapes, the TF-XL memory rides in a KV ring cache
(models/transformer_xl.py), and prompts of different lengths share one scan
(teacher-forcing while t < prompt_len).  This is the "XLA while-loop decode
with cached XL memories" called for in SURVEY.md §7 step 6.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ['SampleConfig', 'process_logits', 'generate_scan', 'beam_generate',
           'diverse_beam_generate', 'contrastive_generate']

NEG_INF = -1e30


def _default_reorder(state, idx, n: int):
    """Gather a decode state's beam axis by `idx` when no reorder_state was
    given: for each leaf, gather axis 0 if its dim0 == n, else axis 1 if its
    dim1 == n (TF-XL caches carry batch on axis 1, [L, B*W, M, N, H]); leaves
    with neither axis sized n (scalars, positions) pass through unchanged."""
    def go(x):
        if not hasattr(x, 'ndim') or x.ndim == 0:
            return x
        if x.shape[0] == n:
            return x[idx]
        if x.ndim > 1 and x.shape[1] == n:
            return x[:, idx]
        return x
    return jax.tree.map(go, state)


@dataclass(frozen=True)
class SampleConfig:
    """Mirror of the reference strategy args (eval.py:279-324)."""
    strategy: str = 'sample'            # greedy | sample
    temperature: float = 1.0
    top_k: int = 0                      # 0 = off
    top_p: float = 1.0                  # 1 = off
    typical_p: float = 0.0              # 0 = off
    repetition_penalty: float = 1.0     # 1 = off


def _apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def _apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF semantics: keep smallest set with cumprob > p,
    always keeping the most probable token)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while the cumulative mass *before* them is < p
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def _apply_typical(logits: jnp.ndarray, mass: float) -> jnp.ndarray:
    """Typical decoding (Meister et al.): keep tokens whose -log p is closest
    to the entropy until `mass` probability is covered."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * jnp.where(p > 0, logp, 0.0), axis=-1, keepdims=True)
    shift = jnp.abs(-logp - ent)
    order = jnp.argsort(shift, axis=-1)
    p_sorted = jnp.take_along_axis(p, order, axis=-1)
    cum = jnp.cumsum(p_sorted, axis=-1)
    keep_sorted = (cum - p_sorted) < mass
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def process_logits(
        logits: jnp.ndarray, cfg: SampleConfig,
        token_counts: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Apply the warper chain in HF order: repetition penalty -> temperature ->
    top-k -> top-p -> typical.  logits f32 [B, V]; token_counts int32 [B, V]
    occurrence counts of already-emitted tokens (for repetition penalty)."""
    if cfg.repetition_penalty != 1.0 and token_counts is not None:
        seen = token_counts > 0
        pen = jnp.asarray(cfg.repetition_penalty, jnp.float32)
        penalized = jnp.where(logits > 0, logits / pen, logits * pen)
        logits = jnp.where(seen, penalized, logits)
    if cfg.temperature != 1.0:
        logits = logits / jnp.asarray(cfg.temperature, jnp.float32)
    if cfg.top_k:
        logits = _apply_top_k(logits, cfg.top_k)
    if cfg.top_p < 1.0:
        logits = _apply_top_p(logits, cfg.top_p)
    if cfg.typical_p:
        logits = _apply_typical(logits, cfg.typical_p)
    return logits


def _scan_early_exit(body, carry0, n_steps: int, chunk: Optional[int],
                     all_done: Callable):
    """Run `body(carry, t)` for t = 0..n_steps-1: one plain `lax.scan` when
    `chunk` is falsy, else `chunk`-step scans inside a `lax.while_loop` that
    exits once `all_done(carry)` -- HF generate's all-sequences-finished
    stopping rule.  Callers' bodies are no-ops on the token buffer once every
    sequence is finished (they write pad over pad; beam variants at most
    re-sort frozen beams, and final selection is permutation-invariant), so
    the result is bit-identical to the plain scan.  A tail scan covers
    n_steps % chunk; total executed steps never exceed n_steps, so decode
    caches never see out-of-range positions."""
    if not chunk or n_steps <= 0:
        carry, _ = jax.lax.scan(body, carry0, jnp.arange(n_steps))
        return carry
    ch = min(int(chunk), n_steps)
    n_full = n_steps // ch

    def chunk_body(wcarry):
        t0, carry = wcarry
        carry, _ = jax.lax.scan(
            lambda c, i: body(c, t0 + i), carry, jnp.arange(ch))
        return t0 + ch, carry

    t0, carry = jax.lax.while_loop(
        lambda wc: (wc[0] < n_full * ch) & ~all_done(wc[1]), chunk_body,
        (jnp.zeros((), jnp.int32), carry0))
    tail = n_steps - n_full * ch
    if tail:
        # skipped when the while_loop exited early (those steps would be
        # no-ops anyway, but on e.g. the Reformer scan path each costs an
        # O(cache) stream -- the latency this feature exists to save)
        def run_tail(c):
            c, _ = jax.lax.scan(lambda c, i: body(c, t0 + i), c,
                                jnp.arange(tail))
            return c
        carry = jax.lax.cond(all_done(carry), lambda c: c, run_tail, carry)
    return carry


def generate_scan(
        decode_step: Callable, init_state, prompt_ids: jnp.ndarray,
        prompt_len: jnp.ndarray, *, max_length: int, eos_id: int, pad_id: int,
        sample_cfg: SampleConfig, vocab_size: int, rng=None,
        early_exit_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run one fixed-shape decode scan.

    decode_step: (token_ids [B], state) -> (logits f32 [B, V], state).
    prompt_ids:  int32 [B, P] prompts left-aligned, padded with pad_id.
    prompt_len:  int32 [B] true prompt lengths (>= 1).
    Returns (ids int32 [B, max_length] incl. prompt, out_len int32 [B]).
    Positions beyond a sequence's end are pad_id.

    early_exit_chunk: if set, stop decoding (in chunks of this size) once
    EVERY sequence has emitted eos -- HF generate's stopping rule (reference
    trainer/eval.py:333 inherits it) and the lever for single/small-batch
    song-generation latency.  Bit-identical output; see _scan_early_exit.
    """
    B, P = prompt_ids.shape
    assert P <= max_length
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    buf = jnp.full((B, max_length), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0, 0))
    counts0 = jnp.zeros((B, vocab_size), jnp.int32)

    track_counts = sample_cfg.repetition_penalty != 1.0

    def body(carry, t):
        state, buf, finished, counts, rng = carry
        cur = buf[:, t]                                   # token fed at step t
        if track_counts:                                  # scatter isn't free
            counts = counts.at[jnp.arange(B), cur].add(
                jnp.where(finished, 0, 1))
        logits, state = decode_step(cur, state)

        rng, r = jax.random.split(rng)
        warped = process_logits(logits, sample_cfg, counts)
        if sample_cfg.strategy == 'greedy':
            nxt = jnp.argmax(warped, axis=-1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(r, warped).astype(jnp.int32)

        in_prompt = (t + 1) < prompt_len                  # next pos teacher-forced?
        nxt_tok = jnp.where(in_prompt, buf[:, t + 1], nxt)
        new_finished = finished | ((cur == eos_id) & ~in_prompt)
        nxt_tok = jnp.where(new_finished, pad_id, nxt_tok)
        buf = buf.at[:, t + 1].set(nxt_tok)               # t+1 <= max_length-1
        return (state, buf, new_finished, counts, rng), None

    finished0 = jnp.zeros((B,), bool)
    state, buf, finished, _, _ = _scan_early_exit(
        body, (init_state, buf, finished0, counts0, rng), max_length - 1,
        early_exit_chunk, all_done=lambda c: jnp.all(c[2]))

    # output length: position after the first eos at/after prompt end, else max
    idx = jnp.arange(max_length)[None, :]
    is_eos = (buf == eos_id) & (idx >= (prompt_len[:, None] - 1))
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    out_len = jnp.where(any_eos, first_eos + 1, max_length)
    # zero out anything past out_len (finished sequences already pad)
    buf = jnp.where(idx < out_len[:, None], buf, pad_id)
    return buf, out_len.astype(jnp.int32)


def beam_generate(
        decode_step: Callable, init_state_fn: Callable, prompt_ids: jnp.ndarray,
        prompt_len: jnp.ndarray, *, max_length: int, eos_id: int, pad_id: int,
        num_beams: int, length_penalty: float = 1.0,
        reorder_state: Callable = None, early_exit_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode (reference eval.py strategy 'beam', HF semantics:
    log-prob beams, eos freezes a beam, length penalty at final selection).
    early_exit_chunk stops once every beam is frozen (see _scan_early_exit).

    decode_step: (token_ids [B*W], state) -> (logits [B*W, V], state).
    init_state_fn: (batch_size) -> fresh decode state for that batch size.
    reorder_state: (state, idx [B*W]) -> state with its batch axis gathered by
    idx (the caller knows the state layout, e.g. TF-XL caches carry batch on
    axis 1); defaults to gathering axis 0 of leaves whose dim0 == B*W.
    Returns (ids [B, max_length] best beam per batch, out_len [B]).
    """
    B, P = prompt_ids.shape
    W = num_beams
    V = None  # from logits at trace time

    # expand prompts to beams: [B*W, ...]
    rep = lambda x: jnp.repeat(x, W, axis=0)
    buf = jnp.full((B * W, max_length), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, rep(prompt_ids), (0, 0))
    plen = rep(prompt_len)
    state = init_state_fn(B * W)

    # beam scores: beam 0 active, others -inf so the first expansion draws
    # W distinct continuations from beam 0
    scores0 = jnp.tile(jnp.array([0.0] + [NEG_INF] * (W - 1), jnp.float32), (B,))
    finished0 = jnp.zeros((B * W,), bool)

    def body(carry, t):
        state, buf, scores, finished = carry
        cur = buf[:, t]
        logits, state = decode_step(cur, state)            # [B*W, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]

        in_prompt = (t + 1) < plen                         # [B*W]
        # finished or teacher-forced beams contribute a single deterministic
        # continuation at unchanged score
        forced_tok = jnp.where(finished, pad_id, buf[:, t + 1])
        # candidate scores [B*W, V]
        cand = scores[:, None] + logp
        # frozen rows: only forced_tok allowed, at current score
        frozen = finished | in_prompt
        onehot = jax.nn.one_hot(forced_tok, V, dtype=jnp.float32)
        cand = jnp.where(frozen[:, None],
                         scores[:, None] * onehot + NEG_INF * (1 - onehot), cand)

        cand = cand.reshape(B, W * V)
        top_scores, top_idx = jax.lax.top_k(cand, W)       # [B, W]
        beam_idx = top_idx // V                            # which source beam
        tok_idx = (top_idx % V).astype(jnp.int32)
        flat_src = (jnp.arange(B)[:, None] * W + beam_idx).reshape(B * W)

        # reorder everything by source beam
        buf = buf[flat_src]
        if reorder_state is not None:
            state = reorder_state(state, flat_src)
        else:
            state = _default_reorder(state, flat_src, B * W)
        finished = finished[flat_src]
        scores = top_scores.reshape(B * W)
        nxt = tok_idx.reshape(B * W)
        new_finished = finished | ((nxt == eos_id) & ~in_prompt[flat_src])
        buf = buf.at[:, t + 1].set(jnp.where(finished, pad_id, nxt))
        return (state, buf, scores, new_finished), None

    state, buf, scores, finished = _scan_early_exit(
        body, (state, buf, scores0, finished0), max_length - 1,
        early_exit_chunk, all_done=lambda c: jnp.all(c[3]))

    # final selection with length penalty
    idx = jnp.arange(max_length)[None, :]
    is_eos = (buf == eos_id) & (idx >= (plen[:, None] - 1))
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    out_len = jnp.where(any_eos, first_eos + 1, max_length)
    norm = scores / (out_len.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm.reshape(B, W), axis=1)          # [B]
    sel = jnp.arange(B) * W + best
    buf = jnp.where(idx < out_len[sel][:, None], buf[sel], pad_id)
    return buf, out_len[sel].astype(jnp.int32)


def contrastive_generate(
        step_h: Callable, init_state, prompt_ids: jnp.ndarray,
        prompt_len: jnp.ndarray, *, max_length: int, eos_id: int, pad_id: int,
        top_k: int = 4, penalty_alpha: float = 0.6, d_model: int,
        expand_state: Callable, select_state: Callable,
        hidden_dtype=jnp.float32, early_exit_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contrastive search (HF `penalty_alpha` decoding; reference eval.py
    strategy 'contrastive'): at each step the top-k candidates are re-scored
    by (1-a) * p(cand) - a * max cosine-similarity between the candidate's
    hidden state and every context hidden state, and the argmax is kept.

    step_h: (tokens [n], state) -> (logits [n, V], hidden [n, d], state).
    expand_state: (state, k) -> state with batch repeated k times.
    select_state: (state, flat_idx [B]) -> state gathered to batch B.
    """
    B, P = prompt_ids.shape
    K = top_k
    buf = jnp.full((B, max_length), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0, 0))
    ctx_h0 = jnp.zeros((B, max_length, d_model), hidden_dtype)

    def body(carry, t):
        state, buf, ctx_h, finished = carry
        cur = buf[:, t]
        logits, h_cur, state = step_h(cur, state)
        ctx_h = jax.lax.dynamic_update_slice(
            ctx_h, h_cur[:, None].astype(hidden_dtype), (0, t, 0))

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_p, top_tok = jax.lax.top_k(probs, K)              # [B, K]

        # run all K candidates one step on an expanded copy of the state
        cand_state = expand_state(state, K)
        cand_tok = top_tok.reshape(B * K).astype(jnp.int32)
        _, h_cand, _ = step_h(cand_tok, cand_state)           # [B*K, d]
        hc = h_cand.reshape(B, K, -1).astype(jnp.float32)

        # degeneration penalty: max cosine sim vs context states <= t
        ctx = ctx_h.astype(jnp.float32)                       # [B, L, d]
        ctx_n = ctx / jnp.maximum(
            jnp.linalg.norm(ctx, axis=-1, keepdims=True), 1e-6)
        hc_n = hc / jnp.maximum(
            jnp.linalg.norm(hc, axis=-1, keepdims=True), 1e-6)
        sim = jnp.einsum('bkd,bld->bkl', hc_n, ctx_n)
        mask = (jnp.arange(max_length) <= t)[None, None, :]
        pen = jnp.max(jnp.where(mask, sim, -1.0), axis=-1)    # [B, K]

        score = (1 - penalty_alpha) * top_p - penalty_alpha * pen
        best = jnp.argmax(score, axis=-1)                     # [B]
        nxt = jnp.take_along_axis(top_tok, best[:, None], 1)[:, 0].astype(jnp.int32)
        # adopt the chosen candidate's advanced state
        state = select_state(cand_state, jnp.arange(B) * K + best)

        in_prompt = (t + 1) < prompt_len
        nxt_tok = jnp.where(in_prompt, buf[:, t + 1], nxt)
        new_finished = finished | ((cur == eos_id) & ~in_prompt)
        nxt_tok = jnp.where(new_finished, pad_id, nxt_tok)
        buf = buf.at[:, t + 1].set(nxt_tok)
        return (state, buf, ctx_h, new_finished), None

    finished0 = jnp.zeros((B,), bool)
    state, buf, _, _ = _scan_early_exit(
        body, (init_state, buf, ctx_h0, finished0), max_length - 1,
        early_exit_chunk, all_done=lambda c: jnp.all(c[3]))

    idx = jnp.arange(max_length)[None, :]
    is_eos = (buf == eos_id) & (idx >= (prompt_len[:, None] - 1))
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    out_len = jnp.where(any_eos, first_eos + 1, max_length)
    buf = jnp.where(idx < out_len[:, None], buf, pad_id)
    return buf, out_len.astype(jnp.int32)


def diverse_beam_generate(
        decode_step: Callable, init_state_fn: Callable, prompt_ids: jnp.ndarray,
        prompt_len: jnp.ndarray, *, max_length: int, eos_id: int, pad_id: int,
        num_beams: int, num_beam_groups: int, diversity_penalty: float = 1.0,
        length_penalty: float = 1.0, reorder_state: Callable = None,
        early_exit_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Diverse (group) beam search (Vijayakumar et al.; HF
    `num_beam_groups`/`diversity_penalty`, the reference's 'beam(+diverse
    groups)' strategy, reference eval.py:279-324).

    Beams are split into G groups expanded SEQUENTIALLY within each step;
    group g's candidate log-probs are penalized by `diversity_penalty` times
    the number of earlier groups that already chose each token this step.
    Returns the best beam over all groups per batch element.
    """
    B, P = prompt_ids.shape
    W, G = num_beams, num_beam_groups
    assert W % G == 0, 'num_beams must divide into num_beam_groups'
    Wg = W // G

    rep = lambda x: jnp.repeat(x, W, axis=0)
    buf = jnp.full((B * W, max_length), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, rep(prompt_ids), (0, 0))
    plen = rep(prompt_len)
    state = init_state_fn(B * W)
    # per group: beam 0 active, rest -inf
    scores0 = jnp.tile(
        jnp.tile(jnp.array([0.0] + [NEG_INF] * (Wg - 1), jnp.float32), (G,)),
        (B,))
    finished0 = jnp.zeros((B * W,), bool)

    def body(carry, t):
        state, buf, scores, finished = carry
        cur = buf[:, t]
        logits, state = decode_step(cur, state)             # [B*W, V]
        V = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, G, Wg, V)

        in_prompt = (t + 1) < plen
        forced_tok = jnp.where(finished, pad_id, buf[:, t + 1])
        frozen = (finished | in_prompt).reshape(B, G, Wg)
        forced = forced_tok.reshape(B, G, Wg)
        sc = scores.reshape(B, G, Wg)

        # expand groups sequentially, accumulating a per-token usage count
        used = jnp.zeros((B, V), jnp.float32)
        new_scores, new_toks, new_src = [], [], []
        for g in range(G):
            cand = sc[:, g, :, None] + logp[:, g] - diversity_penalty * used[:, None, :]
            onehot = jax.nn.one_hot(forced[:, g], V, dtype=jnp.float32)
            cand = jnp.where(frozen[:, g][:, :, None],
                             sc[:, g, :, None] * onehot + NEG_INF * (1 - onehot),
                             cand)
            cand = cand.reshape(B, Wg * V)
            top_s, top_i = jax.lax.top_k(cand, Wg)          # [B, Wg]
            src = top_i // V
            tok = (top_i % V).astype(jnp.int32)
            # undo the diversity penalty from the stored score (it's a
            # selection-time bias, not part of the sequence log-prob)
            sel_used = jnp.take_along_axis(used, tok, axis=1)   # [B, Wg]
            frozen_sel = jnp.take_along_axis(frozen[:, g], src, axis=1)
            top_s = jnp.where(frozen_sel, top_s,
                              top_s + diversity_penalty * sel_used)
            used = used + jnp.sum(
                jax.nn.one_hot(tok, V, dtype=jnp.float32)
                * (~frozen_sel)[:, :, None].astype(jnp.float32), axis=1)
            new_scores.append(top_s)
            new_toks.append(tok)
            new_src.append(src + g * Wg)                    # group-local -> W idx
        scores = jnp.stack(new_scores, 1).reshape(B * W)
        toks = jnp.stack(new_toks, 1).reshape(B * W)
        src_w = jnp.stack(new_src, 1).reshape(B, W)
        flat_src = (jnp.arange(B)[:, None] * W + src_w).reshape(B * W)

        buf = buf[flat_src]
        if reorder_state is not None:
            state = reorder_state(state, flat_src)
        else:
            state = _default_reorder(state, flat_src, B * W)
        finished = finished[flat_src]
        new_finished = finished | ((toks == eos_id) & ~in_prompt[flat_src])
        buf = buf.at[:, t + 1].set(jnp.where(finished, pad_id, toks))
        return (state, buf, scores, new_finished), None

    state, buf, scores, finished = _scan_early_exit(
        body, (state, buf, scores0, finished0), max_length - 1,
        early_exit_chunk, all_done=lambda c: jnp.all(c[3]))

    idx = jnp.arange(max_length)[None, :]
    is_eos = (buf == eos_id) & (idx >= (plen[:, None] - 1))
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    out_len = jnp.where(any_eos, first_eos + 1, max_length)
    norm = scores / (out_len.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(norm.reshape(B, W), axis=1)
    sel = jnp.arange(B) * W + best
    buf = jnp.where(idx < out_len[sel][:, None], buf[sel], pad_id)
    return buf, out_len[sel].astype(jnp.int32)
