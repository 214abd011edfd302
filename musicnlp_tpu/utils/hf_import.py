"""HF Transformer-XL checkpoint import/export.

Lets a user of the reference stack (HF `TransfoXLLMHeadModel`, reference
musicnlp/models/transformer_xl.py:15-66) bring a trained torch checkpoint
into this framework (and take one back out).  Weight-for-weight exact:

  * trunk (embedding, per-layer qkv/r/o projections, r_w/r_r biases, layer
    norms, FFN) maps by transpose/reshape only;
  * the adaptive-softmax head (the reference sets cutoffs=[1000] for
    vocab >= 1000) maps onto `TransfoXLConfig.adaptive_cutoffs` plus the
    `adaptive` param group -- the model then emits the SAME cluster-
    factorized log-probs HF's ProjectedAdaptiveLogSoftmax produces;
  * supported layout: div_val == 1 and d_proj == d_embed (the only layout
    the reference ever constructs); anything else raises.

Works on a state dict (torch tensors or numpy arrays) so torch never needs
to touch the TPU process; `transformers` is only imported for export.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig

__all__ = ['from_hf_transfo_xl', 'to_hf_transfo_xl']


def _np(x) -> np.ndarray:
    if hasattr(x, 'detach'):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _state_dict(model_or_state) -> Dict[str, np.ndarray]:
    sd = (model_or_state.state_dict() if hasattr(model_or_state, 'state_dict')
          else model_or_state)
    return {k: _np(v) for k, v in sd.items()}


def from_hf_transfo_xl(
        model_or_state, *, hf_config=None, max_length: Optional[int] = None,
        **config_overrides) -> Tuple[TransfoXLConfig, Dict[str, Any]]:
    """HF TransfoXLLMHeadModel (or its state dict) -> (config, params).

    `hf_config` may be omitted when a model object is passed.  Returns param
    arrays as numpy (device placement is the caller's concern).
    """
    if hf_config is None:
        hf_config = getattr(model_or_state, 'config', None)
        if hf_config is None:
            raise ValueError('pass hf_config when importing a bare state dict')
    sd = _state_dict(model_or_state)
    hc = hf_config
    if getattr(hc, 'div_val', 1) != 1:
        raise NotImplementedError('div_val != 1 is not a reference layout')
    if hc.d_embed != hc.d_model:
        raise NotImplementedError('d_proj != d_embed is not a reference layout')
    N, H, d = hc.n_head, hc.d_head, hc.d_model
    cutoffs = tuple(int(c) for c in (hc.cutoffs or []) if c < hc.vocab_size)

    embed = sd['transformer.word_emb.emb_layers.0.weight']       # [V, d]
    out_w = sd.get('crit.out_layers.0.weight')
    if out_w is not None and not np.allclose(out_w, embed, atol=1e-6):
        raise NotImplementedError(
            'untied output embedding (tie_weight=False) is not supported by '
            "this framework's tied head")

    layers = []
    for i in range(hc.n_layer):
        p = f'transformer.layers.{i}.'
        qkv = sd[p + 'dec_attn.qkv_net.weight']                  # [3NH, d]
        r_net = sd[p + 'dec_attn.r_net.weight']                  # [NH, d]
        o_net = sd[p + 'dec_attn.o_net.weight']                  # [d, NH]
        if getattr(hc, 'untie_r', True):
            rw = sd[p + 'dec_attn.r_w_bias']
            rr = sd[p + 'dec_attn.r_r_bias']
        else:
            rw = sd['transformer.r_w_bias']
            rr = sd['transformer.r_r_bias']
        layers.append(dict(
            attn=dict(
                qkv=qkv.T.reshape(d, 3, N, H),
                r=r_net.T.reshape(d, N, H),
                o=o_net.T.reshape(N, H, d),
                r_w_bias=rw.reshape(N, H),
                r_r_bias=rr.reshape(N, H),
                ln=dict(scale=sd[p + 'dec_attn.layer_norm.weight'],
                        bias=sd[p + 'dec_attn.layer_norm.bias']),
            ),
            ffn=dict(
                w1=dict(w=sd[p + 'pos_ff.CoreNet.0.weight'].T,
                        b=sd[p + 'pos_ff.CoreNet.0.bias']),
                w2=dict(w=sd[p + 'pos_ff.CoreNet.3.weight'].T,
                        b=sd[p + 'pos_ff.CoreNet.3.bias']),
                ln=dict(scale=sd[p + 'pos_ff.layer_norm.weight'],
                        bias=sd[p + 'pos_ff.layer_norm.bias']),
            ),
        ))

    params: Dict[str, Any] = dict(
        embed=dict(weight=embed),
        layers=layers,
        out_bias=sd['crit.out_layers.0.bias'],
    )
    if cutoffs:
        params['adaptive'] = dict(
            cluster_w=sd['crit.cluster_weight'],
            cluster_b=sd['crit.cluster_bias'])

    # HF leaves same_length=True by default (the reference never overrides
    # it), which makes its models attend a fixed mem_len-wide sliding
    # window rather than full causal context -- reproduce via attn_window
    window = (max(1, hc.mem_len)
              if getattr(hc, 'same_length', True) else None)
    cfg = TransfoXLConfig(
        vocab_size=hc.vocab_size, model_size='hf-import', d_model=d,
        n_head=N, d_head=H, d_inner=hc.d_inner, n_layer=hc.n_layer,
        mem_len=max(1, hc.mem_len), clamp_len=hc.clamp_len,
        max_length=max_length or max(hc.mem_len, 1) * 8,
        dropout=hc.dropout, pre_lnorm=bool(getattr(hc, 'pre_lnorm', False)),
        adaptive_cutoffs=cutoffs or None, attn_window=window,
        **config_overrides)
    return cfg, params


def to_hf_transfo_xl(cfg: TransfoXLConfig, params: Dict[str, Any]):
    """(config, params) -> HF TransfoXLLMHeadModel with identical weights.

    Exports the dense tied head as a single-cluster (cutoffs=[]) HF model;
    adaptive-imported params round-trip their cutoffs."""
    import torch
    from transformers import TransfoXLConfig as HFConfig
    from transformers import TransfoXLLMHeadModel

    cuts = list(cfg.adaptive_cutoffs or [])
    if cfg.attn_window is not None and cfg.attn_window != cfg.mem_len:
        raise NotImplementedError(
            'HF same_length can only express attn_window == mem_len')
    hc = HFConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_embed=cfg.d_model,
        n_head=cfg.n_head, d_head=cfg.d_head, d_inner=cfg.d_inner,
        n_layer=cfg.n_layer, mem_len=cfg.mem_len, clamp_len=cfg.clamp_len,
        cutoffs=cuts, div_val=1, untie_r=True, dropout=cfg.dropout,
        dropatt=cfg.dropatt, pre_lnorm=cfg.pre_lnorm,
        same_length=cfg.attn_window is not None)
    model = TransfoXLLMHeadModel(hc)
    g = jax_to_np = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    sd = model.state_dict()
    N, H, d = cfg.n_head, cfg.d_head, cfg.d_model
    new = {}
    new['transformer.word_emb.emb_layers.0.weight'] = g(params['embed']['weight'])
    new['crit.out_layers.0.weight'] = g(params['embed']['weight'])
    new['crit.out_layers.0.bias'] = g(params['out_bias'])
    if cuts:
        new['crit.cluster_weight'] = g(params['adaptive']['cluster_w'])
        new['crit.cluster_bias'] = g(params['adaptive']['cluster_b'])
    for i, layer in enumerate(params['layers']):
        p = f'transformer.layers.{i}.'
        a, f = layer['attn'], layer['ffn']
        new[p + 'dec_attn.qkv_net.weight'] = g(
            np.asarray(a['qkv'], np.float32).reshape(d, 3 * N * H).T)
        new[p + 'dec_attn.r_net.weight'] = g(
            np.asarray(a['r'], np.float32).reshape(d, N * H).T)
        new[p + 'dec_attn.o_net.weight'] = g(
            np.asarray(a['o'], np.float32).reshape(N * H, d).T)
        new[p + 'dec_attn.r_w_bias'] = g(a['r_w_bias'])
        new[p + 'dec_attn.r_r_bias'] = g(a['r_r_bias'])
        new[p + 'dec_attn.layer_norm.weight'] = g(a['ln']['scale'])
        new[p + 'dec_attn.layer_norm.bias'] = g(a['ln']['bias'])
        new[p + 'pos_ff.CoreNet.0.weight'] = g(np.asarray(f['w1']['w']).T)
        new[p + 'pos_ff.CoreNet.0.bias'] = g(f['w1']['b'])
        new[p + 'pos_ff.CoreNet.3.weight'] = g(np.asarray(f['w2']['w']).T)
        new[p + 'pos_ff.CoreNet.3.bias'] = g(f['w2']['b'])
        new[p + 'pos_ff.layer_norm.weight'] = g(f['ln']['scale'])
        new[p + 'pos_ff.layer_norm.bias'] = g(f['ln']['bias'])
    sd.update(new)
    model.load_state_dict(sd)
    return model
