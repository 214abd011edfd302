from musicnlp_tpu.models.transformer_xl import DecodeState, TransfoXL, TransfoXLConfig
from musicnlp_tpu.models.reformer import Reformer, ReformerConfig, ReformerDecodeState
