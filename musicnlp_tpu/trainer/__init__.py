from musicnlp_tpu.trainer.train import (
    RECIPES, TrainArgs, Trainer, get_all_setup, get_model_n_tokenizer,
    setup_recipe,
)
from musicnlp_tpu.trainer.metrics import ComputeMetrics, IkrMetric
from musicnlp_tpu.trainer.melody_w2v import PitchEmbedding
