from musicnlp_tpu.postprocess.music_stats import MusicStats
from musicnlp_tpu.postprocess.music_visualize import MusicVisualize
from musicnlp_tpu.postprocess.train_plot import (
    load_train_log, plot_train_curves, summarize_run,
)
