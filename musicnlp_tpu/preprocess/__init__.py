from musicnlp_tpu.preprocess.warning_logger import WarnLog
from musicnlp_tpu.preprocess.key_finder import KeyFinder, ScaleDegreeFinder
from musicnlp_tpu.preprocess.music_converter import (
    MusicConverter, MusicElm, SongSplitOutput, ElmParseOutput,
)
from musicnlp_tpu.preprocess.music_extractor import MusicExtractor, MusicExtractorOutput
from musicnlp_tpu.preprocess.fast_extractor import FastMidiExtractor, fast_extract_available
from musicnlp_tpu.preprocess.music_export import (
    MusicExport, SingleExport, combine_saved_songs, json2dataset,
)
from musicnlp_tpu.preprocess.melody_grid import (
    GridVocab, MelodyGridDataset, MelodyGridExtractor, grid_decode,
)
from musicnlp_tpu.preprocess.dataset import (
    AugmentedDataset, ProportionMixingDataset, SongDataset, load_songs,
)
