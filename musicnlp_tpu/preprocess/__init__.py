from musicnlp_tpu.preprocess.warning_logger import WarnLog
from musicnlp_tpu.preprocess.key_finder import KeyFinder, ScaleDegreeFinder
from musicnlp_tpu.preprocess.music_converter import (
    MusicConverter, MusicElm, SongSplitOutput, ElmParseOutput,
)
