"""musicnlp_tpu: TPU-native symbolic music generation framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
StefanHeng/Symbolic-Music-Generation (see README.md and SURVEY.md).
Top-level re-exports cover the main user-facing flow: extract -> dataset ->
train -> generate.
"""

__version__ = '0.1.0'

from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary, VocabType

__all__ = [
    'MusicTokenizer', 'MusicVocabulary', 'VocabType',
    # lazy (heavy deps): MusicExtractor, MusicExport, Trainer, MusicGenerator
]


def __getattr__(name):
    """Lazy imports so `import musicnlp_tpu` stays light (no jax pull-in)."""
    if name == 'MusicExtractor':
        from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
        return MusicExtractor
    if name == 'FastMidiExtractor':
        from musicnlp_tpu.preprocess.fast_extractor import FastMidiExtractor
        return FastMidiExtractor
    if name == 'MusicExport':
        from musicnlp_tpu.preprocess.music_export import MusicExport
        return MusicExport
    if name == 'MusicConverter':
        from musicnlp_tpu.preprocess.music_converter import MusicConverter
        return MusicConverter
    if name == 'Trainer':
        from musicnlp_tpu.trainer.train import Trainer
        return Trainer
    if name == 'MusicGenerator':
        from musicnlp_tpu.trainer.eval import MusicGenerator
        return MusicGenerator
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
