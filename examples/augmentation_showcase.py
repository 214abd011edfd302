"""Augmentation showcase: extract -> key-augment -> colorized tokens.

The reference's `chore/writing.py::viz_train_aug` (its only "writing" chore):
extract a song in full mode, apply the key augmentation a training epoch
would, and print the token string colorized by token type (red = meta,
green = duration, blue = pitch, magenta = structure).

Usage: python examples/augmentation_showcase.py [path/to/song.{mxl,mid}]
Falls back to a synthesized diatonic song when no path is given.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from musicnlp_tpu.preprocess.key_finder import KeyFinder
    from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
    from musicnlp_tpu.preprocess.transform import AugmentKey
    from musicnlp_tpu.vocab import MusicTokenizer

    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        import tempfile
        from examples.train_demo import make_corpus
        src = make_corpus(tempfile.mkdtemp(), n_song=1)[0]
        print(f'(no input given; synthesized {src})')

    me = MusicExtractor(mode='full', with_pitch_step=True, warn_logger=True)
    text = me(src, exp='str_join')
    keys = KeyFinder(src)(return_type='dict')
    key = max(keys, key=keys.get)
    print(f'extracted {len(text.split())} tokens; best key: {key}\n')

    aug = AugmentKey()
    text_aug = aug((text, key))

    tok = MusicTokenizer(pitch_kind='degree')
    print(tok.colorize(text_aug))


if __name__ == '__main__':
    main()
