"""Golden-file regression tests (SURVEY.md §4): extraction token output,
tokenizer ids, and detokenizer round-trips are pinned byte-for-byte against
frozen fixtures in tests/goldens/."""
import json
import os

import pytest

from musicnlp_tpu.preprocess.fast_extractor import (
    FastMidiExtractor, fast_extract_available,
)
from musicnlp_tpu.preprocess.music_converter import MusicConverter
from musicnlp_tpu.preprocess.music_extractor import MusicExtractor
from musicnlp_tpu.io.musicxml import parse_file
from musicnlp_tpu.vocab import MusicTokenizer

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')
with open(os.path.join(GOLDEN_DIR, 'extraction.json')) as f:
    GOLDENS = json.load(f)
NAMES = sorted(GOLDENS)


@pytest.mark.parametrize('name', NAMES)
def test_full_extraction_golden(name):
    score = parse_file(os.path.join(GOLDEN_DIR, f'{name}.musicxml'))
    got = MusicExtractor(mode='full', warn_logger=True)(score, exp='str_join')
    assert got == GOLDENS[name]['full']


@pytest.mark.parametrize('name', NAMES)
def test_melody_extraction_golden(name):
    score = parse_file(os.path.join(GOLDEN_DIR, f'{name}.musicxml'))
    got = MusicExtractor(mode='melody', warn_logger=True)(score, exp='str_join')
    assert got == GOLDENS[name]['melody']


@pytest.mark.parametrize('name', NAMES)
def test_tokenizer_ids_golden(name):
    tok = MusicTokenizer(pitch_kind='midi')
    ids = tok.encode(GOLDENS[name]['full'])
    assert ids == GOLDENS[name]['ids_midi']
    assert tok.decode(ids) == GOLDENS[name]['full']


@pytest.mark.skipif(not fast_extract_available(), reason='no native lib')
@pytest.mark.parametrize('name', NAMES)
def test_fast_extraction_golden(name):
    got = FastMidiExtractor(mode='full')(
        os.path.join(GOLDEN_DIR, f'{name}.mid'))
    assert got == GOLDENS[name]['fast_full']


@pytest.mark.parametrize('name', NAMES)
def test_detokenize_roundtrip_golden(name):
    """tokens -> Score -> tokens is the identity (mxl2str . str2score)."""
    mc = MusicConverter(mode='full')
    score = mc.str2score(GOLDENS[name]['full'], pitch_kind='midi')
    back = mc.mxl2str(score, pitch_kind='step')
    # map spelled pitches back to midi kind for comparison
    from musicnlp_tpu.preprocess.transform import ToMidiPitch
    back_midi = ToMidiPitch()(back)
    assert back_midi == GOLDENS[name]['full']
