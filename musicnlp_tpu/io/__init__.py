from musicnlp_tpu.io.score import (
    Dur, Pitch, Note, Rest, Chord, SNote, ExtNote, Measure, Part, Score, TsTup,
    MIDI_SPELLING, midi2step_octave, note2dur, note2pitch, get_offset, get_end_qlen,
    flatten_notes, unpack_notes, time_sig2bar_dur, eps,
)
from musicnlp_tpu.io.midi import read_midi, write_midi, PPQ
from musicnlp_tpu.io.musicxml import (
    write_musicxml, write_mxl, read_musicxml, read_mxl, parse_file, DIVISIONS,
)
