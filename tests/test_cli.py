"""End-to-end CLI flow (musicnlp_tpu/cli.py): extract -> dataset -> train ->
generate over the golden fixture scores, exercising the same public API the
README Quickstart documents."""
import glob
import json
import os

from musicnlp_tpu.cli import build_parser, main

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')


def test_parser_has_all_subcommands():
    helps = build_parser().format_help()
    for cmd in ('extract', 'dataset', 'train', 'generate'):
        assert cmd in helps


def test_cli_end_to_end(tmp_path):
    base = str(tmp_path)
    goldens = sorted(glob.glob(os.path.join(GOLDEN_DIR, 'golden*.musicxml')))
    assert len(goldens) >= 6
    # 12 distinct inputs so one full global batch (8, the CPU-mesh data
    # width) survives the test split
    import shutil
    inputs = []
    for i, g in enumerate(goldens * 2):
        p = f'{base}/in_{i}.musicxml'
        shutil.copy(g, p)
        inputs.append(p)

    rc = main(['extract', *inputs, '--out', f'{base}/json',
               '--combine', f'{base}/combined.json'])
    assert rc == 0
    with open(f'{base}/combined.json') as f:
        combined = json.load(f)
    assert combined['n_song'] == len(inputs)

    rc = main(['dataset', f'{base}/combined.json', '--out', f'{base}/ds',
               '--test-frac', '0.2', '--pitch-kind', 'step'])
    assert rc == 0
    assert os.path.exists(f'{base}/ds/train.npz')

    rc = main(['train', '--dataset', f'{base}/ds', '--out', f'{base}/run',
               '--model', 'transf-xl', '--size', 'debug',
               '--pitch-kind', 'degree', '--epochs', '1', '--batch-size', '8',
               '--insert-key'])
    assert rc == 0
    assert os.path.exists(f'{base}/run/trained.npz')

    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen', '--n', '1', '--strategy', 'sample',
               '--top-k', '8', '--seed', '7', '--key', 'CMajor',
               '--typical-p', '0.95', '--repetition-penalty', '1.1',
               '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen/*.mxl') and glob.glob(f'{base}/gen/*.mid')

    # the beam/contrastive arg plumbing, reusing the trained run
    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen_beam', '--n', '1', '--strategy', 'beam',
               '--num-beams', '3', '--length-penalty', '0.9',
               '--temperature', '0.7',  # warned + ignored by beams
               '--key', 'CMajor', '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen_beam/*.mid')
    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen_dbs', '--n', '1', '--strategy', 'beam',
               '--num-beams', '4', '--num-beam-groups', '2',
               '--diversity-penalty', '0.8',
               '--key', 'CMajor', '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen_dbs/*.mid')
    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen_ctr', '--n', '1', '--strategy', 'contrastive',
               '--penalty-alpha', '0.5', '--top-k', '4',
               '--key', 'CMajor', '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen_ctr/*.mid')
    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen_q', '--n', '1', '--strategy', 'sample',
               '--top-k', '8', '--seed', '7', '--kv-cache', 'int8',
               '--key', 'CMajor', '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen_q/*.mid')


def test_cli_train_degree_auto_insert_key(tmp_path, capsys):
    """--pitch-kind degree without --insert-key must auto-enable the
    key-conditioned shift rather than train a garbage model."""
    base = str(tmp_path)
    goldens = sorted(glob.glob(os.path.join(GOLDEN_DIR, 'golden*.musicxml')))
    import shutil
    inputs = []
    for i, g in enumerate(goldens * 2):
        p = f'{base}/in_{i}.musicxml'
        shutil.copy(g, p)
        inputs.append(p)
    assert main(['extract', *inputs, '--out', f'{base}/json',
                 '--combine', f'{base}/combined.json']) == 0
    assert main(['dataset', f'{base}/combined.json', '--out', f'{base}/ds',
                 '--test-frac', '0.2', '--pitch-kind', 'step']) == 0
    rc = main(['train', '--dataset', f'{base}/ds', '--out', f'{base}/run',
               '--model', 'transf-xl', '--size', 'debug',
               '--pitch-kind', 'degree', '--epochs', '1',
               '--batch-size', '8'])   # note: no --insert-key
    assert rc == 0
    assert os.path.exists(f'{base}/run/trained.npz')
    assert 'enabling --insert-key' in capsys.readouterr().err


def test_extract_resume_counts(tmp_path):
    """Second run over the same output dir reports skips, not work."""
    base = str(tmp_path)
    golden = sorted(glob.glob(os.path.join(GOLDEN_DIR, 'golden*.musicxml')))[:2]
    from musicnlp_tpu.preprocess.music_export import MusicExport
    exp = MusicExport(mode='full', extractor_args=dict(with_pitch_step=True))
    r1 = exp(golden, output_dir=f'{base}/json', save_each=True)
    assert r1['n_done'] == 2 and r1['n_skipped'] == 0
    r2 = exp(golden, output_dir=f'{base}/json', save_each=True)
    assert r2['n_done'] == 0 and r2['n_skipped'] == 2


def test_cli_wordpiece_train_generate(tmp_path):
    """Learned-tokenizer CLI flow: extract -> train wordpiece -> train model
    over the string pipeline -> generate (tokenizer auto-restored from run)."""
    base = str(tmp_path)
    goldens = sorted(glob.glob(os.path.join(GOLDEN_DIR, 'golden*.musicxml')))
    import shutil
    inputs = []
    for i, g in enumerate(goldens * 2):
        p = f'{base}/in_{i}.musicxml'
        shutil.copy(g, p)
        inputs.append(p)
    assert main(['extract', *inputs, '--out', f'{base}/json',
                 '--combine', f'{base}/combined.json']) == 0
    assert main(['dataset', f'{base}/combined.json', '--out', f'{base}/ds',
                 '--test-frac', '0.2', '--pitch-kind', 'step']) == 0

    # train a small midi-kind WordPiece over the same corpus
    from musicnlp_tpu.preprocess import transform as tsf
    from musicnlp_tpu.preprocess.dataset import load_songs
    from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTrainer
    from musicnlp_tpu.vocab import MusicVocabulary
    songs = load_songs(f'{base}/combined.json')
    sant = tsf.SanitizeRare(vocab=MusicVocabulary(pitch_kind='step'))
    tomidi = tsf.ToMidiPitch(vocab=MusicVocabulary(pitch_kind='step'))
    corpus = [tomidi(sant(s['score'])) for s in songs]
    tr = WordPieceMusicTrainer(pitch_kind='midi')
    wp_path = f'{base}/wp.json'
    tr(corpus, vocab_size=2 * len(MusicVocabulary(pitch_kind='midi')) + 32,
       save=wp_path)

    rc = main(['train', '--dataset', f'{base}/ds', '--out', f'{base}/run',
               '--model', 'transf-xl', '--size', 'debug', '--epochs', '1',
               '--batch-size', '8', '--tokenizer-scheme', 'wordpiece',
               '--tokenizer-path', wp_path])
    assert rc == 0
    assert os.path.exists(f'{base}/run/tokenizer.json')

    rc = main(['generate', '--model-dir', f'{base}/run', '--out',
               f'{base}/gen', '--n', '1', '--strategy', 'sample',
               '--top-k', '8', '--seed', '3', '--max-length', '48'])
    assert rc == 0
    assert glob.glob(f'{base}/gen/*.mxl') and glob.glob(f'{base}/gen/*.mid')
    # generated text decodes over the BASE vocab (merged units split back)
    js = sorted(glob.glob(f'{base}/gen/*.json'))
    with open(js[0]) as f:
        text = json.load(f)['text']
    basev = MusicVocabulary(pitch_kind='midi')
    assert all(t in basev for t in text.split())
