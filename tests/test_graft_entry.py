"""The driver contract: entry() compiles, dryrun_multichip(8) runs a full
sharded train step on the CPU mesh.

Round-4 post-mortem (VERDICT.md): the driver invokes dryrun_multichip in a
BARE process (JAX_PLATFORMS=axon preset, sitecustomize on PYTHONPATH, no
conftest), where an import-time eager op in the package initialized the
tunneled-TPU backend before the CPU mesh could be forced -- and crashed the
gate when the tunnel had a libtpu version skew.  The tests here therefore run
the gate in SUBPROCESSES that reproduce the driver's environment instead of
relying on conftest.py's already-forced CPU platform.  None of them touch the
TPU: dryrun_multichip forces the virtual CPU platform before any backend
initializes, which is exactly the property under test.
"""
import os
import re
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env(**overrides):
    """The driver's bare environment: axon platform preset, sitecustomize on
    PYTHONPATH, and none of conftest's in-process CPU forcing (undo the
    parent pytest process's env edits)."""
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'axon'
    flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '',
                   env.get('XLA_FLAGS', '')).strip()
    if flags:
        env['XLA_FLAGS'] = flags
    else:
        env.pop('XLA_FLAGS', None)
    pp = env.get('PYTHONPATH', '')
    if '/root/.axon_site' not in pp.split(os.pathsep):
        env['PYTHONPATH'] = (pp + os.pathsep if pp else '') + '/root/.axon_site'
    env.pop('_MUSICNLP_DRYRUN_CHILD', None)
    env.update(overrides)
    return env


def _run(code: str, env):
    return subprocess.run([sys.executable, '-c', code], env=env,
                          capture_output=True, text=True, timeout=1800)


def test_dryrun_multichip_driver_env():
    """rc 0 + full output under the exact bare invocation the driver uses."""
    code = (f'import sys; sys.path.insert(0, {REPO!r}); '
            'from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)')
    r = _run(code, _driver_env())
    assert r.returncode == 0, f'stderr:\n{r.stderr[-4000:]}'
    for marker in ('loss=', 'ikr=', 'reformer', 'shard_vocab 262k',
                   'int8-decode', 'host-shard math ok'):
        assert marker in r.stdout, (marker, r.stdout)


def test_dryrun_multichip_backend_already_initialized():
    """If a backend is already initialized with too few devices (the driver
    may run entry() first), dryrun must fall back to a pristine subprocess
    and still succeed."""
    code = (
        f'import sys; sys.path.insert(0, {REPO!r})\n'
        'import jax\n'
        'jax.config.update("jax_platforms", "cpu")\n'
        'assert len(jax.devices()) == 1, jax.devices()  # backend now locked\n'
        'from __graft_entry__ import dryrun_multichip\n'
        'dryrun_multichip(8)\n')
    r = _run(code, _driver_env())
    assert r.returncode == 0, f'stderr:\n{r.stderr[-4000:]}'


def test_package_import_never_dispatches():
    """Importing any module __graft_entry__ pulls in must not create jax
    arrays (= initialize a backend): point jax at a nonexistent platform so
    any eager dispatch at import time raises."""
    code = (
        f'import sys; sys.path.insert(0, {REPO!r})\n'
        'import jax\n'
        'jax.config.update("jax_platforms", "no_such_platform")\n'
        'import optax\n'
        'import musicnlp_tpu\n'
        'import musicnlp_tpu.models.transformer_xl\n'
        'import musicnlp_tpu.models.reformer\n'
        'import musicnlp_tpu.ops.losses\n'
        'import musicnlp_tpu.ops.sharded_head\n'
        'import musicnlp_tpu.ops.sampling\n'
        'import musicnlp_tpu.parallel.mesh\n'
        'import musicnlp_tpu.preprocess.dataset\n'
        'import musicnlp_tpu.trainer.train\n'
        'import musicnlp_tpu.trainer.eval\n'
        'import musicnlp_tpu.vocab\n'
        'print("import-pure")\n')
    r = _run(code, _driver_env())
    assert r.returncode == 0, f'stderr:\n{r.stderr[-4000:]}'
    assert 'import-pure' in r.stdout


def test_entry_shapes():
    sys.path.insert(0, REPO)
    from __graft_entry__ import entry
    fn, (params, ids) = entry()
    assert ids.shape == (2, 1024)
    # trace-only check (full base compile on CPU is slow); eval_shape
    # validates the program builds without running it
    out = jax.eval_shape(fn, params, ids)
    assert out.shape == (2, 1024, 1190)
