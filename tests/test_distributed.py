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
