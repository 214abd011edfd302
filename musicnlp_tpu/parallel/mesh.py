"""Device mesh + GSPMD sharding rules.

The reference is a single-process single-GPU trainer ("TODO: DDP not
supported", reference musicnlp/trainer/train.py:219-220).  The TPU-native
equivalent (SURVEY.md §2.2) is ONE pjit/GSPMD program over a
(data, model) mesh: batch sharded over `data` (collectives = psum of grads
over ICI), and megatron-style tensor parallelism over `model` (attention
heads + FFN hidden sharded; XLA inserts the all-reduces from the param
shardings alone).  At reference model sizes `model=1` is the normal
configuration, but the rules below make every preset scalable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'make_multislice_mesh', 'param_specs', 'batch_specs',
           'shard_pytree', 'replicated_specs', 'init_distributed',
           'host_shard', 'make_global_batch', 'barrier']

DATA_AXIS, MODEL_AXIS, REPLICA_AXIS = 'data', 'model', 'replica'


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host entry point: initialize the JAX distributed runtime so
    `jax.devices()` spans every host's chips (call ONCE, before any other jax
    API, on every process).  With no arguments JAX auto-detects the cluster
    from the TPU metadata/env (the normal pod-slice path); explicit args
    support bring-your-own coordinators.  No-op when already initialized or
    when nothing indicates a multi-process launch.  Returns process_count."""
    # probe WITHOUT jax.process_count(): that call initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run
    if hasattr(jax.distributed, 'is_initialized'):        # public when present
        already = jax.distributed.is_initialized()
    else:
        from jax._src import distributed as _dist
        already = _dist.global_state.client is not None
    if not already and (coordinator_address or num_processes
                        or _looks_distributed()):
        try:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        except RuntimeError as e:                          # keep the no-op contract
            if 'already initialized' not in str(e).lower():
                raise
    return jax.process_count()


def _looks_distributed() -> bool:
    import os
    return any(os.environ.get(k) for k in
               ('COORDINATOR_ADDRESS', 'JAX_COORDINATOR_ADDRESS',
                'MEGASCALE_COORDINATOR_ADDRESS'))


def barrier(name: str = 'barrier') -> None:
    """Cross-process sync point (no-op single-process).  Used around
    checkpoint writes so no host reads a file another host is still
    writing."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def host_shard() -> Optional[tuple]:
    """(process_index, process_count) for per-host input sharding, or None
    single-process (the `shard=` arg of SongDataset.batches)."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


def make_global_batch(batch: Dict[str, Any], mesh: Mesh,
                      specs: Dict[str, P]) -> Dict[str, Any]:
    """Per-host local batch -> global jax.Arrays laid out on the mesh.

    Single-process: plain device transfer (the jitted step's in_shardings
    place it).  Multi-process: each host contributes only its slice;
    `jax.make_array_from_process_local_data` assembles the logical global
    array without any cross-host data movement."""
    import jax.numpy as jnp
    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(
                NamedSharding(mesh, specs[k]), v)
            for k, v in batch.items()}


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        assert n % n_model == 0, f'{n} devices not divisible by model={n_model}'
        n_data = n // n_model
    assert n_data * n_model <= n
    import numpy as np
    dev = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(n_replica: int, n_data: int = None, n_model: int = 1,
                         devices=None) -> Mesh:
    """(replica, data, model) mesh for multi-slice / multi-pod training.

    Axis order puts `replica` outermost so its collectives (grad psum across
    slices) ride DCN while `data`/`model` collectives stay on ICI within a
    slice -- the standard pod-slice layout (SURVEY.md §2.2's TPU-native
    equivalent).  Batches shard over (replica, data) jointly; see
    `batch_specs(multislice=True)`.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        assert n % (n_replica * n_model) == 0
        n_data = n // (n_replica * n_model)
    import numpy as np
    dev = np.asarray(devices[:n_replica * n_data * n_model]).reshape(
        n_replica, n_data, n_model)
    return Mesh(dev, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def _spec_for(names, leaf, shard_vocab: bool = False) -> P:
    """Megatron-style TP rule for one param, keyed by its pytree path.

    Attention heads and FFN hidden shard over `model`; embeddings, norms, and
    the LM head replicate at the base vocab tiers (<= 32k is small next to
    activations).  `shard_vocab=True` (the 262k learned-tokenizer tier) row-
    shards the tied [V, d] embedding/head + bias over `model` instead -- the
    ~200M-param table and its gradient then never replicate or all-reduce in
    full (ops/sharded_head.py computes the CE shard-locally).
    Works for both TransfoXL and Reformer param trees.
    """
    last = names[-1] if names else ''
    parent = names[-2] if len(names) > 1 else ''
    if shard_vocab:
        if parent == 'embed' and last == 'weight':     # [V, d] row-sharded
            return P(MODEL_AXIS, None)
        if last == 'out_bias':                         # [V]
            return P(MODEL_AXIS)
    if last == 'qkv':                              # [d, 3, N, H]
        return P(None, None, MODEL_AXIS, None)
    if last in ('r', 'qk') or (last in ('v', 'k') and parent == 'attn'):
        return P(None, MODEL_AXIS, None)           # [d, N, H]
    if last == 'o':                                # [N, H, d] row-parallel
        return P(MODEL_AXIS, None, None)
    if last in ('r_w_bias', 'r_r_bias'):           # [N, H]
        return P(MODEL_AXIS, None)
    if parent == 'w1':                             # column-parallel FFN in
        return P(None, MODEL_AXIS) if last == 'w' else P(MODEL_AXIS)
    if parent == 'w2':                             # row-parallel FFN out
        return P(MODEL_AXIS, None) if last == 'w' else P(None)
    return P(*([None] * getattr(leaf, 'ndim', 0)))


def param_specs(params: Dict[str, Any], shard_vocab: bool = False) -> Any:
    """PartitionSpec pytree matching a model param pytree (rule-based)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        names = [str(p.key) for p in path if hasattr(p, 'key')]
        specs.append(_spec_for(names, leaf, shard_vocab=shard_vocab))
    return jax.tree_util.tree_unflatten(treedef, specs)


def batch_specs(multislice: bool = False) -> Dict[str, P]:
    """Shardings for one training batch (data-parallel over the batch axis;
    jointly over (replica, data) on a multi-slice mesh)."""
    axis = (REPLICA_AXIS, DATA_AXIS) if multislice else DATA_AXIS
    return dict(
        input_ids=P(axis, None),
        labels=P(axis, None),
        key_scores=P(axis, None),
    )


def replicated_specs(tree) -> Any:
    return jax.tree.map(lambda _: P(), tree)


def shard_pytree(tree, specs, mesh: Mesh):
    """Place a host pytree onto the mesh with the given PartitionSpecs."""
    # tree.map flattens `specs` up to `tree`'s structure, so each P is handed
    # over whole even though PartitionSpec is itself a pytree (tuple subclass)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
