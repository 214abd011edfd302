"""Test config: run JAX on a virtual 8-device CPU mesh so pjit/sharding paths are
exercised without TPU hardware (the JAX-native fake backend, see SURVEY.md §4).

The environment presets JAX_PLATFORMS=axon (a tunneled real TPU chip) and a
sitecustomize module imports jax at interpreter start, so plain env-var edits
here are too late -- the jax config must be updated directly, before any
backend initializes.  The single remote chip can't exercise multi-device
sharding, and remote compiles make the suite orders of magnitude slower.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

jax.config.update('jax_platforms', 'cpu')
# this environment's DEFAULT matmul precision quantizes f32 einsum inputs to
# bf16 even on CPU (TPU-style); equivalence tests (decode vs forward, sharded
# vs single-device) need true f32 matmuls to assert tight tolerances
jax.config.update('jax_default_matmul_precision', 'highest')
assert jax.devices()[0].platform == 'cpu' and len(jax.devices()) >= 8, (
    'tests must run on the virtual 8-device CPU mesh, got '
    f'{jax.devices()}')
