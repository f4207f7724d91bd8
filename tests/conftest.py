"""Test configuration: force CPU backend with 8 virtual devices.

Tests must never contend for the single tunnel-attached TPU chip, nor go
through its remote-compile relay (each compile would block on a network
round-trip).  The axon sitecustomize hook registers its backend at
interpreter startup and sets ``jax_platforms='axon,cpu'`` via jax.config —
which overrides the JAX_PLATFORMS env var — so we must undo it at the
config level and drop any already-initialized backends.

8 fake CPU devices are requested for mesh/collective tests — the standard
JAX way to test `shard_map`/pjit sharding without a pod (SURVEY.md §4).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:
    from jax._src import xla_bridge as _xb
    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends
        clear_backends()
except Exception:
    pass

jax.config.update('jax_default_matmul_precision', 'highest')

assert jax.devices()[0].platform == 'cpu', 'tests must run on the CPU backend'
assert len(jax.devices()) == 8, 'tests expect 8 virtual CPU devices'
