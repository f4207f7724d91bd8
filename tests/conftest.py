"""Test configuration: force CPU backend with 8 virtual devices.

Must run before any jax import: disables the axon TPU claim (so tests
never contend for the single tunnel-attached chip) and requests 8 fake
CPU devices for mesh/collective tests — the standard JAX way to test
`shard_map`/pjit sharding without a pod (SURVEY.md §4).
"""
import os

os.environ['PALLAS_AXON_POOL_IPS'] = ''
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_default_matmul_precision', 'highest')
