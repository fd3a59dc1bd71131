r"""Test configuration.

- Forces the CPU platform with 8 virtual devices so multi-chip sharding
  tests run anywhere (the TPU-native answer to "test multi-node without a
  cluster"); the benchmark (`bench.py`) runs on real TPU separately.
- Enables x64 so physics tests can assert at 1e-9 like the reference
  (`/root/reference/tests/test_sims.py:16`).

Environment variables must be set before JAX initializes — this module is
imported by pytest before any test imports jax.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The container's sitecustomize registers an 'axon' (TPU) backend and pins
# JAX_PLATFORMS before any env override can land; force CPU via jax.config
# (which wins over the env var) so tests are hermetic.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compile cache: DISABLED under pytest. Two full-suite
# crashes this round traced to it — (a) XLA:CPU AOT entries are
# machine-specific and this container migrates hosts (SIGILL loading a
# foreign executable, even with a /proc/cpuinfo fingerprint in the
# path: XLA's detected feature set can differ while cpuinfo matches),
# and (b) a crash mid-write leaves torn entries that abort every later
# read. Cold compiles cost ~10 min of suite time; reliability wins.
# The env var is honored by utils.timing.enable_persistent_cache, so
# tests that exercise it (test_parallel) stay inert here.
os.environ['MRPHY_NO_PERSISTENT_CACHE'] = '1'
