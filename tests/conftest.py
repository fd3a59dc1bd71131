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

# Persistent compile cache: most of the suite's wall time is jit compiles
# of the big parametrized engines; repeated runs reuse the executables.
# The dir is keyed by a CPU-feature fingerprint: XLA:CPU AOT artifacts
# are machine-specific, and loading another host's entries fails loudly
# (and slowly) for every cached executable.


def _cpu_fingerprint():
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine()


jax.config.update('jax_compilation_cache_dir', os.path.expanduser(
    f'~/.cache/mrphy_tpu_test_jax_{_cpu_fingerprint()}'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
