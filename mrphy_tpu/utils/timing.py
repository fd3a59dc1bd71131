r"""Timing and profiling harness.

The reference instruments with bare ``time.time()`` in tests
(``/root/reference/tests/test_sims.py:73-97``); on an asynchronously
dispatched runtime that measures dispatch, not execution (and
``block_until_ready`` does not dependably block on remote-attached
runtimes). These helpers measure honestly:

- :func:`host_sync` — force completion via a host read;
- :func:`amortized_timeit` — K calls + host sync, amortized;
- :func:`chained_timeit` — iterations chained through a data dependency
  (the strictest serialization);
- :func:`trace` — ``jax.profiler`` trace context for XProf dumps.
"""

import contextlib
import time

import numpy as np
import jax

__all__ = ['host_sync', 'amortized_timeit', 'chained_timeit', 'trace',
           'enable_persistent_cache']


def enable_persistent_cache(path: str = '~/.cache/mrphy_tpu_jax') -> None:
    r"""Opt into JAX's persistent compilation cache at ``path``.

    Design-scale graphs (scan over optimizer iterations of a custom-VJP
    Bloch engine) take tens of seconds to minutes to compile on a remote
    attachment; the persistent cache makes later processes reuse the
    compiled executables. Call once, before the first ``jit`` runs.

    The directory is suffixed with a fingerprint of the host CPU's
    feature flags: XLA:CPU AOT results are machine-specific, and this
    container can migrate between hosts — loading another machine's
    cached executable SIGILLs/segfaults mid-compile (observed: two
    full-suite crashes inside ``backend_compile_and_load`` after a
    host change, with XLA warning "Compile machine features ... vs
    host machine features"). Set ``MRPHY_NO_PERSISTENT_CACHE`` to make
    this a no-op (the test suite does: torn entries from a crashed
    writer abort subsequent cache READS, and the fingerprint cannot
    catch every host difference — XLA's detected features can differ
    while /proc/cpuinfo matches).
    """
    import hashlib
    import os
    import platform
    if os.environ.get('MRPHY_NO_PERSISTENT_CACHE'):
        return
    fp = platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser(path) + '-' + fp)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def host_sync(out):
    r"""Force completion of ``out`` (any pytree) via a host read.

    Reads ONE element per leaf, sliced ON DEVICE first: ``np.asarray``
    on the whole leaf would transfer it entirely over the (tunneled)
    attachment — measured ~20 s for a 0.4 GB gradient, dwarfing the
    compute being timed. The slice is plain indexing, NOT
    ``reshape(-1)[0]``: the remote compile helper rejects the
    flatten-of-GBs kernel (HTTP 500) while a multi-axis index lowers
    fine."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, 'ndim') and getattr(leaf, 'size', 1) > 1:
            np.asarray(leaf[(0,) * leaf.ndim])
        else:
            np.asarray(leaf)
    return out


def amortized_timeit(f, *args, repeats: int = 8) -> float:
    r"""Seconds per call of ``f(*args)``: warm once, run ``repeats``
    times, host-sync every output."""
    host_sync(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(repeats)]
    for o in outs:
        host_sync(o)
    return (time.perf_counter() - t0) / repeats


def chained_timeit(f, x0, *args, repeats: int = 4,
                   feedback=lambda x, out: out) -> float:
    r"""Seconds per call of ``f(x, *args)`` where iteration k+1's input is
    derived from iteration k's output via ``feedback`` — the device must
    serialize the chain; one host sync at the end."""
    host_sync(f(x0, *args))
    x = x0
    t0 = time.perf_counter()
    for _ in range(repeats):
        x = feedback(x, f(x, *args))
    host_sync(x)
    return (time.perf_counter() - t0) / repeats


@contextlib.contextmanager
def trace(logdir: str):
    r"""``jax.profiler`` trace context (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
