r"""Headline benchmark: fwd+adjoint Bloch simulation throughput per chip.

Runs on the real TPU (default platform). Measures the north-star config of
/root/repo/BASELINE.json: forward + full adjoint (grads w.r.t. rf and gr)
of a Bloch simulation over 1M spins x 1000 time steps, with T1/T2
relaxation, off-resonance, and B1, via the fused waveform engine
(`sims.blochsim_rfgr` - B-effective assembled inside the scan so the run
fits HBM).

Baseline: the reference's explicit-Jacobian engine measured on this
container's CPU (BASELINE.md): fwd+bwd with relaxation took
0.224 s + 0.130 s for 512 spins x 512 steps = 7.4e5 spin*steps/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_SPIN_STEPS_PER_SEC = 512 * 512 / (0.224 + 0.130)  # reference CPU

# Last successful on-chip run (committed); reported — clearly labeled as
# cached — if the remote chip is unreachable when the driver runs this
# script (axon outages last hours; see benchmarks/RESULTS.md).
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'benchmarks', 'BENCH_CACHE.json')


def _emit_cached_or_zero(why):
    try:
        with open(CACHE) as f:
            rec = json.load(f)
        rec['metric'] = (f"{rec['metric']} [CACHED on-chip measurement "
                         f"of {rec.pop('measured_utc')}; {why} at report "
                         f"time]")
        print(json.dumps(rec))
    except Exception:
        print(json.dumps({'metric': f'blochsim fwd+adjoint ({why})',
                          'value': 0, 'unit': 'spin*steps/s',
                          'vs_baseline': 0}))


def _device_attaches(timeout=300):
    r"""Probe device discovery in a SUBPROCESS with a hard timeout: a
    dead remote attachment makes ``jax.devices()`` hang inside a C call
    (no GIL release — signal-based timeouts never fire), which would
    otherwise hang this whole script. Measured outages last hours."""
    try:
        subprocess.run([sys.executable, '-c',
                        'import jax; jax.devices()'],
                       timeout=timeout, check=True,
                       stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired,
            subprocess.CalledProcessError) as e:
        print(f'# device attach probe failed: {type(e).__name__}',
              file=sys.stderr)
        return False


def _build(nM, nT, dtype):
    import jax.numpy as jnp
    from mrphy_tpu import gamH, dt0, pi

    rng = np.random.default_rng(0)
    N = 1
    Mi = jnp.asarray(rng.random((N, nM, 3)) - 0.5, dtype)
    loc = jnp.asarray(rng.random((N, nM, 3)) * 2 - 1, dtype)
    df = jnp.asarray(rng.random((N, nM)) * 200 - 100, dtype)
    b1Map = jnp.asarray(
        np.stack([np.ones((N, nM)), np.zeros((N, nM))], -1), dtype)
    T1 = jnp.asarray([[1.47]], dtype)
    T2 = jnp.asarray([[0.07]], dtype)

    t = jnp.arange(nT, dtype=dtype).reshape(N, 1, nT)
    rf = 0.25 * jnp.concatenate([jnp.cos(t / nT * 2 * pi),
                                 jnp.sin(t / nT * 2 * pi)], 1)
    gr = jnp.concatenate([jnp.ones((N, 1, nT), dtype),
                          jnp.ones((N, 1, nT), dtype),
                          10 * jnp.arctan(t - nT // 2) / pi], 1)
    return dict(Mi=Mi, loc=loc, df=df, b1Map=b1Map, T1=T1, T2=T2,
                rf=rf, gr=gr, gam=gamH, dt=dt0)


def bench_fwd_adjoint(nM, nT, dtype_name='float32', repeats=3, passes=4):
    import jax
    import jax.numpy as jnp
    from mrphy_tpu.ops import sims

    dtype = jnp.dtype(dtype_name)
    a = _build(nM, nT, dtype)

    # NB: max_phi= (reduction-free sincos) measured ±0 on this config —
    # the kernel is not sincos-flop-bound; see RESULTS.md round 2.
    def loss(rf, gr):
        Mo = sims.blochsim_rfgr(a['Mi'], rf, gr, a['loc'], T1=a['T1'],
                                T2=a['T2'], df=a['df'], b1Map=a['b1Map'],
                                gam=a['gam'], dt=a['dt'])
        return jnp.sum(Mo * Mo)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    # warmup / compile (host read = reliable sync; block_until_ready does
    # not dependably block on remote-attached runtimes)
    v, (grf, ggr) = step(a['rf'], a['gr'])
    float(v)

    # chained amortized timing: iteration k+1 consumes iteration k's
    # gradient, so the device must serialize the K steps; one host read
    # at the end syncs the whole chain. The chip is shared/remote and
    # noisy, so take the best of several passes (min is the least-noise
    # estimator of the true cost).
    best = float('inf')
    for _ in range(passes):
        rf = a['rf']
        t0 = time.perf_counter()
        for _ in range(repeats):
            v, (grf, ggr) = step(rf, a['gr'])
            rf = rf + 1e-12 * grf
        float(jnp.sum(rf))
        best = min(best, (time.perf_counter() - t0) / repeats)
    return best


def main():
    if not _device_attaches():
        _emit_cached_or_zero('device attach timed out')
        return
    try:  # reuse compiled kernels across rounds (remote compile is slow)
        from mrphy_tpu.utils.timing import enable_persistent_cache
        enable_persistent_cache()
    except Exception:
        pass
    # Prefer the north-star size; fall back if HBM is insufficient.
    for nM in (1_000_000, 500_000, 250_000):
        try:
            secs = bench_fwd_adjoint(nM, 1000)
            break
        except Exception as e:  # noqa: BLE001 - OOM/backend errors
            print(f'# {nM} spins failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    else:
        _emit_cached_or_zero('all sizes failed on-chip')
        return

    value = nM * 1000 / secs
    print(f'# {nM} spins x 1000 steps fwd+adjoint: {secs*1e3:.1f} ms',
          file=sys.stderr)
    rec = {
        'metric': f'blochsim fwd+adjoint throughput ({nM} spins x 1000 '
                  f'steps, relax+df+b1, f32)',
        'value': round(value / 1e6, 2),
        'unit': 'M spin*steps/s/chip',
        'vs_baseline': round(value / BASELINE_SPIN_STEPS_PER_SEC, 1),
    }
    print(json.dumps(rec))
    try:  # refresh the committed cache for outage-time reporting
        rec['measured_utc'] = time.strftime('%Y-%m-%d %H:%M UTC',
                                            time.gmtime())
        with open(CACHE, 'w') as f:
            json.dump(rec, f)
            f.write('\n')
    except OSError:
        pass


if __name__ == '__main__':
    main()
