"""Relay-keeper feasibility micro: can a trickle of tiny device kernels
pin the relay's h2d fast path during query uploads?

R4i/R4k measured (put_micro.py): after one kernel runs, sequential puts
from one thread degrade to ~46 ms per 1 MB (handshake-dominated, ~20x
the fresh-process 700 MB/s), BUT puts issued while a LONG kernel is
executing complete at full speed. If that holds for a stream of tiny
kernels, the engine can keep a "keeper" op running whenever uploads are
in flight and reclaim most of the per-pass upload wall (the #1 cost at
100k bench shapes).

Questions answered on the live chip:
  A. put latency while a stream of K tiny keeper kernels is enqueued
     (vs degraded baseline) — for several keeper-op durations;
  B. how much a keeper stream DELAYS a real kernel enqueued after it
     (the cost side: keeper kernels serialize with real work);
  C. whether d2h fetches also speed up under a running kernel
     (drains are the other half of the pass's fixed cost);
  D. put latency when the keeper op is enqueued JUST BEFORE the put
     (single pilot kernel, no stream) — the cheapest possible policy.

Prints one JSON line per measurement; diagnostics to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    payload = rng.normal(size=(2, 2048, 128)).astype(ml_dtypes.bfloat16)

    def put_ms(buf):
        t0 = time.perf_counter()
        a = jax.device_put(buf, dev)
        a.block_until_ready()
        return (time.perf_counter() - t0) * 1e3, a

    # keeper ops of several durations: fori_loop of bf16 matmuls.
    def make_keeper(side, iters):
        m = jnp.ones((side, side), jnp.bfloat16)
        f = jax.jit(lambda a: jax.lax.fori_loop(
            0, iters, lambda i, c: jnp.tanh(c @ m), a))
        r = f(m)
        r.block_until_ready()
        # measure its solo duration
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f(m).block_until_ready()
            ts.append((time.perf_counter() - t0) * 1e3)
        return f, m, float(np.median(ts))

    # trigger degraded mode + baseline
    tiny = jax.jit(lambda v: (v * 2).sum())
    float(tiny(jnp.ones((8, 128))))
    base = [put_ms(payload)[0] for _ in range(5)]
    emit(phase="degraded_baseline", put_ms=[round(t, 2) for t in base])

    keepers = {}
    for name, (side, iters) in {"k2ms": (1024, 40), "k10ms": (2048, 60),
                                "k40ms": (4096, 60)}.items():
        f, m, dur = make_keeper(side, iters)
        keepers[name] = (f, m, dur)
        log(f"keeper {name}: measured {dur:.1f} ms solo")

    # -- D: single pilot kernel enqueued just before each put ----------
    for name, (f, m, dur) in keepers.items():
        ts = []
        for _ in range(5):
            r = f(m)  # async enqueue; device busy for ~dur
            t, _ = put_ms(payload)
            r.block_until_ready()
            ts.append(t)
        emit(phase="pilot_then_put", keeper=name, keeper_solo_ms=round(dur, 1),
             put_ms=[round(t, 2) for t in ts])

    # -- A: stream of keeper kernels while several puts run ------------
    f, m, dur = keepers["k10ms"]
    for n_puts in (2, 4):
        t0 = time.perf_counter()
        rs = [f(m) for _ in range(2 * n_puts)]  # enqueue stream first
        ts = [put_ms(payload)[0] for _ in range(n_puts)]
        stream_done = (time.perf_counter() - t0) * 1e3
        for r in rs:
            r.block_until_ready()
        emit(phase="stream_puts", n_puts=n_puts,
             put_ms=[round(t, 2) for t in ts],
             wall_ms=round(stream_done, 2),
             stream_drain_ms=round((time.perf_counter() - t0) * 1e3, 2))

    # -- B: keeper delay on real work -----------------------------------
    # real kernel proxy: same op as the bench's fixed-work probe.
    a = jnp.ones((2048, 1024), jnp.bfloat16)
    b = jnp.ones((1024, 1024), jnp.bfloat16)
    work = jax.jit(lambda a, b: jax.lax.scan(
        lambda c, _: (jnp.tanh(c @ b), None), a, None, length=8)[0].sum())
    float(work(a, b))
    solo = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(work(a, b))
        solo.append((time.perf_counter() - t0) * 1e3)
    t0 = time.perf_counter()
    r = f(m)  # one 10ms keeper in front
    float(work(a, b))
    behind = (time.perf_counter() - t0) * 1e3
    r.block_until_ready()
    emit(phase="keeper_delay", work_solo_ms=[round(t, 2) for t in solo],
         work_behind_keeper_ms=round(behind, 2))

    # -- C: d2h fetch under a running kernel ----------------------------
    big = jnp.asarray(rng.normal(size=(4096, 64)).astype(np.float32))
    big.block_until_ready()

    def fetch_ms():
        t0 = time.perf_counter()
        np.asarray(big)
        return (time.perf_counter() - t0) * 1e3

    base_f = [fetch_ms() for _ in range(4)]
    fk, mk, _ = keepers["k40ms"]
    under = []
    for _ in range(4):
        r = fk(mk)
        under.append(fetch_ms())
        r.block_until_ready()
    emit(phase="fetch_under_kernel", base_ms=[round(t, 2) for t in base_f],
         under_kernel_ms=[round(t, 2) for t in under])


if __name__ == "__main__":
    main()
