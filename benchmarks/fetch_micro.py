"""d2h fetch-path anatomy through the tunneled relay.

Counterpart of put_micro.py for the drain direction: the grouped path
fetches one packed [G, B, 2k] int32 array (~327 KB at bench shapes) per
super-chunk. Questions:
  A. per-fetch cost (handshake + bytes) for bench-shaped arrays;
  B. do two sequential fetches serialize like puts do;
  C. do fetches issued from separate threads pipeline (as puts do:
     46 -> 34 ms/put at 2 threads).

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # bench-shaped packed result: [G=2, B=2048, 2k=20] int32 = 327 KB
    make = jax.jit(lambda s: jnp.full((2, 2048, 20), s, jnp.int32))
    bufs = [make(i) for i in range(24)]
    for b in bufs:
        b.block_until_ready()

    def fetch(a):
        t0 = time.perf_counter()
        np.asarray(a)
        return (time.perf_counter() - t0) * 1e3

    # warm one fetch (any lazy channel setup)
    fetch(bufs[-1])

    ts = [fetch(b) for b in bufs[:6]]
    emit(phase="seq_fetch", ms=[round(t, 2) for t in ts])

    for nthreads in (2, 4):
        per = 4
        done = [None] * nthreads

        def work(i):
            t0 = time.perf_counter()
            for j in range(per):
                np.asarray(bufs[6 + i * per + j])
            done[i] = (time.perf_counter() - t0) * 1e3

        th = [threading.Thread(target=work, args=(i,))
              for i in range(nthreads)]
        t0 = time.perf_counter()
        for t in th:
            t.start()
        for t in th:
            t.join()
        wall = (time.perf_counter() - t0) * 1e3
        emit(phase="threaded_fetch", threads=nthreads, fetches=nthreads * per,
             wall_ms=round(wall, 2),
             per_fetch_ms=round(wall / (nthreads * per), 2),
             per_thread_ms=[round(d, 2) for d in done])

    # mixed direction: a put and a fetch issued concurrently from two
    # threads (the steady-state pass has both in flight)
    import ml_dtypes
    payload = np.random.default_rng(0).normal(
        size=(2, 2048, 128)).astype(ml_dtypes.bfloat16)
    dev = jax.devices()[0]
    res = {}

    def do_put():
        t0 = time.perf_counter()
        a = jax.device_put(payload, dev)
        a.block_until_ready()
        res["put_ms"] = round((time.perf_counter() - t0) * 1e3, 2)

    def do_fetch():
        t0 = time.perf_counter()
        np.asarray(bufs[0])
        res["fetch_ms"] = round((time.perf_counter() - t0) * 1e3, 2)

    t1, t2 = threading.Thread(target=do_put), threading.Thread(target=do_fetch)
    t0 = time.perf_counter()
    t1.start(); t2.start(); t1.join(); t2.join()
    res["wall_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    emit(phase="put_plus_fetch_threaded", **res)


if __name__ == "__main__":
    main()
