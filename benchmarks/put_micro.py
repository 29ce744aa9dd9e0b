"""h2d put-path anatomy through the tunneled relay (degraded mode).

R4i measured: fresh-process puts run ~700 MB/s with ~0.4 ms overhead;
after ONE jitted kernel executes in the process, every put pays ~33 ms
handshake + ~37 MB/s, permanently. At 100k bench shapes the per-pass
query upload (2 x 1 MB bf16) IS the wall, so the put handshake is the
last lever toward the >=6x like-for-like target (VERDICT r3 #2).

Questions this script answers on the live chip:
  A. is the per-put handshake CLIENT-serialized (two Python threads
     issuing puts overlap their handshakes -> ~2x effective bandwidth)
     or relay-serialized (threads don't help)?
  B. does jax.device_put on a pytree (list of arrays) batch the
     handshake, or pay it per leaf?
  C. is the put call async (returns before the transfer lands) —
     i.e. is the 33 ms already overlappable by issuing early?
  D. does degraded mode ever reset (gc, sleep, deleting buffers)?
  E. does an np.ndarray passed directly as a jit arg (implicit
     transfer inside dispatch) pay the same handshake?

Prints one JSON line per measurement to stdout; diagnostics to stderr.
"""
from __future__ import annotations

import json
import sys
import threading
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


MB = 1024 * 1024


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    # 1 MB bf16 payload = bench super-chunk query upload [2,2048,128].
    import ml_dtypes
    payload = rng.normal(size=(2, 2048, 128)).astype(ml_dtypes.bfloat16)

    def put_once(buf):
        t0 = time.perf_counter()
        a = jax.device_put(buf, dev)
        t_enq = time.perf_counter() - t0
        a.block_until_ready()
        return t_enq, time.perf_counter() - t0, a

    # -- fresh-process baseline (no kernel has run yet) --------------
    times = [put_once(payload) for _ in range(4)]
    emit(phase="fresh", enq_ms=[round(t[0] * 1e3, 2) for t in times],
         total_ms=[round(t[1] * 1e3, 2) for t in times])

    # -- trigger degraded mode ----------------------------------------
    f = jax.jit(lambda v: (v * 2).sum())
    float(f(jnp.ones((8, 128))))
    log("kernel executed; relay should now be in degraded put mode")

    def seq(nrep=6):
        ts = [put_once(payload) for _ in range(nrep)]
        return ts

    ts = seq()
    emit(phase="degraded_seq", enq_ms=[round(t[0] * 1e3, 2) for t in ts],
         total_ms=[round(t[1] * 1e3, 2) for t in ts])

    # -- C: async depth — enqueue N puts, then block all ---------------
    for nrep in (2, 4, 8):
        t0 = time.perf_counter()
        arrs = [jax.device_put(payload, dev) for _ in range(nrep)]
        t_enq = time.perf_counter() - t0
        for a in arrs:
            a.block_until_ready()
        total = time.perf_counter() - t0
        emit(phase="burst_then_block", n=nrep,
             enq_ms=round(t_enq * 1e3, 2), total_ms=round(total * 1e3, 2),
             per_put_ms=round(total / nrep * 1e3, 2))

    # -- A: thread-parallel puts ---------------------------------------
    for nthreads in (2, 4):
        per_thread = 4
        done = [None] * nthreads

        def work(i):
            t0 = time.perf_counter()
            arrs = [jax.device_put(payload, dev) for _ in range(per_thread)]
            for a in arrs:
                a.block_until_ready()
            done[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        th = [threading.Thread(target=work, args=(i,))
              for i in range(nthreads)]
        for t in th:
            t.start()
        for t in th:
            t.join()
        wall = time.perf_counter() - t0
        n_puts = nthreads * per_thread
        emit(phase="threaded", threads=nthreads, puts=n_puts,
             wall_ms=round(wall * 1e3, 2),
             per_put_ms=round(wall / n_puts * 1e3, 2),
             per_thread_ms=[round(d * 1e3, 2) for d in done])

    # -- B: pytree put (list of 4 arrays in one call) -------------------
    t0 = time.perf_counter()
    arrs = jax.device_put([payload] * 4, dev)
    for a in arrs:
        a.block_until_ready()
    emit(phase="pytree4", total_ms=round((time.perf_counter() - t0) * 1e3, 2))

    # halves: 2 x 0.5 MB vs 1 x 1 MB (handshake vs bytes split)
    half = payload[:1]
    t0 = time.perf_counter()
    a1 = jax.device_put(half, dev); a2 = jax.device_put(half, dev)
    a1.block_until_ready(); a2.block_until_ready()
    emit(phase="two_halves", total_ms=round((time.perf_counter() - t0) * 1e3, 2))

    # -- E: implicit transfer via jit arg -------------------------------
    g = jax.jit(lambda v: (v.astype(jnp.float32) * 2).sum())
    float(g(payload))  # compile
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(g(payload))
        ts.append(time.perf_counter() - t0)
    emit(phase="implicit_jit_arg", total_ms=[round(t * 1e3, 2) for t in ts])

    # -- D: does degraded mode reset? -----------------------------------
    import gc
    del arrs, a1, a2
    gc.collect()
    time.sleep(2.0)
    ts = seq(3)
    emit(phase="after_gc_sleep", total_ms=[round(t[1] * 1e3, 2) for t in ts])

    # -- put overlapped with a LONG kernel: can a put land entirely
    #    under a running kernel (the dispatch-ahead premise), and do TWO
    #    concurrent puts land under it too?
    side = 256 if "--smoke" in sys.argv else 4096
    m = jnp.ones((side, side), jnp.bfloat16)
    chain = jax.jit(lambda a: jax.lax.fori_loop(
        0, 60, lambda i, c: jnp.tanh(c @ m), a))
    r = chain(m); r.block_until_ready()
    t0 = time.perf_counter()
    r = chain(m)
    a1 = jax.device_put(payload, dev)
    a2 = jax.device_put(payload, dev)
    a1.block_until_ready(); a2.block_until_ready()
    t_puts = time.perf_counter() - t0
    r.block_until_ready()
    t_all = time.perf_counter() - t0
    emit(phase="puts_under_kernel", puts_done_ms=round(t_puts * 1e3, 2),
         kernel_done_ms=round(t_all * 1e3, 2))


if __name__ == "__main__":
    main()
