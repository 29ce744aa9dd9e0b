"""Micro-benchmark: random row-gather throughput, XLA take vs Pallas DMA.

Traversal cost in the beam kernel is dominated by gathering candidate
rows ([B*C] random ids -> [B*C, D] bf16 rows). XLA's gather measured
~70M rows/s on this chip regardless of row bytes (row-count bound).
This probes whether a Pallas kernel issuing per-row async DMAs with a
deep in-flight window beats it — if yes, the traversal inner loop is
worth rewriting around manual DMA; if no, that experiment is dead.

Run on the real chip:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/gather_micro.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("chunk", "window"))
def pallas_gather(table, ids, chunk: int, window: int):
    """Gather table[ids] -> [num, D] with per-row async DMAs.

    HBM memrefs are (8, 128)-tiled, so single rows cannot be sliced for
    DMA; instead each candidate DMAs its aligned 8-row block (row & ~7)
    into a VMEM scratch, and one vectorized sublane-select at the end
    extracts the wanted row from each block. 8x the bytes per candidate,
    but the hypothesis under test is that DMA descriptor rate, not bytes,
    bounds random gathers.

    ids: [num] int32, num % chunk == 0.
    """
    num = ids.shape[0]
    d = table.shape[1]

    def kernel(ids_smem, ids_vmem, table_ref, out_ref):
        def body(scratch, sems):
            def start(i):
                row = ids_smem[0, i]
                base = pl.multiple_of((row // 8) * 8, 8)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(base, 8), :],
                    scratch.at[i],
                    sems.at[i % window],
                ).start()

            for i in range(window):
                start(i)

            def loop_body(i, carry):
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(0, 8), :],
                    scratch.at[i],
                    sems.at[i % window],
                ).wait()

                @pl.when(i + window < chunk)
                def _():
                    start(i + window)

                return carry

            jax.lax.fori_loop(0, chunk, loop_body, 0)

            # Vectorized sublane select: out[c] = scratch[c, ids[c] % 8].
            sub = (ids_vmem[:, 0] % 8)                       # [chunk]
            onehot = (sub[:, None] ==
                      jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
                      ).astype(jnp.float32)                  # 32-bit before
            sel = jnp.sum(scratch[...].astype(jnp.float32)
                          * onehot[:, :, None], axis=1)      # minor-dim ins.
            out_ref[...] = sel.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((chunk, 8, d), table.dtype),
            sems=pltpu.SemaphoreType.DMA((window,)),
        )

    grid = (num // chunk,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num, d), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids.reshape(1, num), ids.reshape(num, 1), table)


@jax.jit
def xla_gather(table, ids):
    return jnp.take(table, ids, axis=0)


def bench(fn, *args, reps=5):
    """Median wall time. block_until_ready does not actually block through
    the axon relay, so force a d2h scalar fetch (float(sum)) each rep; the
    ~30 ms fixed relay round-trip is reported separately and subtracted by
    the caller via the baseline measurement."""
    out = fn(*args)
    float(out.astype(jnp.float32).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn(*args)
        float(o.astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    n, d = 500_000, 128
    num = 393_216  # 2048 queries * 192 candidates
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(n, d)).astype(np.float32), dtype=jnp.bfloat16)
    ids_h = rng.integers(0, n, num).astype(np.int32)
    ids = jnp.asarray(ids_h)

    # Relay-rtt baseline: same fetch, near-zero device work.
    t_base, _ = bench(lambda t, i: jnp.sum(i)[None].astype(jnp.float32),
                      table, ids)
    log(f"fetch baseline (relay rtt): {t_base * 1e3:.2f} ms")

    t_x, ref = bench(xla_gather, table, ids)
    tx = max(t_x - t_base, 1e-6)
    log(f"xla take: {t_x * 1e3:.2f} ms (net {tx * 1e3:.2f} ms -> "
        f"{num / tx / 1e6:.1f} M rows/s)")
    ref_h = np.asarray(ref)

    for chunk in (256, 512, 1024):
        for window in (8, 16, 32):
            try:
                t_p, out = bench(
                    lambda tb, ii: pallas_gather(tb, ii, chunk, window),
                    table, ids)
                ok = bool(np.array_equal(np.asarray(out), ref_h))
                tp = max(t_p - t_base, 1e-6)
                log(f"pallas c={chunk} w={window}: {t_p * 1e3:.2f} ms "
                    f"(net {tp * 1e3:.2f} ms -> {num / tp / 1e6:.1f} "
                    f"M rows/s) correct={ok}")
            except Exception as e:  # noqa: BLE001 — report and continue
                s = str(e)
                i = s.find("Mosaic")
                log(f"pallas c={chunk} w={window}: FAILED "
                    f"{s[i:i + 160] if i >= 0 else s[:160]}")


if __name__ == "__main__":
    main()
