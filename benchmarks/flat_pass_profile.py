"""Where does a 32768-query flat-serve pass spend its 500 ms at 100k?

Breaks the steady-state pass into its three relay-facing cost classes and
times each in isolation, then sweeps the structural knobs that trade them
against each other:

  upload  — per-super-chunk bf16 query put ([G*B, 128]); UploadThreads
            pipeline the ~33 ms/put handshakes.
  launch  — one flat_serve_grouped program dispatch per super-chunk
            (Pallas scan + top_k + exact re-rank, packed int32 out).
  drain   — one packed [G*B, 2k] int32 d2h per super-chunk (~25-30 ms
            handshake each; DrainThreads pipeline them).

Sweep: QueryGroupSize in {2, 4, 8, 16} — bigger G means fewer programs,
fewer drains, bigger puts (same bytes, fewer handshakes) but less
upload/kernel overlap granularity inside the pass.

Usage: python benchmarks/flat_pass_profile.py [n_rows] [n_queries]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    dim, k, batch = 128, 10, 2048

    import jax
    import jax.numpy as jnp

    import bench as B
    from vectordb_tpu.config import global_config as cfg
    from vectordb_tpu.ops import flat as flat_ops
    from vectordb_tpu.schema import MetricType

    x, queries = B.make_clustered(n, dim, nq)
    seg, _ = B.make_bench_segment(n, dim, x)
    table = B.make_shim(seg, None)
    table.graphs = {}
    valid = seg.valid_mask()

    fs = table._flat_serve_view("V", n, batch, 1)
    assert fs is not None, "flat-serve gated off at this shape"
    store, tf32, use_pallas = fs
    print(f"store dtype {store.dtype} capacity {store.capacity} "
          f"pallas={use_pallas} rerank_dev={tf32 is not None}",
          file=sys.stderr)
    dm = table._composed_device_mask(store, valid, True, None)

    from vectordb_tpu.ops import pallas_topk
    fold = pallas_topk.pick_tile_c(store.dim_padded) // 128
    surv_w = store.capacity // fold
    k_cand = min(k + flat_ops.FLAT_SERVE_SLACK, surv_w)

    def pad_chunk(s, gb):
        qc = queries[s:s + gb]
        qp = np.zeros((gb, store.dim_padded), dtype=np.float32)
        qp[: qc.shape[0], : qc.shape[1]] = qc
        return qp

    results = {}
    for g in (2, 4, 8, 16):
        gb = batch * g
        starts = list(range(0, nq, gb))
        chunks = [pad_chunk(s, gb) for s in starts]

        # -- warm compile at this G
        qdev = jnp.asarray(chunks[0], dtype=jnp.bfloat16)
        out = flat_ops.flat_serve_grouped(
            qdev, store.buf, store.norms, dm, tf32, int(MetricType.EUCLIDEAN),
            int(k_cand), int(k), int(store.capacity),
            use_pallas=use_pallas, pack_out=True)
        np.asarray(out)

        # -- upload only (UploadThreads parallel puts, median of 3)
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=cfg.upload_threads)

        def put_all():
            t0 = time.perf_counter()
            futs = [pool.submit(
                lambda c: jnp.asarray(c, dtype=jnp.bfloat16), c)
                for c in chunks]
            devs = [f.result() for f in futs]
            jax.block_until_ready(devs)
            return time.perf_counter() - t0, devs

        put_all()  # warm
        up_ts = []
        for _ in range(3):
            dt, devs = put_all()
            up_ts.append(dt)
        up_ms = float(np.median(up_ts)) * 1e3

        # -- launch only: queries pre-staged on device, dispatch all
        #    programs back-to-back, block at the end (kernel + dispatch
        #    cost, no put/drain handshakes in the timing).
        def launch_all():
            t0 = time.perf_counter()
            outs = [flat_ops.flat_serve_grouped(
                d, store.buf, store.norms, dm, tf32,
                int(MetricType.EUCLIDEAN), int(k_cand), int(k),
                int(store.capacity), use_pallas=use_pallas, pack_out=True)
                for d in devs]
            jax.block_until_ready(outs)
            return time.perf_counter() - t0, outs

        launch_all()  # warm
        ln_ts = []
        for _ in range(3):
            dt, outs = launch_all()
            ln_ts.append(dt)
        ln_ms = float(np.median(ln_ts)) * 1e3

        # -- drain only (DrainThreads parallel d2h of ready results)
        dpool = ThreadPoolExecutor(max_workers=max(cfg.drain_threads, 1))

        def drain_all():
            t0 = time.perf_counter()
            futs = [dpool.submit(np.asarray, o) for o in outs]
            for f in futs:
                f.result()
            return time.perf_counter() - t0

        drain_all()
        dr_ts = [drain_all() for _ in range(3)]
        dr_ms = float(np.median(dr_ts)) * 1e3

        # -- full pump pass through the Table path
        cfg.query_group_size = g
        table.grouped_dense_search("V", queries, valid,
                                   MetricType.EUCLIDEAN, k, batch=batch,
                                   mask_cacheable=True)  # warm
        full_ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            table.grouped_dense_search("V", queries, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            full_ts.append(time.perf_counter() - t0)
        full_ms = float(np.median(full_ts)) * 1e3
        qps = nq / (full_ms / 1e3)

        results[g] = dict(chunks=len(starts), upload_ms=round(up_ms, 1),
                          launch_ms=round(ln_ms, 1),
                          drain_ms=round(dr_ms, 1),
                          full_ms=round(full_ms, 1), qps=round(qps))
        print(f"G={g:2d} ({len(starts)} chunks): upload {up_ms:6.1f} ms  "
              f"launch {ln_ms:6.1f} ms  drain {dr_ms:6.1f} ms  "
              f"full {full_ms:6.1f} ms  -> {qps:7.0f} qps",
              file=sys.stderr)
        for d in devs:
            d.delete()
        del outs

    print(json.dumps({"metric": "flat_pass_profile_100k", "n": n,
                      "nq": nq, "by_group": results}))


if __name__ == "__main__":
    main()
