"""Benchmark: batched ANN query throughput at high recall on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": ratio, ...}

Workload (BASELINE.json config-3 shape): SIFT-like clustered 500k x 128-d
EUCLIDEAN table, graph index build, batched top-10 queries through the full
engine path (beam search + validity filter + exact f32 re-rank).

Protocol (VERDICT r1 items 3-5):
  - recall scoring happens OUTSIDE the timed region;
  - QPS is the MEDIAN of N_TIMED timed passes (run-to-run variance on the
    tunneled chip is high);
  - p50/p99 per-batch latency are reported;
  - the number only counts if recall@10 >= 0.99;
  - vs_baseline is the measured C++ reference-core QPS from
    benchmarks/REF_BASELINE.json at its best recall>=0.99 config
    (clustered_100k, single CPU core — see that file for the policy and
    the 500k recall-collapse note). The old numpy-brute ratio is kept as
    a secondary field.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_TIMED = 5  # timed passes; relay throughput varies run-to-run, median of 5
RECALL_FLOOR = 0.99
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", 120))
PROBE_ATTEMPTS = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 20))
PROBE_RETRY_SLEEP_S = int(os.environ.get("BENCH_PROBE_RETRY_SLEEP_S", 60))
# Global capture budget: probes + bench attempts must fit inside this.
# Rounds 1-3 postmortem: the engine measurably did 21-49k QPS but the
# scoreboard showed 0 three rounds running because the capture window hit
# backend wedges longer than the old ~11.5 min probe budget (an ~8 min
# wedge was ridden out at attempt 4/4; round 2 saw 90+ min). The probe
# only spins when the backend is already down, so a long budget costs
# nothing in the healthy case.
TOTAL_BUDGET_S = int(os.environ.get("BENCH_TOTAL_BUDGET_S", 3 * 3600))
# One full bench attempt (incl. graph builds) through a healthy relay
# takes ~10-25 min; a wedge mid-run hangs the in-process JAX call forever,
# so each attempt runs in a subprocess under this timeout.
INNER_TIMEOUT_S = int(os.environ.get("BENCH_INNER_TIMEOUT_S", 3600))
RUN_ATTEMPTS = int(os.environ.get("BENCH_RUN_ATTEMPTS", 3))
# Nominal fixed-work calibration time (ms) in a healthy relay window;
# used to normalize QPS across relay weather (see relay_calibration).
NOMINAL_WORK_MS = 30.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit_error(err: str, **extra):
    """The driver records stdout verbatim; a wedged backend must still
    produce ONE parseable JSON line (round-2 postmortem: BENCH_r02 was a
    raw traceback, rc=1, and the working engine scored nothing)."""
    print(json.dumps({
        "metric": "batched_qps_recall@10>=0.99",
        "value": 0.0,
        "unit": "qps",
        "vs_baseline": 0.0,
        "error": err,
        **extra,
    }))


def probe_backend(deadline: float | None = None) -> bool:
    """Backend health check in a time-boxed SUBPROCESS: a wedged TPU
    backend makes bare `jax.devices()` hang forever (measured >120 s in
    round 2), so the parent must never be the first process to touch JAX.
    Retries until the probe budget OR the global `deadline` (epoch
    seconds) runs out; returns True once a trivial jitted op round-trips.
    Default budget: 20 x 120 s probes + 19 x 60 s sleeps ~ 59 min —
    sized to outlast every wedge window measured so far (~8 min in r3,
    90+ min in r2 is covered by the outer retry loop re-probing)."""
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jax.jit(lambda v: (v*2).sum())"
            "(jnp.ones((8,128)))))")
    for attempt in range(PROBE_ATTEMPTS):
        if deadline is not None and time.time() > deadline:
            log("backend probe: global budget exhausted")
            return False
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=PROBE_TIMEOUT_S)
            if p.returncode == 0:
                log(f"backend probe OK ({time.time() - t0:.1f}s, "
                    f"attempt {attempt + 1})")
                return True
            log(f"backend probe rc={p.returncode}: {p.stderr[-300:]}")
        except subprocess.TimeoutExpired:
            log(f"backend probe TIMED OUT after {PROBE_TIMEOUT_S}s "
                f"(attempt {attempt + 1}/{PROBE_ATTEMPTS})")
        if attempt + 1 < PROBE_ATTEMPTS:
            time.sleep(PROBE_RETRY_SLEEP_S)
    return False


def make_clustered(n: int, dim: int, n_queries: int, seed: int = 0,
                   n_centers: int = 3000):
    """Clustered table + near-duplicate queries (harder for graph search
    than uniform noise). Rows are generated in 1M blocks to bound the
    transient numpy allocations at 10M+ scale."""
    rng = np.random.default_rng(seed)
    centers = (rng.normal(size=(n_centers, dim)) * 2).astype(np.float32)
    x = np.empty((n, dim), dtype=np.float32)
    for s in range(0, n, 1_000_000):
        e = min(s + 1_000_000, n)
        x[s:e] = (centers[rng.integers(0, n_centers, e - s)]
                  + rng.normal(size=(e - s, dim)).astype(np.float32))
    queries = (x[rng.integers(0, n, n_queries)]
               + 0.1 * rng.normal(size=(n_queries, dim)).astype(np.float32))
    return x, queries


_tiny_probe = None
_work_probe = None


def quick_work_ms(reps: int = 3) -> float:
    """Median wall time of the fixed bf16 matmul chain (same workload as
    relay_calibration's work probe), sampled immediately before every
    timed pass. Round-3 postmortem: identical params + recall measured
    21k vs 44k QPS in different relay windows with the rtt gate silent —
    device THROUGHPUT through the relay swings independently of rtt, so
    passes are also gated and normalized on this fixed-work probe."""
    global _work_probe
    import jax
    import jax.numpy as jnp

    if _work_probe is None:
        def chain(a, b):
            def step(c, _):
                return jnp.tanh(c @ b), None
            c, _ = jax.lax.scan(step, a, None, length=8)
            return c.sum()
        f = jax.jit(chain)
        a = jnp.ones((2048, 1024), jnp.bfloat16)
        b = jnp.ones((1024, 1024), jnp.bfloat16)
        float(f(a, b))  # compile
        _work_probe = (f, a, b)
    f, a, b = _work_probe
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(a, b))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def quick_rtt_ms(reps: int = 5) -> float:
    """Median round-trip of a trivial jitted op — sampled immediately
    before every timed pass so passes taken in degraded relay windows
    (>2x the run's median rtt) can be discarded and re-run instead of
    polluting the reported median (the r2d 960-d 2,975-vs-4,100 split)."""
    global _tiny_probe
    import jax
    import jax.numpy as jnp

    if _tiny_probe is None:
        f = jax.jit(lambda v: (v * 1.0000001).sum())
        x = jnp.ones((8, 128), jnp.float32)
        float(f(x))  # compile
        _tiny_probe = (f, x)
    f, x = _tiny_probe
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        rtts.append(time.perf_counter() - t0)
    return float(np.median(rtts)) * 1e3


def gated_passes(one_pass, n_timed: int = N_TIMED):
    """Run timed passes, each tagged with fresh rtt + fixed-work probes;
    discard passes whose rtt exceeds 2x the running median OR whose
    fixed-work time deviates >1.5x from the running median, and re-run
    (bounded at 2x n_timed total). Returns (kept_runs, n_discarded_rtt,
    n_discarded_work); each run is (rtt_ms, work_ms, qps, latencies)."""
    runs = [one_pass() for _ in range(n_timed)]

    def kept_of(rs):
        med_rtt = float(np.median([r[0] for r in rs]))
        med_work = float(np.median([r[1] for r in rs]))
        kept, bad_rtt, bad_work = [], 0, 0
        for r in rs:
            if r[0] > 2.0 * med_rtt:
                bad_rtt += 1
            elif r[1] > 1.5 * med_work:
                bad_work += 1
            else:
                kept.append(r)
        return kept, bad_rtt, bad_work, med_rtt, med_work

    kept, bad_rtt, bad_work, med_rtt, med_work = kept_of(runs)
    while len(kept) < n_timed and len(runs) < 2 * n_timed:
        log(f"calibration gate: {bad_rtt} pass(es) above 2x median rtt "
            f"({med_rtt:.1f} ms), {bad_work} above 1.5x median work "
            f"({med_work:.1f} ms); re-running")
        runs.append(one_pass())
        kept, bad_rtt, bad_work, med_rtt, med_work = kept_of(runs)
    return kept, bad_rtt, bad_work


def relay_calibration(reps: int = 15):
    """Fixed-work relay/device condition probe (untimed vs the workload).

    Numbers through the tunneled chip swing ~30% by hour; recording a
    fixed-size calibration alongside every run lets round-over-round
    comparisons separate engine changes from relay weather. Two probes:
      - rtt_ms: median round-trip of a trivial jitted op + scalar d2h
        (the per-call fixed cost every dispatch/fetch pays);
      - work_ms: median wall time of a fixed 2048x1024 @ 1024x2048 bf16
        matmul chain (8 deep) + scalar fetch — device throughput under
        the same relay.
    Returns {"calib_rtt_ms": ..., "calib_work_ms": ...}.
    """
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: (v * 1.0000001).sum())
    xt = jnp.ones((8, 128), jnp.float32)
    float(tiny(xt))  # compile
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(tiny(xt))
        rtts.append(time.perf_counter() - t0)

    def chain(a, b):
        def step(c, _):
            return jnp.tanh(c @ b), None
        c, _ = jax.lax.scan(step, a, None, length=8)
        return c.sum()

    work = jax.jit(chain)
    a = jnp.ones((2048, 1024), jnp.bfloat16)
    b = jnp.ones((1024, 1024), jnp.bfloat16)
    float(work(a, b))  # compile
    works = []
    for _ in range(max(3, reps // 3)):
        t0 = time.perf_counter()
        float(work(a, b))
        works.append(time.perf_counter() - t0)
    out = {"calib_rtt_ms": round(float(np.median(rtts)) * 1e3, 2),
           "calib_work_ms": round(float(np.median(works)) * 1e3, 2)}
    log(f"relay calibration: rtt {out['calib_rtt_ms']} ms, "
        f"fixed-work {out['calib_work_ms']} ms")
    return out


def device_ground_truth(x: np.ndarray, xn: np.ndarray,
                        queries: np.ndarray, k: int,
                        batch: int = 2048) -> np.ndarray:
    """Exact EUCLIDEAN top-k oracle on the device in FLOAT32 (untimed).

    Same arithmetic as the host BLAS oracle (f32 inputs, f32 accumulation
    of qn - 2 q.x + xn) but far faster: the host oracle takes ~an hour
    for 4096 queries at 10M rows, which is why large-scale runs use this.
    Independent of the engine's bf16 store/candidate machinery — the table
    is a fresh f32 upload and the scan is a fused matmul+top-k at
    Precision.HIGHEST (bf16x3). HIGHEST is load-bearing: the TPU's DEFAULT
    f32 matmul truncates operands to bf16, and at 10M clustered rows that
    ~2e-3 relative ip error reorders near-tied neighbors — measured 0.98
    oracle overlap vs the host, which silently deflated engine recall.
    Cross-checked against blocked_ground_truth in tests.
    """
    import jax
    import jax.numpy as jnp

    from vectordb_tpu.ops import flat as flat_ops
    from vectordb_tpu.schema import MetricType

    n, d = x.shape
    dp = -(-d // 128) * 128
    npad = -(-n // 8192) * 8192
    tab = np.zeros((npad, dp), np.float32)
    tab[:n, :d] = x
    # HBM pre-check: this f32 oracle is the largest single allocation in a
    # bench run (8+ GB at 16M rows) and near-capacity pressure WEDGES this
    # backend instead of erroring (round-2 outage).
    from vectordb_tpu.utils import require_hbm
    require_hbm(tab.nbytes + npad * 5, "bench oracle table")
    tab_dev = jnp.asarray(tab)
    del tab
    norms = np.zeros(npad, np.float32)
    norms[:n] = xn
    norms_dev = jnp.asarray(norms)
    mask = np.zeros(npad, dtype=bool)
    mask[:n] = True
    mask_dev = jnp.asarray(mask)
    nq = queries.shape[0]
    gt = np.empty((nq, k), dtype=np.int64)
    for s in range(0, nq, batch):
        qb = queries[s:s + batch]
        q = np.zeros((qb.shape[0], dp), np.float32)
        q[:, :d] = qb
        dd, ii = flat_ops.flat_topk(jnp.asarray(q), tab_dev, norms_dev,
                                    mask_dev, MetricType.EUCLIDEAN, k,
                                    precision=jax.lax.Precision.HIGHEST)
        gt[s:s + batch] = np.asarray(ii)
    # Free the f32 oracle table NOW (8+ GB at 16M rows): the engine's
    # adjacency upload follows immediately, and relying on GC to release
    # device buffers under HBM pressure has wedged large runs.
    tab_dev.delete()
    norms_dev.delete()
    mask_dev.delete()
    return gt


def blocked_ground_truth(x: np.ndarray, xn: np.ndarray, queries: np.ndarray,
                         k: int, block: int = 128) -> np.ndarray:
    """Exact EUCLIDEAN top-k on host, blocked to bound memory (untimed)."""
    nq = queries.shape[0]
    gt = np.empty((nq, k), dtype=np.int64)
    for s in range(0, nq, block):
        q = queries[s:s + block]
        d = (q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T) + xn[None, :]
        part = np.argpartition(d, k, axis=1)[:, :k]
        row_d = np.take_along_axis(d, part, axis=1)
        gt[s:s + block] = np.take_along_axis(part, np.argsort(row_d, axis=1),
                                             axis=1)
    return gt


def make_bench_segment(n: int, dim: int, x: np.ndarray):
    """Segment pre-filled with x (bypasses record ingest; benchmarks drive
    the search path, tests cover ingest)."""
    from vectordb_tpu.schema import (FieldSchema, FieldType, MetricType,
                                     TableSchema)
    from vectordb_tpu.segment import TableSegment

    schema = TableSchema(id=0, name="bench", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim, metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x.astype(np.float32) ** 2).sum(1)
    return seg, schema


def run_batches(table, queries, valid, metric, k, batch,
                collect_ids=False):
    """Software-pipelined batched search: dispatch(i) -> [collect(i-1)
    host re-rank overlapping kernel(i)] -> fetch(i). The fetch of batch i
    completes BEFORE batch i+1 is dispatched, so the d2h never queues
    behind a later kernel (the failure mode of dispatch-ahead pipelining
    through the tunneled relay). Returns (ids list or None, per-batch
    latencies)."""
    n_queries = queries.shape[0]
    out = [] if collect_ids else None
    lat = []
    h_prev = None
    t_mark = time.perf_counter()
    for s in range(0, n_queries, batch):
        h = table.dispatch_dense_search(
            "V", queries[s:s + batch], valid, metric, k)
        if h_prev is not None:
            ids, _ = table.collect_dense_search(h_prev)
            if collect_ids:
                out.append(ids[:, :k])
        table.fetch_dense_search(h)
        h_prev = h
        now = time.perf_counter()
        lat.append(now - t_mark)
        t_mark = now
    ids, _ = table.collect_dense_search(h_prev)
    if collect_ids:
        out.append(ids[:, :k])
    lat[-1] += time.perf_counter() - t_mark
    return out, lat


def make_runner(table, queries, valid, metric, k, batch, mode):
    """Pass runner for one table: 'grouped' = ONE device program per
    batch*QueryGroupSize super-chunk with on-device exact re-rank
    (throughput mode, default); 'pipeline' = r2's per-batch
    dispatch/fetch/collect overlap. Returns run(collect_ids) ->
    (ids list or None, per-dispatch latencies)."""
    n_queries = queries.shape[0]

    def run(collect_ids=False):
        if mode != "grouped":
            return run_batches(table, queries, valid, metric, k, batch,
                               collect_ids)
        t0 = time.perf_counter()
        ids, _ = table.grouped_dense_search(
            "V", queries, valid, metric, k, batch=batch,
            mask_cacheable=True)
        lat = [time.perf_counter() - t0]  # one dispatch per super-chunk
        if collect_ids:
            return ([ids[s:s + batch, :k]
                     for s in range(0, n_queries, batch)], lat)
        return None, lat

    return run


def engine_slope_ms(table, queries, valid, k, batch=2048, g1=1, g2=4,
                    reps=5):
    """Engine-side per-batch time with relay fixed costs cancelled.

    Runs the grouped one-program path (the serving throughput mode, with
    the table's tuned search config) over g1 and g2 batches of `batch`
    queries — ONE dispatch each, so rtt, the put handshake and the drain
    handshake appear in both timings and cancel in the slope
    (t(g2) - t(g1)) / (g2 - g1). Measured at the serving batch (2048):
    at tuned settings the per-batch-16 increment sits BELOW the relay's
    ±15 ms jitter floor (r5 reported 0.00), while the 2048-batch slope
    (~4 ms graph / ~22 ms flat, steady_state_ab) clears it. Returns the
    median-of-reps slope in ms per `batch` queries; callers derive the
    per-query figure."""
    from vectordb_tpu.config import global_config
    from vectordb_tpu.schema import MetricType

    saved = global_config.query_group_size

    def timed(g):
        global_config.query_group_size = g
        qs = queries[:batch * g]
        table.grouped_dense_search("V", qs, valid, MetricType.EUCLIDEAN,
                                   k, batch=batch, mask_cacheable=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            table.grouped_dense_search("V", qs, valid,
                                       MetricType.EUCLIDEAN, k,
                                       batch=batch, mask_cacheable=True)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    try:
        t1, t2 = timed(g1), timed(g2)
    finally:
        global_config.query_group_size = saved
    return max((t2 - t1) / (g2 - g1) * 1e3, 0.0)


def make_shim(seg, graph):
    """A Table driving a pre-built segment+graph directly (no catalog/WAL);
    exercises the same batch_dense_search path as the full engine."""
    from vectordb_tpu.config import global_config
    from vectordb_tpu.schema import FieldType, MetricType
    from vectordb_tpu.table import Table

    class _Shim(Table):
        def __init__(self):
            self.segment = seg
            self.graphs = {"V": graph}
            self.sharded_fields = {}
            self.config = global_config
            self.metric_map = {"V": MetricType.EUCLIDEAN}
            self.field_type_map = {"V": FieldType.VECTOR_FLOAT}
            self.search_ef_override = {}
            self.search_iters_override = {}
            self.search_qdtype_override = {}
            self.is_leader = False  # tune_search_ef: skip sidecar persist
            self.schema = seg.schema

    return _Shim()


def main():
    """Outer capture supervisor (runs NO jax itself).

    A wedge can start mid-run, hanging the in-process device call forever
    — no amount of in-process retry recovers that. So each full bench
    attempt runs in a SUBPROCESS under INNER_TIMEOUT_S, and the parent
    loops probe -> attempt -> (on failure/timeout) re-probe -> retry,
    all inside TOTAL_BUDGET_S. The last JSON line the inner prints is
    forwarded verbatim; only when every attempt inside the budget fails
    does an error line go out. This subsumes the "probe between phases"
    idea: a mid-phase wedge kills the attempt via timeout and the next
    attempt starts with a fresh probe."""
    deadline = time.time() + TOTAL_BUDGET_S
    last_err = "tpu-backend-unavailable"
    for attempt in range(1, RUN_ATTEMPTS + 1):
        if time.time() > deadline:
            log(f"global capture budget ({TOTAL_BUDGET_S}s) exhausted")
            break
        if not probe_backend(deadline):
            last_err = "tpu-backend-unavailable"
            continue
        t0 = time.time()
        timeout = min(INNER_TIMEOUT_S, max(60, deadline - time.time()))
        log(f"bench attempt {attempt}/{RUN_ATTEMPTS} "
            f"(timeout {timeout:.0f}s)")
        try:
            # stderr inherits (diagnostics stream live); stdout captured —
            # the inner prints exactly one JSON line.
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                stdout=subprocess.PIPE, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            log(f"bench attempt {attempt} TIMED OUT after {timeout:.0f}s "
                "(mid-run wedge); re-probing")
            last_err = "bench-attempt-timeout"
            continue
        line = (p.stdout or "").strip().splitlines()
        line = line[-1] if line else ""
        try:
            parsed = json.loads(line)
        except Exception:
            parsed = None
        if p.returncode == 0 and parsed and "error" not in parsed:
            print(line)
            return
        log(f"bench attempt {attempt} failed rc={p.returncode} "
            f"({time.time() - t0:.0f}s): {line[:300]}")
        last_err = (parsed or {}).get("error", f"inner-rc-{p.returncode}")
    emit_error(last_err, probe_attempts=PROBE_ATTEMPTS,
               probe_timeout_s=PROBE_TIMEOUT_S,
               total_budget_s=TOTAL_BUDGET_S)


def inner_main():
    try:
        run_bench()
    except Exception as e:
        import traceback
        log(traceback.format_exc())
        emit_error(f"bench-exception: {type(e).__name__}: {e}")
        sys.exit(1)


def load_bench_data(n: int, dim: int, n_queries: int):
    """Workload source: a real dataset when BENCH_DATASET points at an
    ann-benchmarks hdf5 / TexMex dir (loaders in benchmarks/datasets.py),
    else the synthetic clustered generator — stamped into the JSON either
    way so the workload is never ambiguous (VERDICT r2 #8; this host has
    zero egress, so real files only appear if the driver provides them).
    Returns (x, queries, gt_or_None, dataset_label, n, dim)."""
    ds_path = os.environ.get("BENCH_DATASET", "")
    if ds_path and os.path.exists(ds_path):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from datasets import load_dataset
        x, queries, gt, dist = load_dataset(ds_path)
        if dist not in ("euclidean",):
            log(f"dataset distance '{dist}' != euclidean; normalizing "
                "rows and using EUCLIDEAN (rank-equivalent for angular)")
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
            gt = None  # reference gt is angular-ranked; recompute
        queries = queries[:n_queries]
        if gt is not None:
            gt = gt[:n_queries]
        return (np.ascontiguousarray(x, dtype=np.float32),
                np.ascontiguousarray(queries, dtype=np.float32), gt,
                os.path.basename(ds_path.rstrip("/")),
                x.shape[0], x.shape[1])
    x, queries = make_clustered(n, dim, n_queries)
    return x, queries, None, "synthetic-clustered-3000c", n, dim


def run_bench():
    import vectordb_tpu  # noqa: F401  (configures the compile cache)
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.schema import MetricType

    n = int(os.environ.get("BENCH_N", 500_000))
    cfg_env = os.environ.get("BENCH_CONFIG", "")
    if cfg_env:  # e.g. BENCH_CONFIG='{"FusedTraversal": "off"}' for A/Bs
        from vectordb_tpu.config import global_config as _gc
        ok, _ = _gc.update(json.loads(cfg_env))
        assert ok, f"bad BENCH_CONFIG: {cfg_env}"
        log(f"config override: {cfg_env}")
    # Timed passes run 32768 queries (16 super-chunks at batch 2048,
    # G=2): an 8192-query pass is ~half pipeline fill/drain — measured
    # r5 at 100k, 34-49k QPS at 8192 vs 60-65k at 32768 with identical
    # kernels (benchmarks/steady_state_ab.py) — while the C++ baseline
    # was itself measured at steady state over its whole query file.
    # Recall is scored on the first `n_recall` queries against the exact
    # oracle (GT cost bounds), untimed.
    dim, k, batch = 128, 10, 2048
    n_queries = int(os.environ.get("BENCH_QUERIES", 32768))
    n_recall = min(8192, n_queries)
    calib = relay_calibration()
    x, queries, gt_pre, dataset, n, dim = load_bench_data(n, dim, n_queries)
    n_queries = queries.shape[0]
    n_recall = min(n_recall, n_queries)
    seg, schema = make_bench_segment(n, dim, x)

    t0 = time.time()
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    build_s = time.time() - t0
    log(f"graph build {n}x{dim}: {build_s:.1f}s")

    # Exact ground truth (blocked to bound memory) — untimed. Real
    # datasets ship theirs (first k columns are the exact top-k).
    xn = (x ** 2).sum(1)
    gt = (gt_pre[:n_recall, :k]
          if gt_pre is not None and gt_pre.shape[1] >= k
          else blocked_ground_truth(x, xn, queries[:n_recall], k))

    # Numpy/BLAS brute-force QPS (secondary reference point).
    n_base = 256
    t0 = time.time()
    for s in range(0, n_base, 128):
        q = queries[s:s + 128]
        d = (q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T) + xn[None, :]
        np.argpartition(d, k, axis=1)[:, :k]
    cpu_qps = n_base / (time.time() - t0)
    log(f"numpy brute baseline: {cpu_qps:.0f} qps")

    # Measured C++ reference-core baseline (see REF_BASELINE.json).
    ref_qps = 0.0
    ref_note = ""
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "REF_BASELINE.json")
    try:
        with open(ref_path) as f:
            refj = json.load(f)
        ref_qps = float(refj["measured"]["clustered_100k"]["qps"])
        ref_note = "epsilla C++ core, clustered_100k recall=1.0, 1 CPU core"
    except Exception as e:  # baseline file optional
        log(f"no REF_BASELINE.json ({e}); vs_baseline falls back to numpy")

    # Engine path: batched graph search + exact re-rank. Default mode is
    # the grouped one-program dispatch (BENCH_MODE=pipeline for the r2
    # per-batch overlap).
    mode = os.environ.get("BENCH_MODE", "grouped")
    # Two super-chunks per pass: the grouped path dispatches ahead, so
    # chunk i+1's query upload (~40 ms h2d through the relay) and chunk
    # i-1's fetch overlap chunk i's kernel instead of serializing.
    from vectordb_tpu.config import global_config
    global_config.query_group_size = int(os.environ.get("BENCH_GROUP", 2))
    table = make_shim(seg, graph)
    valid = seg.valid_mask()
    # Recall-targeted auto-tune (engine feature, untimed like the build):
    # picks the smallest beam width meeting the target on self-queries —
    # the role of hand-tuning the reference's queue-size config
    # (config.hpp:18-24). Target 0.995 leaves margin over the 0.99 floor.
    tuned = table.tune_search_ef(target_recall=0.995, k=k)
    log(f"tune_search_ef: {tuned.get('V', {})}")
    run_all = make_runner(table, queries, valid, MetricType.EUCLIDEAN, k,
                          batch, mode)
    run_recall = make_runner(table, queries[:n_recall], valid,
                             MetricType.EUCLIDEAN, k, batch, mode)

    # Warmup + recall scoring (untimed; recall over the GT'd subset).
    ids_all, _ = run_recall(collect_ids=True)
    hits = 0
    for bi, s in enumerate(range(0, n_recall, batch)):
        ids = ids_all[bi]
        for i in range(ids.shape[0]):
            hits += len(set(ids[i].tolist()) & set(gt[s + i].tolist()))
    recall = hits / (n_recall * k)
    run_all()  # warm the full-size pass (16-chunk program shapes)

    # Timed passes: median QPS over rtt-gated passes, pooled per-batch
    # latency percentiles.
    def one_pass():
        rtt = quick_rtt_ms()
        work = quick_work_ms()
        t0 = time.time()
        _, lat = run_all()
        return (rtt, work, n_queries / (time.time() - t0), lat)

    kept, n_disc_rtt, n_disc_work = gated_passes(one_pass)
    qps_runs = [r[2] for r in kept]
    work_runs = [r[1] for r in kept]
    lats = [v for r in kept for v in r[3]]
    qps = float(np.median(qps_runs))
    # Relay-weather-normalized figure: per-pass qps x that pass's
    # fixed-work time is ~invariant to device-throughput weather (slow
    # window => work up, qps down). Scaled by the nominal healthy-window
    # work time so units stay qps-like and comparable round-over-round.
    qps_norm = float(np.median([r[2] * r[1] for r in kept])) / NOMINAL_WORK_MS
    p50_ms = float(np.percentile(lats, 50) * 1e3)
    p99_ms = float(np.percentile(lats, 99) * 1e3)
    log(f"engine: {qps:.0f} qps (runs {[round(r) for r in qps_runs]}, "
        f"work {[round(w, 1) for w in work_runs]} ms, norm {qps_norm:.0f}) "
        f"at recall@10={recall:.4f}; batch p50 {p50_ms:.1f} ms p99 "
        f"{p99_ms:.1f} ms")

    # Latency mode (VERDICT r3 #8): per-request p50 with small batches,
    # sequential dispatch->fetch->collect (no pipelining, no grouping) —
    # what a single client sees per call.
    lat_batch = 16
    lat_queries = queries[:256]
    lat_samples = []
    for s in range(0, lat_queries.shape[0], lat_batch):
        t0 = time.perf_counter()
        h = table.dispatch_dense_search(
            "V", lat_queries[s:s + lat_batch], valid,
            MetricType.EUCLIDEAN, k)
        table.fetch_dense_search(h)
        table.collect_dense_search(h)
        lat_samples.append(time.perf_counter() - t0)
    p50_single_ms = float(np.percentile(lat_samples[1:], 50) * 1e3)
    log(f"latency mode (batch={lat_batch}, sequential): "
        f"p50 {p50_single_ms:.1f} ms")

    # Engine-side latency (VERDICT r4 #5): p50_single_ms above is ~100%
    # tunneled-relay rtt (calib_rtt ~27 ms vs the reference's ~0.08 ms
    # local CPU call), so also report the ENGINE's per-batch time with
    # the relay fixed costs cancelled: time one grouped program with G1
    # vs G2 batch-2048 groups (same upload handshake, same dispatch rtt,
    # same drain — only the per-group kernel work differs) and take the
    # slope. The per-QUERY figure is what a local PJRT deployment would
    # see per query inside a served batch, directly comparable to
    # nsg.cpp:777-812's ~0.08 ms single-query CPU walk.
    p50_engine_ms = engine_slope_ms(table, queries, valid, k)
    engine_us_per_query = p50_engine_ms / 2048 * 1e3
    log(f"engine-side latency (grouped slope): {p50_engine_ms:.2f} ms "
        f"per 2048-batch = {engine_us_per_query:.2f} us/query")

    if recall < RECALL_FLOOR:
        log(f"RECALL BELOW FLOOR ({recall:.4f} < {RECALL_FLOOR}); "
            "reporting 0")
        qps = 0.0

    # Like-for-like comparison phase: the reference core's only measured
    # recall>=0.99 config is 100k clustered (REF_BASELINE.json) — its
    # recall collapses at 500k (0.13). Measure THIS engine at the same
    # 100k scale so vs_baseline compares identical workloads; the 500k
    # numbers above stand as the scale headroom the reference lacks.
    qps_100k, qps_norm_100k, recall_100k = 0.0, 0.0, 0.0
    if ref_qps and n != 100_000 and n > 100_000:
        m = 100_000
        seg2, _ = make_bench_segment(m, dim, x[:m])
        g2 = GraphIndex.build(seg2, "V", MetricType.EUCLIDEAN)
        gt2 = blocked_ground_truth(x[:m], xn[:m], queries[:n_recall], k)
        table2 = make_shim(seg2, g2)
        valid2 = seg2.valid_mask()
        tuned2 = table2.tune_search_ef(target_recall=0.995, k=k)
        log(f"tune_search_ef (100k): {tuned2.get('V', {})}")
        run_all2 = make_runner(table2, queries, valid2,
                               MetricType.EUCLIDEAN, k, batch, mode)
        run_recall2 = make_runner(table2, queries[:n_recall], valid2,
                                  MetricType.EUCLIDEAN, k, batch, mode)
        ids2_all, _ = run_recall2(collect_ids=True)  # warmup + recall
        hits2 = 0
        for bi, s in enumerate(range(0, n_recall, batch)):
            ids = ids2_all[bi]
            for i in range(ids.shape[0]):
                hits2 += len(set(ids[i, :k].tolist())
                             & set(gt2[s + i].tolist()))
        recall_100k = hits2 / (n_recall * k)
        run_all2()  # warm the full-size pass

        def one_pass_100k():
            rtt = quick_rtt_ms()
            work = quick_work_ms()
            t0 = time.time()
            _, lat = run_all2()
            return (rtt, work, n_queries / (time.time() - t0), lat)

        kept2, _, _ = gated_passes(one_pass_100k)
        qps_100k = float(np.median([r[2] for r in kept2]))
        qps_norm_100k = float(
            np.median([r[2] * r[1] for r in kept2])) / NOMINAL_WORK_MS
        log(f"100k comparison: {qps_100k:.0f} qps "
            f"(norm {qps_norm_100k:.0f}) at "
            f"recall@10={recall_100k:.4f} (ref C++ 1-core: {ref_qps:.0f})")
        if recall_100k < RECALL_FLOOR:
            qps_100k = qps_norm_100k = 0.0

    # vs_baseline tracks the relay-weather-NORMALIZED like-for-like figure
    # (VERDICT r4 weak #1: raw per-pass QPS swings ±17% with relay
    # weather while qps x fixed-work-time is ~invariant); the raw ratio
    # is kept alongside as vs_baseline_raw.
    if ref_qps and qps_100k:
        vs = qps_norm_100k / ref_qps
        vs_raw = qps_100k / ref_qps
    elif ref_qps:
        vs = qps_norm / ref_qps
        vs_raw = qps / ref_qps
    else:
        vs = vs_raw = qps / cpu_qps if cpu_qps else 0.0
    print(json.dumps({
        "metric": f"batched_qps_recall@10>={RECALL_FLOOR}_{n//1000}k_{dim}d",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(vs, 2),
        "vs_baseline_raw": round(vs_raw, 2),
        "baseline": (ref_note and
                     "epsilla C++ core @100k clustered recall>=0.99, "
                     "1 CPU core (like-for-like scale)") or
                    "numpy BLAS brute",
        "recall_at_10": round(recall, 4),
        "build_seconds": round(build_s, 1),
        "batch_p50_ms": round(p50_ms, 1),
        "batch_p99_ms": round(p99_ms, 1),
        "p50_single_ms": round(p50_single_ms, 1),
        "p50_engine_ms": round(p50_engine_ms, 2),
        "engine_us_per_query": round(engine_us_per_query, 2),
        "qps_norm_work": round(qps_norm, 1),
        "calib_work_per_pass_ms": [round(w, 1) for w in work_runs],
        "qps_runs": [round(r, 1) for r in qps_runs],
        "qps_100k_like_for_like": round(qps_100k, 1),
        "qps_norm_100k": round(qps_norm_100k, 1),
        "recall_100k": round(recall_100k, 4),
        "ref_cpp_qps_100k_1core": round(ref_qps, 1),
        "ref_cpp_recall_at_500k": 0.1279,
        "numpy_brute_qps": round(cpu_qps, 1),
        "n_queries": n_queries,
        "n_recall": n_recall,
        "batch": batch,
        "dataset": dataset,
        "mode": mode,
        "tuned_ef": table.search_ef_override.get("V", 0),
        "tuned_iters": table.search_iters_override.get("V", 0),
        "passes_discarded_rtt": n_disc_rtt,
        "passes_discarded_work": n_disc_work,
        **calib,
    }))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner_main()
    else:
        main()
