"""Regression coverage for the driver-facing bench.py harness helpers.

bench.py runs on the real TPU at the end of every round; its table shim
bypasses Table.__init__, so any new Table attribute used on the search
path can break it silently (this happened with search_ef_override).
Exercise the full shim -> dispatch/fetch/collect pipeline plus the
ground-truth oracles on the CPU mesh so pytest catches such breakage.
"""
import numpy as np
import pytest

from vectordb_tpu.schema import MetricType


@pytest.fixture(scope="module")
def bench_mod():
    import bench
    return bench


def test_shim_pipeline_end_to_end(bench_mod):
    n, dim, k, batch = 600, 16, 5, 64
    x, queries = bench_mod.make_clustered(n, dim, 128, n_centers=20)
    seg, _ = bench_mod.make_bench_segment(n, dim, x)

    from vectordb_tpu.index.graph import GraphIndex
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    table = bench_mod.make_shim(seg, graph)
    valid = seg.valid_mask()

    ids_all, lat = bench_mod.run_batches(
        table, queries, valid, MetricType.EUCLIDEAN, k, batch,
        collect_ids=True)
    ids = np.concatenate(ids_all, axis=0)
    assert ids.shape == (128, k)
    assert len(lat) == 2
    assert all(t >= 0 for t in lat)

    xn = (x ** 2).sum(1)
    gt = bench_mod.blocked_ground_truth(x, xn, queries, k)
    hits = sum(len(set(ids[i].tolist()) & set(gt[i].tolist()))
               for i in range(queries.shape[0]))
    assert hits / (queries.shape[0] * k) >= 0.95


def test_ground_truth_oracles_agree(bench_mod):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(400, 24)).astype(np.float32)
    q = rng.normal(size=(32, 24)).astype(np.float32)
    xn = (x ** 2).sum(1)
    gt_host = bench_mod.blocked_ground_truth(x, xn, q, 10)
    gt_dev = bench_mod.device_ground_truth(x, xn, q, 10)
    overlap = np.mean([len(set(gt_host[i]) & set(gt_dev[i])) / 10
                       for i in range(32)])
    assert overlap >= 0.99


def test_shim_grouped_runner(bench_mod):
    """The default BENCH_MODE=grouped path: one-program super-chunk
    dispatch with on-device exact re-rank through the bench shim."""
    n, dim, k, batch = 800, 16, 5, 64
    x, queries = bench_mod.make_clustered(n, dim, 384, n_centers=20)
    seg, _ = bench_mod.make_bench_segment(n, dim, x)

    from vectordb_tpu.index.graph import GraphIndex
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    table = bench_mod.make_shim(seg, graph)
    valid = seg.valid_mask()

    run = bench_mod.make_runner(table, queries, valid,
                                MetricType.EUCLIDEAN, k, batch, "grouped")
    ids_all, lat = run(collect_ids=True)
    ids = np.concatenate(ids_all, axis=0)
    assert ids.shape == (384, k)
    assert len(lat) >= 1

    xn = (x ** 2).sum(1)
    gt = bench_mod.blocked_ground_truth(x, xn, queries, k)
    hits = sum(len(set(ids[i].tolist()) & set(gt[i].tolist()))
               for i in range(queries.shape[0]))
    assert hits / (queries.shape[0] * k) >= 0.95


def test_gated_passes_discards_degraded_windows(bench_mod, monkeypatch):
    """Passes whose rtt probe exceeds 2x the median must be discarded and
    re-run (bounded)."""
    rtts = iter([10.0, 11.0, 12.0, 90.0, 10.5, 11.5])
    calls = []

    def fake_pass():
        r = next(rtts)
        calls.append(r)
        return (r, 30.0, 1000.0 + r, [0.1])

    kept, disc_rtt, disc_work = bench_mod.gated_passes(fake_pass, n_timed=5)
    assert disc_rtt == 1
    assert disc_work == 0
    assert len(kept) == 5
    assert all(r[0] <= 2 * 11.0 + 1e-9 for r in kept)


def test_gated_passes_discards_slow_work_windows(bench_mod):
    """Round-3 gap: identical rtt but 2x device-throughput swing went
    ungated. Passes whose fixed-work probe exceeds 1.5x the median must
    also be discarded and re-run."""
    passes = iter([(10.0, 30.0), (10.0, 31.0), (10.0, 29.0),
                   (10.0, 70.0), (10.0, 30.5), (10.0, 30.2)])

    def fake_pass():
        rtt, work = next(passes)
        return (rtt, work, 1000.0, [0.1])

    kept, disc_rtt, disc_work = bench_mod.gated_passes(fake_pass, n_timed=5)
    assert disc_rtt == 0
    assert disc_work == 1
    assert len(kept) == 5
    assert all(r[1] <= 1.5 * 30.5 + 1e-9 for r in kept)


def test_supervisor_retries_and_forwards(bench_mod, monkeypatch, capsys):
    """The outer capture supervisor must retry a failed/timed-out inner
    attempt after a fresh probe and forward the first clean JSON line
    verbatim (rounds 1-3: three straight scoreboard zeros because the
    capture, not the engine, died)."""
    import json as _json
    import subprocess as _sp

    monkeypatch.setattr(bench_mod, "probe_backend", lambda d=None: True)
    attempts = []

    class FakeProc:
        def __init__(self, rc, out):
            self.returncode, self.stdout = rc, out

    def fake_run(cmd, **kw):
        attempts.append(cmd)
        if len(attempts) == 1:
            raise _sp.TimeoutExpired(cmd, 1)  # mid-run wedge
        if len(attempts) == 2:
            return FakeProc(1, '{"value": 0.0, "error": "bench-exception: x"}')
        return FakeProc(0, 'noise\n{"metric": "m", "value": 42.0}')

    monkeypatch.setattr(bench_mod.subprocess, "run", fake_run)
    monkeypatch.setattr(bench_mod, "RUN_ATTEMPTS", 3)
    bench_mod.main()
    out = capsys.readouterr().out.strip()
    assert _json.loads(out) == {"metric": "m", "value": 42.0}
    assert len(attempts) == 3


def test_supervisor_emits_error_line_when_budget_spent(bench_mod,
                                                       monkeypatch, capsys):
    """Even a never-recovering backend must still yield ONE parseable
    JSON line on stdout (driver contract)."""
    import json as _json

    monkeypatch.setattr(bench_mod, "probe_backend", lambda d=None: False)
    monkeypatch.setattr(bench_mod, "RUN_ATTEMPTS", 2)
    bench_mod.main()
    out = capsys.readouterr().out.strip()
    parsed = _json.loads(out)
    assert parsed["value"] == 0.0
    assert parsed["error"] == "tpu-backend-unavailable"


def test_shim_tune_search_ef(bench_mod):
    """bench.py auto-tunes ef on the shim before timed passes (r3); the
    tuner touches schema/is_leader/graphs — attributes the shim must
    carry (the r3b bench run died on a missing .schema)."""
    n, dim = 600, 16
    x, _ = bench_mod.make_clustered(n, dim, 8, n_centers=20)
    seg, _ = bench_mod.make_bench_segment(n, dim, x)

    from vectordb_tpu.index.graph import GraphIndex
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
    table = bench_mod.make_shim(seg, graph)
    report = table.tune_search_ef(target_recall=0.9, sample=16, k=5)
    assert "V" in report
    assert table.search_ef_override["V"] == report["V"]["ef"]
