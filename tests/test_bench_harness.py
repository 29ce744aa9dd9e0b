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
        return (r, 1000.0 + r, [0.1])

    kept, discarded = bench_mod.gated_passes(fake_pass, n_timed=5)
    assert discarded == 1
    assert len(kept) == 5
    assert all(r[0] <= 2 * 11.0 + 1e-9 for r in kept)


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
