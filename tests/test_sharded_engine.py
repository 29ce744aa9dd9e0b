"""Engine-level multi-chip sharding tests (virtual 8-CPU mesh).

Drives the FULL engine (DBServer -> Table -> sharded data plane) with
config ShardCount=8: flat scans, distributed graph build, tail merge for
rows inserted after the build, deletes, filters, rebuild-while-query, and
cross-process persistence of sharded graphs. Recall is checked against the
exact numpy oracle.
"""
import threading

import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.config import global_config


@pytest.fixture(autouse=True)
def _sharded_mode():
    global_config.shard_count = 8
    global_config.minimal_graph_size = 100
    yield
    global_config.shard_count = 0
    global_config.minimal_graph_size = 100
    from vectordb_tpu.parallel import engine
    engine._reset_for_tests()


def _mk_table(tmp_path, dim=32, name="t"):
    vdb.load_db("sdb", str(tmp_path / "sdb"))
    vdb.use_db("sdb")
    vdb.create_table(name, [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])


def _insert(name, x, start=0):
    vdb.insert_columns(name, {"ID": np.arange(start, start + len(x)),
                              "V": x}, len(x))


def _oracle(x, q, k):
    d = ((x - q) ** 2).sum(1)
    return np.argsort(d, kind="stable")[:k]


def test_sharded_flat_exact(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    # Sanity: the table really runs in sharded mode.
    table = vdb._db.databases["sdb"].tables["t"]
    assert table.mesh is not None and "V" in table.sharded_fields
    for qi in [0, 17, 999, 2999]:
        code, res = vdb.query("t", "V", x[qi].tolist(), ["ID"], 10, "", True)
        got = [r["ID"] for r in res]
        assert got == _oracle(x, x[qi], 10).tolist(), qi


def test_sharded_graph_recall_and_tail(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    assert table.sharded_fields["V"].graph is not None

    queries = x[rng.integers(0, 4000, 64)] + 0.01 * rng.normal(
        size=(64, 32)).astype(np.float32)
    hits = 0
    for q in queries:
        code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, "", True)
        got = {r["ID"] for r in res}
        hits += len(got & set(_oracle(x, q, 10).tolist()))
    recall = hits / (64 * 10)
    assert recall >= 0.95, recall

    # Rows inserted AFTER the build must be found via the sharded tail.
    x2 = rng.normal(size=(500, 32)).astype(np.float32) + 5.0
    _insert("t", x2, start=4000)
    for j in [0, 123, 499]:
        code, res = vdb.query("t", "V", x2[j].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == 4000 + j


def test_sharded_delete_and_filter(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    vdb.rebuild()
    q = x[50]
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 5, "", True)
    assert res[0]["ID"] == 50
    vdb.delete_by_pk("t", [50])
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 5, "", True)
    assert 50 not in [r["ID"] for r in res]
    # Selective filter: graph post-filter + sharded flat top-up still
    # returns full k.
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, "ID < 100")
    ids = [r["ID"] for r in res]
    assert len(ids) == 10 and all(i < 100 and i != 50 for i in ids)
    oracle = [i for i in _oracle(x, q, 2000).tolist()
              if i < 100 and i != 50][:10]
    assert ids == oracle


def test_sharded_concurrent_insert_query(tmp_path):
    """BASELINE config-5 shape: concurrent insert + query workload over a
    sharded table while a rebuild happens mid-stream."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x[:1500])
    vdb.rebuild()

    errors = []

    def writer():
        try:
            for s in range(1500, 3000, 250):
                _insert("t", x[s:s + 250], start=s)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    for _ in range(20):
        qi = int(rng.integers(0, 1500))
        code, res = vdb.query("t", "V", x[qi].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == qi
    th.join()
    assert not errors
    vdb.rebuild()
    for qi in [1500, 2200, 2999]:
        code, res = vdb.query("t", "V", x[qi].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == qi


def test_sharded_graph_persistence(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1500, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    vdb.rebuild()
    vdb.dump_db("sdb", str(tmp_path / "sdb"))
    vdb.unload_db("sdb")

    vdb.load_db("sdb", str(tmp_path / "sdb"))
    vdb.use_db("sdb")
    table = vdb._db.databases["sdb"].tables["t"]
    assert table.sharded_fields["V"].graph is not None
    assert table.sharded_fields["V"].graph.num_rows == 1500
    for qi in [3, 700, 1499]:
        code, res = vdb.query("t", "V", x[qi].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == qi


def test_mask_cache_not_poisoned_by_stale_valid_snapshot(tmp_path):
    """Race regression: a query thread snapshots valid_mask(), a writer
    then inserts rows (bumping mutation_version), and the query builds the
    cacheable device mask. The cache entry is keyed by the NEW version, so
    it must not be built from the STALE snapshot — that would hide the new
    rows from every later query at that version (observed as intermittent
    self-query misses in test_sharded_concurrent_insert_query)."""
    from vectordb_tpu.schema import MetricType

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1200, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x[:1000])
    vdb.rebuild()
    tbl = vdb._db.databases["sdb"].tables["t"]
    seg = tbl.segment

    stale_valid = seg.valid_mask().copy()   # snapshot BEFORE the insert
    _insert("t", x[1000:], start=1000)      # bumps mutation_version

    # Sharded path with the stale snapshot + cacheable mask: the freshly
    # inserted row must still be visible (tail scan over synced store).
    ids, _ = tbl.batch_dense_search("V", x[1100:1101], stale_valid,
                                    MetricType.EUCLIDEAN, 5,
                                    mask_cacheable=True)
    assert 1100 in ids[0].tolist()
    # And the cached mask itself must cover all current rows.
    sf = tbl.sharded_fields["V"]
    ver, dm = sf._mask_cache
    mask = np.asarray(dm)
    s, cap = sf.store.n_shards, sf.store.cap_s
    for r in (1000, 1100, 1199):
        assert mask[r % s, r // s], r


def test_sharded_ivf_build_path(tmp_path):
    """Sub-quadratic sharded build: per-shard rows above IvfKnnThreshold
    route KNN through per-shard IVF partitioning (ops/ivf.py) instead of
    the exact in-kernel scan; recall must hold."""
    old = global_config.ivf_knn_threshold
    global_config.ivf_knn_threshold = 400  # 4000 rows / 8 shards = 500 each
    try:
        rng = np.random.default_rng(5)
        x = rng.normal(size=(4000, 32)).astype(np.float32)
        _mk_table(tmp_path)
        _insert("t", x)
        assert vdb.rebuild() == 0
        table = vdb._db.databases["sdb"].tables["t"]
        assert table.sharded_fields["V"].graph is not None

        queries = x[rng.integers(0, 4000, 64)] + 0.01 * rng.normal(
            size=(64, 32)).astype(np.float32)
        hits = 0
        for q in queries:
            code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, "",
                                  True)
            hits += len({r["ID"] for r in res}
                        & set(_oracle(x, q, 10).tolist()))
        recall = hits / (64 * 10)
        assert recall >= 0.95, recall
    finally:
        global_config.ivf_knn_threshold = old


def test_sharded_tune_search_ef(tmp_path):
    """tune_search_ef must work in sharded mode: enumerate fields whose
    graphs live on the sharded plane (not Table.graphs) and compute its
    oracle through the SHARDED flat path, never a single-chip
    device_view replication (ADVICE r2, medium)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    assert table.graphs.get("V") is None  # graphs live on the sharded plane
    assert table.sharded_fields["V"].graph is not None

    report = table.tune_search_ef(sample=32, k=5, target_recall=0.95)
    assert "V" in report, report  # no-field-name call found the field
    assert report["V"]["recall"] >= 0.95
    assert table.search_ef_override["V"] == report["V"]["ef"]


def test_sharded_device_filter_zero_host_work(tmp_path, monkeypatch):
    """Numeric filters on a sharded table evaluate per shard ON DEVICE
    (VERDICT r2 #6): after the first filtered query has cached the sharded
    columns + validity mask, a repeated filtered query performs NO host
    mask evaluation, NO mask interleave, and NO host->device column
    upload — and results still match the host oracle exactly."""
    rng = np.random.default_rng(11)
    n, dim = 2500, 32
    x = rng.normal(size=(n, dim)).astype(np.float32)
    price = rng.uniform(0, 100, n)
    vdb.load_db("sdb", str(tmp_path / "sdb"))
    vdb.use_db("sdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "price", "dataType": "DOUBLE"},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert_columns("t", {"ID": np.arange(n), "price": price, "V": x}, n)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    assert table.sharded_fields["V"].graph is not None

    from vectordb_tpu.expr.evaluator import FilterCompiler
    from vectordb_tpu.parallel import engine

    q = x[40]
    flt = "price > 25.0 AND price < 75.0"
    keep = (price > 25.0) & (price < 75.0)
    oracle = [i for i in _oracle(x, q, n).tolist() if keep[i]][:10]

    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, flt)
    assert [r["ID"] for r in res] == oracle

    # Spy on every host-side mask path AFTER the warm query.
    host_folds = []
    orig_mask = FilterCompiler.mask
    monkeypatch.setattr(
        FilterCompiler, "mask",
        lambda self, *a, **k: (host_folds.append(k),
                               orig_mask(self, *a, **k))[1])
    interleaves = []
    orig_il = engine._interleave
    monkeypatch.setattr(
        engine, "_interleave",
        lambda *a, **k: (interleaves.append(a), orig_il(*a, **k))[1])

    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, flt)
    assert [r["ID"] for r in res] == oracle
    assert host_folds == []       # no host filter evaluation
    assert interleaves == []      # no mask/column re-interleave or upload


def test_sharded_device_filter_selective_topup(tmp_path):
    """A filter keeping fewer rows than the beam surfaces triggers the
    sharded flat top-up — which must apply the SAME device filter (not the
    unfiltered validity mask)."""
    rng = np.random.default_rng(12)
    n, dim = 2000, 32
    x = rng.normal(size=(n, dim)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    q = x[1500]
    # Only 6 rows match; limit 10 -> top-up path fills what exists.
    code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, "ID < 6")
    ids = [r["ID"] for r in res]
    oracle = [i for i in _oracle(x, q, n).tolist() if i < 6]
    assert ids == oracle


def test_sharded_fused_traversal(tmp_path):
    """Fused int8 traversal on the sharded plane: same final results as
    the split path (exact re-rank repairs int8 navigation rounding), fused
    table actually active and per-shard shaped, and auto-gating falls back
    cleanly when the budget denies it."""
    old = (global_config.fused_traversal, global_config.fused_max_bytes)
    global_config.fused_traversal = "on"
    try:
        rng = np.random.default_rng(11)
        x = rng.normal(size=(4000, 32)).astype(np.float32)
        _mk_table(tmp_path)
        _insert("t", x)
        assert vdb.rebuild() == 0
        table = vdb._db.databases["sdb"].tables["t"]
        sf = table.sharded_fields["V"]
        assert sf.graph is not None

        queries = x[rng.integers(0, 4000, 64)] + 0.01 * rng.normal(
            size=(64, 32)).astype(np.float32)

        def run_all():
            hits = 0
            for q in queries:
                code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10,
                                      "", True)
                got = {r["ID"] for r in res}
                hits += len(got & set(_oracle(x, q, 10).tolist()))
            return hits / (64 * 10)

        r_fused = run_all()
        # The fused table must actually be active and per-shard shaped.
        fused, scale = sf.graph._fused_cache
        assert fused is not None and float(scale) > 0
        s, cap_s, r_total = sf.graph.adjacency_host.shape
        assert fused.shape == (s, cap_s, r_total * sf.store.dim_padded)
        assert fused.dtype == np.int8

        global_config.fused_traversal = "off"
        r_split = run_all()
        assert r_fused >= r_split - 0.02, (r_fused, r_split)

        # auto + zero budget: gated off, still answers correctly.
        global_config.fused_traversal = "auto"
        global_config.fused_max_bytes = 0
        sf.graph._fused_cache = None
        code, res = vdb.query("t", "V", x[7].tolist(), ["ID"], 10, "", True)
        assert sf.graph._fused_cache == (None, None)
        assert res[0]["ID"] == 7
    finally:
        (global_config.fused_traversal,
         global_config.fused_max_bytes) = old


def test_sharded_fused_hbm_budget_from_config(tmp_path, monkeypatch):
    """Configured-total HBM fallback on the sharded plane (the axon
    backend reports no memory_stats): per-device budget = DeviceHbmBytes
    minus the per-device resident shards. No headroom -> deny; plenty ->
    admit."""
    import vectordb_tpu.utils as utils_mod

    old = (global_config.fused_traversal, global_config.fused_max_bytes,
           global_config.device_hbm_bytes)
    global_config.fused_traversal = "auto"
    global_config.fused_max_bytes = 12 << 30
    monkeypatch.setattr(utils_mod, "device_hbm_stats",
                        lambda *a, **k: None)
    try:
        rng = np.random.default_rng(13)
        x = rng.normal(size=(3000, 32)).astype(np.float32)
        _mk_table(tmp_path)
        _insert("t", x)
        assert vdb.rebuild() == 0
        table = vdb._db.databases["sdb"].tables["t"]
        sf = table.sharded_fields["V"]
        s = sf.graph.adjacency_host.shape[0]
        resident_dev = (sf.store.buf.nbytes + sf.store.norms.nbytes
                        + sf.graph.adjacency_host.nbytes
                        + sf.graph.rep_ids_host.nbytes) // s
        global_config.device_hbm_bytes = resident_dev + 1024  # no room
        sf.graph._fused_cache = None
        assert sf.graph.fused_traversal(
            sf.store, table.segment.dense_host["V"],
            global_config.fused_max_bytes) == (None, None)
        global_config.device_hbm_bytes = 64 << 30  # plenty
        sf.graph._fused_cache = None
        fused, scale = sf.graph.fused_traversal(
            sf.store, table.segment.dense_host["V"],
            global_config.fused_max_bytes)
        assert fused is not None and float(scale) > 0
        code, res = vdb.query("t", "V", x[7].tolist(), ["ID"], 10, "", True)
        assert res[0]["ID"] == 7
    finally:
        (global_config.fused_traversal, global_config.fused_max_bytes,
         global_config.device_hbm_bytes) = old


def test_sharded_fused_deny_reevaluated_at_higher_budget(tmp_path):
    """A cached sharded-plane deny only holds for budgets <= the one it
    was recorded at: a later call with a raised FusedMaxBytes (e.g. a
    forced A/B) must re-evaluate, not inherit the deny — with no manual
    cache reset."""
    old = (global_config.fused_traversal, global_config.fused_max_bytes)
    global_config.fused_traversal = "auto"
    try:
        rng = np.random.default_rng(14)
        x = rng.normal(size=(3000, 32)).astype(np.float32)
        _mk_table(tmp_path)
        _insert("t", x)
        assert vdb.rebuild() == 0
        table = vdb._db.databases["sdb"].tables["t"]
        sf = table.sharded_fields["V"]
        sf.graph._fused_cache = None
        host = table.segment.dense_host["V"]
        assert sf.graph.fused_traversal(sf.store, host, 0) == (None, None)
        # Same or lower budget: the deny is served from cache.
        assert sf.graph.fused_traversal(sf.store, host, 0) == (None, None)
        # Raised budget: re-evaluated, admits, builds the table.
        fused, scale = sf.graph.fused_traversal(sf.store, host, 1 << 40)
        assert fused is not None and float(scale) > 0
        # Built tables are immutable: a later tight budget keeps serving
        # the existing table (it is already resident; denying would only
        # drop the pointer, not the memory).
        fused2, _ = sf.graph.fused_traversal(sf.store, host, 0)
        assert fused2 is not None
    finally:
        (global_config.fused_traversal,
         global_config.fused_max_bytes) = old


def test_sharded_fused_with_tail_and_filter(tmp_path):
    """Fused traversal + post-build tail rows + device filter compose."""
    old = global_config.fused_traversal
    global_config.fused_traversal = "on"
    try:
        rng = np.random.default_rng(12)
        x = rng.normal(size=(3000, 32)).astype(np.float32)
        vdb.load_db("sdb2", str(tmp_path / "sdb2"))
        vdb.use_db("sdb2")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "Tag", "dataType": "INT", "primaryKey": False},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": 32,
             "metricType": "EUCLIDEAN"}])
        vdb.insert_columns("t", {"ID": np.arange(3000),
                                 "Tag": np.arange(3000) % 4, "V": x}, 3000)
        assert vdb.rebuild() == 0
        # Tail rows after the build stay reachable alongside fused rows.
        x2 = rng.normal(size=(200, 32)).astype(np.float32) + 5.0
        vdb.insert_columns("t", {"ID": np.arange(3000, 3200),
                                 "Tag": np.zeros(200, np.int64),
                                 "V": x2}, 200)
        code, res = vdb.query("t", "V", x2[9].tolist(), ["ID"], 5, "", True)
        assert res[0]["ID"] == 3009
        # Device filter on the fused path.
        q = x[70]
        code, res = vdb.query("t", "V", q.tolist(), ["ID"], 10, "Tag < 2")
        ids = [r["ID"] for r in res]
        assert len(ids) == 10 and all(i % 4 < 2 or i >= 3000 for i in ids)
    finally:
        global_config.fused_traversal = old


def test_sharded_grouped_one_program_per_super_chunk(tmp_path):
    """Grouped throughput mode on the sharded plane: one shard_map
    program per batch*G super-chunk (counted via launch_grouped), oracle
    recall, and the single packed int32 drain (VERDICT r3 #5)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    sf = table.sharded_fields["V"]
    assert sf.graph is not None

    calls = []
    orig = type(sf).launch_grouped

    def spy(self, qg, *a, **kw):
        calls.append(qg.shape)
        return orig(self, qg, *a, **kw)

    type(sf).launch_grouped = spy
    try:
        from vectordb_tpu.schema import MetricType
        global_config.query_group_size = 2
        queries = x[rng.integers(0, len(x), 512)] + 0.01 * rng.normal(
            size=(512, 32)).astype(np.float32)
        valid = table.segment.valid_mask()
        ids, d = table.grouped_dense_search(
            "t" and "V", queries, valid, MetricType.EUCLIDEAN, 10,
            batch=128, mask_cacheable=True)
    finally:
        type(sf).launch_grouped = orig
        global_config.query_group_size = 4
    # 512 queries / (128 * G=2) = 2 super-chunks -> 2 programs of [2, 128, Dp]
    assert [c[:2] for c in calls] == [(2, 128), (2, 128)], calls
    assert ids.shape == (512, 10)
    hits = 0
    for i, q in enumerate(queries):
        hits += len(set(ids[i][ids[i] >= 0].tolist())
                    & set(_oracle(x, q, 10).tolist()))
    assert hits / (512 * 10) >= 0.97
    # Exact distances from the host re-rank
    q0 = queries[0]
    want = np.sort(((x[ids[0][ids[0] >= 0]] - q0) ** 2).sum(1))
    np.testing.assert_allclose(d[0][: len(want)], want, rtol=1e-5)


def test_sharded_grouped_int8_wire(tmp_path):
    """int8 query wire on the sharded plane: the packed buffer decodes
    inside the shard_map program and stays oracle-accurate."""
    from vectordb_tpu.schema import MetricType

    rng = np.random.default_rng(13)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    queries = x[rng.integers(0, len(x), 512)] + 0.01 * rng.normal(
        size=(512, 32)).astype(np.float32)
    valid = table.segment.valid_mask()
    old_qd = global_config.query_dtype
    old_g = global_config.query_group_size
    try:
        global_config.query_group_size = 2
        global_config.query_dtype = "int8"
        ids, d = table.grouped_dense_search(
            "V", queries, valid, MetricType.EUCLIDEAN, 10, batch=128,
            mask_cacheable=True)
    finally:
        global_config.query_dtype = old_qd
        global_config.query_group_size = old_g
    hits = sum(len(set(ids[i][ids[i] >= 0].tolist())
                   & set(_oracle(x, q, 10).tolist()))
               for i, q in enumerate(queries))
    assert hits / (512 * 10) >= 0.97
    # Distances are the host re-rank's EXACT f32 vs the true query.
    q0 = queries[0]
    want = np.sort(((x[ids[0][ids[0] >= 0]] - q0) ** 2).sum(1))
    np.testing.assert_allclose(d[0][: len(want)], want, rtol=1e-5)


def test_sharded_tuned_iters_ladder_applies(tmp_path):
    """tune_search_ef's (ef, iters) rungs must run (not skip) on the
    sharded plane and the chosen iters cap must reach the launch."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    report = table.tune_search_ef(target_recall=0.9, sample=32, k=5)
    assert "V" in report
    # The cheapest rung has iters > 0; on a 3000-row table it must meet
    # 0.9 easily, proving iters rungs are exercised sharded.
    assert report["V"]["iters"] > 0
    assert report["V"]["recall"] >= 0.9


def test_sharded_grouped_upload_threads_equivalent(tmp_path):
    """Sharded grouped path: threaded query uploads (UploadThreads) are
    bit-identical to inline uploads (only the issuing thread changes)."""
    from vectordb_tpu.schema import MetricType

    rng = np.random.default_rng(11)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    queries = x[rng.integers(0, len(x), 520)]
    valid = table.segment.valid_mask()
    old_up = global_config.upload_threads
    old_g = global_config.query_group_size
    try:
        global_config.query_group_size = 2
        outs = []
        for n_up in (0, 2):
            global_config.upload_threads = n_up
            outs.append(table.grouped_dense_search(
                "V", queries, valid, MetricType.EUCLIDEAN, 5, batch=64,
                mask_cacheable=True))
        np.testing.assert_array_equal(outs[1][0], outs[0][0])
        np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=0, atol=0)
    finally:
        global_config.upload_threads = old_up
        global_config.query_group_size = old_g


def test_sharded_grouped_drain_threads_equivalent(tmp_path):
    """Sharded grouped path: threaded result drains (DrainThreads) are
    bit-identical to inline drains (disjoint output slices per chunk)."""
    from vectordb_tpu.schema import MetricType

    rng = np.random.default_rng(12)
    x = rng.normal(size=(3000, 32)).astype(np.float32)
    _mk_table(tmp_path)
    _insert("t", x)
    assert vdb.rebuild() == 0
    table = vdb._db.databases["sdb"].tables["t"]
    queries = x[rng.integers(0, len(x), 520)]
    valid = table.segment.valid_mask()
    old_dr = global_config.drain_threads
    old_g = global_config.query_group_size
    try:
        global_config.query_group_size = 2
        outs = []
        for n_dr in (0, 2):
            global_config.drain_threads = n_dr
            outs.append(table.grouped_dense_search(
                "V", queries, valid, MetricType.EUCLIDEAN, 5, batch=64,
                mask_cacheable=True))
        np.testing.assert_array_equal(outs[1][0], outs[0][0])
        np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=0, atol=0)
    finally:
        global_config.drain_threads = old_dr
        global_config.query_group_size = old_g
