"""ANN graph build + beam search: recall vs brute-force ground truth.

The reference validates graph correctness through rebuild tests
(db_server.cpp RebuildDenseVector); here we additionally enforce a measured
recall@10 floor against the exact oracle, which the reference lacks.
"""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.config import global_config
from vectordb_tpu.index.graph import GraphIndex
from vectordb_tpu.ops.knn import exact_knn
from vectordb_tpu.schema import MetricType


def make_data(n=5000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    # Clustered data: harder for graphs than uniform noise.
    centers = rng.normal(size=(20, d)) * 3
    x = (centers[rng.integers(0, 20, n)]
         + rng.normal(size=(n, d))).astype(np.float32)
    return x


def brute_topk(x, q, k, metric):
    if metric == MetricType.EUCLIDEAN:
        dmat = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    else:
        ip = q @ x.T
        dmat = 1.0 - ip if metric == MetricType.COSINE else -ip
    return np.argsort(dmat, axis=1, kind="stable")[:, :k]


class TestKnn:
    def test_exact_knn_matches_oracle(self):
        import jax.numpy as jnp
        x = make_data(n=1000, d=16)
        norms = (x ** 2).sum(1).astype(np.float32)
        ids, d = exact_knn(jnp.asarray(x), jnp.asarray(norms), 1000, 5,
                           MetricType.EUCLIDEAN)
        ids = np.asarray(ids)
        oracle = brute_topk(x, x, 6, MetricType.EUCLIDEAN)[:, 1:]  # skip self
        # approx_max_k may swap near-ties; demand >= 98% edge agreement.
        agree = np.mean([len(set(ids[i]) & set(oracle[i])) / 5
                         for i in range(1000)])
        assert agree > 0.98, agree
        assert not np.any(ids == np.arange(1000)[:, None])  # no self edges


class TestGraphSearch:
    @pytest.mark.parametrize("metric", [MetricType.EUCLIDEAN,
                                        MetricType.COSINE])
    def test_recall_at_10(self, tmp_path, metric):
        n, dim = 5000, 32
        x = make_data(n, dim)
        if metric == MetricType.COSINE:
            x /= np.linalg.norm(x, axis=1, keepdims=True)
        mname = "EUCLIDEAN" if metric == MetricType.EUCLIDEAN else "COSINE"
        vdb.load_db("gdb", str(tmp_path / "gdb"), vector_scale=n)
        vdb.use_db("gdb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": mname}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        assert vdb.rebuild() == 0

        # The graph must actually be used now.
        eng = vdb._engine()
        table = eng.get_db("gdb").get_table("t")
        assert table.graphs["V"] is not None
        assert table.graphs["V"].num_rows == n

        rng = np.random.default_rng(7)
        queries = x[rng.integers(0, n, 50)] + rng.normal(
            size=(50, dim)).astype(np.float32) * 0.01
        if metric == MetricType.COSINE:
            queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        gt = brute_topk(x, queries, 10, metric)
        hits = 0
        for i in range(50):
            _, res = vdb.query("t", "V", queries[i].tolist(), ["ID"], 10)
            got = {r["ID"] for r in res}
            hits += len(got & set(gt[i].tolist()))
        recall = hits / (50 * 10)
        assert recall >= 0.99, f"recall@10 = {recall}"

    def test_graph_persistence(self, tmp_path):
        n, dim = 2000, 16
        x = make_data(n, dim, seed=3)
        vdb.load_db("pdb", str(tmp_path / "pdb"), vector_scale=n)
        vdb.use_db("pdb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        vdb.rebuild()
        vdb.dump_db("pdb", str(tmp_path / "pdb"))
        vdb.unload_db("pdb")

        vdb.load_db("pdb", str(tmp_path / "pdb"), vector_scale=n)
        vdb.use_db("pdb")
        table = vdb._engine().get_db("pdb").get_table("t")
        assert table.graphs["V"] is not None  # loaded from disk, not rebuilt
        _, res = vdb.query("t", "V", x[99].tolist(), ["ID"], 1)
        assert res[0]["ID"] == 99

    def test_insert_after_build_tail(self, tmp_path):
        """Rows inserted after the graph build must be searchable via the
        brute-force tail (vec_search_executor.cpp:885-914 semantics)."""
        n, dim = 1500, 16
        x = make_data(n, dim, seed=4)
        vdb.load_db("tdb", str(tmp_path / "tdb"), vector_scale=n + 10)
        vdb.use_db("tdb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        vdb.rebuild()
        new_vec = (np.ones(dim) * 40.0).astype(np.float32)  # far outlier
        vdb.insert("t", [{"ID": 99999, "V": new_vec.tolist()}])
        _, res = vdb.query("t", "V", new_vec.tolist(), ["ID"], 1)
        assert res[0]["ID"] == 99999

    def test_delete_after_build(self, tmp_path):
        n, dim = 1500, 16
        x = make_data(n, dim, seed=5)
        vdb.load_db("ddb", str(tmp_path / "ddb"), vector_scale=n)
        vdb.use_db("ddb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        vdb.rebuild()
        _, res = vdb.query("t", "V", x[7].tolist(), ["ID"], 1)
        assert res[0]["ID"] == 7
        vdb.delete_by_pk("t", [7])
        _, res = vdb.query("t", "V", x[7].tolist(), ["ID"], 5)
        assert 7 not in [r["ID"] for r in res]
        assert len(res) == 5  # full k returned despite the deletion

    def test_filtered_graph_query_returns_full_k(self, tmp_path):
        """Selective filters fall back to the masked flat scan so a full k
        results come back (improvement over the reference post-filter)."""
        n, dim = 2000, 16
        x = make_data(n, dim, seed=6)
        vdb.load_db("fdb", str(tmp_path / "fdb"), vector_scale=n)
        vdb.use_db("fdb")
        vdb.create_table("t", [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
             "metricType": "EUCLIDEAN"}])
        vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
        vdb.rebuild()
        # ~1% selectivity
        _, res = vdb.query("t", "V", x[0].tolist(), ["ID"], 10, "ID < 20")
        assert len(res) == 10
        assert all(r["ID"] < 20 for r in res)


def test_prefilter_mode_bypasses_graph(tmp_path):
    """PreFilter=true forces the masked flat scan (reference config.hpp:25
    + PreFilterBruteForceSearch, vec_search_executor.cpp:770-831)."""
    from vectordb_tpu.config import global_config

    n, dim = 2000, 16
    x = make_data(n, dim, seed=9)
    vdb.load_db("pfdb", str(tmp_path / "pfdb"), vector_scale=n)
    vdb.use_db("pfdb")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert("t", [{"ID": i, "V": x[i].tolist()} for i in range(n)])
    vdb.rebuild()
    assert vdb.update_config({"PreFilter": True}) == 0
    try:
        _, res = vdb.query("t", "V", x[0].tolist(), ["ID"], 10, "ID < 100")
        assert len(res) == 10 and all(r["ID"] < 100 for r in res)
        assert res[0]["ID"] == 0
    finally:
        vdb.update_config({"PreFilter": False})


def test_beam_compaction_recall(tmp_path):
    """Candidate compaction (beam.py: gather only the best `compact`
    surviving candidates per iteration) must not dent recall: compare an
    aggressive compact width against the exact oracle at the kernel level.
    Also covers the visited-history dedup (expanded rows are never
    re-gathered or re-expanded)."""
    import jax.numpy as jnp

    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.ops.beam import beam_search_kernel
    from vectordb_tpu.schema import (FieldSchema, FieldType, TableSchema)
    from vectordb_tpu.segment import TableSegment

    n, dim, k = 4000, 32, 10
    x = make_data(n, dim, seed=11)
    schema = TableSchema(id=0, name="c", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim,
                    metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x ** 2).sum(1)
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)

    rng = np.random.default_rng(13)
    q = x[rng.integers(0, n, 64)] + 0.01 * rng.normal(
        size=(64, dim)).astype(np.float32)
    qp = np.zeros((64, graph.table.shape[1]), np.float32)
    qp[:, :dim] = q
    gt = brute_topk(x, q, k, MetricType.EUCLIDEAN)

    def run(compact):
        d, ids, _ = beam_search_kernel(
            jnp.asarray(qp), graph.table, graph.norms, graph.adjacency,
            graph.rep_ids, int(MetricType.EUCLIDEAN), 64, 4, 64,
            num_seeds=32, term_width=12, compact=compact)
        ids = np.asarray(ids)
        return np.mean([len(set(ids[i, :k]) & set(gt[i])) / k
                        for i in range(64)])

    # degree slack is 64 cols here -> C = 4*64 = 256; compact 64 is 4x.
    # Raw beam output (no exact re-rank) on clustered data with ties sits
    # just under 0.99; the engine path re-ranks in f32. What matters here:
    # aggressive compaction must track the uncompacted kernel.
    base = run(0)
    assert base >= 0.97, base
    assert run(64) >= base - 0.015, (run(64), base)


def test_unrolled_traversal_matches_while_loop(monkeypatch):
    """Traversal depths <= UNROLL_MAX_ITERS compile as straight-line code
    with a per-step freeze (state is kept once the while_loop exit
    predicate fails). That freeze must make the unrolled kernel
    RESULT-IDENTICAL to the lax.while_loop it replaces — including the
    visited history, and including queries that converge well before
    max_iters (small term_width forces early convergence, which is
    exactly the case where an unfrozen unroll would keep mutating the
    beam past the while_loop's stopping point)."""
    import jax.numpy as jnp

    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.ops import beam
    from vectordb_tpu.schema import FieldSchema, FieldType, TableSchema
    from vectordb_tpu.segment import TableSegment

    n, dim = 3000, 32
    x = make_data(n, dim, seed=17)
    schema = TableSchema(id=0, name="u", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim,
                    metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x ** 2).sum(1)
    graph = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)

    rng = np.random.default_rng(19)
    q = x[rng.integers(0, n, 32)] + 0.01 * rng.normal(
        size=(32, dim)).astype(np.float32)
    qp = np.zeros((32, graph.table.shape[1]), np.float32)
    qp[:, :dim] = q

    def run(max_iters):
        d, ids, vis = beam.beam_search_kernel(
            jnp.asarray(qp), graph.table, graph.norms, graph.adjacency,
            graph.rep_ids, int(MetricType.EUCLIDEAN), 32, 4, max_iters,
            num_seeds=16, term_width=4, compact=64)
        return np.asarray(d), np.asarray(ids), np.asarray(vis)

    assert 12 <= beam.UNROLL_MAX_ITERS  # depth 12 takes the unrolled path
    try:
        d_u, ids_u, vis_u = run(12)
        beam.beam_search_kernel.clear_cache()
        monkeypatch.setattr(beam, "UNROLL_MAX_ITERS", -1)  # force while_loop
        d_w, ids_w, vis_w = run(12)
    finally:
        # The jit cache now holds the while_loop trace under the same
        # static key; clear it so later tests compile the default path.
        beam.beam_search_kernel.clear_cache()
    np.testing.assert_array_equal(ids_u, ids_w)
    np.testing.assert_array_equal(vis_u, vis_w)
    np.testing.assert_array_equal(d_u, d_w)


def test_grouped_build_dispatch_matches_oracle(monkeypatch):
    """The grouped lax.scan build path (_build_batch_group) must produce a
    graph of the same quality as the per-batch path — exercised by
    shrinking the batch size so a small table crosses the grouped region."""
    from vectordb_tpu.index import graph as graph_mod
    from vectordb_tpu.schema import FieldSchema, FieldType, TableSchema
    from vectordb_tpu.segment import TableSegment

    monkeypatch.setattr(graph_mod, "PRUNE_BATCH", 128)
    rng = np.random.default_rng(21)
    n, dim, k = 4096, 32, 10
    x = rng.normal(size=(n, dim)).astype(np.float32)
    schema = TableSchema(id=0, name="g", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim,
                    metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x ** 2).sum(1)
    # search_pools=True: this test exists to exercise the grouped
    # pool-search dispatch (_build_batch_group), which the auto policy
    # (KNN-only prune) no longer reaches by default.
    g = graph_mod.GraphIndex.build(seg, "V", MetricType.EUCLIDEAN,
                                   search_pools=True)

    from vectordb_tpu.ops.beam import beam_search
    q = x[rng.integers(0, n, 64)] + 0.01 * rng.normal(
        size=(64, dim)).astype(np.float32)
    ids = beam_search(g, q, seg.valid_mask(), MetricType.EUCLIDEAN,
                      beam_width=64, term_width=16)
    d = ((q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T)
         + (x ** 2).sum(1)[None, :])
    gt = np.argsort(d, axis=1)[:, :k]
    hits = sum(len(set(ids[i, :k].tolist()) & set(gt[i].tolist()))
               for i in range(64))
    assert hits / (64 * k) >= 0.97

    # Same crossing of the grouped region for the KNN-only prune path
    # (the default build): 4096 rows > 16 * batch(128).
    g2 = graph_mod.GraphIndex.build(seg, "V", MetricType.EUCLIDEAN,
                                    search_pools=False)
    ids2 = beam_search(g2, q, seg.valid_mask(), MetricType.EUCLIDEAN,
                       beam_width=64, term_width=16)
    hits2 = sum(len(set(ids2[i, :k].tolist()) & set(gt[i].tolist()))
                for i in range(64))
    assert hits2 / (64 * k) >= 0.97


def test_native_bfs_matches_numpy_absorb():
    """The native BFS used by finalize_adjacency must agree with the
    numpy fallback on reachability (including incremental re-absorbs)."""
    import numpy as np

    from vectordb_tpu.native import get_native

    nat = get_native()
    if nat is None or not getattr(nat, "has_bfs", False):
        import pytest
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    n, r = 500, 6
    adj = rng.integers(-1, n, size=(n, r)).astype(np.int32)

    def numpy_reach(seeds):
        reached = np.zeros(n, dtype=bool)
        frontier = np.asarray(seeds, dtype=np.int64)
        reached[frontier] = True
        while len(frontier):
            nxt = adj[frontier].reshape(-1)
            nxt = nxt[nxt >= 0]
            nxt = np.unique(nxt)
            nxt = nxt[~reached[nxt]]
            reached[nxt] = True
            frontier = nxt
        return reached

    seeds = np.asarray([0, 17, 123], np.int32)
    want = numpy_reach(seeds)
    got = np.zeros(n, dtype=bool)
    scratch = np.empty(n, np.int32)
    newly = nat.bfs_reach(adj, seeds, got.view(np.uint8), scratch)
    assert newly == int(want.sum())
    assert np.array_equal(got, want)
    # incremental absorb from an unreached node
    unreached = np.flatnonzero(~want)
    if len(unreached):
        s2 = np.asarray([unreached[0]], np.int32)
        n2 = nat.bfs_reach(adj, s2, got.view(np.uint8), scratch)
        assert n2 >= 1
        assert got[unreached[0]]


def test_build_search_pools_config_paths():
    """Both build variants (KNN-only prune default, pool-search via
    BuildSearchPools=on) must produce searchable graphs with recall
    against the exact oracle."""
    import numpy as np

    from vectordb_tpu.config import global_config
    from vectordb_tpu.index.graph import GraphIndex
    from vectordb_tpu.ops.beam import beam_search
    from vectordb_tpu.schema import (FieldSchema, FieldType, MetricType,
                                     TableSchema)
    from vectordb_tpu.segment import TableSegment

    rng = np.random.default_rng(5)
    n, dim = 1500, 24
    x = rng.normal(size=(n, dim)).astype(np.float32)
    schema = TableSchema(id=0, name="t", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=dim,
                    metric_type=MetricType.EUCLIDEAN)])
    seg = TableSegment(schema, n)
    seg.record_number = n
    seg.dense_host["V"][:n] = x
    seg.dense_norms["V"][:n] = (x ** 2).sum(1)

    q = x[:64] + 0.01 * rng.normal(size=(64, dim)).astype(np.float32)
    d = ((q ** 2).sum(1)[:, None] - 2.0 * (q @ x.T)
         + (x ** 2).sum(1)[None, :])
    gt = np.argsort(d, axis=1)[:, :5]

    assert global_config.build_search_pools == "auto"
    for mode, pools in (("auto-default", None), ("explicit-on", True)):
        g = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN,
                             search_pools=pools)
        ids = beam_search(g, q, seg.valid_mask(), MetricType.EUCLIDEAN,
                          beam_width=64)
        hits = sum(len(set(ids[i, :5].tolist()) & set(gt[i].tolist()))
                   for i in range(64))
        assert hits / (64 * 5) >= 0.97, (mode, hits / 320)


class TestCoverReps:
    """k-means cover representatives: one seed per basin by construction.

    Pins the r4 fix for the measured 200k failure — uniform-random reps
    miss small isolated clusters (~exp(-cluster_size*S/N) each), stranding
    their queries at ANY beam width (best rep 3x further than the true
    neighborhood). See index/graph._cover_rep_ids."""

    def test_every_isolated_cluster_gets_a_seed(self):
        import jax.numpy as jnp
        from vectordb_tpu.index.graph import _make_rep_ids, _rep_count

        n, d, n_clusters = 8192, 16, 64
        rng = np.random.default_rng(7)
        centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 100
        labels = rng.integers(0, n_clusters, n)
        # One deliberately tiny cluster (8 rows): the case random reps miss.
        labels[:8] = 0
        labels[8:][labels[8:] == 0] = 1
        x = (centers[labels]
             + 0.1 * rng.normal(size=(n, d))).astype(np.float32)

        s = _rep_count(n)
        assert s >= 256 and n >= 4 * s  # cover path is active at this shape
        reps = _make_rep_ids(n, nav=0, table=jnp.asarray(x))
        assert reps.dtype == np.int32 and len(reps) == s
        assert np.all((reps >= 0) & (reps < n))
        # Duplicate rep ids seed duplicate beam entries and surface as
        # duplicate rows in the grouped device-rerank top-k (no host
        # dedup stage there) — the rep set must be unique.
        assert len(set(reps.tolist())) == s
        assert 0 in reps  # nav point is always a seed
        covered = set(labels[reps].tolist())
        missing = set(range(n_clusters)) - covered
        assert not missing, f"clusters with no rep seed: {sorted(missing)}"

    def test_rep_ids_persist_roundtrip(self, tmp_path):
        from vectordb_tpu.schema import FieldSchema, TableSchema, FieldType
        from vectordb_tpu.segment import TableSegment

        n, dim = 512, 16
        x = make_data(n=n, d=dim, seed=3)
        schema = TableSchema(id=0, name="t", fields=[
            FieldSchema(id=0, name="ID", is_primary_key=True,
                        field_type=FieldType.INT4),
            FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                        vector_dimension=dim,
                        metric_type=MetricType.EUCLIDEAN)])
        seg = TableSegment(schema, n)
        seg.record_number = n
        seg.dense_host["V"][:n] = x
        seg.dense_norms["V"][:n] = (x ** 2).sum(1)
        g = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN)
        path = str(tmp_path / "g.npz")
        g.save(path)
        g2 = GraphIndex.load(path, seg, "V")
        np.testing.assert_array_equal(g.rep_ids_host, g2.rep_ids_host)
