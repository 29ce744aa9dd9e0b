"""Multi-chip sharded search on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vectordb_tpu.index.graph import GraphIndex, _make_rep_ids
from vectordb_tpu.parallel import (ShardedTable, make_mesh,
                                   sharded_beam_search, sharded_flat_topk,
                                   sharded_knn_round)
from vectordb_tpu.schema import MetricType

pytestmark = pytest.mark.skipif(jax.device_count() < 2,
                                reason="needs a multi-device mesh")


def make_data(n=4096, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(32, d)) * 3
    return (centers[rng.integers(0, 32, n)]
            + rng.normal(size=(n, d))).astype(np.float32)


def test_sharded_flat_matches_oracle():
    x = make_data()
    mesh = make_mesh()
    st = ShardedTable(mesh, x)
    q = x[:8] + 0.01
    mask = np.ones(st.n_rows, dtype=bool)
    d, ids = sharded_flat_topk(mesh, jnp.asarray(q), st.table, st.norms,
                               jnp.asarray(mask), MetricType.EUCLIDEAN, 10)
    ids = np.asarray(ids)
    ref = np.argsort(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1),
                     axis=1)[:, :10]
    for b in range(8):
        assert set(ids[b][:5].tolist()) == set(ref[b][:5].tolist())


def test_sharded_knn_round_matches_oracle():
    x = make_data(n=1024, d=16)
    mesh = make_mesh()
    st = ShardedTable(mesh, x)
    ids = np.asarray(sharded_knn_round(mesh, st.table, st.norms,
                                       st.n_rows, MetricType.EUCLIDEAN, 5))
    dmat = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(dmat, np.inf)
    oracle = np.argsort(dmat, axis=1)[:, :5]
    agree = np.mean([len(set(ids[i]) & set(oracle[i])) / 5
                     for i in range(1024)])
    assert agree > 0.99, agree


def test_sharded_beam_search_end_to_end():
    """Per-shard graphs + global merge: recall vs oracle on the mesh."""
    from vectordb_tpu.schema import FieldSchema, FieldType, TableSchema
    from vectordb_tpu.segment import TableSegment

    x = make_data(n=4096, d=32, seed=1)
    mesh = make_mesh()
    n_shards = mesh.devices.size
    st = ShardedTable(mesh, x)
    ns = st.rows_per_shard

    # Build one graph per shard over its local rows (host-side build,
    # local ids), then stack into the sharded adjacency.
    adj_parts = []
    rep_parts = []
    schema = TableSchema(id=0, name="t", fields=[
        FieldSchema(id=0, name="ID", is_primary_key=True,
                    field_type=FieldType.INT4),
        FieldSchema(id=1, name="V", field_type=FieldType.VECTOR_FLOAT,
                    vector_dimension=32,
                    metric_type=MetricType.EUCLIDEAN)])
    for s in range(n_shards):
        rows = x[s * ns:(s + 1) * ns]
        seg = TableSegment(schema, ns)
        seg.record_number = len(rows)
        seg.dense_host["V"][:len(rows)] = rows
        seg.dense_norms["V"][:len(rows)] = (rows ** 2).sum(1)
        g = GraphIndex.build(seg, "V", MetricType.EUCLIDEAN,
                             knn_k=16, degree=8)
        adj_parts.append(g.adjacency_host)
        reps = np.zeros(64, dtype=np.int32)
        src = g.rep_ids_host[:64]
        reps[:len(src)] = src
        rep_parts.append(reps)
    adjacency = st.put_adjacency(np.concatenate(adj_parts, axis=0))
    rep_ids = jax.device_put(
        np.concatenate(rep_parts, axis=0),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("shard")))

    q = x[100:108] + 0.01
    d, ids = sharded_beam_search(mesh, jnp.asarray(q), st.table, st.norms,
                                 adjacency, rep_ids,
                                 MetricType.EUCLIDEAN, beam_width=32)
    ids = np.asarray(ids)
    ref = np.argsort(((q[:, None, :] - x[None, :, :]) ** 2).sum(-1),
                     axis=1)[:, :10]
    hits = sum(len(set(ids[b][:10].tolist()) & set(ref[b].tolist()))
               for b in range(8))
    assert hits / 80 >= 0.95, hits / 80
