"""int8 query wire: block-scale codec, grouped-path equivalence, tuning.

The poisoned relay h2d (~34 MB/s with a per-put handshake after the
process's first d2h fetch, NOTES_ROUND5 R5j) makes query-upload bytes
the dominant per-pass wire term; the int8 wire (ops/qwire: per-block
scales PACKED into the same buffer — one put per super-chunk) quarters
them vs f32. These tests pin:
  - the packed wire layout round-trips exactly (host encode -> device
    decode == host roundtrip simulation);
  - a forced QueryDtype=int8 grouped search stays oracle-exact on both
    the flat-serve and the graph paths;
  - tune_search_ef prefers the int8 wire when it meets the recall
    target, and the choice round-trips through the tuned sidecar.
"""
import numpy as np
import pytest

import vectordb_tpu as vdb
from vectordb_tpu.config import global_config
from vectordb_tpu.ops import qwire
from vectordb_tpu.schema import MetricType


@pytest.fixture(autouse=True)
def _grouping_on():
    old = (global_config.query_group_size, global_config.device_rerank,
           global_config.query_dtype, global_config.flat_serve)
    global_config.query_group_size = 4
    global_config.device_rerank = "auto"
    yield
    (global_config.query_group_size, global_config.device_rerank,
     global_config.query_dtype, global_config.flat_serve) = old


def _mk(tmp_path, n=4000, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    vdb.load_db("i8db", str(tmp_path / "i8db"))
    vdb.use_db("i8db")
    vdb.create_table("t", [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "V", "dataType": "VECTOR_FLOAT", "dimensions": dim,
         "metricType": "EUCLIDEAN"}])
    vdb.insert_columns("t", {"ID": np.arange(n), "V": x}, n)
    assert vdb.rebuild() == 0
    return x, vdb._db.databases["i8db"].tables["t"]


def _oracle(x, q, k):
    return np.argsort(((x - q) ** 2).sum(1), kind="stable")[:k]


def test_quantize_block_bounds():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 128)).astype(np.float32) * 3.0
    q[5] = 0.0  # all-zero row must not divide by zero
    q[7, :qwire.QBLOCK] = 100.0  # hot block must not inflate others' error
    qi, sc = qwire.quantize_block_int8(q)
    assert qi.dtype == np.int8 and sc.dtype == np.float32
    assert (sc > 0).all()
    back = qwire.roundtrip_int8(q)
    # Per-block error bound: half a quantization step of that block
    # (plus one step of slack for the bf16 scale rounding's clip).
    step = np.repeat(sc, qwire.QBLOCK, axis=1)
    assert (np.abs(back - q) <= step + 1e-7).all()
    np.testing.assert_array_equal(back[5], 0.0)
    # Block independence: row 7's cold blocks keep their own fine scale.
    assert sc[7, 1:].max() < sc[7, 0] / 10


def test_packed_wire_device_decode_matches_host():
    """encode -> decode (the device prologue, run here via jnp on CPU)
    must equal the host roundtrip simulation BITWISE — that identity is
    what makes tune_search_ef's recall gate input-equivalent."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    for r, dp in ((16, 64), (128, 128), (100, 256)):
        q = (rng.normal(size=(r, dp)) * rng.uniform(0.1, 5)).astype(
            np.float32)
        buf = qwire.encode_int8_queries(q)
        assert buf.shape == (r + qwire.scale_rows(r, dp), dp)
        assert buf.dtype == np.int8
        dev = np.asarray(qwire.decode_int8_queries(jnp.asarray(buf), r, dp))
        np.testing.assert_array_equal(dev, qwire.roundtrip_int8(q))


def test_roundtrip_pads_odd_dims():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 100)).astype(np.float32)  # 100 % 16 != 0
    back = qwire.roundtrip_int8(q)
    assert back.shape == q.shape
    assert np.abs(back - q).max() < 0.05


@pytest.mark.parametrize("flat_serve", ["on", "off"])
def test_forced_int8_grouped_matches_oracle(tmp_path, flat_serve):
    """QueryDtype=int8 on both grouped paths (flat-serve scan and graph
    beam traversal) stays oracle-exact on well-separated data."""
    x, table = _mk(tmp_path, n=3000, seed=2)
    global_config.flat_serve = flat_serve
    global_config.query_dtype = "int8"
    rng = np.random.default_rng(3)
    queries = x[rng.integers(0, len(x), 300)] + 0.01 * rng.normal(
        size=(300, 32)).astype(np.float32)
    valid = table.segment.valid_mask()
    ids, d = table.grouped_dense_search("V", queries, valid,
                                        MetricType.EUCLIDEAN, 10,
                                        batch=128, mask_cacheable=True)
    hits = 0
    for i, q in enumerate(queries):
        hits += len(set(ids[i].tolist()) & set(_oracle(x, q, 10).tolist()))
        # Distances come from the dequantized query: near-exact vs the
        # true f32 query (block-scale error ~0.4% of the block max).
        dd = ((x[ids[i]] - q) ** 2).sum(1)
        np.testing.assert_allclose(d[i], dd, rtol=0.05, atol=0.05)
        assert np.all(np.diff(d[i]) >= -1e-6)
    assert hits / 3000 >= 0.99


def test_tune_prefers_int8_and_sidecar_roundtrip(tmp_path):
    x, table = _mk(tmp_path, n=2500, seed=4)
    table.is_leader = True
    report = table.tune_search_ef(target_recall=0.9, sample=32, k=5)
    assert report["V"]["qdtype"] == "int8"
    assert report["V"]["recall"] >= 0.9
    assert table.search_qdtype_override["V"] == "int8"
    assert table._query_wire("V") == "int8"  # QueryDtype defaults to auto
    # Sidecar round-trip: a follower reload must come back int8.
    table.search_qdtype_override.clear()
    table._load_tuned_ef()
    assert table.search_qdtype_override["V"] == "int8"


def test_explicit_f32_ignores_override(tmp_path):
    _, table = _mk(tmp_path, n=600, seed=5)
    table.search_qdtype_override["V"] = "int8"
    global_config.query_dtype = "f32"
    assert table._query_wire("V") == "f32"
    global_config.query_dtype = "bf16"
    assert table._query_wire("V") == "bf16"
    global_config.query_dtype = "auto"
    assert table._query_wire("V") == "int8"
