"""Native JSON encoder parity (vectordb_tpu/fastjson.py, native/vdbjson.c).

The REST response encoder is the single-core serving hot path; the C
encoder must be a drop-in for json.dumps with ensure_ascii semantics.
Floats are formatted %.9g when float32-exact (binary32 round-trip) and
%.17g otherwise (binary64 round-trip) — parsed values must reproduce
the same float32 (engine distances/vectors are f32-origin) and the same
float64 for non-f32-origin values.
"""
import json
import math

import numpy as np
import pytest

from vectordb_tpu.fastjson import _native_dumps, dumps_bytes


def _cmp(a, b):
    if isinstance(a, float):
        if a != a:
            assert b != b
            return
        f32 = np.float32(a)
        if np.isfinite(f32):
            assert np.float32(b) == f32, (a, b)
        if float(f32) != a and math.isfinite(a):
            assert a == b, (a, b)  # non-f32-origin: must be f64-exact
    elif isinstance(a, list):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _cmp(x, y)
    elif isinstance(a, dict):
        assert a.keys() == b.keys()
        for kk in a:
            _cmp(a[kk], b[kk])
    else:
        assert a == b and type(a) is type(b), (a, b)


CORPUS = [
    None, True, False, 0, -1, 2 ** 70, -(2 ** 70), 1.0, -0.0, 0.1,
    float("nan"), float("inf"), float("-inf"), "", "hello",
    'quote"back\\slash', "tab\tnl\nctrl\x01", "unicode: héllo 中文 🎉",
    [], {}, [1, [2, [3]]], {"a": {"b": [1.5, "x", None]}},
    0.30000000000000004, 1e300, 5e-324,
]


@pytest.mark.skipif(_native_dumps is None,
                    reason="native encoder unavailable (no toolchain)")
class TestFastJson:
    def test_corpus_parity(self):
        for obj in CORPUS:
            got = json.loads(dumps_bytes(obj).decode())
            ref = json.loads(json.dumps(obj))
            if isinstance(obj, float) and obj != obj:
                assert got != got
                continue
            _cmp(ref, got)

    def test_query_response_shape(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(10, 128)).astype(np.float32)
        rows = [{"ID": int(i), "V": x[i].tolist(),
                 "@distance": float(np.float32(i) * 1.7)}
                for i in range(10)]
        payload = {"statusCode": 200, "message": "Query search successfully.",
                   "result": rows}
        got = json.loads(dumps_bytes(payload).decode())
        _cmp(json.loads(json.dumps(payload)), got)
        # every vector component survives as the same float32
        for i in range(10):
            np.testing.assert_array_equal(
                np.asarray(got["result"][i]["V"], dtype=np.float32), x[i])

    def test_separator_parity_exact_bytes(self):
        # Float-free payloads must be byte-identical to json.dumps.
        obj = {"statusCode": 200, "message": "ok",
               "result": ["a", 1, None, True, {"k": [2, 3]}]}
        assert dumps_bytes(obj) == json.dumps(obj).encode()

    def test_unsupported_type_falls_back(self):
        # np.float64 subclasses float -> not CheckExact in C -> stdlib path.
        assert json.loads(dumps_bytes({"x": np.float64(1.5)})) == {"x": 1.5}

    def test_non_str_keys_fall_back(self):
        # stdlib json stringifies int keys; the C encoder defers to it.
        assert json.loads(dumps_bytes({1: "a"})) == {"1": "a"}
