/* vdb_fastjson: C JSON encoder for the REST serving hot path.
 *
 * Role: replaces json.dumps on the response-encode path
 * (vectordb_tpu/rest/server.py). The reference engine serializes its
 * responses in compiled C++ (oatpp DTOs, web_controller.hpp); the
 * stdlib encoder's shortest-repr float formatting costs ~1.2 us/float,
 * which at 10 result rows x 128-d vectors is ~1.5 ms/request — the
 * measured 353-QPS single-core serving wall. %.9g snprintf preserves
 * float32-origin values exactly (9 significant digits round-trip
 * binary32) and runs ~15x faster; doubles that are not float32-exact
 * get %.17g (exact binary64 round-trip).
 *
 * Output parity with json.dumps defaults: ensure_ascii=True escaping,
 * ", " / ": " separators, NaN/Infinity/-Infinity literals. Containers
 * are dict/list/tuple; keys must be str. Any unsupported type raises
 * TypeError and the Python caller falls back to json.dumps.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    char *buf;
    Py_ssize_t len;
    Py_ssize_t cap;
} Writer;

static int w_reserve(Writer *w, Py_ssize_t extra) {
    if (w->len + extra <= w->cap) return 0;
    Py_ssize_t ncap = w->cap ? w->cap * 2 : 1024;
    while (ncap < w->len + extra) ncap *= 2;
    char *nbuf = (char *)PyMem_Realloc(w->buf, (size_t)ncap);
    if (!nbuf) { PyErr_NoMemory(); return -1; }
    w->buf = nbuf;
    w->cap = ncap;
    return 0;
}

static inline int w_put(Writer *w, const char *s, Py_ssize_t n) {
    if (w_reserve(w, n) < 0) return -1;
    memcpy(w->buf + w->len, s, (size_t)n);
    w->len += n;
    return 0;
}

static inline int w_putc(Writer *w, char c) {
    if (w_reserve(w, 1) < 0) return -1;
    w->buf[w->len++] = c;
    return 0;
}

static int write_double(Writer *w, double v) {
    char tmp[40];
    int n;
    if (v != v) return w_put(w, "NaN", 3);
    if (v == Py_HUGE_VAL) return w_put(w, "Infinity", 8);
    if (v == -Py_HUGE_VAL) return w_put(w, "-Infinity", 9);
    if ((double)(float)v == v)
        n = snprintf(tmp, sizeof tmp, "%.9g", v);
    else
        n = snprintf(tmp, sizeof tmp, "%.17g", v);
    /* JSON needs a fraction or exponent marker to parse back as float;
       json.dumps always emits one ("1.0"). Match it. */
    if (!memchr(tmp, '.', (size_t)n) && !memchr(tmp, 'e', (size_t)n)
        && !memchr(tmp, 'n', (size_t)n)) {  /* 'n' guards nan/inf (handled) */
        tmp[n++] = '.';
        tmp[n++] = '0';
    }
    return w_put(w, tmp, n);
}

static const char HEX[] = "0123456789abcdef";

static int write_str(Writer *w, PyObject *s) {
    if (PyUnicode_READY(s) < 0) return -1;
    Py_ssize_t n = PyUnicode_GET_LENGTH(s);
    int kind = PyUnicode_KIND(s);
    const void *data = PyUnicode_DATA(s);
    if (w_putc(w, '"') < 0) return -1;
    /* worst case per code point: 12 bytes (surrogate pair escapes) */
    if (w_reserve(w, n * 12 + 1) < 0) return -1;
    char *p = w->buf + w->len;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (c == '"' || c == '\\') { *p++ = '\\'; *p++ = (char)c; }
        else if (c >= 0x20 && c < 0x7f) *p++ = (char)c;
        else if (c == '\n') { *p++ = '\\'; *p++ = 'n'; }
        else if (c == '\t') { *p++ = '\\'; *p++ = 't'; }
        else if (c == '\r') { *p++ = '\\'; *p++ = 'r'; }
        else if (c == '\b') { *p++ = '\\'; *p++ = 'b'; }
        else if (c == '\f') { *p++ = '\\'; *p++ = 'f'; }
        else if (c < 0x10000) {  /* ensure_ascii \uXXXX */
            *p++ = '\\'; *p++ = 'u';
            *p++ = HEX[(c >> 12) & 0xf]; *p++ = HEX[(c >> 8) & 0xf];
            *p++ = HEX[(c >> 4) & 0xf]; *p++ = HEX[c & 0xf];
        } else {  /* surrogate pair, like json.dumps */
            Py_UCS4 v = c - 0x10000;
            Py_UCS4 hi = 0xd800 + (v >> 10), lo = 0xdc00 + (v & 0x3ff);
            *p++ = '\\'; *p++ = 'u';
            *p++ = HEX[(hi >> 12) & 0xf]; *p++ = HEX[(hi >> 8) & 0xf];
            *p++ = HEX[(hi >> 4) & 0xf]; *p++ = HEX[hi & 0xf];
            *p++ = '\\'; *p++ = 'u';
            *p++ = HEX[(lo >> 12) & 0xf]; *p++ = HEX[(lo >> 8) & 0xf];
            *p++ = HEX[(lo >> 4) & 0xf]; *p++ = HEX[lo & 0xf];
        }
    }
    w->len = p - w->buf;
    return w_putc(w, '"');
}

static int encode(Writer *w, PyObject *o, int depth) {
    if (depth > 200) {
        PyErr_SetString(PyExc_ValueError, "too deeply nested");
        return -1;
    }
    if (o == Py_None) return w_put(w, "null", 4);
    if (o == Py_True) return w_put(w, "true", 4);
    if (o == Py_False) return w_put(w, "false", 5);
    if (PyFloat_CheckExact(o)) return write_double(w, PyFloat_AS_DOUBLE(o));
    if (PyLong_CheckExact(o)) {
        int overflow = 0;
        long long v = PyLong_AsLongLongAndOverflow(o, &overflow);
        if (!overflow) {
            if (v == -1 && PyErr_Occurred()) return -1;
            char tmp[24];
            return w_put(w, tmp, snprintf(tmp, sizeof tmp, "%lld", v));
        }
        PyObject *s = PyObject_Str(o);  /* arbitrary-precision int */
        if (!s) return -1;
        Py_ssize_t sn;
        const char *sc = PyUnicode_AsUTF8AndSize(s, &sn);
        int rc = sc ? w_put(w, sc, sn) : -1;
        Py_DECREF(s);
        return rc;
    }
    if (PyUnicode_CheckExact(o)) return write_str(w, o);
    if (PyList_CheckExact(o) || PyTuple_CheckExact(o)) {
        Py_ssize_t n = PySequence_Fast_GET_SIZE(o);
        PyObject **items = PySequence_Fast_ITEMS(o);
        if (w_putc(w, '[') < 0) return -1;
        for (Py_ssize_t i = 0; i < n; i++) {
            if (i && w_put(w, ", ", 2) < 0) return -1;
            if (encode(w, items[i], depth + 1) < 0) return -1;
        }
        return w_putc(w, ']');
    }
    if (PyDict_CheckExact(o)) {
        Py_ssize_t pos = 0;
        PyObject *k, *v;
        int first = 1;
        if (w_putc(w, '{') < 0) return -1;
        while (PyDict_Next(o, &pos, &k, &v)) {
            if (!PyUnicode_CheckExact(k)) {
                PyErr_SetString(PyExc_TypeError, "non-str dict key");
                return -1;
            }
            if (!first && w_put(w, ", ", 2) < 0) return -1;
            first = 0;
            if (write_str(w, k) < 0) return -1;
            if (w_put(w, ": ", 2) < 0) return -1;
            if (encode(w, v, depth + 1) < 0) return -1;
        }
        return w_putc(w, '}');
    }
    PyErr_Format(PyExc_TypeError, "vdb_fastjson: unsupported type %s",
                 Py_TYPE(o)->tp_name);
    return -1;
}

/* dumps_rows(names, kinds, cols, distances) -> bytes
 *
 * Columnar row-object encoder for the query hot path: emits the JSON
 * array of row objects DIRECTLY from column buffers, skipping the
 * per-row dict assembly in Table.project (measured ~0.3 ms per
 * 10x128-d response) plus the generic dict walk above. The reference
 * engine serializes from compiled C++ DTOs (web_controller.hpp) — this
 * is the TPU engine's equivalent.
 *
 *   names:     sequence of str field names (JSON-escaped here)
 *   kinds:     str, one char per field:
 *                i = int64 buffer [m]      f = float64 buffer [m]
 *                b = uint8/bool buffer [m] v = float32 buffer [m, d]
 *                s = list of str/None      o = list of arbitrary objects
 *   cols:      sequence of column objects matching kinds
 *   distances: float64 buffer [m] appended as "@distance", or None
 */
static PyObject *fastjson_dumps_rows(PyObject *self, PyObject *args) {
    (void)self;
    PyObject *names, *kinds_o, *cols, *dists;
    if (!PyArg_ParseTuple(args, "OOOO", &names, &kinds_o, &cols, &dists))
        return NULL;
    Py_ssize_t nf = PySequence_Size(names);
    const char *kinds = PyUnicode_AsUTF8(kinds_o);
    if (nf < 0 || !kinds || (Py_ssize_t)strlen(kinds) != nf
        || PySequence_Size(cols) != nf) {
        PyErr_SetString(PyExc_TypeError, "dumps_rows: bad arguments");
        return NULL;
    }

    Py_buffer bufs[64];
    PyObject *objs[64];
    int have_buf[64];
    Py_ssize_t m = -1;
    Writer w = {NULL, 0, 0};
    Py_buffer dbuf;
    int have_dbuf = 0;
    Py_ssize_t ngot = 0;
    if (nf > 64) {
        PyErr_SetString(PyExc_TypeError, "dumps_rows: too many fields");
        return NULL;
    }
    for (Py_ssize_t j = 0; j < nf; j++) {
        objs[j] = PySequence_GetItem(cols, j);  /* new ref */
        if (!objs[j]) goto fail;
        ngot = j + 1;
        have_buf[j] = 0;
        char k = kinds[j];
        if (k == 'i' || k == 'f' || k == 'b' || k == 'v') {
            if (PyObject_GetBuffer(objs[j], &bufs[j],
                                   PyBUF_C_CONTIGUOUS | PyBUF_ND) < 0)
                goto fail;
            have_buf[j] = 1;
            Py_ssize_t rows = bufs[j].ndim > 0 ? bufs[j].shape[0] : 0;
            Py_ssize_t isz = (k == 'i' || k == 'f') ? 8
                             : (k == 'b' ? 1 : 4);
            if (bufs[j].itemsize != isz
                || (k == 'v' ? bufs[j].ndim != 2 : bufs[j].ndim != 1)) {
                PyErr_SetString(PyExc_TypeError,
                                "dumps_rows: column buffer shape/itemsize");
                goto fail;
            }
            if (m < 0) m = rows;
            else if (rows != m) {
                PyErr_SetString(PyExc_TypeError,
                                "dumps_rows: ragged columns");
                goto fail;
            }
        } else if (k == 's' || k == 'o') {
            Py_ssize_t rows = PySequence_Size(objs[j]);
            if (rows < 0) goto fail;
            if (m < 0) m = rows;
            else if (rows != m) {
                PyErr_SetString(PyExc_TypeError,
                                "dumps_rows: ragged columns");
                goto fail;
            }
        } else {
            PyErr_SetString(PyExc_TypeError, "dumps_rows: unknown kind");
            goto fail;
        }
    }
    if (m < 0) m = 0;
    if (dists != Py_None) {
        if (PyObject_GetBuffer(dists, &dbuf,
                               PyBUF_C_CONTIGUOUS | PyBUF_ND) < 0)
            goto fail;
        have_dbuf = 1;
        if (dbuf.itemsize != 8 || dbuf.ndim != 1 || dbuf.shape[0] < m) {
            PyErr_SetString(PyExc_TypeError, "dumps_rows: bad distances");
            goto fail;
        }
    }

    if (w_putc(&w, '[') < 0) goto fail;
    for (Py_ssize_t r = 0; r < m; r++) {
        if (r && w_put(&w, ", ", 2) < 0) goto fail;
        if (w_putc(&w, '{') < 0) goto fail;
        for (Py_ssize_t j = 0; j < nf; j++) {
            if (j && w_put(&w, ", ", 2) < 0) goto fail;
            PyObject *nm = PySequence_GetItem(names, j);
            if (!nm) goto fail;
            int rc = write_str(&w, nm);
            Py_DECREF(nm);
            if (rc < 0 || w_put(&w, ": ", 2) < 0) goto fail;
            char k = kinds[j];
            if (k == 'i') {
                char tmp[24];
                long long v = ((int64_t *)bufs[j].buf)[r];
                if (w_put(&w, tmp,
                          snprintf(tmp, sizeof tmp, "%lld", v)) < 0)
                    goto fail;
            } else if (k == 'f') {
                if (write_double(&w, ((double *)bufs[j].buf)[r]) < 0)
                    goto fail;
            } else if (k == 'b') {
                uint8_t v = ((uint8_t *)bufs[j].buf)[r];
                if (w_put(&w, v ? "true" : "false", v ? 4 : 5) < 0)
                    goto fail;
            } else if (k == 'v') {
                Py_ssize_t d = bufs[j].shape[1];
                const float *row = (const float *)bufs[j].buf + r * d;
                if (w_putc(&w, '[') < 0) goto fail;
                for (Py_ssize_t c = 0; c < d; c++) {
                    if (c && w_put(&w, ", ", 2) < 0) goto fail;
                    if (write_double(&w, (double)row[c]) < 0) goto fail;
                }
                if (w_putc(&w, ']') < 0) goto fail;
            } else {  /* 's' or 'o' */
                PyObject *v = PySequence_GetItem(objs[j], r);
                if (!v) goto fail;
                int rc2 = encode(&w, v, 0);
                Py_DECREF(v);
                if (rc2 < 0) goto fail;
            }
        }
        if (have_dbuf) {
            if (m > 0 && nf > 0 && w_put(&w, ", ", 2) < 0) goto fail;
            if (w_put(&w, "\"@distance\": ", 13) < 0) goto fail;
            if (write_double(&w, ((double *)dbuf.buf)[r]) < 0) goto fail;
        }
        if (w_putc(&w, '}') < 0) goto fail;
    }
    if (w_putc(&w, ']') < 0) goto fail;

    {
        PyObject *out = PyBytes_FromStringAndSize(w.buf, w.len);
        PyMem_Free(w.buf);
        for (Py_ssize_t j = 0; j < ngot; j++) {
            if (have_buf[j]) PyBuffer_Release(&bufs[j]);
            Py_DECREF(objs[j]);
        }
        if (have_dbuf) PyBuffer_Release(&dbuf);
        return out;
    }
fail:
    PyMem_Free(w.buf);
    for (Py_ssize_t j = 0; j < ngot; j++) {
        if (have_buf[j]) PyBuffer_Release(&bufs[j]);
        Py_DECREF(objs[j]);
    }
    if (have_dbuf) PyBuffer_Release(&dbuf);
    return NULL;
}

static PyObject *fastjson_dumps(PyObject *self, PyObject *arg) {
    (void)self;
    Writer w = {NULL, 0, 0};
    if (encode(&w, arg, 0) < 0) {
        PyMem_Free(w.buf);
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(w.buf, w.len);
    PyMem_Free(w.buf);
    return out;
}

static PyMethodDef Methods[] = {
    {"dumps", fastjson_dumps, METH_O,
     "Encode a Python object tree to JSON bytes (ensure_ascii semantics)."},
    {"dumps_rows", fastjson_dumps_rows, METH_VARARGS,
     "Encode row objects directly from column buffers (query hot path)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "vdb_fastjson",
    "Native JSON encoder for the REST serving hot path.", -1, Methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_vdb_fastjson(void) {
    return PyModule_Create(&moduledef);
}
