/* _tpbfast: CPython fastcall bindings for the single-block frame hot path.
 *
 * The ctypes crossing costs ~2-3 us per call in argument marshalling plus
 * a staging memmove and a second allocation — measurable against the
 * ~9 us C-side cost of the reference's own 100 KB benchmark config
 * (blosc_test.go:363-413).  This module is a METH_FASTCALL front door to
 * the same tpb_* entry points (linked against libtpublosc.so, rpath
 * $ORIGIN): one Python call, one C call, one PyBytes allocation.
 *
 * Falls back transparently: native/backend.py only imports this module
 * when it built successfully; everything below is also reachable via the
 * ctypes path (oracle-equality tests run both).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* entry points from tpublosc.cpp (extern "C" there) */
extern int64_t tpb_compress_frame(const uint8_t *src, int64_t n, int ts,
                                  int shuffle_mode, int header_codec_id,
                                  int codec, int depth, uint8_t *dst);
extern int64_t tpb_decompress_block_into(const uint8_t *frame,
                                         int64_t payload_off, int64_t psize,
                                         uint8_t *out, int64_t n, int ts,
                                         int shuffle_mode, int codec);

/* per-thread staging buffer for compressed output (bound-sized, reused) */
static _Thread_local uint8_t *stage = NULL;
static _Thread_local int64_t stage_cap = 0;

static uint8_t *get_stage(int64_t need) {
  if (stage_cap < need) {
    int64_t cap = need < (1 << 17) ? (1 << 17) : need;
    uint8_t *nb = (uint8_t *)realloc(stage, (size_t)cap);
    if (!nb) return NULL;
    stage = nb;
    stage_cap = cap;
  }
  return stage;
}

/* compress_frame(data: bytes-like, type_size, shuffle_mode, header_codec,
 *                native_codec, depth) -> bytes (complete frame)
 * Raises RuntimeError on negative native status (parity with
 * backend.compress_frame). */
static PyObject *fast_compress_frame(PyObject *self, PyObject *const *args,
                                     Py_ssize_t nargs) {
  (void)self;
  if (nargs != 6) {
    PyErr_SetString(PyExc_TypeError, "compress_frame expects 6 arguments");
    return NULL;
  }
  Py_buffer view;
  if (PyObject_GetBuffer(args[0], &view, PyBUF_SIMPLE) < 0) return NULL;
  long ts = PyLong_AsLong(args[1]);
  long shuf = PyLong_AsLong(args[2]);
  long hdr_codec = PyLong_AsLong(args[3]);
  long codec = PyLong_AsLong(args[4]);
  long depth = PyLong_AsLong(args[5]);
  if (PyErr_Occurred()) {
    PyBuffer_Release(&view);
    return NULL;
  }
  int64_t n = (int64_t)view.len;
  /* same conservative universal bound as backend._universal_bound */
  uint8_t *dst = get_stage(16 + n + (n >> 2) + 1024);
  if (!dst) {
    PyBuffer_Release(&view);
    return PyErr_NoMemory();
  }
  int64_t total;
  Py_BEGIN_ALLOW_THREADS;
  total = tpb_compress_frame((const uint8_t *)view.buf, n, (int)ts, (int)shuf,
                             (int)hdr_codec, (int)codec, (int)depth, dst);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  if (total < 0) {
    PyErr_Format(PyExc_RuntimeError, "native compress_frame failed (%lld)",
                 (long long)total);
    return NULL;
  }
  return PyBytes_FromStringAndSize((const char *)dst, (Py_ssize_t)total);
}

/* decompress_frame(data, payload_off, psize, nbytes_orig, type_size,
 *                  shuffle_mode, native_codec) -> bytes | int
 * Returns the decoded bytes on success; on failure returns the native
 * status (int) — the cold error path maps codes to typed exceptions in
 * Python where the error strings live. */
static PyObject *fast_decompress_frame(PyObject *self, PyObject *const *args,
                                       Py_ssize_t nargs) {
  (void)self;
  if (nargs != 7) {
    PyErr_SetString(PyExc_TypeError, "decompress_frame expects 7 arguments");
    return NULL;
  }
  Py_buffer view;
  if (PyObject_GetBuffer(args[0], &view, PyBUF_SIMPLE) < 0) return NULL;
  long long off = PyLong_AsLongLong(args[1]);
  long long psize = PyLong_AsLongLong(args[2]);
  long long n = PyLong_AsLongLong(args[3]);
  long ts = PyLong_AsLong(args[4]);
  long shuf = PyLong_AsLong(args[5]);
  long codec = PyLong_AsLong(args[6]);
  if (PyErr_Occurred() || n < 0 || off < 0 || psize < 0 ||
      off + psize > (long long)view.len) {
    PyBuffer_Release(&view);
    if (!PyErr_Occurred())
      PyErr_SetString(PyExc_ValueError, "payload out of range");
    return NULL;
  }
  PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)n);
  if (!out) {
    PyBuffer_Release(&view);
    return NULL;
  }
  int64_t got;
  Py_BEGIN_ALLOW_THREADS;
  got = tpb_decompress_block_into((const uint8_t *)view.buf, off, psize,
                                  (uint8_t *)PyBytes_AS_STRING(out), n,
                                  (int)ts, (int)shuf, (int)codec);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  if (got == n) return out;
  Py_DECREF(out);
  return PyLong_FromLongLong((long long)got);
}

static PyMethodDef methods[] = {
    {"compress_frame", (PyCFunction)(void (*)(void))fast_compress_frame,
     METH_FASTCALL, "single-shot frame compress"},
    {"decompress_frame", (PyCFunction)(void (*)(void))fast_decompress_frame,
     METH_FASTCALL, "single-shot frame decompress"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_tpbfast", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__tpbfast(void) { return PyModule_Create(&moduledef); }
