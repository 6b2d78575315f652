// C ABI implementation: embeds CPython and forwards to the sassy_tpu
// package (the reference exposes the same surface from its Rust cdylib,
// /root/reference/src/c.rs:52-131).
//
// Thread-safety: calls are serialized through the CPython GIL.

#include "sassy_tpu.h"

#include <Python.h>

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <mutex>

namespace {

std::once_flag g_init_once;
bool g_owns_interp = false;

void ensure_python() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      g_owns_interp = true;
    }
  });
}

// Holds the Python Searcher instance.
struct Guard {
  PyGILState_STATE st;
  Guard() : st(PyGILState_Ensure()) {}
  ~Guard() { PyGILState_Release(st); }
};

}  // namespace

struct sassy_searcher {
  PyObject *obj;  // sassy_tpu.Searcher
};

extern "C" sassy_searcher_t *sassy_searcher(const char *alphabet, int rc,
                                            double alpha) {
  ensure_python();
  Guard g;
  PyObject *mod = PyImport_ImportModule("sassy_tpu");
  if (!mod) {
    PyErr_Print();
    return nullptr;
  }
  PyObject *cls = PyObject_GetAttrString(mod, "Searcher");
  Py_DECREF(mod);
  if (!cls) {
    PyErr_Print();
    return nullptr;
  }
  PyObject *args = Py_BuildValue("(s)", alphabet);
  PyObject *kw = PyDict_New();
  PyDict_SetItemString(kw, "rc", rc ? Py_True : Py_False);
  if (!std::isnan(alpha)) {
    PyObject *a = PyFloat_FromDouble(alpha);
    PyDict_SetItemString(kw, "alpha", a);
    Py_DECREF(a);
  }
  PyObject *inst = PyObject_Call(cls, args, kw);
  Py_DECREF(cls);
  Py_DECREF(args);
  Py_DECREF(kw);
  if (!inst) {
    PyErr_Print();
    return nullptr;
  }
  auto *s = static_cast<sassy_searcher_t *>(malloc(sizeof(sassy_searcher_t)));
  s->obj = inst;
  return s;
}

extern "C" size_t sassy_search(sassy_searcher_t *searcher,
                               const uint8_t *pattern, size_t pattern_len,
                               const uint8_t *text, size_t text_len, size_t k,
                               sassy_match_t **out) {
  if (!searcher || !out) return (size_t)-1;
  Guard g;
  PyObject *pat = PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(pattern), (Py_ssize_t)pattern_len);
  PyObject *txt = PyBytes_FromStringAndSize(
      reinterpret_cast<const char *>(text), (Py_ssize_t)text_len);
  PyObject *res = PyObject_CallMethod(searcher->obj, "search", "OOn", pat, txt,
                                      (Py_ssize_t)k);
  Py_DECREF(pat);
  Py_DECREF(txt);
  if (!res) {
    PyErr_Print();
    return (size_t)-1;
  }
  Py_ssize_t n = PyList_Size(res);
  auto *arr = static_cast<sassy_match_t *>(
      malloc(sizeof(sassy_match_t) * (n > 0 ? n : 1)));
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject *m = PyList_GetItem(res, i);  // borrowed
    auto geti = [&](const char *name) -> long long {
      PyObject *v = PyObject_GetAttrString(m, name);
      long long x = v ? PyLong_AsLongLong(v) : 0;
      Py_XDECREF(v);
      return x;
    };
    arr[i].text_start = (size_t)geti("text_start");
    arr[i].text_end = (size_t)geti("text_end");
    arr[i].pattern_start = (size_t)geti("pattern_start");
    arr[i].pattern_end = (size_t)geti("pattern_end");
    arr[i].cost = (int32_t)geti("cost");
    arr[i].strand = (uint8_t)geti("strand");
  }
  Py_DECREF(res);
  *out = arr;
  return (size_t)n;
}

extern "C" void sassy_matches_free(sassy_match_t *matches, size_t n) {
  (void)n;
  free(matches);
}

extern "C" void sassy_searcher_free(sassy_searcher_t *searcher) {
  if (!searcher) return;
  {
    Guard g;
    Py_XDECREF(searcher->obj);
  }
  free(searcher);
}
