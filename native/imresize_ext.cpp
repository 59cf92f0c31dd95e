// Native host-side resize kernel for the data loader hot path.
//
// The MATLAB-bicubic degradation (data/imresize.py) runs per training
// item on the host; this CPython extension applies the precomputed
// per-dimension (weights, indices) tables with multithreaded C++ loops,
// replacing the numpy gather+reduce (2-4x on typical HSI crops).
// Python-side entry: hsi_dmgasr_tpu.data.imresize (falls back to numpy
// when the extension is not built).
//
// Contract: resize_along_dim(src, weights, indices, dim) with
//   src      float32/float64 C-contiguous (H, W, C)
//   weights  float64 (out, P)
//   indices  int64   (out, P)
//   dim      0 (rows) or 1 (cols)
// returns float64 (out, W, C) or (H, out, C).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Array {
  const char* data;
  Py_ssize_t shape[3];
  Py_ssize_t strides[3];
  int ndim;
  char kind;      // 'f' float
  int itemsize;
  Py_buffer view;
};

bool get_buffer(PyObject* obj, Array* out, int ndim) {
  if (PyObject_GetBuffer(obj, &out->view,
                         PyBUF_RECORDS_RO | PyBUF_C_CONTIGUOUS) != 0) {
    return false;
  }
  if (out->view.ndim != ndim) {
    PyBuffer_Release(&out->view);
    PyErr_SetString(PyExc_ValueError, "unexpected ndim");
    return false;
  }
  out->data = static_cast<const char*>(out->view.buf);
  out->ndim = out->view.ndim;
  out->itemsize = static_cast<int>(out->view.itemsize);
  out->kind = out->view.format ? out->view.format[0] : 'B';
  for (int i = 0; i < ndim; i++) {
    out->shape[i] = out->view.shape[i];
    out->strides[i] = out->view.strides[i];
  }
  return true;
}

template <typename T>
void resize_rows(const T* src, Py_ssize_t H, Py_ssize_t WC,
                 const double* w, const int64_t* idx, Py_ssize_t out_len,
                 Py_ssize_t P, double* dst, int n_threads) {
  auto work = [&](Py_ssize_t lo, Py_ssize_t hi) {
    for (Py_ssize_t o = lo; o < hi; o++) {
      double* drow = dst + o * WC;
      std::memset(drow, 0, sizeof(double) * WC);
      for (Py_ssize_t p = 0; p < P; p++) {
        const double wv = w[o * P + p];
        if (wv == 0.0) continue;
        const T* srow = src + idx[o * P + p] * WC;
        for (Py_ssize_t j = 0; j < WC; j++) drow[j] += wv * srow[j];
      }
    }
  };
  std::vector<std::thread> ts;
  Py_ssize_t chunk = (out_len + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    Py_ssize_t lo = t * chunk, hi = std::min<Py_ssize_t>(out_len, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& th : ts) th.join();
}

template <typename T>
void resize_cols(const T* src, Py_ssize_t H, Py_ssize_t W, Py_ssize_t C,
                 const double* w, const int64_t* idx, Py_ssize_t out_len,
                 Py_ssize_t P, double* dst, int n_threads) {
  auto work = [&](Py_ssize_t lo, Py_ssize_t hi) {
    for (Py_ssize_t i = lo; i < hi; i++) {
      const T* srow = src + i * W * C;
      double* drow = dst + i * out_len * C;
      std::memset(drow, 0, sizeof(double) * out_len * C);
      for (Py_ssize_t o = 0; o < out_len; o++) {
        double* dpix = drow + o * C;
        for (Py_ssize_t p = 0; p < P; p++) {
          const double wv = w[o * P + p];
          if (wv == 0.0) continue;
          const T* spix = srow + idx[o * P + p] * C;
          for (Py_ssize_t c = 0; c < C; c++) dpix[c] += wv * spix[c];
        }
      }
    }
  };
  std::vector<std::thread> ts;
  Py_ssize_t chunk = (H + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    Py_ssize_t lo = t * chunk, hi = std::min<Py_ssize_t>(H, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& th : ts) th.join();
}

PyObject* resize_along_dim(PyObject*, PyObject* args) {
  PyObject *src_o, *w_o, *idx_o;
  int dim;
  int n_threads = 4;
  if (!PyArg_ParseTuple(args, "OOOi|i", &src_o, &w_o, &idx_o, &dim,
                        &n_threads)) {
    return nullptr;
  }
  Array src{}, w{}, idx{};
  if (!get_buffer(src_o, &src, 3)) return nullptr;
  if (!get_buffer(w_o, &w, 2)) {
    PyBuffer_Release(&src.view);
    return nullptr;
  }
  if (!get_buffer(idx_o, &idx, 2)) {
    PyBuffer_Release(&src.view);
    PyBuffer_Release(&w.view);
    return nullptr;
  }

  const Py_ssize_t H = src.shape[0], W = src.shape[1], C = src.shape[2];
  const Py_ssize_t out_len = w.shape[0], P = w.shape[1];
  const bool is_f32 = (src.kind == 'f' && src.itemsize == 4);
  const bool is_f64 = (src.kind == 'd' || (src.kind == 'f' && src.itemsize == 8));
  PyObject* result = nullptr;

  if ((!is_f32 && !is_f64) || w.itemsize != 8 || idx.itemsize != 8) {
    PyErr_SetString(PyExc_TypeError,
                    "src must be float32/float64; weights float64; "
                    "indices int64");
  } else if (dim != 0 && dim != 1) {
    PyErr_SetString(PyExc_ValueError, "dim must be 0 or 1");
  } else {
    const Py_ssize_t oh = dim == 0 ? out_len : H;
    const Py_ssize_t ow = dim == 0 ? W : out_len;
    Py_ssize_t n_out = oh * ow * C;
    result = PyByteArray_FromStringAndSize(nullptr, n_out * 8);
    if (result != nullptr) {
      double* dst = reinterpret_cast<double*>(PyByteArray_AsString(result));
      const double* wp = reinterpret_cast<const double*>(w.data);
      const int64_t* ip = reinterpret_cast<const int64_t*>(idx.data);
      Py_BEGIN_ALLOW_THREADS
      if (dim == 0) {
        if (is_f32)
          resize_rows(reinterpret_cast<const float*>(src.data), H, W * C, wp,
                      ip, out_len, P, dst, n_threads);
        else
          resize_rows(reinterpret_cast<const double*>(src.data), H, W * C, wp,
                      ip, out_len, P, dst, n_threads);
      } else {
        if (is_f32)
          resize_cols(reinterpret_cast<const float*>(src.data), H, W, C, wp,
                      ip, out_len, P, dst, n_threads);
        else
          resize_cols(reinterpret_cast<const double*>(src.data), H, W, C, wp,
                      ip, out_len, P, dst, n_threads);
      }
      Py_END_ALLOW_THREADS
    }
  }

  PyBuffer_Release(&src.view);
  PyBuffer_Release(&w.view);
  PyBuffer_Release(&idx.view);
  return result;
}

PyMethodDef methods[] = {
    {"resize_along_dim", resize_along_dim, METH_VARARGS,
     "apply one dimension's (weights, indices) resize tables"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_imresize_native", nullptr, -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__imresize_native(void) {
  return PyModule_Create(&moduledef);
}
