// Native episode-drain kernel (CPython extension).
//
// The host side of the rollout pipeline reassembles variable-length episode
// trajectories from fixed-shape [T, N] device chunks (see
// tpu_plume/train/ppo_trainer.py EpisodeAssembler).  The pure-NumPy version
// loops over T chunk steps from Python; at 4096 envs that Python loop
// becomes a per-iteration host tax that competes with device dispatch.  This
// module is the native runtime equivalent: one C++ pass over the chunk,
// scattering (x, y, conc) into per-env episode buffers and reporting the
// (env, step_count, t_index) of every completed episode.
//
// The reference project has no native layer at all (SURVEY.md §0) — its
// equivalent logic is the per-step Python trajectory accounting in
// PPOV2.0/train_ppo2.0.py:166-199.
//
// Build: python -m tpu_plume.native.build   (uses setuptools + g++)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <vector>

namespace {

struct Array {
  char *data;
  Py_ssize_t shape[3];
  Py_ssize_t strides[3];
  int ndim;
  Py_buffer view;
  bool ok;
};

bool get_buffer(PyObject *obj, Array *arr, const char *format, int ndim,
                bool writable) {
  int flags = PyBUF_STRIDED_RO | PyBUF_FORMAT;
  if (writable) flags = PyBUF_STRIDED | PyBUF_FORMAT;
  if (PyObject_GetBuffer(obj, &arr->view, flags) != 0) return false;
  arr->ok = true;
  if (arr->view.ndim != ndim) {
    PyErr_Format(PyExc_ValueError, "expected %d-d array, got %d-d", ndim,
                 arr->view.ndim);
    return false;
  }
  if (format && (!arr->view.format || arr->view.format[0] != format[0])) {
    PyErr_Format(PyExc_ValueError, "expected dtype format '%s', got '%s'",
                 format, arr->view.format ? arr->view.format : "?");
    return false;
  }
  arr->data = static_cast<char *>(arr->view.buf);
  arr->ndim = arr->view.ndim;
  for (int i = 0; i < ndim; i++) {
    arr->shape[i] = arr->view.shape[i];
    arr->strides[i] = arr->view.strides[i];
  }
  return true;
}

inline float load_f32(const Array &a, Py_ssize_t i, Py_ssize_t j) {
  return *reinterpret_cast<float *>(a.data + i * a.strides[0] +
                                    j * a.strides[1]);
}
inline float load_f32_3(const Array &a, Py_ssize_t i, Py_ssize_t j,
                        Py_ssize_t k) {
  return *reinterpret_cast<float *>(a.data + i * a.strides[0] +
                                    j * a.strides[1] + k * a.strides[2]);
}
inline int32_t load_i32(const Array &a, Py_ssize_t i, Py_ssize_t j) {
  return *reinterpret_cast<int32_t *>(a.data + i * a.strides[0] +
                                      j * a.strides[1]);
}
inline bool load_bool(const Array &a, Py_ssize_t i, Py_ssize_t j) {
  return *reinterpret_cast<uint8_t *>(a.data + i * a.strides[0] +
                                      j * a.strides[1]) != 0;
}
inline float *f32_ptr(const Array &a, Py_ssize_t i, Py_ssize_t j) {
  return reinterpret_cast<float *>(a.data + i * a.strides[0] +
                                   j * a.strides[1]);
}

// scatter_chunk(xbuf, ybuf, cbuf, pos, conc, done, steps)
//   -> list[(env, n_steps, t, x_bytes, y_bytes, c_bytes)]
//   xbuf/ybuf/cbuf : f32[N, max_steps]   (written in place)
//   pos            : f32[T, N, 2]
//   conc           : f32[T, N]
//   done           : bool[T, N]
//   steps          : i32[T, N]  (1-based episode step index at chunk step t)
PyObject *scatter_chunk(PyObject *, PyObject *args) {
  PyObject *o_x, *o_y, *o_c, *o_pos, *o_conc, *o_done, *o_steps;
  if (!PyArg_ParseTuple(args, "OOOOOOO", &o_x, &o_y, &o_c, &o_pos, &o_conc,
                        &o_done, &o_steps))
    return nullptr;

  Array x{}, y{}, c{}, pos{}, conc{}, done{}, steps{};
  PyObject *result = nullptr;
  bool parsed = get_buffer(o_x, &x, "f", 2, true) &&
                get_buffer(o_y, &y, "f", 2, true) &&
                get_buffer(o_c, &c, "f", 2, true) &&
                get_buffer(o_pos, &pos, "f", 3, false) &&
                get_buffer(o_conc, &conc, "f", 2, false) &&
                get_buffer(o_done, &done, nullptr, 2, false) &&
                get_buffer(o_steps, &steps, "i", 2, false);

  if (parsed) {
    const Py_ssize_t T = pos.shape[0];
    const Py_ssize_t N = pos.shape[1];
    const Py_ssize_t max_steps = x.shape[1];

    // Completed episodes are copied out at the chunk step where they end —
    // their successor episode reuses the same buffer rows later in the
    // chunk, so extraction cannot be deferred to after the scatter.
    struct Episode {
      Py_ssize_t env;
      int32_t n_steps;
      Py_ssize_t t;
      std::vector<float> xs, ys, cs;
    };
    std::vector<Episode> completed;
    completed.reserve(64);

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t t = 0; t < T; t++) {
      for (Py_ssize_t n = 0; n < N; n++) {
        int32_t s = load_i32(steps, t, n);
        Py_ssize_t idx = s - 1;
        if (idx < 0) idx = 0;
        if (idx >= max_steps) idx = max_steps - 1;
        *f32_ptr(x, n, idx) = load_f32_3(pos, t, n, 0);
        *f32_ptr(y, n, idx) = load_f32_3(pos, t, n, 1);
        *f32_ptr(c, n, idx) = load_f32(conc, t, n);
        if (load_bool(done, t, n)) {
          Episode ep;
          ep.env = n;
          ep.n_steps = s;
          ep.t = t;
          Py_ssize_t len = s;
          if (len > max_steps) len = max_steps;
          ep.xs.resize(len);
          ep.ys.resize(len);
          ep.cs.resize(len);
          for (Py_ssize_t j = 0; j < len; j++) {
            ep.xs[j] = *f32_ptr(x, n, j);
            ep.ys[j] = *f32_ptr(y, n, j);
            ep.cs[j] = *f32_ptr(c, n, j);
          }
          completed.push_back(std::move(ep));
        }
      }
    }
    Py_END_ALLOW_THREADS

    result = PyList_New(static_cast<Py_ssize_t>(completed.size()));
    if (result) {
      for (size_t i = 0; i < completed.size(); i++) {
        const Episode &ep = completed[i];
        const Py_ssize_t nbytes =
            static_cast<Py_ssize_t>(ep.xs.size() * sizeof(float));
        PyObject *tup = Py_BuildValue(
            "(niny#y#y#)", ep.env, ep.n_steps, ep.t,
            reinterpret_cast<const char *>(ep.xs.data()), nbytes,
            reinterpret_cast<const char *>(ep.ys.data()), nbytes,
            reinterpret_cast<const char *>(ep.cs.data()), nbytes);
        if (!tup) {
          Py_CLEAR(result);
          break;
        }
        PyList_SET_ITEM(result, static_cast<Py_ssize_t>(i), tup);
      }
    }
  }

  for (Array *a : {&x, &y, &c, &pos, &conc, &done, &steps})
    if (a->ok) PyBuffer_Release(&a->view);
  return result;
}

PyMethodDef methods[] = {
    {"scatter_chunk", scatter_chunk, METH_VARARGS,
     "Scatter a [T, N] rollout chunk into per-env episode buffers; returns "
     "[(env, n_steps, t), ...] for completed episodes."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_drain",
                      "Native episode-drain kernels for tpu-plume", -1,
                      methods};

}  // namespace

PyMODINIT_FUNC PyInit__drain(void) { return PyModule_Create(&module); }
