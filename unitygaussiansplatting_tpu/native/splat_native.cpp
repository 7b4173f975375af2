// Native import-pipeline kernels for the splat asset creator.
//
// The TPU-native equivalent of the reference's Burst-compiled (AOT native,
// AVX/NEON) import jobs (SURVEY.md §2.3): the pieces of asset creation that
// stay on the host CPU and are hot at multi-million-splat scale —
// 3D Morton encoding (package/Runtime/GaussianUtils.cs:79-95), the Morton
// argsort that reorders splats for chunk locality
// (package/Editor/GaussianSplatAssetCreator.cs:384-429), and the per-chunk
// min/max statistics pass (GaussianSplatAssetCreator.cs:520-658).
//
// Exposed as a CPython extension (no pybind11 in this image); NumPy arrays
// come in through the buffer protocol.  Python callers fall back to the
// NumPy implementations in ops/morton.py when the extension is not built
// (see native/__init__.py for the on-demand g++ build).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Insert two zero bits after each of the 21 low bits (GaussianUtils.cs:81-90).
inline uint64_t part1by2(uint64_t x) {
  x &= 0x1fffff;
  x = (x ^ (x << 32)) & 0x1f00000000ffffULL;
  x = (x ^ (x << 16)) & 0x1f0000ff0000ffULL;
  x = (x ^ (x << 8)) & 0x100f00f00f00f00fULL;
  x = (x ^ (x << 4)) & 0x10c30c30c30c30c3ULL;
  x = (x ^ (x << 2)) & 0x1249249249249249ULL;
  return x;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t grain = (n + hw - 1) / hw;
  if (grain < 16384 || hw == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  for (int64_t lo = 0; lo < n; lo += grain) {
    int64_t hi = std::min(n, lo + grain);
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& t : threads) t.join();
}

// morton_codes(pos float32 (N,3) C-contiguous, bmin float3, bmax float3)
//   -> bytes holding uint64[N]
PyObject* morton_codes(PyObject*, PyObject* args) {
  Py_buffer pos;
  float bmin[3], bmax[3];
  if (!PyArg_ParseTuple(args, "y*(fff)(fff)", &pos, &bmin[0], &bmin[1],
                        &bmin[2], &bmax[0], &bmax[1], &bmax[2]))
    return nullptr;
  const int64_t n = pos.len / (3 * (int64_t)sizeof(float));
  const float* p = static_cast<const float*>(pos.buf);

  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * sizeof(uint64_t));
  if (!out) {
    PyBuffer_Release(&pos);
    return nullptr;
  }
  uint64_t* codes = reinterpret_cast<uint64_t*>(PyBytes_AS_STRING(out));

  float scale[3];
  const float kMax = 2097151.0f;  // 2^21 - 1
  for (int i = 0; i < 3; ++i) {
    float ext = bmax[i] - bmin[i];
    scale[i] = ext > 1e-12f ? kMax / ext : 0.0f;
  }

  Py_BEGIN_ALLOW_THREADS;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t c[3];
      for (int d = 0; d < 3; ++d) {
        float v = (p[i * 3 + d] - bmin[d]) * scale[d];
        v = v < 0.0f ? 0.0f : (v > kMax ? kMax : v);
        c[d] = (uint64_t)v;
      }
      codes[i] = (part1by2(c[2]) << 2) | (part1by2(c[1]) << 1) | part1by2(c[0]);
    }
  });
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&pos);
  return out;
}

// radix_argsort_u64(codes uint64 (N,)) -> bytes holding int64[N] permutation
// LSD radix, 8 passes of 8 bits, with per-thread histogram accumulation.
PyObject* radix_argsort_u64(PyObject*, PyObject* args) {
  Py_buffer keys_buf;
  if (!PyArg_ParseTuple(args, "y*", &keys_buf)) return nullptr;
  const int64_t n = keys_buf.len / (int64_t)sizeof(uint64_t);
  const uint64_t* keys_in = static_cast<const uint64_t*>(keys_buf.buf);

  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * sizeof(int64_t));
  if (!out) {
    PyBuffer_Release(&keys_buf);
    return nullptr;
  }
  int64_t* perm_out = reinterpret_cast<int64_t*>(PyBytes_AS_STRING(out));

  Py_BEGIN_ALLOW_THREADS;
  std::vector<uint64_t> k0(keys_in, keys_in + n), k1(n);
  std::vector<int64_t> p0(n), p1(n);
  for (int64_t i = 0; i < n; ++i) p0[i] = i;

  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    size_t hist[257] = {0};
    for (int64_t i = 0; i < n; ++i) hist[((k0[i] >> shift) & 0xFF) + 1]++;
    for (int b = 0; b < 256; ++b) hist[b + 1] += hist[b];
    for (int64_t i = 0; i < n; ++i) {
      size_t dst = hist[(k0[i] >> shift) & 0xFF]++;
      k1[dst] = k0[i];
      p1[dst] = p0[i];
    }
    k0.swap(k1);
    p0.swap(p1);
  }
  std::memcpy(perm_out, p0.data(), n * sizeof(int64_t));
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&keys_buf);
  return out;
}

// chunk_minmax(values float32 (N, D), chunk_size) -> bytes float32 (C, 2, D)
// Per-chunk min/max over each of D columns (the CalcChunkDataJob stats pass).
PyObject* chunk_minmax(PyObject*, PyObject* args) {
  Py_buffer vals;
  int64_t d, chunk;
  if (!PyArg_ParseTuple(args, "y*LL", &vals, &d, &chunk)) return nullptr;
  const int64_t n = vals.len / (d * (int64_t)sizeof(float));
  const float* v = static_cast<const float*>(vals.buf);
  const int64_t c = (n + chunk - 1) / chunk;

  PyObject* out = PyBytes_FromStringAndSize(nullptr, c * 2 * d * sizeof(float));
  if (!out) {
    PyBuffer_Release(&vals);
    return nullptr;
  }
  float* res = reinterpret_cast<float*>(PyBytes_AS_STRING(out));

  Py_BEGIN_ALLOW_THREADS;
  parallel_for(c, [&](int64_t lo, int64_t hi) {
    for (int64_t ci = lo; ci < hi; ++ci) {
      int64_t s = ci * chunk;
      int64_t e = std::min(n, s + chunk);
      float* mn = res + ci * 2 * d;
      float* mx = mn + d;
      for (int64_t j = 0; j < d; ++j) {
        mn[j] = 3.4e38f;
        mx[j] = -3.4e38f;
      }
      for (int64_t i = s; i < e; ++i)
        for (int64_t j = 0; j < d; ++j) {
          float x = v[i * d + j];
          mn[j] = x < mn[j] ? x : mn[j];
          mx[j] = x > mx[j] ? x : mx[j];
        }
    }
  });
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&vals);
  return out;
}

PyMethodDef methods[] = {
    {"morton_codes", morton_codes, METH_VARARGS,
     "3D Morton codes (21 bits/axis) for float32 (N,3) positions"},
    {"radix_argsort_u64", radix_argsort_u64, METH_VARARGS,
     "LSD radix argsort of uint64 keys; returns int64 permutation"},
    {"chunk_minmax", chunk_minmax, METH_VARARGS,
     "Per-chunk per-column min/max of float32 (N,D)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_splat_native",
                      "Native splat import kernels", -1, methods};

}  // namespace

extern "C" PyMODINIT_FUNC PyInit__splat_native() {
  return PyModule_Create(&module);
}
