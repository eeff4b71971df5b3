// Native host-side graph kernels for pathnet_tpu.
//
// Role: one-time preprocessing that is awkward/slow to vectorize in numpy —
// Vose alias-table construction over millions of CSR rows (the reference
// builds per-node alias tables in C++ too, as part of its offline sampler
// binaries; here construction is the ONLY host step, rolls happen on-device).
//
// Build: make -C pathnet_tpu/csrc      (produces libfastgraph.so)
// ABI: plain C, consumed via ctypes (pathnet_tpu/csrc/fastgraph.py).

#include <cstdint>
#include <vector>

extern "C" {

// nbr/prob: [n, d] row-major padded CSR; deg: [n].
// Outputs lo/hi: [n, d] neighbor ids, split: [n, d] probabilities.
// Drawing slot j ~ U[0, deg[u]) and coin u2: lo if u2 < split else hi.
void build_alias_tables(int64_t n, int64_t d,
                        const int32_t* nbr, const float* prob,
                        const int32_t* deg,
                        int32_t* lo, int32_t* hi, float* split) {
  std::vector<double> q;
  std::vector<int32_t> small_q, large_q, alias;
  for (int64_t u = 0; u < n; ++u) {
    const int64_t k = deg[u];
    const int64_t off = u * d;
    if (k <= 1) continue;  // lo/hi prefilled with nbr, split with 1
    q.assign(k, 0.0);
    alias.assign(k, 0);
    small_q.clear();
    large_q.clear();
    for (int64_t i = 0; i < k; ++i) {
      q[i] = static_cast<double>(prob[off + i]) * k;
      alias[i] = static_cast<int32_t>(i);
    }
    for (int64_t i = 0; i < k; ++i) {
      if (q[i] < 1.0) small_q.push_back(static_cast<int32_t>(i));
      else large_q.push_back(static_cast<int32_t>(i));
    }
    while (!small_q.empty() && !large_q.empty()) {
      const int32_t s = small_q.back(); small_q.pop_back();
      const int32_t l = large_q.back(); large_q.pop_back();
      alias[s] = l;
      q[l] = (q[l] + q[s]) - 1.0;
      if (q[l] < 1.0) small_q.push_back(l);
      else large_q.push_back(l);
    }
    for (int32_t i : small_q) q[i] = 1.0;
    for (int32_t i : large_q) q[i] = 1.0;
    for (int64_t i = 0; i < k; ++i) {
      split[off + i] = static_cast<float>(q[i] < 1.0 ? q[i] : 1.0);
      lo[off + i] = nbr[off + i];
      hi[off + i] = nbr[off + alias[i]];
    }
  }
}

}  // extern "C"
