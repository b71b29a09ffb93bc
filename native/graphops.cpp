// Native data-plane kernels for diffdock_tpu (host-side preprocessing).
//
// The reference leans on torch-cluster's C++/CUDA kNN for receptor graph
// construction (datasets/process_mols.py:172,208) and RDKit's C++ parsers.
// This library supplies the TPU framework's host-side equivalents: an
// O(N^2) but cache-blocked, OpenMP-parallel k-nearest-neighbor builder
// (receptors reach 3000 residues / ~25k heavy atoms, where the numpy
// fallback allocates a 625M-entry distance matrix), and a fast SDF V2000
// reader for high-throughput ligand streaming.
//
// C ABI only (consumed via ctypes; pybind11 is not available in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// k nearest neighbors per point (excluding self), optional radius cap.
// pos: (n, 3) float32; out_idx: (n, k) int32; out_mask: (n, k) uint8.
void knn_graph(const float* pos, int n, int k, float max_radius,
               int32_t* out_idx, uint8_t* out_mask) {
  const float max_r2 =
      max_radius > 0 ? max_radius * max_radius : 3.4e38f;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<std::pair<float, int>> cand;
    cand.reserve(n);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
    for (int i = 0; i < n; ++i) {
      cand.clear();
      const float xi = pos[3 * i], yi = pos[3 * i + 1], zi = pos[3 * i + 2];
      for (int j = 0; j < n; ++j) {
        if (j == i) continue;
        const float dx = pos[3 * j] - xi;
        const float dy = pos[3 * j + 1] - yi;
        const float dz = pos[3 * j + 2] - zi;
        const float d2 = dx * dx + dy * dy + dz * dz;
        cand.emplace_back(d2, j);
      }
      const int kk = std::min<int>(k, (int)cand.size());
      std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
      for (int s = 0; s < k; ++s) {
        // never isolate a node: the nearest neighbor survives the radius
        // cap (reference process_mols.py:184-188 fallback)
        const bool keep =
            s < kk && (cand[s].first <= max_r2 || s == 0);
        if (keep) {
          out_idx[(size_t)i * k + s] = cand[s].second;
          out_mask[(size_t)i * k + s] = 1;
        } else {
          out_idx[(size_t)i * k + s] = 0;
          out_mask[(size_t)i * k + s] = 0;
        }
      }
    }
  }
}

// Cross k nearest neighbors: for each query point, k nearest reference
// points (used for capped cross graphs on huge receptors).
void knn_cross(const float* query, int nq, const float* ref, int nr, int k,
               float max_radius, int32_t* out_idx, uint8_t* out_mask) {
  const float max_r2 =
      max_radius > 0 ? max_radius * max_radius : 3.4e38f;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<std::pair<float, int>> cand;
    cand.reserve(nr);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
    for (int i = 0; i < nq; ++i) {
      cand.clear();
      const float xi = query[3 * i], yi = query[3 * i + 1],
                  zi = query[3 * i + 2];
      for (int j = 0; j < nr; ++j) {
        const float dx = ref[3 * j] - xi;
        const float dy = ref[3 * j + 1] - yi;
        const float dz = ref[3 * j + 2] - zi;
        cand.emplace_back(dx * dx + dy * dy + dz * dz, j);
      }
      const int kk = std::min<int>(k, (int)cand.size());
      std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
      for (int s = 0; s < k; ++s) {
        // never isolate a node: the nearest neighbor survives the radius
        // cap (reference process_mols.py:184-188 fallback)
        const bool keep =
            s < kk && (cand[s].first <= max_r2 || s == 0);
        if (keep) {
          out_idx[(size_t)i * k + s] = cand[s].second;
          out_mask[(size_t)i * k + s] = 1;
        } else {
          out_idx[(size_t)i * k + s] = 0;
          out_mask[(size_t)i * k + s] = 0;
        }
      }
    }
  }
}

// Parse the first SDF/MOL V2000 record in `text`.
// elements: (max_atoms, 4) char, NUL-padded symbols.
// Returns 0 on success, negative on error, 1 if capacities too small
// (n_atoms/n_bonds still reported so the caller can retry).
int sdf_parse_first(const char* text, int64_t text_len, int max_atoms,
                    int max_bonds, float* coords, char* elements,
                    int32_t* bonds, int32_t* charges, int32_t* n_atoms_out,
                    int32_t* n_bonds_out) {
  // split lines
  const char* p = text;
  const char* end = text + text_len;
  std::vector<std::pair<const char*, int>> lines;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) nl = end;
    int len = (int)(nl - p);
    if (len > 0 && p[len - 1] == '\r') --len;
    lines.emplace_back(p, len);
    p = nl + 1;
  }
  if (lines.size() < 4) return -1;

  auto parse_int = [](const char* s, int len) {
    char buf[16];
    len = std::min(len, 15);
    memcpy(buf, s, len);
    buf[len] = 0;
    return atoi(buf);
  };
  const char* counts = lines[3].first;
  int clen = lines[3].second;
  if (clen < 6) return -2;
  const int na = parse_int(counts, 3);
  const int nb = parse_int(counts + 3, 3);
  *n_atoms_out = na;
  *n_bonds_out = nb;
  if (na < 0 || nb < 0 || (int)lines.size() < 4 + na + nb) return -3;
  if (na > max_atoms || nb > max_bonds) return 1;

  for (int i = 0; i < na; ++i) {
    const char* ln = lines[4 + i].first;
    const int len = lines[4 + i].second;
    if (len < 34) return -4;
    char buf[11];
    memcpy(buf, ln, 10); buf[10] = 0; coords[3 * i] = (float)atof(buf);
    memcpy(buf, ln + 10, 10); buf[10] = 0; coords[3 * i + 1] = (float)atof(buf);
    memcpy(buf, ln + 20, 10); buf[10] = 0; coords[3 * i + 2] = (float)atof(buf);
    // element field cols 31-34
    int s = 31, e = std::min(34, len);
    while (s < e && ln[s] == ' ') ++s;
    int t = s;
    while (t < e && ln[t] != ' ') ++t;
    const int el_len = std::min(t - s, 3);
    memset(elements + 4 * i, 0, 4);
    memcpy(elements + 4 * i, ln + s, el_len);
    charges[i] = 0;
  }
  for (int i = 0; i < nb; ++i) {
    const char* ln = lines[4 + na + i].first;
    const int len = lines[4 + na + i].second;
    if (len < 9) return -5;
    bonds[3 * i] = parse_int(ln, 3) - 1;
    bonds[3 * i + 1] = parse_int(ln + 3, 3) - 1;
    bonds[3 * i + 2] = parse_int(ln + 6, 3);
  }
  // properties: M  CHG
  for (size_t li = 4 + na + nb; li < lines.size(); ++li) {
    const char* ln = lines[li].first;
    const int len = lines[li].second;
    if (len >= 6 && strncmp(ln, "M  END", 6) == 0) break;
    if (len >= 6 && strncmp(ln, "M  CHG", 6) == 0) {
      // fields: M  CHG nnn (idx chg)*
      char buf[512];
      const int blen = std::min(len, 511);
      memcpy(buf, ln, blen);
      buf[blen] = 0;
      char* save = nullptr;
      strtok_r(buf, " ", &save);  // M
      strtok_r(nullptr, " ", &save);  // CHG
      char* cnt_s = strtok_r(nullptr, " ", &save);
      if (!cnt_s) continue;
      const int cnt = atoi(cnt_s);
      for (int c = 0; c < cnt; ++c) {
        char* idx_s = strtok_r(nullptr, " ", &save);
        char* chg_s = strtok_r(nullptr, " ", &save);
        if (!idx_s || !chg_s) break;
        const int idx = atoi(idx_s) - 1;
        if (idx >= 0 && idx < na) charges[idx] = atoi(chg_s);
      }
    }
  }
  return 0;
}

}  // extern "C"
