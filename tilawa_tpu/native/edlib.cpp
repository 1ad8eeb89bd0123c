// tilawa-tpu native edit-distance core.
//
// The reference pipeline leans on python-Levenshtein's C implementation for
// its fuzzy retrieval hot loop (reference: shared/quran_db.py:6 — ~3x6,236
// ratio() calls per predict).  This is the TPU-framework's host-side
// equivalent: a small, dependency-free C++ library exposing
//
//   * lev_distance   — classic Levenshtein distance (sub cost 1)
//   * indel_distance — insert/delete-only distance (sub cost 2 semantics);
//                      ratio = (m+n-indel)/(m+n) matches python-Levenshtein's
//                      ratio() exactly (it equals 2*LCS/(m+n))
//   * semi_global_distance — query vs best substring of ref (free gaps in
//                      ref), the fragmentScore primitive
//   * batched corpus scans of all three against a concatenated corpus,
//     multithreaded — one call scores a query against all 6,236 verses.
//
// Strings cross the boundary as uint32 codepoint arrays (Python str ->
// array of ord()).  Two-row DP, O(min) space; ukkonen-style early-exit
// bounds are intentionally omitted: the batched scan wants every score.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int dp_lev(const uint32_t* a, int m, const uint32_t* b, int n,
                  std::vector<int>& row) {
  if (m == 0) return n;
  if (n == 0) return m;
  if (m > n) { std::swap(a, b); std::swap(m, n); }
  row.resize(m + 1);
  for (int i = 0; i <= m; ++i) row[i] = i;
  for (int j = 1; j <= n; ++j) {
    int diag = row[0];
    row[0] = j;
    const uint32_t bj = b[j - 1];
    for (int i = 1; i <= m; ++i) {
      const int up = row[i];
      const int cost = (a[i - 1] == bj) ? 0 : 1;
      int v = diag + cost;
      if (up + 1 < v) v = up + 1;
      if (row[i - 1] + 1 < v) v = row[i - 1] + 1;
      diag = up;
      row[i] = v;
    }
  }
  return row[m];
}

// Indel distance = m + n - 2*LCS(a, b); computed via the LCS DP.
inline int dp_indel(const uint32_t* a, int m, const uint32_t* b, int n,
                    std::vector<int>& row) {
  if (m == 0) return n;
  if (n == 0) return m;
  if (m > n) { std::swap(a, b); std::swap(m, n); }
  row.assign(m + 1, 0);
  for (int j = 1; j <= n; ++j) {
    int diag = 0;
    const uint32_t bj = b[j - 1];
    for (int i = 1; i <= m; ++i) {
      const int up = row[i];
      int v;
      if (a[i - 1] == bj) {
        v = diag + 1;
      } else {
        v = (up > row[i - 1]) ? up : row[i - 1];
      }
      diag = up;
      row[i] = v;
    }
  }
  return m + n - 2 * row[m];
}

// Semi-global: align the whole query against any substring of ref.
inline int dp_semi_global(const uint32_t* q, int m, const uint32_t* r, int n,
                          std::vector<int>& row) {
  if (m == 0) return 0;
  if (n == 0) return m;
  row.resize(m + 1);
  for (int i = 0; i <= m; ++i) row[i] = i;
  int best = row[m];
  for (int j = 1; j <= n; ++j) {
    int diag = row[0];
    row[0] = 0;  // free to start anywhere in ref
    const uint32_t rj = r[j - 1];
    for (int i = 1; i <= m; ++i) {
      const int up = row[i];
      const int cost = (q[i - 1] == rj) ? 0 : 1;
      int v = diag + cost;
      if (up + 1 < v) v = up + 1;
      if (row[i - 1] + 1 < v) v = row[i - 1] + 1;
      diag = up;
      row[i] = v;
    }
    if (row[m] < best) best = row[m];  // free to end anywhere in ref
  }
  return best;
}

// Best indel ratio of the shorter string against every window of its own
// length in the longer string (reference: shared/quran_db.py:10-28).
inline double dp_partial_ratio(const uint32_t* a, int m, const uint32_t* b,
                               int n, std::vector<int>& row) {
  if (m == 0 || n == 0) return 0.0;
  if (m > n) { std::swap(a, b); std::swap(m, n); }
  const int windows = std::max(1, n - m + 1);
  double best = 0.0;
  for (int s = 0; s < windows; ++s) {
    const int d = dp_indel(a, m, b + s, m, row);
    const double r = static_cast<double>(2 * m - d) / (2 * m);
    if (r > best) {
      best = r;
      if (best >= 1.0) break;
    }
  }
  return best;
}

enum Kind { KIND_LEV = 0, KIND_INDEL = 1, KIND_SEMI = 2, KIND_PARTIAL = 3 };

void scan_range(int kind, const uint32_t* q, int qlen, const uint32_t* corpus,
                const int64_t* offsets, int lo, int hi, double* out) {
  std::vector<int> row;
  for (int k = lo; k < hi; ++k) {
    const uint32_t* s = corpus + offsets[k];
    const int slen = static_cast<int>(offsets[k + 1] - offsets[k]);
    switch (kind) {
      case KIND_LEV:
        out[k] = dp_lev(q, qlen, s, slen, row);
        break;
      case KIND_INDEL: {
        const int d = dp_indel(q, qlen, s, slen, row);
        const int lensum = qlen + slen;
        out[k] = lensum ? static_cast<double>(lensum - d) / lensum : 1.0;
        break;
      }
      case KIND_SEMI: {
        const int d = dp_semi_global(q, qlen, s, slen, row);
        out[k] = qlen ? std::max(0.0, 1.0 - static_cast<double>(d) / qlen) : 1.0;
        break;
      }
      case KIND_PARTIAL:
        out[k] = dp_partial_ratio(q, qlen, s, slen, row);
        break;
    }
  }
}

}  // namespace

extern "C" {

int lev_distance(const uint32_t* a, int m, const uint32_t* b, int n) {
  std::vector<int> row;
  return dp_lev(a, m, b, n, row);
}

int indel_distance(const uint32_t* a, int m, const uint32_t* b, int n) {
  std::vector<int> row;
  return dp_indel(a, m, b, n, row);
}

int semi_global_distance(const uint32_t* q, int m, const uint32_t* r, int n) {
  std::vector<int> row;
  return dp_semi_global(q, m, r, n, row);
}

double lev_ratio(const uint32_t* a, int m, const uint32_t* b, int n) {
  const int lensum = m + n;
  if (lensum == 0) return 1.0;
  std::vector<int> row;
  return static_cast<double>(lensum - dp_indel(a, m, b, n, row)) / lensum;
}

double partial_ratio(const uint32_t* a, int m, const uint32_t* b, int n) {
  std::vector<int> row;
  return dp_partial_ratio(a, m, b, n, row);
}

// Batched scan: `kind` selects the metric (0=lev distance, 1=indel ratio,
// 2=fragment score).  `corpus` is all strings concatenated; `offsets` has
// num_strings+1 entries.  Results land in `out[num_strings]`.
void batch_scan(int kind, const uint32_t* q, int qlen, const uint32_t* corpus,
                const int64_t* offsets, int num_strings, int num_threads,
                double* out) {
  if (num_strings <= 0) return;
  if (num_threads <= 1 || num_strings < 64) {
    scan_range(kind, q, qlen, corpus, offsets, 0, num_strings, out);
    return;
  }
  const int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = std::min(num_threads, hw > 0 ? hw : 4);
  nt = std::min(nt, num_strings);
  std::vector<std::thread> threads;
  threads.reserve(nt);
  const int per = (num_strings + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int lo = t * per;
    const int hi = std::min(num_strings, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(scan_range, kind, q, qlen, corpus, offsets, lo, hi, out);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
