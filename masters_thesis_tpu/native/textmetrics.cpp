// Native batch text-metric kernels.
//
// TPU-native replacement for the reference's sole native component, the
// Cython batch-BLEU scorer (reference: CNN_RNN/cython/cython_functions.pyx:24-50,
// built by setup.py). Same contract: int32 token-id matrices, candidate rows
// truncated at the first <end> token, 0 = <pad> ignored; returns the mean
// sentence BLEU over the batch. Unlike the Cython kernel (which called back
// into Python/NLTK per sentence), everything here is pure C++ — suitable for
// in-loop eval without the GIL.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Functions:
//   tm_bleu_batch:  mean sentence BLEU (uniform 1..max_n weights, Chen&Cherry
//                   smoothing method2 on orders > 1, closest-ref brevity
//                   penalty) over a batch with R references per candidate.
//   tm_lcs_batch:   per-pair longest-common-subsequence lengths (ROUGE-L core).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

using Seq = std::vector<int32_t>;

// FNV-1a hash of an n-gram for the count maps.
struct NgramHash {
  size_t operator()(const Seq& v) const {
    size_t h = 1469598103934665603ULL;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b9;
      h *= 1099511628211ULL;
    }
    return h;
  }
};

using Counts = std::unordered_map<Seq, int, NgramHash>;

Counts ngram_counts(const Seq& toks, int n) {
  Counts c;
  if (static_cast<int>(toks.size()) >= n) {
    for (size_t i = 0; i + n <= toks.size(); ++i) {
      Seq ng(toks.begin() + i, toks.begin() + i + n);
      ++c[ng];
    }
  }
  return c;
}

// Truncate at first end token, drop pads (id 0).
Seq clean_row(const int32_t* row, int len, int32_t end_id) {
  Seq out;
  out.reserve(len);
  for (int i = 0; i < len; ++i) {
    if (row[i] == end_id) break;
    if (row[i] == 0) continue;
    out.push_back(row[i]);
  }
  return out;
}

double sentence_bleu(const std::vector<Seq>& refs, const Seq& hyp, int max_n,
                     bool smooth2) {
  const int hyp_len = static_cast<int>(hyp.size());
  if (hyp_len == 0) return 0.0;

  // closest reference length (ties -> shorter)
  int ref_len = 0, best = INT32_MAX;
  for (const auto& r : refs) {
    int rl = static_cast<int>(r.size());
    int d = std::abs(rl - hyp_len);
    if (d < best || (d == best && rl < ref_len)) {
      best = d;
      ref_len = rl;
    }
  }
  double bp = hyp_len >= ref_len
                  ? 1.0
                  : std::exp(1.0 - static_cast<double>(ref_len) / hyp_len);

  double log_sum = 0.0;
  const double w = 1.0 / max_n;
  for (int n = 1; n <= max_n; ++n) {
    Counts hyp_c = ngram_counts(hyp, n);
    int total = 0;
    for (const auto& kv : hyp_c) total += kv.second;

    Counts max_ref;
    for (const auto& r : refs) {
      Counts rc = ngram_counts(r, n);
      for (const auto& kv : rc) {
        auto it = max_ref.find(kv.first);
        if (it == max_ref.end() || it->second < kv.second)
          max_ref[kv.first] = kv.second;
      }
    }
    int clipped = 0;
    for (const auto& kv : hyp_c) {
      auto it = max_ref.find(kv.first);
      if (it != max_ref.end()) clipped += std::min(kv.second, it->second);
    }
    // NLTK clamps the denominator to >= 1 before smoothing
    double num = clipped, den = std::max(total, 1);
    if (smooth2 && n > 1) {
      num += 1.0;
      den += 1.0;
    }
    if (den <= 0.0 || num <= 0.0) return 0.0;
    log_sum += w * std::log(num / den);
  }
  return bp * std::exp(log_sum);
}

}  // namespace

extern "C" {

// preds: (B, Lp) int32 candidate rows; refs: (B, R, Lr) int32.
// Returns mean sentence BLEU; per_sentence (len B) optionally filled.
double tm_bleu_batch(const int32_t* preds, int B, int Lp, const int32_t* refs,
                     int R, int Lr, int32_t end_id, int max_n, int smooth2,
                     double* per_sentence) {
  double total = 0.0;
  for (int b = 0; b < B; ++b) {
    Seq hyp = clean_row(preds + static_cast<size_t>(b) * Lp, Lp, end_id);
    std::vector<Seq> rs;
    rs.reserve(R);
    for (int r = 0; r < R; ++r) {
      Seq ref = clean_row(
          refs + (static_cast<size_t>(b) * R + r) * Lr, Lr, end_id);
      if (!ref.empty()) rs.push_back(std::move(ref));
    }
    double s = rs.empty() ? 0.0 : sentence_bleu(rs, hyp, max_n, smooth2 != 0);
    if (per_sentence) per_sentence[b] = s;
    total += s;
  }
  return B > 0 ? total / B : 0.0;
}

// LCS length per (candidate, reference) pair — ROUGE-L core.
void tm_lcs_batch(const int32_t* a, int B, int La, const int32_t* b, int Lb,
                  int32_t end_id, int32_t* out) {
  std::vector<int> prev(static_cast<size_t>(Lb) + 1),
      cur(static_cast<size_t>(Lb) + 1);
  for (int i = 0; i < B; ++i) {
    Seq x = clean_row(a + static_cast<size_t>(i) * La, La, end_id);
    Seq y = clean_row(b + static_cast<size_t>(i) * Lb, Lb, end_id);
    std::fill(prev.begin(), prev.end(), 0);
    for (size_t p = 0; p < x.size(); ++p) {
      cur[0] = 0;
      for (size_t q = 0; q < y.size(); ++q) {
        cur[q + 1] =
            x[p] == y[q] ? prev[q] + 1 : std::max(prev[q + 1], cur[q]);
      }
      std::swap(prev, cur);
    }
    out[i] = y.empty() ? 0 : prev[y.size()];
  }
}

}  // extern "C"
