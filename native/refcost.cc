// Independent C++ edit-distance oracle for differential conformance tests.
//
// Role: the third-party cost cross-check the reference fills with edlib
// (/root/reference/evals/src/benchsuite/edlib.rs; its differential fuzz
// contract is pattern_tiling/search.rs:690-848). edlib is not installable
// in this environment, so this is a from-scratch textbook implementation:
// cell-by-cell scalar DP, no vectorization, no shared code or tricks with
// the Python oracle (which uses a prefix-min row recurrence) or the
// bit-parallel engines.
//
// Semantics under test (shared spec, independent derivations):
//   D[0][i] = 0
//   D[j][0] = boundary(j)  (j, or floor(alpha*min(j, max_overhang)) +
//                           max(0, j - max_overhang) with overhang)
//   D[j][i] = min(D[j-1][i-1] + (pattern[j-1] ~ text[i-1] ? 0 : 1),
//                 D[j-1][i] + 1, D[j][i-1] + 1)
// end_costs[i] = D[m][i].
//
// The IUPAC nibble code table is transcribed from the published IUPAC
// standard (as in reference iupac.rs:281-317): A=1 C=2 T=4 G=8,
// ambiguity codes OR their bases, N=15, U=T, unknown=0 (matches nothing).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

uint8_t iupac_code(uint8_t c) {
  switch (c) {
    case 'A': case 'a': return 1;
    case 'C': case 'c': return 2;
    case 'T': case 't': return 4;
    case 'U': case 'u': return 4;
    case 'G': case 'g': return 8;
    case 'R': case 'r': return 1 | 8;          // A or G
    case 'Y': case 'y': return 2 | 4;          // C or T
    case 'S': case 's': return 2 | 8;          // G or C
    case 'W': case 'w': return 1 | 4;          // A or T
    case 'K': case 'k': return 4 | 8;          // G or T
    case 'M': case 'm': return 1 | 2;          // A or C
    case 'B': case 'b': return 2 | 4 | 8;      // not A
    case 'D': case 'd': return 1 | 4 | 8;      // not C
    case 'H': case 'h': return 1 | 2 | 4;      // not G
    case 'V': case 'v': return 1 | 2 | 8;      // not T
    case 'N': case 'n': return 15;             // any
    default: return 0;                         // X / invalid: matches nothing
  }
}

// alphabet ids: 0 = iupac, 1 = dna (ACGT, case-insensitive, exact equality
// of base identity), 2 = ascii case-sensitive, 3 = ascii case-insensitive
bool chars_match(uint8_t a, uint8_t b, int alphabet) {
  switch (alphabet) {
    case 0: return (iupac_code(a) & iupac_code(b)) != 0;
    case 1: {
      uint8_t la = a | 0x20, lb = b | 0x20;
      if (la != lb) return false;
      return la == 'a' || la == 'c' || la == 'g' || la == 't';
    }
    case 2: return a == b;
    default: {
      uint8_t la = (a >= 'A' && a <= 'Z') ? a + 32 : a;
      uint8_t lb = (b >= 'A' && b <= 'Z') ? b + 32 : b;
      return la == lb;
    }
  }
}

int64_t boundary_cost(int64_t j, float alpha, int64_t max_overhang,
                      bool use_alpha, int64_t m) {
  if (!use_alpha) return j;
  // per-row f32-floor deltas floor((i+1)a) - floor(ia), telescoped —
  // exactly the reference's init (search.rs:1692-1748): rows beyond
  // min(m, max_overhang) get delta 1
  int64_t mo = m;
  if (max_overhang >= 0 && max_overhang < mo) mo = max_overhang;
  int64_t lim = j < mo ? j : mo;
  int64_t acc = 0;
  for (int64_t i = 0; i < lim; ++i) {
    acc += (int64_t)(std::floor((float)(i + 1) * alpha) -
                     std::floor((float)i * alpha));
  }
  return acc + (j - lim);
}

}  // namespace

extern "C" {

// end costs D[m][0..n] into out (length n+1). alpha < 0 disables overhang.
// max_overhang < 0 means unlimited. Returns 0 on success.
int refcost_end_costs(const uint8_t* pattern, int64_t m, const uint8_t* text,
                      int64_t n, int alphabet, float alpha,
                      int64_t max_overhang, int64_t* out) {
  bool use_alpha = alpha >= 0.0f;
  std::vector<int64_t> prev(n + 1), cur(n + 1);
  for (int64_t i = 0; i <= n; ++i) prev[i] = 0;
  for (int64_t j = 1; j <= m; ++j) {
    cur[0] = boundary_cost(j, alpha, max_overhang, use_alpha, m);
    for (int64_t i = 1; i <= n; ++i) {
      int64_t sub = prev[i - 1] +
                    (chars_match(pattern[j - 1], text[i - 1], alphabet) ? 0 : 1);
      int64_t ins = prev[i] + 1;
      int64_t del = cur[i - 1] + 1;
      int64_t best = sub < ins ? sub : ins;
      cur[i] = best < del ? best : del;
    }
    std::swap(prev, cur);
  }
  std::memcpy(out, prev.data(), sizeof(int64_t) * (size_t)(n + 1));
  return 0;
}

// plain global edit distance (Levenshtein) between two strings
int64_t refcost_edit_distance(const uint8_t* a, int64_t la, const uint8_t* b,
                              int64_t lb, int alphabet) {
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t i = 0; i <= lb; ++i) prev[i] = i;
  for (int64_t j = 1; j <= la; ++j) {
    cur[0] = j;
    for (int64_t i = 1; i <= lb; ++i) {
      int64_t sub = prev[i - 1] + (chars_match(a[j - 1], b[i - 1], alphabet) ? 0 : 1);
      int64_t ins = prev[i] + 1;
      int64_t del = cur[i - 1] + 1;
      int64_t best = sub < ins ? sub : ins;
      cur[i] = best < del ? best : del;
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

}  // extern "C"
