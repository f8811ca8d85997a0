// Text-derivation helpers for index construction at genome scale.
// numpy's negative-stride byte copy and random fancy-index run at a few
// MB/s; these loops run at memory speed with explicit prefetch, which
// turns two ~30 min GRCh38-scale passes into ~2 min (index/build.py).

#include <cstdint>

// BWT characters from the (n+1)-entry row model (rows[0] == n): for every
// row value r != 0 emit code2[r-1], in row order; returns the index of
// the $-row (primary).  Equivalent to index/build.py bwt_from_rows.
template <typename I>
static int64_t bwt_chars_t(const uint8_t *code2, const I *rows, I n,
                           uint8_t *bwt_out) {
  int64_t primary = -1;
  int64_t out = 0;
  const int64_t total = (int64_t)n + 1;
  for (int64_t i = 0; i < total; ++i) {
    if (i + 16 < total) __builtin_prefetch(&code2[rows[i + 16]]);
    I r = rows[i];
    if (r == 0) { primary = i; continue; }
    bwt_out[out++] = code2[r - 1];
  }
  return out == (int64_t)n ? primary : -1;
}

extern "C" {

// out[0..n) = fwd, out[n..2n) = reverse complement of fwd (code space
// 0..3, complement = 3-c) — the doubled text of bntseq.c:306-312.
void revcomp_concat(const uint8_t *fwd, int64_t n, uint8_t *out) {
  for (int64_t i = 0; i < n; ++i) out[i] = fwd[i];
  for (int64_t i = 0; i < n; ++i) out[n + i] = (uint8_t)(3 - fwd[n - 1 - i]);
}

int64_t bwt_chars_i32(const uint8_t *code2, const int32_t *rows, int32_t n,
                      uint8_t *bwt_out) {
  return bwt_chars_t<int32_t>(code2, rows, n, bwt_out);
}

int64_t bwt_chars_i64(const uint8_t *code2, const int64_t *rows, int64_t n,
                      uint8_t *bwt_out) {
  return bwt_chars_t<int64_t>(code2, rows, n, bwt_out);
}

}  // extern "C"
