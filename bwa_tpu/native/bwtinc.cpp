// Bounded-memory BWT construction for big genomes.
//
// The reference builds GRCh38 with an incremental blockwise BWT
// (bwt_bwtgen2 / BWTIncConstructFromPacked, bwt_gen.c:1292-1638: QSufSort
// block sorts + rank merge) precisely because a full suffix array does
// not fit: our in-place 64-bit SA-IS peaks at ~10 bytes/char (63 GB at
// the 6.2e9-char doubled text).  This file provides the same
// bounded-memory property with a different, simpler-to-verify algorithm:
//
//   dynamic-BWT right-to-left insertion, batched per block.
//
// State: the BWT "rows model" of the current suffix T[h:] — stored
// chars in the reference's interleaved occ layout (per 128 chars: 4
// int64 counts + 8 uint32 words = one 64-byte line) plus the primary
// (the charless full-suffix row).  Inserting the next suffix c·T[h:]:
//
//   rank(c·S) = 1 + C[c] + Occ_c(rows < primary)        (LF step)
//
// computed over (immutable old structure + this block's pending
// inserts).  Pending inserts live in a treap ordered by combined row
// coordinate with per-char subtree counts, so each insert and each
// Occ decomposition is O(log b).  At block end one linear pass merges
// old chars + pending into a fresh interleaved buffer and rebuilds the
// checkpoints.  Peak memory = 2 interleaved buffers (~n/2 bytes each)
// + the packed input text (n/4) + O(block) treap nodes — ~9 GB at
// GRCh38 vs 63 GB for the full SA, with byte-identical output
// (tests/test_index.py fuzzes it against the SA-IS path).
//
// The companion bwt_sa_walk derives the sampled .sa (and the dense
// sidecar when requested) from the finished BWT by the inverse-Psi
// chain (bwt_cal_sa, bwt.c:70-84), since no suffix array ever exists.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "occ64.h"

namespace {

// 2-bit packed char access (.pac convention: base i at byte i>>2,
// bits (~i & 3) * 2 — bntseq.h:76 _get_pac)
static inline int pac_at(const uint8_t *p, int64_t i) {
  return (p[i >> 2] >> ((~i & 3) << 1)) & 3;
}

// ---- interleaved stored-char stream (the .bwt layout) ----
// count of base c among the FIRST s stored chars (prefix-exclusive; no
// primary/row logic — that belongs to the caller)
static inline int64_t occ_prefix(const uint8_t *inter, int64_t s, int c) {
  if (s <= 0) return 0;
  int64_t blk = s >> 7;
  int within = (int)(s & 127);
  const int64_t *cp = (const int64_t *)(inter + blk * 64);
  int64_t acc = cp[c];
  if (within) {
    const uint32_t *w = (const uint32_t *)(inter + blk * 64 + 32);
    int kw = (within - 1) >> 5, kb = (within - 1) & 31;
    uint64_t want_hi = (c & 2) ? ~0ull : 0ull;
    uint64_t want_lo = (c & 1) ? ~0ull : 0ull;
    for (int i = 0; i <= kw; ++i) {
      uint64_t mask2 = (i < kw) ? ~0ull : occ64::keep_top(kb + 1);
      uint64_t word = occ64::wpair(w, i) & mask2;
      uint64_t vm = mask2 & occ64::VM55;
      uint64_t hi = (word >> 1) & occ64::VM55, lo = word & occ64::VM55;
      acc += __builtin_popcountll((hi ^ ~want_hi) & (lo ^ ~want_lo) & vm);
    }
  }
  return acc;
}

struct Writer {  // streaming builder of the interleaved layout
  uint8_t *buf;
  int64_t cap_blocks = 0;  // buffer capacity in 64-byte blocks
  int64_t n = 0;          // chars emitted
  int64_t cnt[4] = {0, 0, 0, 0};
  uint32_t word = 0;
  void start_block() {
    int64_t blk = n >> 7;
    int64_t *cp = (int64_t *)(buf + blk * 64);
    for (int c = 0; c < 4; ++c) cp[c] = cnt[c];
  }
  inline void put(int c) {
    if ((n & 127) == 0) start_block();
    word = (word << 2) | (uint32_t)c;
    ++cnt[c];
    ++n;
    if ((n & 15) == 0) {
      int64_t blk = (n - 1) >> 7;
      uint32_t *w = (uint32_t *)(buf + blk * 64 + 32);
      w[((n - 1) >> 4) & 7] = word;
      word = 0;
    }
  }
  void finish() {  // flush the ragged tail word (left-aligned like
    if (n == 0) return;
    // when the stream ends exactly on a 128-char boundary, the NEXT
    // block's checkpoint must still be written: occ_prefix(cur, s, c)
    // with s == n reads it (s is a block multiple -> within == 0), and
    // the ping-pong buffer holds a stale round's bytes there otherwise
    if ((n & 127) == 0 && (n >> 7) < cap_blocks) start_block();
    int64_t blk = (n - 1) >> 7;
    uint32_t *w = (uint32_t *)(buf + blk * 64 + 32);
    if (n & 15)  // pack_bwt_words: base i at bits (15-(i&15))*2
      w[((n - 1) >> 4) & 7] = word << ((16 - (n & 15)) << 1);
    word = 0;
    // zero the unused word slots of the last block: the buffers
    // ping-pong across rounds, and the final output is byte-compared
    // with the SA-IS path's zero-padded interleave (interleave_bwt)
    for (int i = (int)((((n - 1) >> 4) & 7) + 1); i < 8; ++i) w[i] = 0;
  }
};

// ---- pending-insert treap (combined row order, per-char counts) ----
struct Node {
  int32_t left = -1, right = -1;
  uint32_t pri;
  int64_t gap;        // number of OLD rows before this node
  int32_t cnt_total;  // subtree node count
  int32_t cnt[4];     // subtree counts per assigned char
  int8_t ch;          // 0..3 assigned, 4 = pending $ (uncounted)
};

struct Treap {
  std::vector<Node> pool;
  int32_t root = -1;
  uint64_t rng = 0x9E3779B97F4A7C15ull;
  uint32_t rnd() {
    rng ^= rng << 13;
    rng ^= rng >> 7;
    rng ^= rng << 17;
    return (uint32_t)rng;
  }
  void reset() {
    pool.clear();
    root = -1;
  }
  static void pull(Treap &t, int32_t x) {
    Node &nx = t.pool[x];
    nx.cnt_total = 1;
    for (int c = 0; c < 4; ++c) nx.cnt[c] = 0;
    if (nx.ch < 4) nx.cnt[nx.ch] = 1;
    for (int32_t s : {nx.left, nx.right})
      if (s >= 0) {
        nx.cnt_total += t.pool[s].cnt_total;
        for (int c = 0; c < 4; ++c) nx.cnt[c] += t.pool[s].cnt[c];
      }
  }
  // split by "first k nodes" (in-order)
  void split(int32_t x, int32_t k, int32_t *a, int32_t *b) {
    if (x < 0) {
      *a = *b = -1;
      return;
    }
    int32_t lc = pool[x].left >= 0 ? pool[pool[x].left].cnt_total : 0;
    if (lc < k) {
      *a = x;
      split(pool[x].right, k - lc - 1, &pool[x].right, b);
      pull(*this, x);
    } else {
      *b = x;
      split(pool[x].left, k, a, &pool[x].left);
      pull(*this, x);
    }
  }
  int32_t merge(int32_t a, int32_t b) {
    if (a < 0) return b;
    if (b < 0) return a;
    if (pool[a].pri < pool[b].pri) {
      pool[a].right = merge(pool[a].right, b);
      pull(*this, a);
      return a;
    }
    pool[b].left = merge(a, pool[b].left);
    pull(*this, b);
    return b;
  }
  // number of pending nodes with combined coordinate < p, plus their
  // per-char counts (combined coord of a node = gap + nodes before it)
  void count_before(int64_t p, int64_t *n_before, int64_t cnt_c[4]) const {
    int64_t nb = 0;
    for (int c = 0; c < 4; ++c) cnt_c[c] = 0;
    int32_t x = root;
    int64_t acc = 0;  // nodes before the current subtree
    while (x >= 0) {
      const Node &nx = pool[x];
      int32_t lc = nx.left >= 0 ? pool[nx.left].cnt_total : 0;
      int64_t node_comb = nx.gap + acc + lc;
      if (node_comb < p) {  // node and its left subtree are before p
        nb += lc + 1;
        if (nx.left >= 0)
          for (int c = 0; c < 4; ++c) cnt_c[c] += pool[nx.left].cnt[c];
        if (nx.ch < 4) ++cnt_c[nx.ch];
        acc += lc + 1;
        x = nx.right;
      } else {
        x = nx.left;
      }
    }
    *n_before = nb;
  }
  // insert a pending-$ node so that exactly `p` combined rows precede it
  void insert_dollar(int64_t p) {
    int64_t nb, cc[4];
    count_before(p, &nb, cc);  // nodes strictly before the new one
    Node nn;
    nn.pri = rnd();
    nn.gap = p - nb;
    nn.ch = 4;
    nn.cnt_total = 1;
    for (int c = 0; c < 4; ++c) nn.cnt[c] = 0;
    pool.push_back(nn);
    int32_t id = (int32_t)pool.size() - 1;
    int32_t a, b;
    split(root, (int32_t)nb, &a, &b);
    root = merge(merge(a, id), b);
  }
  std::vector<int32_t> path;  // assign_char scratch (no per-call alloc)

  // assign char c to the node at combined coordinate p (the current $)
  void assign_char(int64_t p, int c) {
    // descend to the node whose combined coord == p, updating counts
    path.clear();
    int32_t x = root;
    int64_t acc = 0;
    while (x >= 0) {
      path.push_back(x);
      Node &nx = pool[x];
      int32_t lc = nx.left >= 0 ? pool[nx.left].cnt_total : 0;
      int64_t node_comb = nx.gap + acc + lc;
      if (node_comb == p) {
        nx.ch = (int8_t)c;
        break;
      }
      if (node_comb < p) {
        acc += lc + 1;
        x = nx.right;
      } else {
        x = nx.left;
      }
    }
    for (auto it = path.rbegin(); it != path.rend(); ++it)
      pull(*this, *it);  // leaf -> root so parents see updated children
  }
  // in-order traversal -> (gap, ch) stream
  void inorder(std::vector<std::pair<int64_t, int8_t>> *out) const {
    out->clear();
    out->reserve(pool.size());
    std::vector<int32_t> st;
    int32_t x = root;
    while (x >= 0 || !st.empty()) {
      while (x >= 0) {
        st.push_back(x);
        x = pool[x].left;
      }
      x = st.back();
      st.pop_back();
      out->push_back({pool[x].gap, pool[x].ch});
      x = pool[x].right;
    }
  }
};

}  // namespace

extern "C" {

// Incremental bounded-memory BWT over the 2-bit packed doubled text.
// inter_out must hold ceil((n+127)/128)*64 bytes (wait: ceil(n/128)*64).
// Returns the primary row; cnt_out[4] receives the char counts (L2
// deltas).  block = chars merged per round (memory/merge-traffic knob).
int64_t bwt_inc_build(const uint8_t *pac2, int64_t n, int64_t block,
                      uint8_t *inter_out, int64_t *cnt_out) {
  int64_t n_blk_bytes = ((n + 127) / 128) * 64;
  std::vector<uint8_t> other(n_blk_bytes);
  // ping-pong: cur = current stored structure, nxt = merge target
  uint8_t *cur = other.data(), *nxt = inter_out;
  int64_t m = 0;           // current stored chars (= length of T[h:])
  int64_t primary = 0;     // current $ row (rows model)
  int64_t C[5] = {0, 0, 0, 0, 0};  // cumulative: C[c] = #chars < c
  int64_t cnt[4] = {0, 0, 0, 0};
  Treap treap;
  std::vector<std::pair<int64_t, int8_t>> pend;

  int64_t h = n;
  while (h > 0) {
    int64_t s = h - block;
    if (s < 0) s = 0;
    treap.reset();
    int64_t old_primary = primary;
    int64_t old_m = m;
    int dollar_patch = -1;     // char assigned to the old $ row
    int64_t dollar_coord = primary;  // combined row coord of current $
    bool dollar_is_old = true;
    for (int64_t i = h - 1; i >= s; --i) {
      int c = pac_at(pac2, i);
      // rank(c·S) = 1 + C[c] + Occ_c(rows < dollar_coord), over the
      // combined (old + pending) structure
      int64_t nb, pc[4];
      treap.count_before(dollar_coord, &nb, pc);
      int64_t k_old = dollar_coord - nb;  // old rows before $
      // old rows -> old stored chars (+ patched old $ row)
      int64_t stored = k_old - (k_old > old_primary ? 1 : 0);
      int64_t occv = occ_prefix(cur, stored, c) + pc[c];
      if (dollar_patch == c && k_old > old_primary) ++occv;
      int64_t rank = 1 + C[c] + occv;
      // the current $ row gains char c ...
      if (dollar_is_old) {
        dollar_patch = c;
        dollar_is_old = false;
      } else {
        treap.assign_char(dollar_coord, c);
      }
      ++cnt[c];
      for (int cc = c + 1; cc < 4; ++cc) ++C[cc];
      // ... and the new $ row appears at `rank`
      treap.insert_dollar(rank);
      dollar_coord = rank;
      ++m;
    }
    // merge old + pending into nxt
    treap.inorder(&pend);
    Writer w;
    w.buf = nxt;
    w.cap_blocks = n_blk_bytes / 64;
    size_t pi = 0;
    for (int64_t r = 0; r <= old_m; ++r) {  // old rows incl old $
      while (pi < pend.size() && pend[pi].first == r) {
        if (pend[pi].second < 4) w.put(pend[pi].second);
        ++pi;
      }
      if (r == old_primary) {
        if (dollar_patch >= 0) w.put(dollar_patch);
      } else if (r < old_m + 1) {
        int64_t stored = r - (r > old_primary ? 1 : 0);
        if (stored < old_m) {
          // read old stored char `stored`
          const uint32_t *ww =
              (const uint32_t *)(cur + (stored >> 7) * 64 + 32);
          int cch = (ww[(stored >> 4) & 7] >>
                     ((15 - (stored & 15)) << 1)) & 3;
          w.put(cch);
        }
      }
    }
    while (pi < pend.size()) {  // gap == old_m + 1 (after every old row)
      if (pend[pi].second < 4) w.put(pend[pi].second);
      ++pi;
    }
    w.finish();
    primary = dollar_coord;
    h = s;
    uint8_t *t = cur;
    cur = nxt;
    nxt = t;
  }
  if (cur != inter_out) std::memcpy(inter_out, cur, n_blk_bytes);
  for (int c = 0; c < 4; ++c) cnt_out[c] = cnt[c];
  return primary;
}

// Sampled .sa (+ optional dense sidecar) from the finished BWT by the
// inverse-Psi chain (bwt_cal_sa, bwt.c:70-84): row 0 is the empty
// suffix (SA value n); each inv_psi step moves to the one-shorter
// suffix position.  samples[k] = SA value of row k*intv (samples[0]
// ends up n; the file writer skips it, matching bwt_dump_sa).
void bwt_sa_walk(const uint8_t *inter, int64_t n, int64_t primary,
                 const int64_t *L2, int32_t intv, int64_t *samples,
                 int64_t *sad_or_null) {
  occ64::View g{inter, n, primary, L2};
  int64_t isa = 0, sa_val = n;
  for (int64_t i = 0; i <= n; ++i) {
    if ((isa % intv) == 0) samples[isa / intv] = sa_val;
    if (sad_or_null) sad_or_null[isa] = sa_val;
    if (i == n) break;
    isa = occ64::inv_psi(g, isa);
    --sa_val;
  }
}

}  // extern "C"
