// Native samse finalize: .sai records + reads -> SAM lines, one batch per
// call.  Ports the executable spec in aln/samse.py exactly (which is the
// byte-exact mirror of bwase.c:22-499): drand48 hit sampling, SA->coord,
// ksw_global gapped refinement, MD/NM, trimming correction and the SAM
// text of bwa_print_sam1.  The Python per-read loops were the samse
// bottleneck (aln+samse at 0.2x the oracle end of round 1).
//
// Everything lives in one .so: the ksw kernel is ksw.cpp's extern "C"
// bt_ksw_global2; the FM occ/invPsi walkers mirror bsw2.cpp's.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" int bt_ksw_global2(int qlen, const uint8_t *query, int tlen,
                              const uint8_t *target, int m, const int8_t *mat,
                              int o_del, int e_del, int o_ins, int e_ins,
                              int w, int *n_cigar_out, uint32_t *cigar_out,
                              int cigar_cap);

namespace btsam {

// ---- drand48 (utils/rand48.py; POSIX LCG) ----
struct Rand48 {
  uint64_t x;
  static const uint64_t A = 0x5DEECE66DULL, C = 0xBULL,
                        MASK = (1ULL << 48) - 1;
  double drand48() {
    x = (A * x + C) & MASK;
    return (double)x / (double)(1ULL << 48);
  }
};

// ---- FM view (bsw2.cpp GenomeFM twin) ----
struct FM {
  // interleaved occ blocks (64B = 4 int64 counts + 8 uint32 words); see
  // bsw2.cpp GenomeFM — one cache line per occ
  const uint8_t *inter;
  int64_t seq_len, primary;
  const int64_t *L2;
  const int64_t *ssa;
  int32_t sa_intv;
};

static inline const int64_t *blk_cnt(const FM &g, int64_t blk) {
  return (const int64_t *)(g.inter + blk * 64);
}
static inline const uint32_t *blk_words(const FM &g, int64_t blk) {
  return (const uint32_t *)(g.inter + blk * 64 + 32);
}

static void occ4(const FM &g, int64_t k, int64_t cnt[4]) {
  if (k == -1) { cnt[0] = cnt[1] = cnt[2] = cnt[3] = 0; return; }
  if (k == g.seq_len) {
    for (int c = 0; c < 4; ++c) cnt[c] = g.L2[c + 1] - g.L2[c];
    return;
  }
  if (k >= g.primary) --k;
  int64_t blk = k >> 7;
  int kw = (int)((k >> 4) & 7), kb = (int)(k & 15);
  const uint32_t *w = blk_words(g, blk);
  int64_t a0 = 0, a1 = 0, a2 = 0, a3 = 0;
  for (int i = 0; i <= kw; ++i) {
    int nkeep = (i < kw) ? 16 : kb + 1;
    uint32_t mask2 = (nkeep == 16) ? 0xffffffffu
                                   : ~((1u << ((16 - nkeep) << 1)) - 1u);
    uint32_t word = w[i] & mask2;
    uint32_t vm = mask2 & 0x55555555u;
    uint32_t hi = (word >> 1) & 0x55555555u, lo = word & 0x55555555u;
    a3 += __builtin_popcount(hi & lo);
    a2 += __builtin_popcount(hi & ~lo);
    a1 += __builtin_popcount(lo & ~hi);
    a0 += __builtin_popcount(vm & ~hi & ~lo);
  }
  const int64_t *cp = blk_cnt(g, blk);
  cnt[0] = cp[0] + a0; cnt[1] = cp[1] + a1;
  cnt[2] = cp[2] + a2; cnt[3] = cp[3] + a3;
}

static inline int B0(const FM &g, int64_t x) {
  uint32_t word = blk_words(g, x >> 7)[(x >> 4) & 7];
  return (word >> ((15 - (x & 15)) << 1)) & 3;
}

static inline int64_t inv_psi(const FM &g, int64_t k) {
  int64_t x = k - (k > g.primary);
  int c = B0(g, x);
  int64_t cnt[4], occ_kc;
  if (k == g.seq_len) occ_kc = g.L2[c + 1] - g.L2[c];
  else if (k == -1) occ_kc = 0;
  else { occ4(g, k, cnt); occ_kc = cnt[c]; }
  int64_t r = g.L2[c] + occ_kc;
  return k == g.primary ? 0 : r;
}

static int64_t sa_value(const FM &g, int64_t k) {  // bwt_sa (bwt.c:86-96)
  int64_t mask = g.sa_intv - 1, s = 0;
  while (k & mask) { ++s; k = inv_psi(g, k); }
  return s + g.ssa[k / g.sa_intv];
}

// ---- reference / contig view ----
struct Ref {
  const uint8_t *pac;
  int64_t l_pac;
  const int64_t *ctg_off;
  const int32_t *ctg_len;
  const int32_t *name_off;
  const char *names;
  int32_t n_ctg;
  const int64_t *amb_off;
  const int32_t *amb_len;
  int32_t n_amb;
};

static inline int pac_at(const Ref &r, int64_t k) {
  return r.pac[k >> 2] >> ((~k & 3) << 1) & 3;
}

static int pos2rid(const Ref &r, int64_t pos_f) {
  if (pos_f >= r.l_pac) return -1;
  int left = 0, mid = 0, right = r.n_ctg;
  while (left < right) {
    mid = (left + right) >> 1;
    if (pos_f >= r.ctg_off[mid]) {
      if (mid == r.n_ctg - 1) break;
      if (pos_f < r.ctg_off[mid + 1]) break;
      left = mid + 1;
    } else right = mid;
  }
  return mid;
}

// bns_cnt_ambi (bntseq.c:380-401): stops at first overlapping hole
static int cnt_ambi(const Ref &r, int64_t pos_f, int64_t len) {
  int left = 0, right = r.n_amb, nn = 0;
  while (left < right) {
    int mid = (left + right) >> 1;
    int64_t ho = r.amb_off[mid];
    int64_t hl = r.amb_len[mid];
    if (pos_f >= ho + hl) left = mid + 1;
    else if (pos_f + len <= ho) right = mid;
    else {
      if (pos_f >= ho)
        nn += (int)((ho + hl < pos_f + len) ? (ho + hl - pos_f) : len);
      else
        nn += (int)((ho + hl < pos_f + len) ? hl : (len - (ho - pos_f)));
      break;
    }
  }
  return nn;
}

// ---- per-read state ----
struct Aln1 {
  int n_mm, n_gapo, n_gape, score, n_ins, n_del;
  int64_t k, l;
};

struct Cig { std::vector<uint32_t> v; };  // packed op|len<<4? no: len<<4|op

struct Multi {
  int64_t pos;
  int gap, mm, strand, ref_shift;
  std::vector<uint32_t> cigar;  // len<<4|op (MIDS = 0..3); empty = none
  bool has_cigar = false;
};

enum { T_NO_MATCH = 0, T_UNIQUE = 1, T_REPEAT = 2, T_MATESW = 3 };

struct Seq {
  // inputs
  const uint8_t *codes;  // full_codes, original orientation
  const char *name;
  const uint8_t *qual;   // may be null
  int qual_len;
  const char *bc;
  int len, full_len, clip_len;
  // state
  int strand = 0, type = 0, n_mm = 0, n_gapo = 0, n_gape = 0;
  int mapQ = 0, seQ = 0, score = 0, c1 = 0, c2 = 0, ref_shift = 0, nm = 0;
  int64_t sa = 0, pos = -1;
  std::vector<Aln1> alns;
  std::vector<Multi> multi;
  std::vector<uint32_t> cigar;
  bool has_cigar = false;
  std::string md;
};

static int g_log_n_tab[256];
static void init_log_n() {
  static bool done = false;
  if (done) return;
  for (int i = 1; i < 256; ++i)
    g_log_n_tab[i] = (int)(4.343 * std::log((double)i) + 0.5);
  done = true;
}

// bwa_cal_maxdiff (bwtaln.c:42-54).  The reference's factorial lives in
// a C int and wraps (observable from k=13; exactly 0 at k=34 where the
// division yields inf) — keep the int32 wraparound so mapQ matches for
// long reads with fractional -n.
static int cal_maxdiff(int l, double err, double thres) {
  double elambda = std::exp(-l * err);
  double y = 1.0, total = elambda;
  uint32_t x = 1;
  for (int k = 1; k < 1000; ++k) {
    y *= l * err;
    x *= (uint32_t)k;
    total += elambda * y / (double)(int32_t)x;
    if (1.0 - total < thres) return k;
  }
  return 2;
}

// bwa_aln2seq_core (bwase.c:22-94 / aln/samse.py)
static void aln2seq_core(Seq &s, Rand48 &rng, int n_multi_req) {
  const std::vector<Aln1> &alns = s.alns;
  if (alns.empty()) { s.type = T_NO_MATCH; s.c1 = s.c2 = 0; return; }
  int best = alns[0].score;
  int64_t cnt = 0;
  size_t i;
  for (i = 0; i < alns.size(); ++i) {
    const Aln1 &p = alns[i];
    if (p.score > best) break;
    if (rng.drand48() * (double)(p.l - p.k + 1 + cnt) > (double)cnt) {
      s.n_mm = p.n_mm; s.n_gapo = p.n_gapo; s.n_gape = p.n_gape;
      s.ref_shift = p.n_del - p.n_ins;
      s.score = p.score;
      s.sa = p.k + (int64_t)((double)(p.l - p.k + 1) * rng.drand48());
    }
    cnt += p.l - p.k + 1;
  }
  s.c1 = (int)cnt;
  for (; i < alns.size(); ++i) cnt += alns[i].l - alns[i].k + 1;
  s.c2 = (int)cnt - s.c1;
  s.type = s.c1 > 1 ? T_REPEAT : T_UNIQUE;

  if (n_multi_req) {
    int64_t n_occ = 0;
    for (const Aln1 &q : alns) n_occ += q.l - q.k + 1;
    s.multi.clear();
    if (n_occ > n_multi_req + 1) return;
    int64_t rest = n_occ < n_multi_req + 1 ? n_occ : n_multi_req + 1;
    for (const Aln1 &q : alns) {
      if (q.l - q.k + 1 <= rest) {
        for (int64_t l = q.k; l <= q.l; ++l) {
          Multi m; m.pos = l; m.gap = q.n_gapo + q.n_gape; m.mm = q.n_mm;
          m.strand = 0; m.ref_shift = q.n_del - q.n_ins;
          s.multi.push_back(m);
        }
        rest -= q.l - q.k + 1;
      } else {  // "we never come here" sampling branch (bwase.c:76-87)
        int64_t ii = q.l - q.k + 1;
        for (int64_t j = rest; j > 0; --j) {
          double p = 1.0, x = rng.drand48();
          while (x < p) { p -= p * j / ii; --ii; }
          Multi m; m.pos = q.l - ii; m.gap = q.n_gapo + q.n_gape;
          m.mm = q.n_mm; m.strand = 0; m.ref_shift = q.n_del - q.n_ins;
          s.multi.push_back(m);
        }
        rest = 0;
        break;
      }
    }
  }
}

static int approx_mapQ(const Seq &p, int mm) {
  if (p.c1 == 0) return 23;
  if (p.c1 > 1) return 0;
  if (p.n_mm == mm) return 25;
  if (p.c2 == 0) return 37;
  int n = p.c2 >= 255 ? 255 : p.c2;
  return 23 < g_log_n_tab[n] ? 0 : 23 - g_log_n_tab[n];
}

// pos2coord (bwa_sa2pos coordinate step, bwase.c:112-123)
static int64_t pos2coord(const Ref &r, int64_t pos_f, int64_t ref_len,
                         int *strand) {
  if (pos_f < r.l_pac && r.l_pac < pos_f + ref_len) { *strand = 0; return -1; }
  int is_rev = pos_f >= r.l_pac;
  if (is_rev) pos_f = (r.l_pac << 1) - 1 - pos_f;
  *strand = !is_rev;
  if (is_rev) pos_f = (pos_f + 1 < ref_len) ? 0 : pos_f - ref_len + 1;
  return pos_f;
}

static const int8_t REFINE_MAT[25] = {  // fill_scmat(1, 3)
    1, -3, -3, -3, -1,
    -3, 1, -3, -3, -1,
    -3, -3, 1, -3, -1,
    -3, -3, -3, 1, -1,
    -1, -1, -1, -1, -1};

// bwa_refine_gapped_core (bwase.c:169-199); returns false on failure
static bool refine_core(const Ref &r, int length, const uint8_t *seq,
                        int ref_shift, int64_t &rb,
                        std::vector<uint32_t> &cigar) {
  int64_t re = rb + length + ref_shift;
  if (re > r.l_pac) return false;  // spec asserts; never fires in samse
  int64_t rlen = re - rb;
  std::vector<uint8_t> rseq((size_t)rlen);
  for (int64_t k = rb; k < re; ++k) rseq[k - rb] = (uint8_t)pac_at(r, k);
  int w = (int)(std::llabs(rlen - length) * 1.5);
  int bw = w > 50 ? w : 50;
  int n_cig = 0;
  std::vector<uint32_t> cig((size_t)(length + rlen) + 8);
  bt_ksw_global2(length, seq, (int)rlen, rseq.data(), 5, REFINE_MAT, 5, 1, 5,
                 1, bw, &n_cig, cig.data(), (int)cig.size());
  cig.resize(n_cig);
  if (cig.empty()) return false;
  if ((cig.back() & 0xf) == 1) cig.back() = (cig.back() & ~0xfu) | 3;
  if ((cig.front() & 0xf) == 1) cig.front() = (cig.front() & ~0xfu) | 3;
  if (!cig.empty() && (cig.back() & 0xf) == 2) cig.pop_back();
  if (!cig.empty() && (cig.front() & 0xf) == 2) {
    rb += cig.front() >> 4;
    cig.erase(cig.begin());
  }
  cigar = std::move(cig);
  return true;
}

// bwa_cal_md1 (bwase.c:201-249)
static void cal_md1(const Ref &r, const std::vector<uint32_t> &cigar_in,
                    bool has_cigar, int length, int64_t pos,
                    const uint8_t *seq, std::string &md, int &nm) {
  static const char *B = "ACGTN";
  md.clear();
  nm = 0;
  int64_t x = pos;
  int y = 0, u = 0;
  char buf[32];
  std::vector<uint32_t> def;
  const std::vector<uint32_t> *cig = &cigar_in;
  if (!has_cigar || cigar_in.empty()) {
    def.push_back(((uint32_t)length << 4) | 0);
    cig = &def;
  }
  for (uint32_t cw : *cig) {
    int op = cw & 0xf;
    int ln = (int)(cw >> 4);
    if (op == 0) {  // M
      for (int z = 0; z < ln && x + z < r.l_pac; ++z) {
        int c = pac_at(r, x + z);
        if (c != seq[y + z] || seq[y + z] > 3) {
          snprintf(buf, sizeof buf, "%d", u);
          md += buf;
          md += B[c];
          ++nm;
          u = 0;
        } else ++u;
      }
      x += ln; y += ln;
    } else if (op == 1 || op == 3) {  // I or S
      y += ln;
      if (op == 1) nm += ln;
    } else if (op == 2) {  // D
      snprintf(buf, sizeof buf, "%d", u);
      md += buf;
      md += '^';
      for (int z = 0; z < ln && x + z < r.l_pac; ++z)
        md += B[pac_at(r, x + z)];
      u = 0;
      x += ln;
      nm += ln;
    }
  }
  snprintf(buf, sizeof buf, "%d", u);
  md += buf;
}

// bwa_correct_trimmed (bwase.c:251-285)
static void correct_trimmed(Seq &s) {
  if (s.len == s.full_len) return;
  uint32_t clip = (uint32_t)(s.full_len - s.len);
  if (!s.has_cigar) {
    s.cigar.clear();
    s.cigar.push_back(((uint32_t)s.len << 4) | 0);
    s.has_cigar = true;
  }
  if (s.strand == 0) {
    if (!s.cigar.empty() && (s.cigar.back() & 0xf) == 3)
      s.cigar.back() += clip << 4;
    else s.cigar.push_back((clip << 4) | 3);
  } else {
    if (!s.cigar.empty() && (s.cigar.front() & 0xf) == 3)
      s.cigar.front() += clip << 4;
    else s.cigar.insert(s.cigar.begin(), (clip << 4) | 3);
  }
  s.len = s.full_len;
}

static int64_t pos_end(const Seq &p) {
  if (p.has_cigar) {
    int64_t e = p.pos;
    for (uint32_t cw : p.cigar)
      if ((cw & 0xf) == 0 || (cw & 0xf) == 2) e += cw >> 4;
    return e;
  }
  return p.pos + p.len;
}

static int64_t pos_end_multi(const Multi &q, int length) {
  if (q.has_cigar) {
    int64_t e = q.pos;
    for (uint32_t cw : q.cigar)
      if ((cw & 0xf) == 0 || (cw & 0xf) == 2) e += cw >> 4;
    return e;
  }
  return q.pos + length;
}

static void put_int(std::string &o, int64_t v) {
  char buf[24];
  snprintf(buf, sizeof buf, "%lld", (long long)v);
  o += buf;
}

static void put_cigar(std::string &o, const std::vector<uint32_t> &cig) {
  static const char *OPS = "MIDS";
  for (uint32_t cw : cig) {
    put_int(o, cw >> 4);
    o += OPS[cw & 0xf];
  }
}

// bwa_print_seq (bwase.c:366-384)
static void put_seq(std::string &o, const Seq &p) {
  static const char *F = "ACGTN", *R = "TGCAN";
  if (p.strand == 0) {
    for (int i = 0; i < p.full_len; ++i) {
      uint8_t c = p.codes[i];
      o += F[c > 4 ? 4 : c];
    }
  } else {
    for (int i = p.full_len - 1; i >= 0; --i) {
      uint8_t c = p.codes[i];
      o += R[c > 4 ? 4 : c];
    }
  }
}

enum { F_SU = 4, F_MU = 8, F_SR = 16, F_MR = 32 };

// bwa_print_sam1 (bwase.c:386-499), SE (mate == NULL)
static void print_sam1(const Ref &r, Seq &p, int mode, int max_top2,
                       const char *rg_id, std::string &o) {
  if (p.type != T_NO_MATCH) {
    int flag = 0;
    int64_t j = pos_end(p) - p.pos;
    int nn = cnt_ambi(r, p.pos, j);
    int seqid = pos2rid(r, p.pos);
    if (p.pos + j - r.ctg_off[seqid] > r.ctg_len[seqid]) flag |= F_SU;
    if (p.strand) flag |= F_SR;
    o += p.name; o += '\t'; put_int(o, flag); o += '\t';
    o += r.names + r.name_off[seqid]; o += '\t';
    put_int(o, p.pos - r.ctg_off[seqid] + 1); o += '\t';
    put_int(o, p.mapQ); o += '\t';
    if (p.has_cigar) put_cigar(o, p.cigar);
    else { put_int(o, p.len); o += 'M'; }
    o += "\t*\t0\t0\t";
    put_seq(o, p);
    o += '\t';
    if (p.qual) {
      if (p.strand) {
        for (int i = p.len - 1; i >= 0; --i) o += (char)p.qual[i];
        for (int i = p.len; i < p.qual_len; ++i) o += (char)p.qual[i];
      } else {
        o.append((const char *)p.qual, p.qual_len);
      }
    } else o += '*';
    if (rg_id && rg_id[0]) { o += "\tRG:Z:"; o += rg_id; }
    if (p.bc && p.bc[0]) { o += "\tBC:Z:"; o += p.bc; }
    if (p.clip_len < p.full_len) { o += "\tXC:i:"; put_int(o, p.clip_len); }
    char XT = "NURM"[p.type];
    if (nn > 10) XT = 'N';
    o += "\tXT:A:"; o += XT;
    o += (mode & 0x02) ? "\tNM:i:" : "\tCM:i:";  // BWA_MODE_COMPREAD
    put_int(o, p.nm);
    if (nn) { o += "\tXN:i:"; put_int(o, nn); }
    if (p.type != T_MATESW) {
      o += "\tX0:i:"; put_int(o, p.c1);
      if (p.c1 <= max_top2) { o += "\tX1:i:"; put_int(o, p.c2); }
    }
    o += "\tXM:i:"; put_int(o, p.n_mm);
    o += "\tXO:i:"; put_int(o, p.n_gapo);
    o += "\tXG:i:"; put_int(o, p.n_gapo + p.n_gape);
    if (!p.md.empty()) { o += "\tMD:Z:"; o += p.md; }
    if (!p.multi.empty()) {
      o += "\tXA:Z:";
      for (const Multi &q : p.multi) {
        int sq = pos2rid(r, q.pos);
        o += r.names + r.name_off[sq];
        o += ',';
        o += q.strand ? '-' : '+';
        put_int(o, q.pos - r.ctg_off[sq] + 1);
        o += ',';
        if (q.has_cigar) put_cigar(o, q.cigar);
        else { put_int(o, p.len); o += 'M'; }
        o += ',';
        put_int(o, q.gap + q.mm);
        o += ';';
      }
    }
    o += '\n';
  } else {
    int flag = F_SU;
    o += p.name; o += '\t'; put_int(o, flag);
    o += "\t*\t0\t0\t*\t*\t0\t0\t";
    put_seq(o, p);
    o += '\t';
    if (p.qual) {
      if (p.strand) {
        for (int i = p.len - 1; i >= 0; --i) o += (char)p.qual[i];
        for (int i = p.len; i < p.qual_len; ++i) o += (char)p.qual[i];
      } else o.append((const char *)p.qual, p.qual_len);
    } else o += '*';
    if (rg_id && rg_id[0]) { o += "\tRG:Z:"; o += rg_id; }
    if (p.bc && p.bc[0]) { o += "\tBC:Z:"; o += p.bc; }
    if (p.clip_len < p.full_len) { o += "\tXC:i:"; put_int(o, p.clip_len); }
    o += '\n';
  }
}

}  // namespace btsam

extern "C" {

// Returns bytes written to out_buf, or -needed when out_cap is too small
// (caller must restore *rng_state from its snapshot and retry).
// sai_bytes points at this batch's first record; *sai_used gets the
// consumed byte count.
int64_t bt_samse_batch(
    const uint8_t *occ_inter, int64_t seq_len,
    int64_t primary, const int64_t *L2, const int64_t *ssa, int32_t sa_intv,
    const uint8_t *pac, int64_t l_pac, const int64_t *ctg_off,
    const int32_t *ctg_len, const int32_t *name_off, const char *names,
    int32_t n_ctg, const int64_t *amb_off, const int32_t *amb_len,
    int32_t n_amb, int32_t n_reads, const uint8_t *codes_flat,
    const int64_t *codes_off, const int32_t *len_arr,
    const int32_t *full_len_arr, const int32_t *clip_len_arr,
    const uint8_t *qual_flat, const int64_t *qual_off,
    const char *rnames, const int64_t *rname_off, const char *bc_blob,
    const int32_t *bc_off, const uint8_t *sai_bytes, int64_t sai_len,
    int32_t mode, int32_t max_top2, int32_t n_multi, int32_t max_diff_opt,
    double fnr, const char *rg_id, uint64_t *rng_state, char *out_buf,
    int64_t out_cap, int64_t *sai_used) {
  using namespace btsam;
  init_log_n();
  FM g{occ_inter, seq_len, primary, L2, ssa, sa_intv};
  Ref r{pac, l_pac, ctg_off, ctg_len, name_off, names,
        n_ctg, amb_off, amb_len, n_amb};
  Rand48 rng{*rng_state};
  bool is_comp = (mode & 0x02) != 0;  // BWA_MODE_COMPREAD

  std::vector<Seq> seqs((size_t)n_reads);
  // parse .sai records + aln2seq
  const uint8_t *sp = sai_bytes;
  const uint8_t *sp_end = sai_bytes + sai_len;
  for (int i = 0; i < n_reads; ++i) {
    Seq &s = seqs[i];
    s.codes = codes_flat + codes_off[i];
    s.name = rnames + rname_off[i];
    s.qual = qual_off ? qual_flat + qual_off[i] : nullptr;
    s.qual_len = qual_off ? (int)(qual_off[i + 1] - qual_off[i]) : 0;
    s.bc = bc_blob ? bc_blob + bc_off[i] : nullptr;
    s.len = len_arr[i];
    s.full_len = full_len_arr[i];
    s.clip_len = clip_len_arr[i];
    if (sp + 4 > sp_end) return -1;
    int32_t n_aln;
    std::memcpy(&n_aln, sp, 4);
    sp += 4;
    if (sp + (int64_t)n_aln * 24 > sp_end) return -1;
    s.alns.resize(n_aln);
    for (int a = 0; a < n_aln; ++a) {
      uint64_t w0, k, l;
      std::memcpy(&w0, sp, 8);
      std::memcpy(&k, sp + 8, 8);
      std::memcpy(&l, sp + 16, 8);
      sp += 24;
      Aln1 &A = s.alns[a];
      A.n_mm = (int)(w0 & 0xFF);
      A.n_gapo = (int)((w0 >> 8) & 0xFF);
      A.n_gape = (int)((w0 >> 16) & 0xFF);
      A.score = (int)((w0 >> 24) & 0xFFFFF);
      A.n_ins = (int)((w0 >> 44) & 0x3FF);
      A.n_del = (int)((w0 >> 54) & 0x3FF);
      A.k = (int64_t)k;
      A.l = (int64_t)l;
    }
    aln2seq_core(s, rng, n_multi);
  }
  *sai_used = sp - sai_bytes;

  // cal_pac_pos (bwase.c:131-165 / samse.py cal_pac_pos)
  for (int i = 0; i < n_reads; ++i) {
    Seq &p = seqs[i];
    if (p.type == T_UNIQUE || p.type == T_REPEAT) {
      int max_diff = fnr > 0.0 ? cal_maxdiff(p.len, 0.02, fnr) : max_diff_opt;
      p.seQ = p.mapQ = approx_mapQ(p, max_diff);
      int strand;
      p.pos = pos2coord(r, sa_value(g, p.sa), p.len + p.ref_shift, &strand);
      p.strand = strand;
      p.seQ = p.mapQ = approx_mapQ(p, max_diff);
      if (p.pos == -1) p.type = T_NO_MATCH;
    }
    std::vector<Multi> kept;
    for (Multi &q : p.multi) {
      int strand;
      q.pos = pos2coord(r, sa_value(g, q.pos), p.len + q.ref_shift, &strand);
      q.strand = strand;
      if (q.pos != p.pos && q.pos != -1) kept.push_back(q);
    }
    p.multi = std::move(kept);
  }

  // refine_gapped (bwase.c:287-331)
  std::vector<uint8_t> fwd, rsq;
  for (int i = 0; i < n_reads; ++i) {
    Seq &s = seqs[i];
    fwd.assign(s.codes, s.codes + s.len);
    rsq.resize(s.len);
    for (int k = 0; k < s.len; ++k) {
      uint8_t c = fwd[s.len - 1 - k];
      rsq[k] = (is_comp && c < 4) ? 3 - c : c;
    }
    std::vector<Multi> kept;
    for (Multi &q : s.multi) {
      if (q.gap) {
        int64_t rb = q.pos;
        std::vector<uint32_t> cig;
        if (refine_core(r, s.len, q.strand ? rsq.data() : fwd.data(),
                        q.ref_shift, rb, cig)) {
          q.cigar = std::move(cig);
          q.has_cigar = true;
          q.pos = rb;
          kept.push_back(q);
        }
      } else kept.push_back(q);
    }
    s.multi = std::move(kept);
    if (!(s.type == T_NO_MATCH || s.type == T_MATESW) && s.n_gapo) {
      int64_t rb = s.pos;
      std::vector<uint32_t> cig;
      if (refine_core(r, s.len, s.strand ? rsq.data() : fwd.data(),
                      s.ref_shift, rb, cig)) {
        s.cigar = std::move(cig);
        s.has_cigar = true;
        s.pos = rb;
      } else s.type = T_NO_MATCH;
    }
    if (s.type != T_NO_MATCH)
      cal_md1(r, s.cigar, s.has_cigar, s.len, s.pos,
              s.strand ? rsq.data() : fwd.data(), s.md, s.nm);
    correct_trimmed(s);
  }

  // SAM text
  std::string out;
  out.reserve((size_t)n_reads * 256);
  for (int i = 0; i < n_reads; ++i)
    print_sam1(r, seqs[i], mode, max_top2, rg_id, out);
  if ((int64_t)out.size() > out_cap) return -(int64_t)out.size();
  std::memcpy(out_buf, out.data(), out.size());
  *rng_state = rng.x;
  return (int64_t)out.size();
}

}  // extern "C"
