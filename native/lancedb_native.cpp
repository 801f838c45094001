// lancedb_tpu native runtime — host-side hot paths in C++.
//
// The reference implements its host data plane in Rust (rust/lancedb +
// the lance crates). Here the TPU does the vector math; this module
// covers the CPU-bound pieces that are too slow in Python:
//
//   * FTS index building: tokenization (simple tokenizer + Porter
//     stemmer + stop words) and CSR postings accumulation
//     (reference: lance's inverted index builder, SURVEY.md §2.9 FTS)
//   * hash join for merge_insert key matching
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 lancedb_native.cpp -o liblancedb_native.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <thread>
#include <atomic>
#include <cstring>

namespace {

// ----------------------------------------------------------- tokenizer

inline bool is_word_char(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9') || c == '_';
}

// Lucene's classic english stop list (matches python tokenizer.py).
const std::unordered_map<std::string, bool>& stop_words() {
  static const std::unordered_map<std::string, bool> s = [] {
    std::unordered_map<std::string, bool> m;
    for (const char* w :
         {"a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
          "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
          "such", "that", "the", "their", "then", "there", "these",
          "they", "this", "to", "was", "will", "with"})
      m[w] = true;
    return m;
  }();
  return s;
}

// ------------------------------------------------------ porter stemmer
// Standard Porter algorithm, behavior-matched to the python
// implementation in lancedb_tpu/index/tokenizer.py (_porter_stem).

struct Porter {
  static bool cons(const std::string& w, int i) {
    char c = w[i];
    if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
    if (c == 'y') return i == 0 ? true : !cons(w, i - 1);
    return true;
  }

  static int measure(const std::string& stem) {
    std::string form;
    for (size_t i = 0; i < stem.size(); i++)
      form += cons(stem, (int)i) ? 'C' : 'V';
    // collapse runs
    std::string collapsed;
    for (char c : form)
      if (collapsed.empty() || collapsed.back() != c) collapsed += c;
    int m = 0;
    for (size_t i = 0; i + 1 < collapsed.size(); i++)
      if (collapsed[i] == 'V' && collapsed[i + 1] == 'C') m++;
    return m;
  }

  static bool has_vowel(const std::string& stem) {
    for (size_t i = 0; i < stem.size(); i++)
      if (!cons(stem, (int)i)) return true;
    return false;
  }

  static bool ends_double_cons(const std::string& w) {
    size_t n = w.size();
    return n >= 2 && w[n - 1] == w[n - 2] && cons(w, (int)n - 1);
  }

  static bool cvc(const std::string& w) {
    size_t n = w.size();
    if (n < 3) return false;
    if (!(cons(w, (int)n - 3) && !cons(w, (int)n - 2) && cons(w, (int)n - 1)))
      return false;
    char last = w[n - 1];
    return last != 'w' && last != 'x' && last != 'y';
  }

  static bool ends(const std::string& w, const char* suf) {
    size_t sl = strlen(suf);
    return w.size() >= sl && w.compare(w.size() - sl, sl, suf) == 0;
  }

  static std::string stem(std::string w) {
    if (w.size() <= 2) return w;
    // 1a
    if (ends(w, "sses")) w.resize(w.size() - 2);
    else if (ends(w, "ies")) w.resize(w.size() - 2);
    else if (ends(w, "ss")) {}
    else if (ends(w, "s")) w.resize(w.size() - 1);
    // 1b
    bool flag = false;
    if (ends(w, "eed")) {
      if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
    } else if (ends(w, "ed")) {
      if (has_vowel(w.substr(0, w.size() - 2))) { w.resize(w.size() - 2); flag = true; }
    } else if (ends(w, "ing")) {
      if (has_vowel(w.substr(0, w.size() - 3))) { w.resize(w.size() - 3); flag = true; }
    }
    if (flag) {
      if (ends(w, "at") || ends(w, "bl") || ends(w, "iz")) w += 'e';
      else if (ends_double_cons(w) && !ends(w, "l") && !ends(w, "s") && !ends(w, "z"))
        w.resize(w.size() - 1);
      else if (measure(w) == 1 && cvc(w)) w += 'e';
    }
    // 1c
    if (ends(w, "y") && has_vowel(w.substr(0, w.size() - 1))) w[w.size() - 1] = 'i';
    // 2
    {
      static const std::pair<const char*, const char*> pairs2[] = {
          {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"}, {"anci", "ance"},
          {"izer", "ize"}, {"abli", "able"}, {"alli", "al"}, {"entli", "ent"},
          {"eli", "e"}, {"ousli", "ous"}, {"ization", "ize"}, {"ation", "ate"},
          {"ator", "ate"}, {"alism", "al"}, {"iveness", "ive"}, {"fulness", "ful"},
          {"ousness", "ous"}, {"aliti", "al"}, {"iviti", "ive"}, {"biliti", "ble"}};
      for (auto& [suf, rep] : pairs2) {
        if (ends(w, suf)) {
          std::string st = w.substr(0, w.size() - strlen(suf));
          if (measure(st) > 0) w = st + rep;
          break;
        }
      }
    }
    // 3
    {
      static const std::pair<const char*, const char*> pairs3[] = {
          {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
          {"ical", "ic"}, {"ful", ""}, {"ness", ""}};
      for (auto& [suf, rep] : pairs3) {
        if (ends(w, suf)) {
          std::string st = w.substr(0, w.size() - strlen(suf));
          if (measure(st) > 0) w = st + rep;
          break;
        }
      }
    }
    // 4 — longest suffix first (matches python's sorted(key=len, reverse=True))
    {
      static const char* sufs4[] = {"ement", "ance", "ence", "able", "ible",
                                    "ment", "ent",  "ant",  "ism",  "ate",
                                    "iti",  "ous",  "ive",  "ize",  "al",
                                    "er",   "ic",   "ou"};
      bool hit = false;
      for (const char* suf : sufs4) {
        if (ends(w, suf)) {
          std::string st = w.substr(0, w.size() - strlen(suf));
          if (measure(st) > 1) w = st;
          hit = true;
          break;
        }
      }
      if (!hit && ends(w, "ion")) {
        std::string st = w.substr(0, w.size() - 3);
        if (measure(st) > 1 && (ends(st, "s") || ends(st, "t"))) w = st;
      }
    }
    // 5a
    if (ends(w, "e")) {
      std::string st = w.substr(0, w.size() - 1);
      int m = measure(st);
      if (m > 1 || (m == 1 && !cvc(st))) w = st;
    }
    // 5b
    if (measure(w) > 1 && ends_double_cons(w) && ends(w, "l")) w.resize(w.size() - 1);
    return w;
  }
};

// ------------------------------------------------------- FTS builder

struct FtsBuilder {
  std::vector<std::string> vocab;                     // tid -> term
  std::unordered_map<std::string, int32_t> term_ids;  // term -> tid
  // per term: (doc, tf, first positions index) — positions flat per term
  struct Posting { int32_t doc; float tf; std::vector<int32_t> positions; };
  std::vector<std::vector<Posting>> postings;  // tid -> postings (doc asc)
  std::vector<int32_t> doc_lens;
  int64_t total_postings = 0;
  int64_t total_positions = 0;
  int64_t vocab_bytes = 0;
};

void tokenize_doc(const char* begin, const char* end, bool lower, bool do_stem,
                  bool drop_stop, int max_len, std::vector<std::string>& out) {
  const char* p = begin;
  std::string tok;
  while (p < end) {
    while (p < end && !is_word_char((unsigned char)*p)) p++;
    const char* start = p;
    while (p < end && is_word_char((unsigned char)*p)) p++;
    if (p == start) break;
    tok.assign(start, p);
    if (max_len > 0 && (int)tok.size() > max_len) continue;
    if (lower)
      for (auto& c : tok)
        if (c >= 'A' && c <= 'Z') c += 32;
    if (drop_stop && stop_words().count(tok)) continue;
    if (do_stem) tok = Porter::stem(tok);
    if (!tok.empty()) out.push_back(tok);
  }
}

}  // namespace

extern "C" {

void* ldb_fts_build(const char* blob, const int64_t* offsets, int64_t ndocs,
                    int lower, int do_stem, int drop_stop, int max_len,
                    int with_positions) {
  auto* b = new FtsBuilder();
  b->doc_lens.reserve(ndocs);
  std::vector<std::string> toks;
  for (int64_t d = 0; d < ndocs; d++) {
    toks.clear();
    tokenize_doc(blob + offsets[d], blob + offsets[d + 1], lower, do_stem,
                 drop_stop, max_len, toks);
    b->doc_lens.push_back((int32_t)toks.size());
    for (size_t pos = 0; pos < toks.size(); pos++) {
      const std::string& t = toks[pos];
      auto it = b->term_ids.find(t);
      int32_t tid;
      if (it == b->term_ids.end()) {
        tid = (int32_t)b->vocab.size();
        b->term_ids.emplace(t, tid);
        b->vocab.push_back(t);
        b->vocab_bytes += (int64_t)t.size();
        b->postings.emplace_back();
      } else {
        tid = it->second;
      }
      auto& plist = b->postings[tid];
      if (plist.empty() || plist.back().doc != (int32_t)d) {
        plist.push_back({(int32_t)d, 0.0f, {}});
        b->total_postings++;
      }
      plist.back().tf += 1.0f;
      if (with_positions) {
        plist.back().positions.push_back((int32_t)pos);
        b->total_positions++;
      }
    }
  }
  return b;
}

int64_t ldb_fts_num_terms(void* h) { return (int64_t)((FtsBuilder*)h)->vocab.size(); }
int64_t ldb_fts_num_postings(void* h) { return ((FtsBuilder*)h)->total_postings; }
int64_t ldb_fts_num_positions(void* h) { return ((FtsBuilder*)h)->total_positions; }
int64_t ldb_fts_vocab_bytes(void* h) { return ((FtsBuilder*)h)->vocab_bytes; }
int64_t ldb_fts_num_docs(void* h) { return (int64_t)((FtsBuilder*)h)->doc_lens.size(); }

// Export everything into caller-allocated buffers (sizes from getters).
void ldb_fts_export(void* h, char* vocab_buf, int64_t* vocab_offsets,
                    int32_t* df, int64_t* post_offsets, int32_t* post_docs,
                    float* post_tf, int64_t* pos_offsets, int32_t* positions,
                    int32_t* doc_lens) {
  auto* b = (FtsBuilder*)h;
  int64_t vb = 0;
  int64_t pw = 0;   // posting write index
  int64_t posw = 0; // position write index
  int64_t T = (int64_t)b->vocab.size();
  for (int64_t t = 0; t < T; t++) {
    vocab_offsets[t] = vb;
    const std::string& term = b->vocab[t];
    memcpy(vocab_buf + vb, term.data(), term.size());
    vb += (int64_t)term.size();
    post_offsets[t] = pw;
    auto& plist = b->postings[t];
    df[t] = (int32_t)plist.size();
    for (auto& p : plist) {
      post_docs[pw] = p.doc;
      post_tf[pw] = p.tf;
      if (pos_offsets) {
        pos_offsets[pw] = posw;
        for (int32_t pp : p.positions) positions[posw++] = pp;
      }
      pw++;
    }
  }
  vocab_offsets[T] = vb;
  post_offsets[T] = pw;
  if (pos_offsets) pos_offsets[pw] = posw;
  memcpy(doc_lens, b->doc_lens.data(), b->doc_lens.size() * sizeof(int32_t));
}

void ldb_fts_free(void* h) { delete (FtsBuilder*)h; }

// ------------------------------------------------------- hash join
// merge_insert key matching: for every target key, the index of the
// matching source key (or -1). Keys are pre-serialized byte strings.

void ldb_hash_join(const char* src_blob, const int64_t* src_offsets, int64_t n_src,
                   const char* tgt_blob, const int64_t* tgt_offsets, int64_t n_tgt,
                   int64_t* out_match) {
  std::unordered_map<std::string, int64_t> index;
  index.reserve((size_t)n_src * 2);
  for (int64_t i = 0; i < n_src; i++) {
    index.emplace(std::string(src_blob + src_offsets[i],
                              (size_t)(src_offsets[i + 1] - src_offsets[i])),
                  i);
  }
  std::string key;
  for (int64_t i = 0; i < n_tgt; i++) {
    key.assign(tgt_blob + tgt_offsets[i],
               (size_t)(tgt_offsets[i + 1] - tgt_offsets[i]));
    auto it = index.find(key);
    out_match[i] = it == index.end() ? -1 : it->second;
  }
}

// ------------------------------------------------------- suffix array
// FM substring index construction (index/scalar.py): prefix doubling
// with radix sort — O(n log n), ~20x the numpy doubling loop. Ranks fit
// int32 (text blobs are capped far below 2^31 by the caller).

void ldb_suffix_array(const uint8_t* text, int64_t n, int32_t* out_sa) {
  if (n <= 0) return;
  std::vector<int32_t> sa(n), rank(n), tmp(n), cnt;
  for (int64_t i = 0; i < n; i++) {
    sa[i] = (int32_t)i;
    rank[i] = text[i];
  }
  auto radix_pass = [&](std::vector<int32_t>& src, std::vector<int32_t>& dst,
                        auto key, int32_t kmax) {
    cnt.assign((size_t)kmax + 2, 0);
    for (int64_t i = 0; i < n; i++) cnt[(size_t)key(src[i]) + 1]++;
    for (size_t i = 1; i < cnt.size(); i++) cnt[i] += cnt[i - 1];
    for (int64_t i = 0; i < n; i++) dst[cnt[(size_t)key(src[i])]++] = src[i];
  };
  std::vector<int32_t> order(n), order2(n);
  // initial sort by first byte
  radix_pass(sa, order, [&](int32_t i) { return rank[i] + 1; }, 257);
  // assign initial ranks
  tmp[order[0]] = 0;
  for (int64_t i = 1; i < n; i++) {
    tmp[order[i]] = tmp[order[i - 1]] + (text[order[i]] != text[order[i - 1]] ? 1 : 0);
  }
  rank.swap(tmp);
  for (int64_t k = 1; k < n; k <<= 1) {
    auto rank_at = [&](int64_t i) -> int32_t {
      return i + k < n ? rank[i + k] + 1 : 0;
    };
    int32_t rmax = 0;
    for (int64_t i = 0; i < n; i++) rmax = std::max(rmax, rank[i]);
    // radix: second key then first key (stable)
    radix_pass(order, order2, [&](int32_t i) { return rank_at(i); }, rmax + 1);
    radix_pass(order2, order, [&](int32_t i) { return rank[i] + 1; }, rmax + 1);
    tmp[order[0]] = 0;
    bool done = true;
    for (int64_t i = 1; i < n; i++) {
      int32_t a = order[i], b = order[i - 1];
      int inc = (rank[a] != rank[b] || rank_at(a) != rank_at(b)) ? 1 : 0;
      tmp[a] = tmp[b] + inc;
      done &= inc;
    }
    rank.swap(tmp);
    if (done) break;
  }
  memcpy(out_sa, order.data(), (size_t)n * sizeof(int32_t));
}

// ------------------------------------------------- varint posting codec
// delta + LEB128 varint encode/decode for sorted int64 posting lists
// (FTS/scalar index persistence; reference posting blocks, SURVEY §2.9).

int64_t ldb_varint_encode(const int64_t* values, int64_t n, uint8_t* out) {
  uint8_t* p = out;
  int64_t prev = 0;
  for (int64_t i = 0; i < n; i++) {
    uint64_t delta = (uint64_t)(values[i] - prev);
    prev = values[i];
    while (delta >= 0x80) {
      *p++ = (uint8_t)(delta | 0x80);
      delta >>= 7;
    }
    *p++ = (uint8_t)delta;
  }
  return (int64_t)(p - out);
}

int64_t ldb_varint_decode(const uint8_t* data, int64_t nbytes, int64_t n,
                          int64_t* out) {
  const uint8_t* p = data;
  const uint8_t* end = data + nbytes;
  int64_t prev = 0;
  for (int64_t i = 0; i < n; i++) {
    uint64_t v = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      v |= (uint64_t)(b & 0x7F) << shift;
      if (!(b & 0x80)) break;
      shift += 7;
    }
    prev += (int64_t)v;
    out[i] = prev;
  }
  return (int64_t)(p - data);
}

// ------------------------------------------------- BM25 DAAT MaxScore
//
// Document-at-a-time MaxScore top-k (Turtle & Flood): terms sort by
// ascending score upper bound; only the "essential" suffix drives the
// document cursor, the low-impact prefix is probed by forward binary
// search and skipped entirely once theta proves it can't matter. Exact
// top-k without materializing a dense score array — the serving-path
// replacement for the numpy scorer in index/fts.py score_match_topk
// (reference behavior: tantivy/lance block-wise top-k, SURVEY §2.9).
//
// postings_docs/postings_tf: the index's global CSR arrays (int64).
// dead: optional per-doc skip bitmap (deleted rows / dead fragments).
// qub: optional per-query-term score upper bound (idf folded in) — the
//   caller's cached MaxScore table; when null the exact bound is
//   recomputed here by scanning each term's postings (slow for common
//   terms, kept as a fallback).
// block_max / block_offsets: optional block-max table (Ding & Suel
//   BMW adapted to MaxScore): block_max holds, per LDB_FTS_BLK-posting
//   block of each term, the max raw contribution tf*(k1+1)/(tf+norm)
//   WITHOUT idf; block_offsets is a per-term CSR into it. When present
//   the essential-cursor loop skips whole blocks that provably cannot
//   beat the running kth score.
// Returns the number of results written (<= k), docs/scores sorted by
// descending score.
#define LDB_FTS_BLK 128

namespace {

typedef std::pair<float, int64_t> LdbHit;

struct LdbCursor {
  const int64_t* docs;
  const int64_t* tfs;
  int64_t len;
  int64_t pos;
  float idf;
  float ub;
  const float* bmax;  // this term's block maxima (null: no table)
};

// Monotonic-max on a float stored as uint32 bits (valid for scores > 0:
// positive-float bit patterns order identically to their uint32 view).
inline void ldb_theta_publish(std::atomic<uint32_t>* g, float v) {
  if (g == nullptr || v <= 0.0f) return;
  uint32_t bits;
  std::memcpy(&bits, &v, 4);
  uint32_t cur = g->load(std::memory_order_relaxed);
  while (bits > cur &&
         !g->compare_exchange_weak(cur, bits, std::memory_order_relaxed)) {
  }
}

inline float ldb_theta_read(std::atomic<uint32_t>* g, float local) {
  if (g == nullptr) return local;
  uint32_t bits = g->load(std::memory_order_relaxed);
  float v;
  std::memcpy(&v, &bits, 4);
  return v > local ? v : local;
}

// MaxScore + block-max core over the doc-id range [doc_lo, doc_hi).
// theta0 pre-seeds the pruning threshold (exact when it is an
// achievable kth-best score — see the python-side seed scoring);
// gtheta optionally shares the threshold across range-sharded threads.
// Results (> theta0 only) land in `heap` unsorted (min-heap layout).
void ldb_maxscore_core(std::vector<LdbCursor> cur, int k, float k1,
                       const float* doc_norm, const uint8_t* dead,
                       const float* block_max, int64_t doc_lo, int64_t doc_hi,
                       float theta0, std::atomic<uint32_t>* gtheta,
                       std::vector<LdbHit>& heap) {
  int n = (int)cur.size();
  std::sort(cur.begin(), cur.end(),
            [](const LdbCursor& a, const LdbCursor& b) { return a.ub < b.ub; });
  std::vector<float> prefix(n);
  float acc = 0.0f;
  for (int i = 0; i < n; i++) {
    acc += cur[i].ub;
    prefix[i] = acc;
  }
  for (auto& c : cur) {
    if (doc_lo > 0) {
      const int64_t* lo = std::lower_bound(c.docs, c.docs + c.len, doc_lo);
      c.pos = lo - c.docs;
    }
  }

  auto cmp = [](const LdbHit& a, const LdbHit& b) { return a.first > b.first; };
  float theta = theta0 > 0.0f ? theta0 : -1.0f;

  int ess = 0;
  auto update_ess = [&]() {
    while (ess < n - 1 && prefix[ess] <= theta) ess++;
  };
  update_ess();

  auto contrib = [&](const LdbCursor& c, int64_t at) -> float {
    float tf = (float)c.tfs[at];
    return c.idf * tf * (k1 + 1.0f) / (tf + doc_norm[c.docs[at]]);
  };
  auto block_last = [&](const LdbCursor& c) -> int64_t {
    int64_t bend = (c.pos / LDB_FTS_BLK + 1) * LDB_FTS_BLK;
    return c.docs[(bend < c.len ? bend : c.len) - 1];
  };

  int64_t steps = 0;
  while (true) {
    int64_t d = INT64_MAX;
    for (int i = ess; i < n; i++) {
      if (cur[i].pos < cur[i].len && cur[i].docs[cur[i].pos] < d)
        d = cur[i].docs[cur[i].pos];
    }
    if (d == INT64_MAX || d >= doc_hi) break;
    if (gtheta != nullptr && (++steps & 1023) == 0) {
      float g = ldb_theta_read(gtheta, theta);
      if (g > theta) {
        theta = g;
        update_ess();
      }
    }
    if (block_max != nullptr && theta > 0.0f) {
      float ceiling = ess > 0 ? prefix[ess - 1] : 0.0f;
      int64_t dprime = INT64_MAX;
      for (int i = ess; i < n; i++) {
        LdbCursor& c = cur[i];
        if (c.pos >= c.len) continue;
        ceiling += c.idf * c.bmax[c.pos / LDB_FTS_BLK];
        int64_t bl = block_last(c);
        if (bl < dprime) dprime = bl;
      }
      if (ceiling <= theta) {
        dprime += 1;
        for (int i = ess; i < n; i++) {
          LdbCursor& c = cur[i];
          if (c.pos >= c.len || c.docs[c.pos] >= dprime) continue;
          while (c.pos < c.len && block_last(c) < dprime)
            c.pos = (c.pos / LDB_FTS_BLK + 1) * LDB_FTS_BLK;
          if (c.pos > c.len) c.pos = c.len;
          const int64_t* lo =
              std::lower_bound(c.docs + c.pos, c.docs + c.len, dprime);
          c.pos = lo - c.docs;
        }
        continue;
      }
    }
    bool skip = dead != nullptr && dead[d];
    float score = 0.0f;
    for (int i = ess; i < n; i++) {
      LdbCursor& c = cur[i];
      if (c.pos < c.len && c.docs[c.pos] == d) {
        if (!skip) score += contrib(c, c.pos);
        c.pos++;
      }
    }
    if (!skip) {
      for (int j = ess - 1; j >= 0; j--) {
        if (score + prefix[j] <= theta) {
          score = -1.0f;
          break;
        }
        LdbCursor& c = cur[j];
        const int64_t* lo =
            std::lower_bound(c.docs + c.pos, c.docs + c.len, d);
        c.pos = lo - c.docs;
        if (c.pos < c.len && c.docs[c.pos] == d) score += contrib(c, c.pos);
      }
      if (score > theta) {
        heap.push_back({score, d});
        std::push_heap(heap.begin(), heap.end(), cmp);
        if ((int)heap.size() > k) {
          std::pop_heap(heap.begin(), heap.end(), cmp);
          heap.pop_back();
        }
        if ((int)heap.size() == k) {
          theta = heap.front().first;
          ldb_theta_publish(gtheta, theta);
          update_ess();
        }
      }
    }
  }
}

}  // namespace

// theta_init / seed_docs / seed_scores / n_seed: optional EXACT
// pre-seeding of the pruning threshold from cached per-term top-impact
// postings (python side, index/fts.py impact_seeds): the DAAT loop
// starts with theta at an achievable kth-best score instead of
// warming up from -inf, so block-max skipping engages from the first
// document. Seeds also backfill the result when ties AT theta leave
// the heap short (docs scoring exactly theta are prunable).
// n_threads > 1 shards the doc-id space and shares theta across
// shards via an atomic (single-threaded on this image's 1-core host;
// scales on real serving machines).
int64_t ldb_bm25_maxscore_topk(
    const int64_t* postings_docs, const int64_t* postings_tf,
    const int64_t* postings_offsets, const int32_t* qterms,
    const float* qidf, const float* qub, const float* block_max,
    const int64_t* block_offsets, int32_t n_q, const float* doc_norm,
    const uint8_t* dead, int64_t num_docs, int32_t k, float k1,
    float theta_init, const int64_t* seed_docs, const float* seed_scores,
    int32_t n_seed, int32_t n_threads,
    int64_t* out_docs, float* out_scores) {
  if (n_q <= 0 || k <= 0) return 0;
  std::vector<LdbCursor> cur;
  cur.reserve(n_q);
  int64_t total_postings = 0;
  for (int32_t i = 0; i < n_q; i++) {
    int64_t s = postings_offsets[qterms[i]];
    int64_t e = postings_offsets[qterms[i] + 1];
    if (e <= s) continue;
    const float* bm =
        block_max != nullptr ? block_max + block_offsets[qterms[i]] : nullptr;
    LdbCursor c{postings_docs + s, postings_tf + s, e - s, 0, qidf[i], 0.0f, bm};
    if (qub != nullptr) {
      c.ub = qub[i];
    } else {
      float best = 0.0f;
      for (int64_t j = s; j < e; j++) {
        float tf = (float)postings_tf[j];
        float v = tf * (k1 + 1.0f) / (tf + doc_norm[postings_docs[j]]);
        if (v > best) best = v;
      }
      c.ub = c.idf * best;
    }
    total_postings += c.len;
    cur.push_back(c);
  }
  if (cur.empty()) return 0;

  auto cmp = [](const LdbHit& a, const LdbHit& b) { return a.first > b.first; };
  std::vector<LdbHit> heap;
  heap.reserve(2 * k + 2);

  if (n_threads > 1 && total_postings > (int64_t)(LDB_FTS_BLK * n_threads) * 4) {
    std::atomic<uint32_t> gtheta{0};
    ldb_theta_publish(&gtheta, theta_init);
    std::vector<std::vector<LdbHit>> heaps(n_threads);
    std::vector<std::thread> ts;
    int64_t span = (num_docs + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t lo = t * span;
      int64_t hi = std::min<int64_t>(num_docs, lo + span);
      ts.emplace_back([&, t, lo, hi]() {
        ldb_maxscore_core(cur, k, k1, doc_norm, dead, block_max, lo, hi,
                          theta_init, &gtheta, heaps[t]);
      });
    }
    for (auto& th : ts) th.join();
    for (auto& h : heaps)
      for (auto& hit : h) {
        heap.push_back(hit);
        std::push_heap(heap.begin(), heap.end(), cmp);
        if ((int)heap.size() > k) {
          std::pop_heap(heap.begin(), heap.end(), cmp);
          heap.pop_back();
        }
      }
  } else {
    ldb_maxscore_core(cur, k, k1, doc_norm, dead, block_max, 0, num_docs,
                      theta_init, nullptr, heap);
  }

  // ties at theta_init were pruned: backfill from the seed candidates
  if ((int)heap.size() < k && n_seed > 0) {
    for (int32_t i = 0; i < n_seed && (int)heap.size() < k; i++) {
      bool present = false;
      for (auto& h : heap)
        if (h.second == seed_docs[i]) {
          present = true;
          break;
        }
      if (!present && seed_scores[i] > 0.0f)
        heap.push_back({seed_scores[i], seed_docs[i]});
    }
  }
  std::sort(heap.begin(), heap.end(),
            [](const LdbHit& a, const LdbHit& b) { return a.first > b.first; });
  int64_t m = std::min<int64_t>((int64_t)heap.size(), k);
  for (int64_t i = 0; i < m; i++) {
    out_scores[i] = heap[i].first;
    out_docs[i] = heap[i].second;
  }
  return m;
}

// --------------------------------------- BM25 impact-ordered TA top-k
//
// Threshold Algorithm (Fagin) over per-term IMPACT-ORDERED postings —
// the exact-retrieval answer to the common-term worst case where DAAT
// MaxScore/BMW degrade to a full linear merge (millions of tied-score
// postings). Each term also keeps its doc-sorted postings for random
// access.
//
//   sorted access: pop the term whose next impact-ordered posting has
//     the highest idf-weighted contribution; fully score that doc
//     (partner terms via forward binary search in doc order);
//   threshold   = sum_t idf_t * current_contribution_t — an upper
//     bound on every unseen doc's score;
//   stop        when the running kth best >= threshold (remaining docs
//     cannot EXCEED the kth; ties lose, matching the DAAT scorer).
//
// Quantized score distributions (short uniform docs, small tf) plateau
// the threshold, which triggers the >=-stop almost immediately —
// exactly the regime that defeats block-max skipping.
//
// imp_pos: per-posting within-term positions sorted by descending
// contribution (CSR layout shared with postings_offsets).
int64_t ldb_bm25_impact_topk(
    const int64_t* postings_docs, const int64_t* postings_tf,
    const int64_t* postings_offsets, const int32_t* imp_pos,
    const int32_t* qterms, const float* qidf, int32_t n_q,
    const float* doc_norm, const uint8_t* dead, int32_t k, float k1,
    int64_t max_pops,  // <=0: unlimited; else return -1 if not converged
    int64_t* out_docs, float* out_scores) {
  if (n_q <= 0 || k <= 0) return 0;
  struct Term {
    const int64_t* docs;   // doc-sorted
    const int64_t* tfs;
    const int32_t* imp;    // impact-order positions into docs/tfs
    int64_t len;
    int64_t p;             // cursor into imp
    float idf;
    float cur;             // idf * contribution at imp[p]
  };
  auto contrib_at = [&](const Term& t, int64_t pos) -> float {
    float tf = (float)t.tfs[pos];
    return tf * (k1 + 1.0f) / (tf + doc_norm[t.docs[pos]]);
  };
  std::vector<Term> terms;
  terms.reserve(n_q);
  for (int32_t i = 0; i < n_q; i++) {
    int64_t s = postings_offsets[qterms[i]];
    int64_t e = postings_offsets[qterms[i] + 1];
    if (e <= s) continue;
    Term t{postings_docs + s, postings_tf + s, imp_pos + s, e - s, 0,
           qidf[i], 0.0f};
    t.cur = t.idf * contrib_at(t, t.imp[0]);
    terms.push_back(t);
  }
  if (terms.empty()) return 0;
  int n = (int)terms.size();

  typedef std::pair<float, int64_t> Hit;
  std::vector<Hit> heap;
  heap.reserve(k + 1);
  auto cmp = [](const Hit& a, const Hit& b) { return a.first > b.first; };
  std::unordered_set<int64_t> seen;
  seen.reserve(1024);

  // Batched sorted access: pop up to POPB consecutive impact entries of
  // the best term per round, doc-sort them, and resolve partner terms
  // with a galloping sorted merge — amortizes the per-doc binary
  // searches that dominate single-pop TA. May overshoot the stop point
  // by < POPB pops; results stay exact (extra pops only ADD candidates).
  constexpr int POPB = 64;
  std::pair<int64_t, float> batch[POPB];  // (doc, popped-term contribution)
  int64_t pops = 0;
  while (true) {
    float threshold = 0.0f;
    int best = -1;
    float best_cur = -1.0f;
    for (int i = 0; i < n; i++) {
      if (terms[i].p >= terms[i].len) continue;
      threshold += terms[i].cur;
      if (terms[i].cur > best_cur) {
        best_cur = terms[i].cur;
        best = i;
      }
    }
    if (best < 0) break;
    if ((int)heap.size() >= k && heap.front().first >= threshold) break;
    // Non-convergence bail-out: with 3+ common terms the summed upper
    // bound decays too slowly for the stop to fire and TA degrades far
    // below a DAAT merge (measured 26 qps vs 78 on a 3-common-term OR
    // at 1M docs). The caller falls back to MaxScore/BMW on -1.
    if (max_pops > 0 && pops >= max_pops) return -1;
    Term& t = terms[best];
    int nb = 0;
    while (nb < POPB && t.p < t.len) {
      int64_t pos = t.imp[t.p];
      int64_t d = t.docs[pos];
      t.p++;
      pops++;
      if (dead != nullptr && dead[d]) continue;
      if (!seen.insert(d).second) continue;
      batch[nb++] = {d, t.idf * contrib_at(t, pos)};
    }
    if (t.p < t.len) t.cur = t.idf * contrib_at(t, t.imp[t.p]);
    if (nb == 0) continue;
    std::sort(batch, batch + nb,
              [](const std::pair<int64_t, float>& a,
                 const std::pair<int64_t, float>& b) { return a.first < b.first; });
    float scores[POPB];
    for (int j = 0; j < nb; j++) scores[j] = batch[j].second;
    for (int i = 0; i < n; i++) {
      if (i == best) continue;
      const Term& u = terms[i];
      const int64_t* cur_lo = u.docs;
      const int64_t* end = u.docs + u.len;
      for (int j = 0; j < nb; j++) {
        cur_lo = std::lower_bound(cur_lo, end, batch[j].first);
        if (cur_lo == end) break;
        if (*cur_lo == batch[j].first)
          scores[j] += u.idf * contrib_at(u, cur_lo - u.docs);
      }
    }
    for (int j = 0; j < nb; j++) {
      float score = scores[j];
      if ((int)heap.size() < k || score > heap.front().first) {
        heap.push_back({score, batch[j].first});
        std::push_heap(heap.begin(), heap.end(), cmp);
        if ((int)heap.size() > k) {
          std::pop_heap(heap.begin(), heap.end(), cmp);
          heap.pop_back();
        }
      }
    }
  }
  std::sort(heap.begin(), heap.end(),
            [](const Hit& a, const Hit& b) { return a.first > b.first; });
  int64_t m = (int64_t)heap.size();
  for (int64_t i = 0; i < m; i++) {
    out_scores[i] = heap[i].first;
    out_docs[i] = heap[i].second;
  }
  return m;
}

// ------------------------------------------------ BM25 DAAT AND top-k
//
// Conjunctive (operator=AND) BM25 top-k: the shortest posting list
// drives the document cursor, every other list is advanced by forward
// binary search (galloping over ascending doc ids). Only docs present
// in ALL lists score — the intersection is tiny for selective
// conjunctions, so this replaces the dense match_count arrays the
// numpy scorer builds (index/fts.py score_match AND path). Duplicate
// query terms contribute once per occurrence, matching the python
// per-token scoring.
int64_t ldb_bm25_and_topk(
    const int64_t* postings_docs, const int64_t* postings_tf,
    const int64_t* postings_offsets, const int32_t* qterms,
    const float* qidf, int32_t n_q, const float* doc_norm,
    const uint8_t* dead, int32_t k, float k1,
    int64_t* out_docs, float* out_scores) {
  if (n_q <= 0 || k <= 0) return 0;
  struct Cursor {
    const int64_t* docs;
    const int64_t* tfs;
    int64_t len;
    int64_t pos;
    float idf;  // summed over duplicate query occurrences
  };
  // unique terms; duplicate tokens fold into one cursor with summed idf
  std::vector<Cursor> cur;
  for (int32_t i = 0; i < n_q; i++) {
    int64_t s = postings_offsets[qterms[i]];
    int64_t e = postings_offsets[qterms[i] + 1];
    if (e <= s) return 0;  // a required term with no postings: no matches
    bool merged = false;
    for (auto& c : cur) {
      if (c.docs == postings_docs + s) {
        c.idf += qidf[i];
        merged = true;
        break;
      }
    }
    if (!merged)
      cur.push_back({postings_docs + s, postings_tf + s, e - s, 0, qidf[i]});
  }
  std::sort(cur.begin(), cur.end(),
            [](const Cursor& a, const Cursor& b) { return a.len < b.len; });
  int n = (int)cur.size();

  typedef std::pair<float, int64_t> Hit;
  std::vector<Hit> heap;
  heap.reserve(k + 1);
  auto cmp = [](const Hit& a, const Hit& b) { return a.first > b.first; };

  Cursor& drv = cur[0];
  for (; drv.pos < drv.len; drv.pos++) {
    int64_t d = drv.docs[drv.pos];
    bool all = true;
    for (int i = 1; i < n; i++) {
      Cursor& c = cur[i];
      const int64_t* lo = std::lower_bound(c.docs + c.pos, c.docs + c.len, d);
      c.pos = lo - c.docs;
      if (c.pos >= c.len) return [&] {  // a list exhausted: finish up
        std::sort(heap.begin(), heap.end(),
                  [](const Hit& a, const Hit& b) { return a.first > b.first; });
        int64_t m = (int64_t)heap.size();
        for (int64_t j = 0; j < m; j++) {
          out_scores[j] = heap[j].first;
          out_docs[j] = heap[j].second;
        }
        return m;
      }();
      if (c.docs[c.pos] != d) {
        all = false;
        break;
      }
    }
    if (!all || (dead != nullptr && dead[d])) continue;
    float score = 0.0f;
    for (int i = 0; i < n; i++) {
      float tf = (float)cur[i].tfs[cur[i].pos];
      score += cur[i].idf * tf * (k1 + 1.0f) / (tf + doc_norm[d]);
    }
    if ((int)heap.size() < k || score > heap.front().first) {
      heap.push_back({score, d});
      std::push_heap(heap.begin(), heap.end(), cmp);
      if ((int)heap.size() > k) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        heap.pop_back();
      }
    }
  }
  std::sort(heap.begin(), heap.end(),
            [](const Hit& a, const Hit& b) { return a.first > b.first; });
  int64_t m = (int64_t)heap.size();
  for (int64_t i = 0; i < m; i++) {
    out_scores[i] = heap[i].first;
    out_docs[i] = heap[i].second;
  }
  return m;
}

// ------------------------------------------------- phrase DAAT top-k
//
// Phrase query: conjunction over the phrase's terms, then positional
// verification per intersected doc (greedy window walk matching
// index/fts.py _phrase_match exactly: each next term's position must
// be > pos and <= start + i + slop). Scores are the per-token BM25
// sums of the phrase terms — the serving-path replacement for the
// python per-candidate-doc loop in score_phrase.
//
// qterms: one entry per phrase TOKEN in order (duplicates allowed);
// pos_offsets/positions: the index's positional CSR (per posting entry).
int64_t ldb_phrase_topk(
    const int64_t* postings_docs, const int64_t* postings_tf,
    const int64_t* postings_offsets, const int64_t* pos_offsets,
    const int64_t* positions, const int32_t* qterms, const float* qidf,
    int32_t n_q, const float* doc_norm, const uint8_t* dead, int32_t slop,
    int32_t k, float k1, int64_t* out_docs, float* out_scores) {
  if (n_q <= 0 || k <= 0) return 0;
  struct TCur {
    int64_t start;  // global posting offset of this term's list
    const int64_t* docs;
    const int64_t* tfs;
    int64_t len;
    int64_t pos;
    float idf;
  };
  std::vector<TCur> toks(n_q);
  for (int32_t i = 0; i < n_q; i++) {
    int64_t s = postings_offsets[qterms[i]];
    int64_t e = postings_offsets[qterms[i] + 1];
    if (e <= s) return 0;
    toks[i] = {s, postings_docs + s, postings_tf + s, e - s, 0, qidf[i]};
  }
  // drive on the token with the shortest list
  int drv_i = 0;
  for (int32_t i = 1; i < n_q; i++)
    if (toks[i].len < toks[drv_i].len) drv_i = i;

  typedef std::pair<float, int64_t> Hit;
  std::vector<Hit> heap;
  heap.reserve(k + 1);
  auto cmp = [](const Hit& a, const Hit& b) { return a.first > b.first; };

  auto plist = [&](const TCur& c) {
    int64_t g = c.start + c.pos;
    return std::make_pair(positions + pos_offsets[g],
                          pos_offsets[g + 1] - pos_offsets[g]);
  };

  TCur& drv = toks[drv_i];
  for (; drv.pos < drv.len; drv.pos++) {
    int64_t d = drv.docs[drv.pos];
    bool all = true;
    for (int32_t i = 0; i < n_q; i++) {
      if (i == drv_i) continue;
      TCur& c = toks[i];
      const int64_t* lo = std::lower_bound(c.docs + c.pos, c.docs + c.len, d);
      c.pos = lo - c.docs;
      if (c.pos >= c.len || c.docs[c.pos] != d) {
        all = false;
        if (c.pos >= c.len) drv.pos = drv.len;  // exhausted: stop driving
        break;
      }
    }
    if (!all || (dead != nullptr && dead[d])) continue;
    // positional verification (greedy window, == python _phrase_match)
    bool match = false;
    auto [base, base_n] = plist(toks[0]);
    if (n_q == 1) {
      match = base_n > 0;
    } else {
      for (int64_t bi = 0; bi < base_n && !match; bi++) {
        int64_t start = base[bi];
        int64_t pos = start;
        bool good = true;
        for (int32_t i = 1; i < n_q; i++) {
          auto [pl, pn] = plist(toks[i]);
          // first position > pos and <= start + i + slop
          const int64_t* lo = std::upper_bound(pl, pl + pn, pos);
          if (lo == pl + pn || *lo > start + i + slop) {
            good = false;
            break;
          }
          pos = *lo;
        }
        match = good;
      }
    }
    if (!match) continue;
    float score = 0.0f;
    for (int32_t i = 0; i < n_q; i++) {
      float tf = (float)toks[i].tfs[toks[i].pos];
      score += toks[i].idf * tf * (k1 + 1.0f) / (tf + doc_norm[d]);
    }
    if ((int)heap.size() < k || score > heap.front().first) {
      heap.push_back({score, d});
      std::push_heap(heap.begin(), heap.end(), cmp);
      if ((int)heap.size() > k) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        heap.pop_back();
      }
    }
  }
  std::sort(heap.begin(), heap.end(),
            [](const Hit& a, const Hit& b) { return a.first > b.first; });
  int64_t m = (int64_t)heap.size();
  for (int64_t i = 0; i < m; i++) {
    out_scores[i] = heap[i].first;
    out_docs[i] = heap[i].second;
  }
  return m;
}

// ------------------------------- BM25 2-term impact-stratified top-k
//
// The exact answer to the two-common-term worst case, where BOTH
// per-posting TA (ldb_bm25_impact_topk) and DAAT MaxScore/BMW degrade:
// TA must pop through every posting of the big middle tf-strata (each
// pop paying a partner binary search), and MaxScore cannot raise theta
// above the flat block maxima. Observation: with per-term postings
// grouped into contribution STRATA (quantized-contribution runs of the
// impact order, doc-sorted within each stratum — index/fts.py
// impact_strata), the top-k candidates live in the CROSS PRODUCTS of
// high strata, and each cross product is a tiny galloping intersection
// of doc-sorted lists. Enumerate units — stratum pairs (ia, ib) plus
// solo strata (ia, ∅)/(∅, ib) — from a max-heap ordered by score upper
// bound idfA·ub[ia] + idfB·ub[ib]; stop when the running kth best >=
// the next unit's bound (ties lose, matching the DAAT scorer).
// Fagin's TA with stratified random access; same candidate-pruning
// idea as Bast et al.'s IO-Top-K block index.
//
// Exactness: every doc is covered by one cross unit (if it has both
// terms) whose bound dominates its score, or by a solo unit (single
// term) likewise; units are processed in descending bound order; solo
// units score docs fully via a partner binary search, so early
// processing of a doc through ANY unit yields its exact score (the
// seen-set prevents rescoring).
//
// max_work <= 0: unlimited. Otherwise return -1 once the touched-
// posting count exceeds the budget (terms that rarely co-occur make
// solo strata dominate — the caller falls back to DAAT MaxScore).
int64_t ldb_bm25_impact2_topk(
    const int64_t* postings_docs, const int64_t* postings_tf,
    const int64_t* postings_offsets,
    const int32_t* strat_docs,      // postings in stratum order (contiguous)
    const float* strat_contrib,     // matching raw contributions
    const int64_t* strat_starts,    // absolute stratum starts (global ids)
    const int64_t* strat_term_off,  // per-term CSR into strat_starts
    const float* strat_ub,          // raw contribution ub per stratum (no idf)
    const int32_t* qterms, const float* qidf,  // exactly 2 terms
    const float* doc_norm, const uint8_t* dead,
    int32_t k, float k1, int64_t max_work,
    int64_t* out_docs, float* out_scores) {
  if (k <= 0) return 0;
  struct TermS {
    const int64_t* pdocs;   // doc-sorted postings (for solo partner lookup)
    const int64_t* ptfs;
    const int32_t* docs;    // stratum-order docs, contiguous per stratum
    const float* contrib;   // stratum-order contributions
    int64_t len;
    int64_t base;  // global posting offset
    int64_t s0, s1;  // global stratum id range
    float idf;
  };
  TermS T[2];
  for (int i = 0; i < 2; i++) {
    int32_t t = qterms[i];
    int64_t s = postings_offsets[t], e = postings_offsets[t + 1];
    if (e <= s) return -1;  // empty term: let the DAAT path handle it
    T[i] = {postings_docs + s, postings_tf + s, strat_docs + s,
            strat_contrib + s, e - s, s,
            strat_term_off[t], strat_term_off[t + 1], qidf[i]};
    if (T[i].s1 <= T[i].s0) return -1;  // no strata (stale cache)
  }
  auto s_begin = [&](const TermS& t, int64_t rel) {
    return strat_starts[t.s0 + rel] - t.base;
  };
  auto s_end = [&](const TermS& t, int64_t rel) {
    return (t.s0 + rel + 1 < t.s1) ? (strat_starts[t.s0 + rel + 1] - t.base)
                                   : t.len;
  };

  struct Unit {
    float bound;
    int32_t ia, ib;  // relative stratum index or -1 (solo)
  };
  auto ucmp = [](const Unit& a, const Unit& b) { return a.bound < b.bound; };
  std::vector<Unit> units;
  units.reserve(64);
  int64_t nA = T[0].s1 - T[0].s0, nB = T[1].s1 - T[1].s0;
  auto push_unit = [&](int64_t ia, int64_t ib) {
    if (ia >= nA || ib >= nB) return;
    float b = 0.0f;
    if (ia >= 0) b += T[0].idf * strat_ub[T[0].s0 + ia];
    if (ib >= 0) b += T[1].idf * strat_ub[T[1].s0 + ib];
    units.push_back({b, (int32_t)ia, (int32_t)ib});
    std::push_heap(units.begin(), units.end(), ucmp);
  };
  push_unit(0, 0);
  push_unit(0, -1);
  push_unit(-1, 0);

  auto hcmp = [](const LdbHit& a, const LdbHit& b) { return a.first > b.first; };
  std::vector<LdbHit> heap;
  heap.reserve(k + 1);
  auto offer = [&](int64_t d, float sc) {
    if ((int)heap.size() < k || sc > heap.front().first) {
      heap.push_back({sc, d});
      std::push_heap(heap.begin(), heap.end(), hcmp);
      if ((int)heap.size() > k) {
        std::pop_heap(heap.begin(), heap.end(), hcmp);
        heap.pop_back();
      }
    }
  };
  std::unordered_set<int64_t> seen;
  seen.reserve(512);
  // gallop a contiguous doc-ascending stratum slice to first >= target
  auto gallop = [&](const int32_t* docs, int64_t i, int64_t e, int32_t target) {
    int64_t step = 1, j = i;
    while (j + step < e && docs[j + step] < target) {
      j += step;
      step <<= 1;
    }
    int64_t hi = j + step < e ? j + step : e;
    while (j < hi) {
      int64_t m = (j + hi) >> 1;
      if (docs[m] < target) j = m + 1;
      else hi = m;
    }
    return j;
  };

  int64_t work = 0;
  while (!units.empty()) {
    std::pop_heap(units.begin(), units.end(), ucmp);
    Unit u = units.back();
    units.pop_back();
    if ((int)heap.size() >= k && heap.front().first >= u.bound) break;
    if (max_work > 0 && work >= max_work) return -1;
    if (u.ia >= 0 && u.ib >= 0) {
      const TermS& A = T[0];
      const TermS& B = T[1];
      int64_t a = s_begin(A, u.ia), ae = s_end(A, u.ia);
      int64_t b = s_begin(B, u.ib), be = s_end(B, u.ib);
      work += (ae - a) < (be - b) ? (ae - a) : (be - b);
      const float wa = A.idf, wb = B.idf;
      while (a < ae && b < be) {
        int32_t da = A.docs[a];
        int32_t db = B.docs[b];
        if (da == db) {
          if (!(dead != nullptr && dead[da]) && seen.insert(da).second)
            offer(da, wa * A.contrib[a] + wb * B.contrib[b]);
          a++;
          b++;
        } else if (da < db) {
          a = gallop(A.docs, a, ae, db);
        } else {
          b = gallop(B.docs, b, be, da);
        }
      }
      if (u.ib == 0) push_unit(u.ia + 1, 0);  // staircase frontier
      push_unit(u.ia, u.ib + 1);
    } else {
      int which = u.ia >= 0 ? 0 : 1;
      const TermS& S = T[which];
      const TermS& O = T[1 - which];
      int64_t si = which == 0 ? u.ia : u.ib;
      int64_t a = s_begin(S, si), ae = s_end(S, si);
      work += ae - a;
      for (int64_t i = a; i < ae; i++) {
        int64_t d = S.docs[i];
        if (dead != nullptr && dead[d]) continue;
        if (!seen.insert(d).second) continue;
        float sc = S.idf * S.contrib[i];
        const int64_t* lo = std::lower_bound(O.pdocs, O.pdocs + O.len, d);
        if (lo != O.pdocs + O.len && *lo == d) {
          float tf = (float)O.ptfs[lo - O.pdocs];
          sc += O.idf * tf * (k1 + 1.0f) / (tf + doc_norm[d]);
        }
        offer(d, sc);
      }
      if (which == 0) push_unit(si + 1, -1);
      else push_unit(-1, si + 1);
    }
  }
  std::sort(heap.begin(), heap.end(),
            [](const LdbHit& a, const LdbHit& b) { return a.first > b.first; });
  int64_t m = (int64_t)heap.size();
  for (int64_t i = 0; i < m; i++) {
    out_scores[i] = heap[i].first;
    out_docs[i] = heap[i].second;
  }
  return m;
}

}  // extern "C"
