// Global cross-request n-gram corpus for speculative drafting.
//
// Ref behavior: python/sglang/kernels/jit/csrc/ngram_corpus/
// (suffix_automaton.cpp, trie.cpp, ngram.cpp) — SGLang keeps a global
// corpus of everything the server has generated and drafts continuations
// by matching the tail of the running sequence against it.
//
// TPU-native recast (original design, not a translation): ONE online
// suffix automaton (SAM) over an append-only token stream with sequence
// separators. The SAM answers "longest suffix of the query that occurs
// anywhere in the corpus" in O(|query|); each state carries the most
// recent end position of its substring, so the draft is simply the
// tokens that followed that occurrence. The endpos sample is recorded at
// state-creation time (always a valid occurrence; NOT refreshed to the
// most recent one — keeping it fresh costs a full suffix-link-chain walk
// per token, O(n^2) on degenerate repeated-token streams). Recency bias
// is provided by the Python layer, which tries the request's own history
// first and uses the corpus as fallback. Capacity is bounded by
// rebuilding the SAM from the newest half of the stream when full
// (amortized O(1) per inserted token).
//
// C ABI for ctypes (pybind11 is not in the image); single-threaded —
// the scheduler's host loop is the only caller.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kSep = -1;  // sequence separator, never a real token

struct State {
  std::unordered_map<int32_t, int32_t> next;
  int32_t link = -1;
  int32_t len = 0;
  // A valid corpus index just AFTER one occurrence of this state's
  // substrings (creation-time sample; see file docstring).
  int64_t last_end = -1;
};

struct Corpus {
  std::vector<State> st;
  int32_t last = 0;
  std::vector<int32_t> stream;  // the corpus text (with kSep markers)
  size_t capacity;
  int max_ngram;
  int min_ngram;
  // stats
  int64_t n_inserted_seqs = 0;
  int64_t n_rebuilds = 0;

  explicit Corpus(size_t cap, int max_n, int min_n)
      : capacity(cap), max_ngram(max_n), min_ngram(min_n) {
    st.reserve(1024);
    st.emplace_back();  // root
  }

  void extend(int32_t c) {
    // kSep flows through as a normal symbol: it can never match a query
    // token (queries contain only real tokens >= 0), so it naturally
    // fences matches at sequence boundaries.
    int64_t end_pos = static_cast<int64_t>(stream.size());
    stream.push_back(c);
    int32_t cur = static_cast<int32_t>(st.size());
    st.emplace_back();
    st[cur].len = st[last].len + 1;
    st[cur].last_end = end_pos + 1;
    int32_t p = last;
    while (p != -1 && !st[p].next.count(c)) {
      st[p].next[c] = cur;
      p = st[p].link;
    }
    if (p == -1) {
      st[cur].link = 0;
    } else {
      int32_t q = st[p].next[c];
      if (st[p].len + 1 == st[q].len) {
        st[cur].link = q;
      } else {
        int32_t clone = static_cast<int32_t>(st.size());
        st.push_back(st[q]);  // copies transitions, link, last_end
        st[clone].len = st[p].len + 1;
        st[q].link = clone;
        st[cur].link = clone;
        while (p != -1 && st[p].next.count(c) && st[p].next[c] == q) {
          st[p].next[c] = clone;
          p = st[p].link;
        }
      }
    }
    last = cur;
    (void)end_pos;
  }

  void insert_seq(const int32_t* toks, int64_t n) {
    if (n <= 0) return;
    if (stream.size() + static_cast<size_t>(n) + 1 > capacity) rebuild(n);
    for (int64_t i = 0; i < n; ++i) extend(toks[i]);
    extend(kSep);
    n_inserted_seqs++;
  }

  // Keep the newest tokens (half the capacity, aligned to a separator so
  // no truncated sequence pollutes matches) and reconstruct the SAM.
  void rebuild(int64_t incoming) {
    size_t keep = capacity / 2;
    if (static_cast<size_t>(incoming) > keep) keep = 0;
    size_t start = stream.size() > keep ? stream.size() - keep : 0;
    while (start < stream.size() && stream[start] != kSep) ++start;
    if (start < stream.size()) ++start;  // skip the separator itself
    std::vector<int32_t> tail(stream.begin() + start, stream.end());
    st.clear();
    st.emplace_back();
    last = 0;
    stream.clear();
    for (int32_t c : tail) extend(c);
    n_rebuilds++;
  }

  // Longest suffix of query[0..n) that appears in the corpus, bounded to
  // max_ngram; returns the continuation after its most recent occurrence.
  int64_t match(const int32_t* query, int64_t n, int32_t* out,
                int64_t max_out) const {
    int64_t lo = n > max_ngram ? n - max_ngram : 0;
    // Walk suffixes longest-first: for each start, try to traverse the
    // whole suffix; SAM traversal from root only matches substrings, so
    // a failed char aborts that start. O(max_ngram^2) worst case with
    // max_ngram ~ 4-8: trivial.
    for (int64_t s = lo; s + min_ngram <= n; ++s) {
      int32_t cur = 0;
      bool ok = true;
      for (int64_t i = s; i < n; ++i) {
        auto it = st[cur].next.find(query[i]);
        if (it == st[cur].next.end()) {
          ok = false;
          break;
        }
        cur = it->second;
      }
      if (!ok || cur == 0) continue;
      int64_t pos = st[cur].last_end;  // index after the match
      int64_t k = 0;
      while (k < max_out && pos + k < static_cast<int64_t>(stream.size())) {
        int32_t t = stream[pos + k];
        if (t == kSep) break;
        out[k++] = t;
      }
      if (k > 0) return k;
    }
    return 0;
  }
};

}  // namespace

extern "C" {

void* ng_new(int64_t capacity, int max_ngram, int min_ngram) {
  if (capacity < 1024) capacity = 1024;
  return new Corpus(static_cast<size_t>(capacity), max_ngram, min_ngram);
}

void ng_free(void* h) { delete static_cast<Corpus*>(h); }

void ng_insert(void* h, const int32_t* toks, int64_t n) {
  static_cast<Corpus*>(h)->insert_seq(toks, n);
}

int64_t ng_match(void* h, const int32_t* query, int64_t n, int32_t* out,
                 int64_t max_out) {
  return static_cast<Corpus*>(h)->match(query, n, out, max_out);
}

void ng_reset(void* h) {
  Corpus* c = static_cast<Corpus*>(h);
  size_t cap = c->capacity;
  int mx = c->max_ngram, mn = c->min_ngram;
  *c = Corpus(cap, mx, mn);
}

int64_t ng_num_tokens(void* h) {
  return static_cast<int64_t>(static_cast<Corpus*>(h)->stream.size());
}

int64_t ng_num_seqs(void* h) {
  return static_cast<Corpus*>(h)->n_inserted_seqs;
}

int64_t ng_num_rebuilds(void* h) {
  return static_cast<Corpus*>(h)->n_rebuilds;
}

}  // extern "C"
