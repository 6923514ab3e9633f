// Native radix tree over KV pages — C++ core for the prefix cache.
//
// Behavioral reference: sglang's C++ tree_v2
// (srt/mem_cache/cpp_radix_tree/tree_v2.cpp) rebuilt for this framework's
// page-granular design (see sglang_tpu/core/radix_cache.py for the
// protocol): edges are page-multiple token chunks, children are keyed by
// their first page, eviction is LRU over unlocked leaves.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <queue>
#include <vector>

namespace {

using Token = int32_t;
using Page = int32_t;

struct Node {
  std::vector<Token> key;   // length % page_size == 0 (root: empty)
  std::vector<Page> pages;  // key.size() / page_size entries
  Node* parent = nullptr;
  std::map<std::vector<Token>, Node*> children;  // keyed by first page chunk
  int64_t lock_ref = 0;
  uint64_t last_access = 0;
  uint64_t id = 0;

  bool is_leaf() const { return children.empty(); }
};

struct Tree {
  int page_size;
  Node root;
  uint64_t clock = 1;
  uint64_t next_id = 1;
  int64_t evictable_pages = 0;
  int64_t protected_pages = 0;
  std::vector<Node*> all_nodes;  // ownership

  explicit Tree(int ps) : page_size(ps) { root.lock_ref = 1; }
  ~Tree() {
    for (Node* n : all_nodes) delete n;
  }

  Node* new_node(Node* parent, const Token* key, size_t klen,
                 const Page* pages, size_t plen) {
    Node* n = new Node();
    n->key.assign(key, key + klen);
    n->pages.assign(pages, pages + plen);
    n->parent = parent;
    n->last_access = clock++;
    n->id = next_id++;
    all_nodes.push_back(n);
    return n;
  }

  std::vector<Token> child_key(const Token* key) const {
    return std::vector<Token>(key, key + page_size);
  }

  size_t match_len(const std::vector<Token>& node_key, const Token* toks,
                   size_t n) const {
    size_t max_pages = std::min(node_key.size(), n) / page_size;
    size_t m = 0;
    for (size_t p = 0; p < max_pages; ++p) {
      if (std::memcmp(node_key.data() + p * page_size, toks + p * page_size,
                      page_size * sizeof(Token)) != 0)
        break;
      m += page_size;
    }
    return m;
  }

  Node* split(Node* node, size_t split_len) {
    Node* upper = new_node(node->parent, node->key.data(), split_len,
                           node->pages.data(), split_len / page_size);
    upper->lock_ref = node->lock_ref;
    upper->last_access = node->last_access;
    node->parent->children[child_key(upper->key.data())] = upper;
    node->key.erase(node->key.begin(), node->key.begin() + split_len);
    node->pages.erase(node->pages.begin(),
                      node->pages.begin() + split_len / page_size);
    node->parent = upper;
    upper->children[child_key(node->key.data())] = node;
    return upper;
  }
};

struct NodeLess {
  bool operator()(Node* a, Node* b) const {
    return a->last_access > b->last_access;  // min-heap by last_access
  }
};

}  // namespace

extern "C" {

void* rt_new(int page_size) { return new Tree(page_size); }
void rt_free(void* t) { delete static_cast<Tree*>(t); }

// Match: fills out_pages (caller-allocated, capacity n/page_size) and
// returns matched token length; *out_node receives the last node handle.
int64_t rt_match(void* tp, const Token* toks, int64_t n, Page* out_pages,
                 void** out_node) {
  Tree* t = static_cast<Tree*>(tp);
  Node* node = &t->root;
  int64_t length = 0;
  int64_t npages = 0;
  while (n - length >= t->page_size) {
    auto it = node->children.find(t->child_key(toks + length));
    if (it == node->children.end()) break;
    Node* child = it->second;
    size_t m = t->match_len(child->key, toks + length, n - length);
    if (m < child->key.size()) {
      if (m > 0) {
        child = t->split(child, m);
        for (Page p : child->pages) out_pages[npages++] = p;
        length += m;
        node = child;
      }
      break;
    }
    for (Page p : child->pages) out_pages[npages++] = p;
    length += child->key.size();
    node = child;
    node->last_access = t->clock++;
  }
  node->last_access = t->clock++;
  *out_node = node;
  return length;
}

// Insert page-aligned tokens; returns matched prefix length (tokens).
int64_t rt_insert(void* tp, const Token* toks, int64_t n, const Page* pages,
                  int64_t npages) {
  Tree* t = static_cast<Tree*>(tp);
  Node* node = &t->root;
  int64_t length = 0;
  while (length < n) {
    auto it = node->children.find(t->child_key(toks + length));
    if (it == node->children.end()) {
      Node* nn =
          t->new_node(node, toks + length, n - length, pages + length / t->page_size,
                      (n - length) / t->page_size);
      node->children[t->child_key(nn->key.data())] = nn;
      t->evictable_pages += nn->pages.size();
      return length;
    }
    Node* child = it->second;
    size_t m = t->match_len(child->key, toks + length, n - length);
    if (m < child->key.size()) child = t->split(child, m);
    length += m;
    node = child;
    node->last_access = t->clock++;
  }
  return length;
}

void rt_inc_lock(void* tp, void* np) {
  Tree* t = static_cast<Tree*>(tp);
  for (Node* n = static_cast<Node*>(np); n && n != &t->root; n = n->parent) {
    if (n->lock_ref == 0) {
      t->evictable_pages -= n->pages.size();
      t->protected_pages += n->pages.size();
    }
    n->lock_ref++;
  }
}

void rt_dec_lock(void* tp, void* np) {
  Tree* t = static_cast<Tree*>(tp);
  for (Node* n = static_cast<Node*>(np); n && n != &t->root; n = n->parent) {
    n->lock_ref--;
    if (n->lock_ref == 0) {
      t->evictable_pages += n->pages.size();
      t->protected_pages -= n->pages.size();
    }
  }
}

// Evict up to num_pages from unlocked LRU leaves. Writes freed page ids to
// out_pages (capacity >= num_pages + max node pages) and, when
// out_prefixes is non-null, writes for each freed NODE: prefix length
// followed by the full token prefix (for host-tier write-back).
// Returns number of freed pages; *out_prefix_len gets the ints written.
int64_t rt_evict(void* tp, int64_t num_pages, Page* out_pages,
                 Token* out_prefixes, int64_t prefix_cap,
                 int64_t* out_prefix_len) {
  Tree* t = static_cast<Tree*>(tp);
  std::priority_queue<Node*, std::vector<Node*>, NodeLess> heap;
  // collect unlocked leaves
  std::vector<Node*> stack = {&t->root};
  while (!stack.empty()) {
    Node* n = stack.back();
    stack.pop_back();
    for (auto& kv : n->children) stack.push_back(kv.second);
    if (n != &t->root && n->is_leaf() && n->lock_ref == 0) heap.push(n);
  }
  int64_t freed = 0;
  int64_t plen = 0;
  while (!heap.empty() && freed < num_pages) {
    Node* node = heap.top();
    heap.pop();
    if (node->lock_ref > 0 || !node->is_leaf()) continue;
    if (out_prefixes != nullptr) {
      // full prefix root->node
      std::vector<const std::vector<Token>*> parts;
      for (Node* c = node; c && !c->key.empty(); c = c->parent)
        parts.push_back(&c->key);
      int64_t total = 0;
      for (auto* p : parts) total += p->size();
      if (plen + 1 + total <= prefix_cap) {
        out_prefixes[plen++] = (Token)total;
        for (auto it2 = parts.rbegin(); it2 != parts.rend(); ++it2)
          for (Token tok : **it2) out_prefixes[plen++] = tok;
      }
    }
    for (Page p : node->pages) out_pages[freed++] = p;
    t->evictable_pages -= node->pages.size();
    Node* parent = node->parent;
    parent->children.erase(t->child_key(node->key.data()));
    node->key.clear();
    node->pages.clear();
    if (parent != &t->root && parent->is_leaf() && parent->lock_ref == 0)
      heap.push(parent);
  }
  if (out_prefix_len) *out_prefix_len = plen;
  return freed;
}

int64_t rt_evictable_pages(void* tp) {
  return static_cast<Tree*>(tp)->evictable_pages;
}
int64_t rt_protected_pages(void* tp) {
  return static_cast<Tree*>(tp)->protected_pages;
}

}  // extern "C"
