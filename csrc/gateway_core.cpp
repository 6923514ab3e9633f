// Gateway data-plane core: cache-aware routing tree + worker registry.
//
// Behavioral reference: sgl-model-gateway/src/policies/{cache_aware.rs:112,
// tree.rs:246-421} (Rust). Original C++ redesign exposed over a C ABI for
// ctypes (pybind11 is not in this image): a byte-level radix tree with
// path-compressed edges, per-node worker tenancy bitsets, LRU timestamps
// with bulk eviction, plus the worker registry (health / circuit breaker /
// inflight counters) and the selection policies. The Python shell
// (sglang_tpu/router.py) keeps the async HTTP proxy; everything per-request
// CPU-hot lives here.
//
// Build: g++ -O2 -shared -fPIC -o gateway_core.so gateway_core.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Node {
    std::string edge;                 // compressed label from parent
    std::map<char, std::unique_ptr<Node>> children;
    std::vector<uint64_t> tenants;    // worker bitset
    uint64_t last_access = 0;
    Node* parent = nullptr;

    bool has(int w) const {
        size_t i = w >> 6;
        return i < tenants.size() && (tenants[i] >> (w & 63)) & 1;
    }
    void add(int w) {
        size_t i = w >> 6;
        if (i >= tenants.size()) tenants.resize(i + 1, 0);
        tenants[i] |= uint64_t(1) << (w & 63);
    }
    void remove_worker(int w) {
        size_t i = w >> 6;
        if (i < tenants.size()) tenants[i] &= ~(uint64_t(1) << (w & 63));
        for (auto& kv : children) kv.second->remove_worker(w);
    }
    bool empty_tenants() const {
        for (uint64_t t : tenants)
            if (t) return false;
        return true;
    }
};

struct Worker {
    bool present = true;
    bool healthy = true;
    int inflight = 0;
    int consecutive_failures = 0;
};

struct Gateway {
    Node root;
    std::vector<Worker> workers;
    std::vector<std::string> worker_names;  // stable ring identity (URL)
    uint64_t clock = 0;
    uint64_t rr = 0;
    uint64_t rng = 0x9e3779b97f4a7c15ull;
    long node_count = 0;
    long max_nodes = 1 << 18;
    long last_matched = 0;
    // consistent-hash ring (shared by consistent_hashing / prefix_hash):
    // each worker sits at fixed positions derived from its name, so scale
    // changes only redistribute keys in the affected arc
    // (ref sgl-model-gateway/src/policies/consistent_hashing.rs).
    std::vector<std::pair<uint64_t, int>> ring;
    bool ring_dirty = true;
    // manual policy: routing key -> pinned worker; remapped ONLY when the
    // pinned worker goes unhealthy (ref policies/manual.rs).
    std::unordered_map<uint64_t, int> sticky;
    // bucket policy: rolling per-key traffic counters drive each bucket's
    // worker-share (ref policies/bucket.rs runs a periodic adjustment
    // thread; this core recomputes the share inline from rolling counts,
    // aged by halving — same proportional-allocation behavior without a
    // thread in a ctypes library).
    std::unordered_map<uint64_t, uint64_t> bucket_counts;
    uint64_t bucket_total = 0;

    uint64_t next_rand() {
        // xorshift64*
        rng ^= rng >> 12;
        rng ^= rng << 25;
        rng ^= rng >> 27;
        return rng * 0x2545F4914F6CDD1Dull;
    }
};

uint64_t fnv1a(const char* s, size_t n, uint64_t seed = 1469598103934665603ull) {
    uint64_t h = seed;
    for (size_t i = 0; i < n; i++) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ull;
    }
    return h;
}

constexpr int kVnodes = 32;  // ring positions per worker (balance)

void rebuild_ring(Gateway* g) {
    g->ring.clear();
    for (int w = 0; w < (int)g->workers.size(); w++) {
        if (!g->workers[w].present) continue;
        const std::string& name = g->worker_names[w];
        for (int v = 0; v < kVnodes; v++) {
            uint64_t h = fnv1a(name.data(), name.size(),
                               1469598103934665603ull + (uint64_t)v * 0x9e37ull);
            g->ring.emplace_back(h, w);
        }
    }
    std::sort(g->ring.begin(), g->ring.end());
    g->ring_dirty = false;
}

// First healthy worker clockwise from hash h on the ring; -1 if none.
int ring_lookup(Gateway* g, uint64_t h) {
    if (g->ring_dirty) rebuild_ring(g);
    if (g->ring.empty()) return -1;
    auto it = std::lower_bound(
        g->ring.begin(), g->ring.end(), std::make_pair(h, -1));
    for (size_t step = 0; step < g->ring.size(); step++) {
        if (it == g->ring.end()) it = g->ring.begin();
        int w = it->second;
        if (g->workers[w].present && g->workers[w].healthy) return w;
        ++it;
    }
    return -1;
}

size_t common_prefix(const char* a, size_t an, const char* b, size_t bn) {
    size_t n = an < bn ? an : bn;
    size_t i = 0;
    while (i < n && a[i] == b[i]) i++;
    return i;
}

// Insert `text` for worker w with path compression.
void insert(Gateway* g, Node* node, const char* s, size_t n, int w) {
    node->last_access = ++g->clock;
    node->add(w);
    while (n > 0) {
        auto it = node->children.find(s[0]);
        if (it == node->children.end()) {
            auto child = std::make_unique<Node>();
            child->edge.assign(s, n);
            child->add(w);
            child->last_access = ++g->clock;
            child->parent = node;
            node->children[s[0]] = std::move(child);
            g->node_count++;
            return;
        }
        Node* c = it->second.get();
        size_t k = common_prefix(s, n, c->edge.data(), c->edge.size());
        if (k < c->edge.size()) {
            // split the edge at k
            auto mid = std::make_unique<Node>();
            mid->edge.assign(c->edge.data(), k);
            mid->tenants = c->tenants;
            mid->last_access = ++g->clock;
            mid->parent = node;
            c->edge.erase(0, k);
            Node* midp = mid.get();
            c->parent = midp;
            midp->children[c->edge[0]] = std::move(it->second);
            it->second = std::move(mid);
            g->node_count++;
            c = midp;
        }
        c->last_access = ++g->clock;
        c->add(w);
        s += k;  // k >= 1 (children keyed by first byte); after a split
        n -= k;  // c is the new mid node whose edge length is exactly k.
        node = c;
    }
}

// Longest match of `text` per worker: walk down, recording depth where each
// worker is still a tenant. Returns best (deepest) per queried worker.
long match_worker(Gateway* g, const char* s, size_t n, int w) {
    Node* node = &g->root;
    long depth = 0, best = 0;
    while (n > 0) {
        auto it = node->children.find(s[0]);
        if (it == node->children.end()) break;
        Node* c = it->second.get();
        size_t k = common_prefix(s, n, c->edge.data(), c->edge.size());
        if (k == 0) break;
        if (c->has(w)) best = depth + (long)k;
        if (k < c->edge.size()) break;
        depth += (long)k;
        s += k;
        n -= k;
        node = c;
        node->last_access = ++g->clock;
    }
    return best;
}

void collect_lru(Node* node, std::vector<Node*>& out) {
    for (auto& kv : node->children) {
        out.push_back(kv.second.get());
        collect_lru(kv.second.get(), out);
    }
}

}  // namespace

extern "C" {

void* gw_create(long max_nodes) {
    auto* g = new Gateway();
    if (max_nodes > 0) g->max_nodes = max_nodes;
    return g;
}

void gw_destroy(void* h) { delete static_cast<Gateway*>(h); }

int gw_add_worker(void* h) {
    auto* g = static_cast<Gateway*>(h);
    g->workers.push_back(Worker());
    g->worker_names.push_back("w" + std::to_string(g->workers.size() - 1));
    g->ring_dirty = true;
    return (int)g->workers.size() - 1;
}

// Named variant: `name` (the worker URL) fixes the worker's ring
// positions, so re-adding the same URL after a scale event lands on the
// same arc (consistent_hashing/prefix_hash stability).
int gw_add_worker_named(void* h, const char* name, long len) {
    auto* g = static_cast<Gateway*>(h);
    g->workers.push_back(Worker());
    g->worker_names.emplace_back(name, (size_t)len);
    g->ring_dirty = true;
    return (int)g->workers.size() - 1;
}

void gw_remove_worker(void* h, int w) {
    auto* g = static_cast<Gateway*>(h);
    if (w >= 0 && w < (int)g->workers.size()) {
        g->workers[w].present = false;
        g->root.remove_worker(w);
        g->ring_dirty = true;
    }
}

void gw_set_health(void* h, int w, int healthy) {
    auto* g = static_cast<Gateway*>(h);
    if (w >= 0 && w < (int)g->workers.size()) {
        g->workers[w].healthy = healthy != 0;
        if (healthy) g->workers[w].consecutive_failures = 0;
    }
}

// Record a health-check failure; trips the circuit breaker at `threshold`
// consecutive failures. Returns 1 if the worker is still healthy.
int gw_record_failure(void* h, int w, int threshold) {
    auto* g = static_cast<Gateway*>(h);
    if (w < 0 || w >= (int)g->workers.size()) return 0;
    Worker& wk = g->workers[w];
    wk.consecutive_failures++;
    if (wk.consecutive_failures >= threshold) wk.healthy = false;
    return wk.healthy ? 1 : 0;
}

void gw_inc_inflight(void* h, int w) {
    auto* g = static_cast<Gateway*>(h);
    if (w >= 0 && w < (int)g->workers.size()) g->workers[w].inflight++;
}

void gw_dec_inflight(void* h, int w) {
    auto* g = static_cast<Gateway*>(h);
    if (w >= 0 && w < (int)g->workers.size() && g->workers[w].inflight > 0)
        g->workers[w].inflight--;
}

int gw_inflight(void* h, int w) {
    auto* g = static_cast<Gateway*>(h);
    return (w >= 0 && w < (int)g->workers.size()) ? g->workers[w].inflight
                                                  : -1;
}

int gw_healthy(void* h, int w) {
    auto* g = static_cast<Gateway*>(h);
    return (w >= 0 && w < (int)g->workers.size() && g->workers[w].present &&
            g->workers[w].healthy)
               ? 1
               : 0;
}

void gw_insert(void* h, const char* text, long len, int w) {
    auto* g = static_cast<Gateway*>(h);
    if (len > 512) len = 512;  // prefix cap, like the reference tree
    insert(g, &g->root, text, (size_t)len, w);
    if (g->node_count > g->max_nodes) {
        // bulk LRU eviction down to 3/4 capacity
        std::vector<Node*> nodes;
        collect_lru(&g->root, nodes);
        std::sort(nodes.begin(), nodes.end(),
                  [](Node* a, Node* b) { return a->last_access < b->last_access; });
        long target = g->max_nodes * 3 / 4;
        for (Node* n : nodes) {
            if (g->node_count <= target) break;
            if (!n->children.empty() || n->parent == nullptr) continue;
            n->parent->children.erase(n->edge[0]);
            g->node_count--;
        }
    }
}

long gw_match(void* h, const char* text, long len, int w) {
    auto* g = static_cast<Gateway*>(h);
    if (len > 512) len = 512;
    return match_worker(g, text, (size_t)len, w);
}

long gw_node_count(void* h) { return static_cast<Gateway*>(h)->node_count; }

long gw_last_matched(void* h) { return static_cast<Gateway*>(h)->last_matched; }

// Selection. policy: 0=cache_aware 1=round_robin 2=random 3=shortest_queue
// 4=power_of_two 5=consistent_hashing 6=prefix_hash 7=bucket 8=manual.
// `key`/`key_len` is the routing key (X-SMG-Routing-Key analog) used by
// consistent_hashing / bucket / manual; empty = policy-specific fallback.
// Returns the chosen worker id, or -1 when no healthy worker exists.
int gw_pick_key(void* h, const char* text, long len, int policy,
                int imbalance_tol, const char* key, long key_len) {
    auto* g = static_cast<Gateway*>(h);
    std::vector<int> alive;
    for (int i = 0; i < (int)g->workers.size(); i++)
        if (g->workers[i].present && g->workers[i].healthy) alive.push_back(i);
    if (alive.empty()) return -1;
    g->last_matched = 0;
    if (policy == 1) return alive[g->rr++ % alive.size()];
    if (policy == 2) return alive[g->next_rand() % alive.size()];
    int least = alive[0];
    long total_load = 0;
    for (int i : alive) {
        total_load += g->workers[i].inflight;
        if (g->workers[i].inflight < g->workers[least].inflight) least = i;
    }
    if (policy == 3) return least;
    if (policy == 4) {
        // power_of_two: two DISTINCT random healthy workers, lower load
        // wins (ref policies/power_of_two.rs).
        if (alive.size() == 1) return alive[0];
        size_t a = g->next_rand() % alive.size();
        size_t b = (a + 1 + g->next_rand() % (alive.size() - 1))
                   % alive.size();
        int wa = alive[a], wb = alive[b];
        return g->workers[wa].inflight <= g->workers[wb].inflight ? wa : wb;
    }
    if (policy == 5) {
        // consistent_hashing: routing key -> ring walk to first healthy
        // worker; keyless requests fall back to random
        // (ref policies/consistent_hashing.rs RandomFallback branch).
        if (key_len <= 0) return alive[g->next_rand() % alive.size()];
        int w = ring_lookup(g, fnv1a(key, (size_t)key_len));
        return w >= 0 ? w : least;
    }
    if (policy == 6) {
        // prefix_hash: hash the request prefix onto the ring; if the ring
        // choice is overloaded (> 1.25x average), fall back to the least
        // loaded worker (ref policies/prefix_hash.rs, load_factor 1.25).
        long plen = len > 512 ? 512 : len;
        if (plen <= 0) return least;
        int w = ring_lookup(g, fnv1a(text, (size_t)plen));
        if (w < 0) return least;
        double avg = (double)total_load / (double)alive.size();
        if ((double)g->workers[w].inflight > avg * 1.25 + 1.0) return least;
        return w;
    }
    if (policy == 7) {
        // bucket: group by routing key (or request prefix); each bucket
        // owns a worker-share proportional to its rolling traffic share,
        // anchored at hash(key) on the alive list; pick the least-loaded
        // worker inside the share (ref policies/bucket.rs, adjustment
        // inlined as rolling counters aged by halving).
        uint64_t bk = key_len > 0
                          ? fnv1a(key, (size_t)key_len)
                          : fnv1a(text, (size_t)(len > 512 ? 512 : len));
        if (g->bucket_total >= 4096) {  // age the window
            for (auto& kv : g->bucket_counts) kv.second /= 2;
            g->bucket_total /= 2;
        }
        uint64_t c = ++g->bucket_counts[bk];
        uint64_t tot = ++g->bucket_total;
        double share = (double)c / (double)tot;
        int m = (int)(share * (double)alive.size() + 0.5);
        if (m < 1) m = 1;
        if (m > (int)alive.size()) m = (int)alive.size();
        size_t start = (size_t)(bk % alive.size());
        int best = alive[start];
        for (int j = 1; j < m; j++) {
            int w = alive[(start + (size_t)j) % alive.size()];
            if (g->workers[w].inflight < g->workers[best].inflight) best = w;
        }
        return best;
    }
    if (policy == 8) {
        // manual: sticky key -> worker pinning; remap ONLY when the
        // pinned worker is unhealthy (ref policies/manual.rs). Keyless
        // requests fall back to random.
        if (key_len <= 0) return alive[g->next_rand() % alive.size()];
        uint64_t kh = fnv1a(key, (size_t)key_len);
        auto it = g->sticky.find(kh);
        if (it != g->sticky.end()) {
            int w = it->second;
            if (w < (int)g->workers.size() && g->workers[w].present &&
                g->workers[w].healthy)
                return w;
        }
        int w = alive[g->next_rand() % alive.size()];
        g->sticky[kh] = w;
        return w;
    }
    // cache_aware: deepest prefix tenant unless its queue is much longer
    if (len > 512) len = 512;
    int best = -1;
    long best_len = 0;
    for (int i : alive) {
        long m = match_worker(g, text, (size_t)len, i);
        if (m > best_len) {
            best_len = m;
            best = i;
        }
    }
    if (best < 0 ||
        g->workers[best].inflight >
            g->workers[least].inflight + imbalance_tol)
        return least;
    g->last_matched = best_len;
    return best;
}

int gw_pick(void* h, const char* text, long len, int policy,
            int imbalance_tol) {
    return gw_pick_key(h, text, len, policy, imbalance_tol, nullptr, 0);
}

}  // extern "C"
