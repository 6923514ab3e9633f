// Native batched-IO arena for the HiCache L3 storage tier.
//
// Behavioral reference: sglang's hf3fs usrbio utility
// (python/sglang/srt/mem_cache/storage/hf3fs/ + its C++ io helper) — a
// storage backend whose hot path is batched multi-page reads/writes
// issued natively, off the GIL. Redesign for this image: a slot-granular
// arena file driven by a pread/pwrite thread pool over a C ABI for
// ctypes (pybind11 is not in the image). The Python side owns the
// key->slot index + LRU; this file owns only the data plane.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o hicache_io.so hicache_io.cpp -lpthread

#include <fcntl.h>
#include <unistd.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Arena {
    int fd = -1;
    int64_t slot_bytes = 0;
    int64_t num_slots = 0;
    std::atomic<int64_t> io_errors{0};
};

// Full-length pread/pwrite (short transfers are retried).
bool pread_full(int fd, char* buf, int64_t n, int64_t off) {
    while (n > 0) {
        ssize_t r = ::pread(fd, buf, n, off);
        if (r <= 0) return false;
        buf += r;
        off += r;
        n -= r;
    }
    return true;
}

bool pwrite_full(int fd, const char* buf, int64_t n, int64_t off) {
    while (n > 0) {
        ssize_t r = ::pwrite(fd, buf, n, off);
        if (r <= 0) return false;
        buf += r;
        off += r;
        n -= r;
    }
    return true;
}

// Run `n` slot transfers across up to `kMaxThreads` threads. Each
// transfer i moves slot_bytes between buf + i*slot_bytes and the arena
// slot slots[i].
template <bool kWrite>
int64_t batched_io(Arena* a, const int64_t* slots, int64_t n, char* buf) {
    constexpr int kMaxThreads = 8;
    int nthreads = static_cast<int>(std::min<int64_t>(n, kMaxThreads));
    if (nthreads <= 0) return 0;
    std::atomic<int64_t> next{0};
    std::atomic<int64_t> failed{0};
    auto work = [&] {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            int64_t slot = slots[i];
            if (slot < 0 || slot >= a->num_slots) {
                failed.fetch_add(1);
                continue;
            }
            int64_t off = slot * a->slot_bytes;
            char* p = buf + i * a->slot_bytes;
            bool ok = kWrite ? pwrite_full(a->fd, p, a->slot_bytes, off)
                             : pread_full(a->fd, p, a->slot_bytes, off);
            if (!ok) failed.fetch_add(1);
        }
    };
    if (nthreads == 1) {
        work();
    } else {
        std::vector<std::thread> ts;
        ts.reserve(nthreads);
        for (int t = 0; t < nthreads; ++t) ts.emplace_back(work);
        for (auto& t : ts) t.join();
    }
    a->io_errors.fetch_add(failed.load());
    return n - failed.load();
}

}  // namespace

extern "C" {

void* hio_open(const char* path, int64_t slot_bytes, int64_t num_slots) {
    int fd = ::open(path, O_RDWR | O_CREAT, 0644);
    if (fd < 0) return nullptr;
    if (::ftruncate(fd, slot_bytes * num_slots) != 0) {
        ::close(fd);
        return nullptr;
    }
    auto* a = new Arena();
    a->fd = fd;
    a->slot_bytes = slot_bytes;
    a->num_slots = num_slots;
    return a;
}

void hio_close(void* h) {
    auto* a = static_cast<Arena*>(h);
    if (a == nullptr) return;
    if (a->fd >= 0) ::close(a->fd);
    delete a;
}

// Returns the number of slots successfully transferred.
int64_t hio_write(void* h, const int64_t* slots, int64_t n, const char* buf) {
    return batched_io<true>(static_cast<Arena*>(h), slots, n,
                            const_cast<char*>(buf));
}

int64_t hio_read(void* h, const int64_t* slots, int64_t n, char* buf) {
    return batched_io<false>(static_cast<Arena*>(h), slots, n, buf);
}

int64_t hio_errors(void* h) {
    return static_cast<Arena*>(h)->io_errors.load();
}

}  // extern "C"
