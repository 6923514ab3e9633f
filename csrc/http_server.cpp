// Embedded native HTTP server: the network data plane in C++.
//
// Behavioral reference: rust/sglang-server (the reference's embedded
// axum server owning accept/parse/write natively, with the inference
// engine behind a handler boundary). TPU redesign: a single epoll I/O
// thread multiplexes all connections (idle keep-alive sockets cost no
// thread); a worker pool parses buffered requests and invokes a
// registered handler callback (Python via ctypes, which re-acquires the
// GIL only for the handler body — connection handling, parsing, and
// response writes never touch Python). /health is answered natively
// without crossing into Python at all.
//
// Connection protocol details:
//   - per-connection receive buffer: pipelined or early-sent requests
//     carry over between reads instead of being dropped;
//   - EPOLLONESHOT hand-off: a readable connection is disabled in epoll,
//     processed to exhaustion by one worker (every complete request in
//     the buffer), then re-armed — so response ordering per connection
//     is trivially serial and no two workers touch one socket;
//   - hs_stop closes the listen socket, wakes the epoll thread via an
//     eventfd, and shuts down every live connection, so hs_destroy's
//     joins cannot hang on idle keep-alive clients.
//
// C ABI (ctypes, see sglang_tpu/entrypoints/native_server.py):
//   hs_create(port, n_workers, handler) -> handle
//   hs_port(handle) -> bound port (when created with port 0)
//   hs_alloc(n) -> buffer the handler fills for its response body
//   hs_stop(handle), hs_destroy(handle)
//   handler signature:
//     char* (*)(const char* method, const char* path,
//               const char* body, long body_len,
//               long* out_len, int* status)
//   The handler returns a buffer from hs_alloc (ownership transfers
//   back; the server frees it after the write). NULL -> 500.
//
// Scope (documented): HTTP/1.1, Content-Length bodies (no chunked
// request bodies), keep-alive + pipelining, JSON responses; streaming
// endpoints stay on the Python server.

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

typedef char* (*Handler)(const char*, const char*, const char*, long,
                         long*, int*);

constexpr size_t kMaxHeaderBytes = 1u << 20;         // 1 MB of headers
constexpr long kMaxBodyBytes = 512l << 20;           // 512 MB body

struct Conn {
  int fd;
  std::string buf;  // received bytes not yet consumed by the parser
};

struct Server {
  int listen_fd = -1;
  int epfd = -1;
  int wake_fd = -1;  // eventfd: hs_stop -> epoll thread
  int port = 0;
  Handler handler = nullptr;
  std::atomic<bool> stop{false};
  std::thread io;
  std::vector<std::thread> workers;
  std::deque<Conn*> queue;  // connections with pending input
  std::mutex mu;
  std::condition_variable cv;
  std::unordered_set<Conn*> conns;  // every live connection
  std::mutex conns_mu;
};

static void set_nonblock(int fd) {
  int fl = fcntl(fd, F_GETFL, 0);
  fcntl(fd, F_SETFL, fl | O_NONBLOCK);
}

// Try to consume ONE complete request from the front of `buf`.
// Returns 1 = parsed (request removed from buf), 0 = need more bytes,
// -1 = malformed / over limits (caller closes the connection).
static int try_parse(std::string& buf, std::string& method,
                     std::string& path, std::string& body,
                     bool& keep_alive) {
  size_t header_end = buf.find("\r\n\r\n");
  if (header_end == std::string::npos)
    return buf.size() > kMaxHeaderBytes ? -1 : 0;
  size_t sp1 = buf.find(' ');
  size_t sp2 = buf.find(' ', sp1 + 1);
  if (sp1 == std::string::npos || sp2 == std::string::npos ||
      sp2 > header_end)
    return -1;
  method = buf.substr(0, sp1);
  path = buf.substr(sp1 + 1, sp2 - sp1 - 1);
  // headers (case-insensitive scan for content-length / connection)
  std::string headers = buf.substr(0, header_end);
  for (auto& c : headers) c = (char)tolower((unsigned char)c);
  keep_alive = headers.find("connection: close") == std::string::npos;
  long content_len = 0;
  size_t cl = headers.find("content-length:");
  if (cl != std::string::npos) {
    content_len = atol(headers.c_str() + cl + 15);
    if (content_len < 0 || content_len > kMaxBodyBytes) return -1;
  }
  size_t total = header_end + 4 + (size_t)content_len;
  if (buf.size() < total) return 0;
  body.assign(buf, header_end + 4, (size_t)content_len);
  buf.erase(0, total);  // leftover bytes = the next pipelined request
  return 1;
}

// Blocking-ish write on a nonblocking socket: poll for writability with
// a short timeout so a stopping server never wedges a worker.
static bool write_all(Server* s, int fd, const char* data, size_t n) {
  size_t off = 0;
  while (off < n) {
    ssize_t w = ::send(fd, data + off, n - off, MSG_NOSIGNAL);
    if (w > 0) {
      off += (size_t)w;
      continue;
    }
    if (w < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      if (s->stop.load()) return false;
      struct pollfd pfd = {fd, POLLOUT, 0};
      ::poll(&pfd, 1, 100);
      continue;
    }
    return false;
  }
  return true;
}

static bool send_response(Server* s, int fd, int status, const char* body,
                          long blen, bool keep_alive) {
  const char* reason = status == 200   ? "OK"
                       : status == 404 ? "Not Found"
                       : status == 400 ? "Bad Request"
                                       : "Internal Server Error";
  char head[256];
  int hn = snprintf(head, sizeof(head),
                    "HTTP/1.1 %d %s\r\nContent-Type: application/json\r\n"
                    "Content-Length: %ld\r\nConnection: %s\r\n\r\n",
                    status, reason, blen,
                    keep_alive ? "keep-alive" : "close");
  if (!write_all(s, fd, head, hn)) return false;
  if (blen > 0) return write_all(s, fd, body, blen);
  return true;
}

static void close_conn(Server* s, Conn* c) {
  // Unpublish BEFORE closing: hs_stop iterates the set and shutdown()s
  // fds — erasing first means it can never touch a recycled fd number.
  {
    std::lock_guard<std::mutex> lk(s->conns_mu);
    s->conns.erase(c);
  }
  epoll_ctl(s->epfd, EPOLL_CTL_DEL, c->fd, nullptr);
  ::close(c->fd);
  delete c;
}

// One worker turn: drain the socket into the carry buffer, answer every
// complete request found, then re-arm the connection in epoll.
static void service_conn(Server* s, Conn* c) {
  char tmp[16384];
  bool eof = false;
  for (;;) {
    ssize_t n = ::recv(c->fd, tmp, sizeof(tmp), 0);
    if (n > 0) {
      c->buf.append(tmp, (size_t)n);
      continue;
    }
    if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) break;
    eof = true;  // peer closed or hard error
    break;
  }
  for (;;) {
    std::string method, path, body;
    bool keep_alive = true;
    int st = try_parse(c->buf, method, path, body, keep_alive);
    if (st == 0) break;
    if (st < 0) {
      close_conn(s, c);
      return;
    }
    bool ok;
    if (path == "/health" || path == "/ping") {
      // native fast path: no Python
      ok = send_response(s, c->fd, 200, "{\"status\":\"ok\"}", 15,
                         keep_alive);
    } else {
      long out_len = 0;
      int status = 500;
      char* out =
          s->handler ? s->handler(method.c_str(), path.c_str(), body.data(),
                                  (long)body.size(), &out_len, &status)
                     : nullptr;
      if (out == nullptr) {
        const char* err = "{\"error\":\"handler failure\"}";
        ok = send_response(s, c->fd, status ? status : 500, err,
                           (long)strlen(err), keep_alive);
      } else {
        ok = send_response(s, c->fd, status, out, out_len, keep_alive);
        free(out);
      }
    }
    if (!ok || !keep_alive) {
      close_conn(s, c);
      return;
    }
  }
  if (eof || s->stop.load()) {
    close_conn(s, c);
    return;
  }
  struct epoll_event ev;
  ev.events = EPOLLIN | EPOLLONESHOT | EPOLLRDHUP;
  ev.data.ptr = c;
  if (epoll_ctl(s->epfd, EPOLL_CTL_MOD, c->fd, &ev) != 0) close_conn(s, c);
}

static void worker_loop(Server* s) {
  for (;;) {
    Conn* c;
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv.wait(lk, [s] { return s->stop.load() || !s->queue.empty(); });
      if (s->queue.empty()) return;  // stop requested and nothing left
      c = s->queue.front();
      s->queue.pop_front();
    }
    service_conn(s, c);
  }
}

static void io_loop(Server* s) {
  struct epoll_event evs[64];
  while (!s->stop.load()) {
    int n = epoll_wait(s->epfd, evs, 64, -1);
    if (n < 0) {
      if (errno == EINTR) continue;
      return;
    }
    for (int i = 0; i < n; i++) {
      void* p = evs[i].data.ptr;
      if (p == &s->wake_fd) return;  // hs_stop
      if (p == &s->listen_fd) {
        for (;;) {
          int fd = ::accept4(s->listen_fd, nullptr, nullptr, SOCK_NONBLOCK);
          if (fd < 0) break;
          int one = 1;
          setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
          auto* c = new Conn{fd, {}};
          {
            std::lock_guard<std::mutex> lk(s->conns_mu);
            s->conns.insert(c);
          }
          struct epoll_event ev;
          ev.events = EPOLLIN | EPOLLONESHOT | EPOLLRDHUP;
          ev.data.ptr = c;
          if (epoll_ctl(s->epfd, EPOLL_CTL_ADD, fd, &ev) != 0) {
            close_conn(s, c);
          }
        }
        continue;
      }
      // readable (or hung-up) connection -> hand off to a worker; the
      // ONESHOT arm guarantees no other event fires until re-armed.
      {
        std::lock_guard<std::mutex> lk(s->mu);
        s->queue.push_back((Conn*)p);
      }
      s->cv.notify_one();
    }
  }
}

}  // namespace

extern "C" {

void* hs_create(int port, int n_workers, Handler handler) {
  auto* s = new Server();
  s->handler = handler;
  s->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (s->listen_fd < 0) {
    delete s;
    return nullptr;
  }
  int one = 1;
  setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr;
  memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons((uint16_t)port);
  if (::bind(s->listen_fd, (sockaddr*)&addr, sizeof(addr)) != 0 ||
      ::listen(s->listen_fd, 512) != 0) {
    ::close(s->listen_fd);
    delete s;
    return nullptr;
  }
  set_nonblock(s->listen_fd);
  socklen_t alen = sizeof(addr);
  getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
  s->port = ntohs(addr.sin_port);

  s->epfd = epoll_create1(0);
  s->wake_fd = eventfd(0, EFD_NONBLOCK);
  if (s->epfd < 0 || s->wake_fd < 0) {
    ::close(s->listen_fd);
    if (s->epfd >= 0) ::close(s->epfd);
    if (s->wake_fd >= 0) ::close(s->wake_fd);
    delete s;
    return nullptr;
  }
  struct epoll_event ev;
  ev.events = EPOLLIN;
  ev.data.ptr = &s->listen_fd;
  epoll_ctl(s->epfd, EPOLL_CTL_ADD, s->listen_fd, &ev);
  ev.events = EPOLLIN;
  ev.data.ptr = &s->wake_fd;
  epoll_ctl(s->epfd, EPOLL_CTL_ADD, s->wake_fd, &ev);

  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; i++) s->workers.emplace_back(worker_loop, s);
  s->io = std::thread(io_loop, s);
  return s;
}

int hs_port(void* h) { return ((Server*)h)->port; }

char* hs_alloc(long n) { return (char*)malloc((size_t)n); }

void hs_stop(void* h) {
  auto* s = (Server*)h;
  if (s->stop.exchange(true)) return;  // idempotent
  ::shutdown(s->listen_fd, SHUT_RDWR);
  ::close(s->listen_fd);
  uint64_t v = 1;
  ssize_t unused = ::write(s->wake_fd, &v, sizeof(v));  // wake io_loop
  (void)unused;
  // Shut down every live socket: workers mid-write observe the error /
  // stop flag; idle keep-alive clients stop pinning resources.
  {
    std::lock_guard<std::mutex> lk(s->conns_mu);
    for (Conn* c : s->conns) ::shutdown(c->fd, SHUT_RDWR);
  }
  s->cv.notify_all();
}

void hs_destroy(void* h) {
  auto* s = (Server*)h;
  if (!s->stop.load()) hs_stop(h);
  if (s->io.joinable()) s->io.join();
  for (auto& w : s->workers)
    if (w.joinable()) w.join();
  {
    std::lock_guard<std::mutex> lk(s->conns_mu);
    for (Conn* c : s->conns) {
      ::close(c->fd);
      delete c;
    }
    s->conns.clear();
  }
  ::close(s->epfd);
  ::close(s->wake_fd);
  delete s;
}

}  // extern "C"
