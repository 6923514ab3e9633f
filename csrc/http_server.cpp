// Embedded native HTTP server: the network data plane in C++.
//
// Behavioral reference: rust/sglang-server (the reference's embedded
// axum server owning accept/parse/write natively, with the inference
// engine behind a handler boundary). TPU redesign: an epoll HTTP/1.1
// server whose worker threads parse requests and invoke a registered
// handler callback (Python via ctypes, which re-acquires the GIL only
// for the handler body — connection handling, parsing, and response
// writes never touch Python). /health is answered natively without
// crossing into Python at all.
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
// request bodies), keep-alive, JSON responses; streaming endpoints
// stay on the Python server.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/epoll.h>
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
#include <vector>

namespace {

typedef char* (*Handler)(const char*, const char*, const char*, long,
                         long*, int*);

struct Conn {
  int fd;
  std::string buf;
};

struct Server {
  int listen_fd = -1;
  int port = 0;
  Handler handler = nullptr;
  std::atomic<bool> stop{false};
  std::thread acceptor;
  std::vector<std::thread> workers;
  std::deque<int> queue;  // ready client fds
  std::mutex mu;
  std::condition_variable cv;
};

static bool read_request(int fd, std::string& method, std::string& path,
                         std::string& body, bool& keep_alive) {
  std::string buf;
  char tmp[8192];
  size_t header_end = std::string::npos;
  while (header_end == std::string::npos) {
    ssize_t n = ::recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    buf.append(tmp, n);
    header_end = buf.find("\r\n\r\n");
    if (buf.size() > (16u << 20)) return false;
  }
  // request line
  size_t sp1 = buf.find(' ');
  size_t sp2 = buf.find(' ', sp1 + 1);
  if (sp1 == std::string::npos || sp2 == std::string::npos) return false;
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
    if (content_len < 0 || content_len > (512l << 20)) return false;
  }
  body = buf.substr(header_end + 4);
  while ((long)body.size() < content_len) {
    ssize_t n = ::recv(fd, tmp, sizeof(tmp), 0);
    if (n <= 0) return false;
    body.append(tmp, n);
  }
  body.resize(content_len);
  return true;
}

static void write_all(int fd, const char* data, size_t n) {
  size_t off = 0;
  while (off < n) {
    ssize_t w = ::send(fd, data + off, n - off, MSG_NOSIGNAL);
    if (w <= 0) return;
    off += (size_t)w;
  }
}

static void send_response(int fd, int status, const char* body, long blen,
                          bool keep_alive) {
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
  write_all(fd, head, hn);
  if (blen > 0) write_all(fd, body, blen);
}

static void handle_conn(Server* s, int fd) {
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  for (;;) {
    std::string method, path, body;
    bool keep_alive = true;
    if (!read_request(fd, method, path, body, keep_alive)) break;
    if (path == "/health" || path == "/ping") {
      // native fast path: no Python
      send_response(fd, 200, "{\"status\":\"ok\"}", 15, keep_alive);
      if (!keep_alive) break;
      continue;
    }
    long out_len = 0;
    int status = 500;
    char* out = s->handler
                    ? s->handler(method.c_str(), path.c_str(), body.data(),
                                 (long)body.size(), &out_len, &status)
                    : nullptr;
    if (out == nullptr) {
      const char* err = "{\"error\":\"handler failure\"}";
      send_response(fd, status ? status : 500, err, (long)strlen(err),
                    keep_alive);
    } else {
      send_response(fd, status, out, out_len, keep_alive);
      free(out);
    }
    if (!keep_alive) break;
  }
  ::close(fd);
}

static void worker_loop(Server* s) {
  for (;;) {
    int fd;
    {
      std::unique_lock<std::mutex> lk(s->mu);
      s->cv.wait(lk, [s] { return s->stop.load() || !s->queue.empty(); });
      if (s->stop.load()) return;
      fd = s->queue.front();
      s->queue.pop_front();
    }
    handle_conn(s, fd);
  }
}

static void accept_loop(Server* s) {
  while (!s->stop.load()) {
    sockaddr_in addr;
    socklen_t alen = sizeof(addr);
    int fd = ::accept(s->listen_fd, (sockaddr*)&addr, &alen);
    if (fd < 0) {
      if (s->stop.load()) return;
      continue;
    }
    {
      std::lock_guard<std::mutex> lk(s->mu);
      s->queue.push_back(fd);
    }
    s->cv.notify_one();
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
  socklen_t alen = sizeof(addr);
  getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
  s->port = ntohs(addr.sin_port);
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; i++)
    s->workers.emplace_back(worker_loop, s);
  s->acceptor = std::thread(accept_loop, s);
  return s;
}

int hs_port(void* h) { return ((Server*)h)->port; }

char* hs_alloc(long n) { return (char*)malloc((size_t)n); }

void hs_stop(void* h) {
  auto* s = (Server*)h;
  s->stop.store(true);
  ::shutdown(s->listen_fd, SHUT_RDWR);
  ::close(s->listen_fd);
  s->cv.notify_all();
}

void hs_destroy(void* h) {
  auto* s = (Server*)h;
  if (!s->stop.load()) hs_stop(h);
  if (s->acceptor.joinable()) s->acceptor.join();
  for (auto& w : s->workers)
    if (w.joinable()) w.join();
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (int fd : s->queue) ::close(fd);
    s->queue.clear();
  }
  delete s;
}

}  // extern "C"
