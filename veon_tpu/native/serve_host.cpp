// veon_serve_host — fully native (no python) serving daemon for exported
// VEON graphs: PJRT execution + the unix-socket tensor protocol in one
// C++ binary. The reference's deployment stack stops at TRT engine
// creation (`tools/convert_bevdet_to_TRT.py`); this is the consuming
// SERVER counterpart of native/pjrt_runner.cpp (one-shot CLI) and the
// C++ twin of the python serve/server.py: load a StableHLO artifact,
// bind fixed arguments (params / rig metas / classifier) on device once,
// then answer per-request tensor frames (serve/protocol.py framing,
// shared via native/frame.h).
//
//   veon_serve_host <socket> <plugin.so> <module.mlir> \
//       --order a,b,c [--bind name=file.npy ...] [--out y0,y1] [--once]
//   veon_serve_host <socket> --echo [--once]
//
// --order: the exported callable's positional argument names; each is
//   resolved from --bind (loaded once, device-resident) or, per request,
//   from the request frame's tensors.
// --out: response tensor names (default out0..outN-1).
// --once: exit after the first connection closes (tests).
// --echo: no PJRT at all — answer every request with its own tensors
//   (the transport/server loop is then testable on boxes with no
//   attachable PJRT device; the unit test drives it with the python
//   TensorClient across every protocol dtype).
//
// Like serve/server.py: one thread per connection (handler calls are
// serialized on a mutex — one device), persistent connections, one request
// per round, per-request errors become status-1 frames and the daemon
// keeps serving. --once handles a single connection inline and exits.
//
// Build (see tests/test_serve_host.py):
//   g++ -O2 -std=c++17 -pthread [-I$TF_INCLUDE/tensorflow/compiler] \
//       [-DVEON_NO_PJRT] -o veon_serve_host serve_host.cpp [-ldl]
// With -DVEON_NO_PJRT only --echo mode is compiled (no PJRT header
// needed) — the dependency-free build used where TF headers are absent.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <unistd.h>

#include "frame.h"
#ifndef VEON_NO_PJRT
#include "pjrt_util.h"
#endif

namespace vf = veon_frame;

namespace {

std::vector<std::string> split_csv(const char* s) {
  std::vector<std::string> out;
  std::string cur;
  for (const char* p = s; ; ++p) {
    if (*p == ',' || *p == '\0') {
      if (!cur.empty()) out.push_back(cur);
      cur.clear();
      if (!*p) break;
    } else {
      cur += *p;
    }
  }
  return out;
}

double now_ms() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// request handler interface: fills `resp` or returns an error message
struct Handler {
  virtual ~Handler() = default;
  virtual std::string handle(const std::vector<vf::Tensor>& req,
                             std::vector<vf::Tensor>* resp) = 0;
};

struct EchoHandler : Handler {
  std::string handle(const std::vector<vf::Tensor>& req,
                     std::vector<vf::Tensor>* resp) override {
    *resp = req;
    return "";
  }
};

#ifndef VEON_NO_PJRT
struct PjrtHandler : Handler {
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
  size_t n_out = 0;
  std::vector<std::string> order;                 // positional arg names
  std::vector<std::string> out_names;             // response tensor names
  std::vector<PJRT_Buffer*> bound;                // per order slot or null

  std::string handle(const std::vector<vf::Tensor>& req,
                     std::vector<vf::Tensor>* resp) override {
    std::vector<PJRT_Buffer*> args(order.size(), nullptr);
    std::vector<PJRT_Buffer*> owned;  // request-supplied, freed after exec
    std::string err;
    for (size_t i = 0; i < order.size() && err.empty(); ++i) {
      if (bound[i]) {
        args[i] = bound[i];
        continue;
      }
      const vf::Tensor* t = nullptr;
      for (const auto& r : req)
        if (r.name == order[i]) t = &r;
      if (!t) {
        err = "missing request tensor: " + order[i];
        break;
      }
      PJRT_Buffer_Type type;
      if (!veon_pjrt::frame_code_type(t->dtype, &type)) {
        err = "unsupported dtype for " + order[i];
        break;
      }
      std::vector<int64_t> dims(t->dims.begin(), t->dims.end());
      PJRT_Buffer* buf = nullptr;
      err = veon_pjrt::to_device(client, device, type, dims.data(),
                                 dims.size(), t->data.data(), &buf);
      // per-tensor flush (see the bind loop / pjrt_util.h rationale)
      if (err.empty()) err = veon_pjrt::await_buffer_ready(buf);
      if (err.empty()) {
        args[i] = buf;
        owned.push_back(buf);
      } else if (buf) {
        veon_pjrt::destroy_buffer(buf);
      }
    }
    std::vector<PJRT_Buffer*> outs(n_out, nullptr);
    if (err.empty()) err = veon_pjrt::execute(exec, args, &outs);
    // all output transfers start before any await — a sequential
    // fetch-await loop deadlocks multi-output results on lazy proxy
    // plugins (pjrt_util.h to_host_all)
    std::vector<PJRT_Buffer_Type> types;
    std::vector<std::vector<int64_t>> odims;
    std::vector<std::vector<uint8_t>> odata;
    if (err.empty()) err = veon_pjrt::to_host_all(outs, &types, &odims, &odata);
    for (size_t i = 0; err.empty() && i < n_out; ++i) {
      vf::Tensor t;
      t.name = i < out_names.size() ? out_names[i]
                                    : "out" + std::to_string(i);
      if (!veon_pjrt::type_frame_code(types[i], &t.dtype)) {
        err = "unsupported output type";
        break;
      }
      t.dims.assign(odims[i].begin(), odims[i].end());
      t.data = std::move(odata[i]);
      resp->push_back(std::move(t));
    }
    for (auto* b : outs) veon_pjrt::destroy_buffer(b);
    for (auto* b : owned) veon_pjrt::destroy_buffer(b);
    return err;
  }
};
#endif  // VEON_NO_PJRT

// handler calls are serialized: the PJRT executable targets one device, so
// concurrency buys nothing on the compute side — the mutex exists so a
// second CLIENT is not locked out while the first holds its persistent
// connection (serve/server.py's thread-per-connection semantics)
std::mutex handler_mu;

void serve_connection(int conn, Handler* handler) {
  for (;;) {  // persistent connection: one request per round
    std::vector<vf::Tensor> req;
    uint16_t status = 0;
    if (!vf::recv_frame(conn, &req, &status)) break;  // peer closed
    std::vector<vf::Tensor> resp;
    double t0 = now_ms();
    std::string err;
    if (status == 0) {
      std::lock_guard<std::mutex> lk(handler_mu);
      err = handler->handle(req, &resp);
    } else {
      err = "request status " + std::to_string(status);
    }
    if (!err.empty()) {
      if (!vf::send_error(conn, err)) break;
      continue;  // keep serving, like serve/server.py
    }
    vf::Tensor ms;
    ms.name = "server_ms";
    ms.dtype = 0;  // f32 scalar
    float v = static_cast<float>(now_ms() - t0);
    ms.data.resize(4);
    std::memcpy(ms.data.data(), &v, 4);
    resp.push_back(std::move(ms));
    if (!vf::send_frame(conn, resp)) break;
  }
  ::close(conn);
}

int serve_loop(int listen_fd, Handler* handler, bool once) {
  for (;;) {
    int conn = ::accept(listen_fd, nullptr, nullptr);
    if (conn < 0) return 1;
    if (once) {  // tests: handle the one connection inline, then exit
      serve_connection(conn, handler);
      return 0;
    }
    std::thread(serve_connection, conn, handler).detach();
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <socket> --echo [--once]\n"
                 "       %s <socket> <plugin.so> <module.mlir> --order a,b,c"
                 " [--bind name=file.npy ...] [--out y0,y1] [--once]\n",
                 argv[0], argv[0]);
    return 2;
  }
  const char* socket_path = argv[1];
  bool echo = std::strcmp(argv[2], "--echo") == 0;
  bool once = false;
  for (int i = 2; i < argc; ++i)
    if (std::strcmp(argv[i], "--once") == 0) once = true;

  EchoHandler echo_handler;
  Handler* handler = &echo_handler;

#ifndef VEON_NO_PJRT
  PjrtHandler pjrt;
  if (!echo) {
    if (argc < 4) {
      std::fprintf(stderr, "need <plugin.so> <module.mlir>\n");
      return 2;
    }
    std::vector<std::pair<std::string, std::string>> binds;
    std::vector<veon_pjrt::CreateOpt> copts;
    std::string compile_opts_path;
    for (int i = 4; i < argc; ++i) {
      if (std::strcmp(argv[i], "--order") == 0 && i + 1 < argc)
        pjrt.order = split_csv(argv[++i]);
      else if (std::strcmp(argv[i], "--out") == 0 && i + 1 < argc)
        pjrt.out_names = split_csv(argv[++i]);
      else if (std::strcmp(argv[i], "--copt") == 0 && i + 1 < argc)
        // client create option k=v (e.g. a remote-terminal proxy plugin's
        // topology=v5e:1x1x1 remote_compile=1 session_id=...)
        copts.push_back(veon_pjrt::parse_copt(argv[++i]));
      else if (std::strcmp(argv[i], "--compile-opts") == 0 && i + 1 < argc)
        compile_opts_path = argv[++i];
      else if (std::strcmp(argv[i], "--bind") == 0 && i + 1 < argc) {
        const char* eq = std::strchr(argv[++i], '=');
        if (!eq) {
          std::fprintf(stderr, "bad --bind (want name=file.npy): %s\n",
                       argv[i]);
          return 2;
        }
        binds.emplace_back(std::string(argv[i], eq - argv[i]),
                           std::string(eq + 1));
      }
    }
    if (pjrt.order.empty()) {
      std::fprintf(stderr, "--order is required in PJRT mode\n");
      return 2;
    }
    std::string e = veon_pjrt::load_plugin(argv[2]);
    if (e.empty()) e = veon_pjrt::create_client(&pjrt.client, copts);
    if (!e.empty()) {
      std::fprintf(stderr, "PJRT init failed: %s\n", e.c_str());
      return 3;  // same "no attachable device" outcome as pjrt_runner
    }
    e = veon_pjrt::first_device(pjrt.client, &pjrt.device);
    if (!e.empty()) {
      std::fprintf(stderr, "%s\n", e.c_str());
      return 3;
    }
    std::vector<char> mlir = veon_pjrt::read_file(argv[3]);
    if (mlir.empty()) {
      std::fprintf(stderr, "cannot read %s\n", argv[3]);
      return 1;
    }
    // full jax-equivalent CompileOptionsProto when the bundle ships one
    // (export --native writes compile_options.pb — required at real graph
    // scale, see pjrt_util.h compile_mlir)
    std::vector<char> co;
    if (!compile_opts_path.empty()) {
      co = veon_pjrt::read_file(compile_opts_path);
      if (co.empty()) {
        std::fprintf(stderr, "cannot read %s\n", compile_opts_path.c_str());
        return 1;
      }
    }
    e = veon_pjrt::compile_mlir(pjrt.client, mlir, &pjrt.exec,
                                co.empty() ? nullptr : &co);
    if (e.empty()) e = veon_pjrt::num_outputs(pjrt.exec, &pjrt.n_out);
    if (!e.empty()) {
      std::fprintf(stderr, "compile failed: %s\n", e.c_str());
      return 1;
    }
    // bind fixed args on device ONCE (params / rig metas / classifier)
    pjrt.bound.assign(pjrt.order.size(), nullptr);
    for (const auto& [name, path] : binds) {
      vf::Tensor t;
      if (!vf::parse_npy(path, &t)) {
        std::fprintf(stderr, "cannot read npy %s\n", path.c_str());
        return 1;
      }
      PJRT_Buffer_Type type;
      if (!veon_pjrt::frame_code_type(t.dtype, &type)) {
        std::fprintf(stderr, "unsupported dtype in %s\n", path.c_str());
        return 1;
      }
      std::vector<int64_t> dims(t.dims.begin(), t.dims.end());
      bool placed = false;
      for (size_t i = 0; i < pjrt.order.size(); ++i) {
        if (pjrt.order[i] != name) continue;
        PJRT_Buffer* buf = nullptr;
        e = veon_pjrt::to_device(pjrt.client, pjrt.device, type, dims.data(),
                                 dims.size(), t.data.data(), &buf);
        // flush NOW, one bind at a time: lazy proxy plugins defer the
        // upload to first use, and one deferred multi-hundred-MB flush at
        // the first request drops relay-style transports (pjrt_util.h)
        if (e.empty()) e = veon_pjrt::await_buffer_ready(buf);
        if (!e.empty()) {
          std::fprintf(stderr, "bind %s: %s\n", name.c_str(), e.c_str());
          return 1;
        }
        pjrt.bound[i] = buf;
        placed = true;
      }
      if (!placed) {
        std::fprintf(stderr, "--bind name %s not in --order\n", name.c_str());
        return 2;
      }
    }
    handler = &pjrt;
    std::printf("compiled %s; serving %zu-arg callable\n", argv[3],
                pjrt.order.size());
  }
#else
  if (!echo) {
    std::fprintf(stderr,
                 "built with -DVEON_NO_PJRT: only --echo is available\n");
    return 2;
  }
#endif  // VEON_NO_PJRT

  int lfd = vf::listen_unix(socket_path);
  if (lfd < 0) {
    std::fprintf(stderr, "cannot listen on %s\n", socket_path);
    return 1;
  }
  std::printf("serving on %s (%s)\n", socket_path,
              echo ? "echo" : "pjrt");
  std::fflush(stdout);
  return serve_loop(lfd, handler, once);
}
