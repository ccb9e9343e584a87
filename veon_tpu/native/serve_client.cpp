// Dependency-free C++ client for the veon_tpu serving socket.
//
// Speaks the frame documented in veon_tpu/serve/protocol.py (framing +
// .npy io shared with the native server in native/frame.h). Usable two
// ways:
//   1. As a library: veon_serve_infer() via ctypes/linkage.
//   2. As a binary:  veon_client <socket> name=in.npy [...] --out prefix
//      reads .npy v1/v2 files, sends one request, writes each response
//      tensor to <prefix><name>.npy.
//
// This is the native consumer of the serving runtime around the StableHLO
// export (the reference's TRT-engine-consumer counterpart — its repo stops
// at engine creation, tools/convert_bevdet_to_TRT.py).

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <unistd.h>

#include "frame.h"

using veon_frame::Tensor;
using veon_frame::connect_unix;
using veon_frame::parse_npy;
using veon_frame::recv_frame;
using veon_frame::send_frame;
using veon_frame::write_npy;

// ---- C API (ctypes-loadable) -------------------------------------------

extern "C" int veon_serve_ping(const char* socket_path) {
  int fd = connect_unix(socket_path);
  if (fd < 0) return -1;
  ::close(fd);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <socket> name=in.npy [name=in.npy ...] "
                 "[--out prefix]\n", argv[0]);
    return 2;
  }
  std::string out_prefix = "./";
  std::vector<Tensor> req;
  for (int i = 2; i < argc; ++i) {
    if (std::strcmp(argv[i], "--out") == 0 && i + 1 < argc) {
      out_prefix = argv[++i];
      continue;
    }
    const char* eq = std::strchr(argv[i], '=');
    if (!eq) {
      std::fprintf(stderr, "bad arg (want name=file.npy): %s\n", argv[i]);
      return 2;
    }
    Tensor t;
    t.name.assign(argv[i], eq - argv[i]);
    if (!parse_npy(eq + 1, &t)) {
      std::fprintf(stderr, "failed to read %s\n", eq + 1);
      return 2;
    }
    req.push_back(std::move(t));
  }
  int fd = connect_unix(argv[1]);
  if (fd < 0) {
    std::fprintf(stderr, "cannot connect to %s\n", argv[1]);
    return 1;
  }
  if (!send_frame(fd, req)) {
    std::fprintf(stderr, "send failed\n");
    return 1;
  }
  std::vector<Tensor> resp;
  uint16_t status = 0;
  if (!recv_frame(fd, &resp, &status)) {
    std::fprintf(stderr, "recv failed\n");
    return 1;
  }
  ::close(fd);
  if (status != 0) {
    std::string msg;
    for (const auto& t : resp)
      if (t.name == "error")
        msg.assign(reinterpret_cast<const char*>(t.data.data()),
                   t.data.size());
    std::fprintf(stderr, "server error: %s\n", msg.c_str());
    return 1;
  }
  for (const auto& t : resp) {
    std::string path = out_prefix + t.name + ".npy";
    if (!write_npy(path, t)) {
      std::fprintf(stderr, "failed to write %s\n", path.c_str());
      return 1;
    }
    std::printf("%s -> %s\n", t.name.c_str(), path.c_str());
  }
  return 0;
}
