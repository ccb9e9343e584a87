// veon_pjrt_runner — jax-free native host runner for exported VEON graphs.
//
// Loads ANY PJRT C-API plugin (libtpu.so on a real TPU host, a CPU plugin
// elsewhere), compiles a StableHLO MLIR module (the `--mlir-out` artifact of
// `veon_tpu export`), feeds .npy inputs, executes on device, writes .npy
// outputs. No python, no jax, no TF at runtime — only dlopen + the PJRT C
// headers at build time. This is the reference's missing TRT-engine
// *consumer* (`tools/convert_bevdet_to_TRT.py` stops at engine creation),
// rebuilt against the TPU-native serving artifact. The long-running daemon
// form of the same stack is native/serve_host.cpp; shared PJRT plumbing
// lives in native/pjrt_util.h, .npy io in native/frame.h.
//
//   veon_pjrt_runner <plugin.so> <module.mlir> [in0.npy in1.npy ...]
//                    [--out prefix] [--probe]
//
// --probe: stop after client creation and print platform info (used by the
// unit test — on machines without an attachable device this exercises the
// full load/init path and reports the plugin's error cleanly).
//
// Build (see tests/test_pjrt_runner.py): needs the PJRT C API header, e.g.
//   g++ -O2 -std=c++17 -I$TF_INCLUDE/tensorflow/compiler \
//       -o veon_pjrt_runner pjrt_runner.cpp -ldl

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "frame.h"
#include "pjrt_util.h"

namespace vp = veon_pjrt;
namespace vf = veon_frame;

namespace {

#define CHECK_OK(expr)                                                \
  do {                                                                \
    std::string _e = (expr);                                          \
    if (!_e.empty()) {                                                \
      std::fprintf(stderr, "PJRT error at %s:%d: %s\n", __FILE__,     \
                   __LINE__, _e.c_str());                             \
      return 1;                                                       \
    }                                                                 \
  } while (0)

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <pjrt_plugin.so> <module.mlir> [inputs.npy ...] "
                 "[--out prefix] [--probe]\n", argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  const char* mlir_path = argv[2];
  bool probe = false;
  std::string out_prefix = "./out_";
  std::vector<std::string> input_paths;
  std::vector<vp::CreateOpt> copts;
  std::string compile_opts_path;
  for (int i = 3; i < argc; ++i) {
    if (std::strcmp(argv[i], "--probe") == 0) probe = true;
    else if (std::strcmp(argv[i], "--out") == 0 && i + 1 < argc)
      out_prefix = argv[++i];
    else if (std::strcmp(argv[i], "--copt") == 0 && i + 1 < argc)
      // client create option k=v (remote-terminal proxy plugins want
      // topology/session_id/remote_compile here, like jax passes them)
      copts.push_back(vp::parse_copt(argv[++i]));
    else if (std::strcmp(argv[i], "--compile-opts") == 0 && i + 1 < argc)
      compile_opts_path = argv[++i];
    else input_paths.push_back(argv[i]);
  }

  CHECK_OK(vp::load_plugin(plugin_path));

  PJRT_Client* client = nullptr;
  {
    std::string e = vp::create_client(&client, copts);
    if (!e.empty()) {
      std::fprintf(stderr, "client create failed: %s\n", e.c_str());
      // --probe treats "plugin loaded + api negotiated but no device
      // attached" as success rc 3 (distinguishable from hard failures)
      return probe ? 3 : 1;
    }
  }

  std::string platform;
  CHECK_OK(vp::platform_name(client, &platform));
  std::printf("platform: %s\n", platform.c_str());

  PJRT_Device* device = nullptr;
  size_t n_dev = 0;
  {
    std::string e = vp::first_device(client, &device, &n_dev);
    std::printf("addressable devices: %zu\n", n_dev);
    if (probe) return 0;
    if (!e.empty()) {
      std::fprintf(stderr, "%s\n", e.c_str());
      return 1;
    }
  }

  std::vector<char> mlir = vp::read_file(mlir_path);
  if (mlir.empty()) {
    std::fprintf(stderr, "cannot read %s\n", mlir_path);
    return 1;
  }
  PJRT_LoadedExecutable* exec = nullptr;
  std::vector<char> co;
  if (!compile_opts_path.empty()) {
    co = vp::read_file(compile_opts_path);
    if (co.empty()) {
      std::fprintf(stderr, "cannot read %s\n", compile_opts_path.c_str());
      return 1;
    }
  }
  CHECK_OK(vp::compile_mlir(client, mlir, &exec, co.empty() ? nullptr : &co));
  std::printf("compiled %s (%zu bytes mlir)\n", mlir_path, mlir.size());

  // inputs -> device buffers (.npy descr -> PJRT type via frame codes)
  std::setvbuf(stdout, nullptr, _IOLBF, 0);  // progress visible under redirect
  std::vector<PJRT_Buffer*> args_buf;
  for (const auto& p : input_paths) {
    if (args_buf.size() % 50 == 0)
      std::printf("to_device %zu/%zu...\n", args_buf.size(),
                  input_paths.size());
    vf::Tensor in;
    if (!vf::parse_npy(p, &in)) {
      std::fprintf(stderr, "cannot read npy %s\n", p.c_str());
      return 1;
    }
    PJRT_Buffer_Type type;
    if (!vp::frame_code_type(in.dtype, &type)) {
      std::fprintf(stderr, "unsupported dtype in %s\n", p.c_str());
      return 1;
    }
    std::vector<int64_t> dims(in.dims.begin(), in.dims.end());
    PJRT_Buffer* buf = nullptr;
    CHECK_OK(vp::to_device(client, device, type, dims.data(), dims.size(),
                           in.data.data(), &buf));
    // stream the upload NOW, every buffer: lazy proxy plugins otherwise
    // defer everything to the first readback, and one bulk multi-hundred-MB
    // flush there drops relay transports ("connection dropped" breaker).
    // Validated: 340 per-buffer flushes incl. a 52 MB tensor, all clean.
    CHECK_OK(vp::await_buffer_ready(buf));
    args_buf.push_back(buf);
  }

  size_t n_out = 0;
  CHECK_OK(vp::num_outputs(exec, &n_out));
  std::vector<PJRT_Buffer*> outs(n_out, nullptr);
  std::printf("executing (%zu args, %zu outputs)...\n", args_buf.size(), n_out);
  CHECK_OK(vp::execute(exec, args_buf, &outs));
  std::printf("execute dispatched; reading back...\n");

  // all transfers started before any await: a sequential fetch-await loop
  // deadlocks multi-output results on lazy proxy plugins (to_host_all doc)
  std::vector<PJRT_Buffer_Type> types;
  std::vector<std::vector<int64_t>> out_dims;
  std::vector<std::vector<uint8_t>> out_data;
  CHECK_OK(vp::to_host_all(outs, &types, &out_dims, &out_data, stdout));
  for (size_t i = 0; i < n_out; ++i) {
    vf::Tensor out;
    if (!vp::type_frame_code(types[i], &out.dtype)) {
      std::fprintf(stderr, "unsupported output type %d\n", int(types[i]));
      return 1;
    }
    out.dims.assign(out_dims[i].begin(), out_dims[i].end());
    out.data = std::move(out_data[i]);
    std::string path = out_prefix + std::to_string(i) + ".npy";
    if (!vf::write_npy(path, out)) {
      std::fprintf(stderr, "write failed: %s\n", path.c_str());
      return 1;
    }
    std::printf("output %zu -> %s\n", i, path.c_str());
  }
  return 0;
}
