// veon_pjrt_runner — jax-free native host runner for exported VEON graphs.
//
// Loads ANY PJRT C-API plugin (libtpu.so on a real TPU host, a CPU plugin
// elsewhere), compiles a StableHLO MLIR module (the `--mlir-out` artifact of
// `veon_tpu export`), feeds .npy inputs, executes on device, writes .npy
// outputs. No python, no jax, no TF at runtime — only dlopen + the PJRT C
// headers at build time. This is the reference's missing TRT-engine
// *consumer* (`tools/convert_bevdet_to_TRT.py` stops at engine creation),
// rebuilt against the TPU-native serving artifact.
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
#include <cstdlib>
#include <string>
#include <vector>

#include <dlfcn.h>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

std::string err_str(PJRT_Error* err) {
  if (!err) return "";
  PJRT_Error_Message_Args m{};
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string s(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  return s;
}

#define CHECK_PJRT(expr)                                              \
  do {                                                                \
    PJRT_Error* _e = (expr);                                          \
    if (_e) {                                                         \
      std::fprintf(stderr, "PJRT error at %s:%d: %s\n", __FILE__,     \
                   __LINE__, err_str(_e).c_str());                    \
      return 1;                                                       \
    }                                                                 \
  } while (0)

bool await_event(PJRT_Event* ev) {
  if (!ev) return true;
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  PJRT_Error* e = g_api->PJRT_Event_Await(&a);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  g_api->PJRT_Event_Destroy(&d);
  if (e) {
    std::fprintf(stderr, "event error: %s\n", err_str(e).c_str());
    return false;
  }
  return true;
}

// ----- .npy v1/v2 (C order) ---------------------------------------------

struct Npy {
  PJRT_Buffer_Type type;
  std::vector<int64_t> dims;
  std::vector<uint8_t> data;
};

size_t type_size(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: case PJRT_Buffer_Type_S32: return 4;
    case PJRT_Buffer_Type_F64: case PJRT_Buffer_Type_S64: return 8;
    case PJRT_Buffer_Type_U8: case PJRT_Buffer_Type_PRED: return 1;
    case PJRT_Buffer_Type_F16: case PJRT_Buffer_Type_BF16: return 2;
    default: return 0;
  }
}

const char* type_descr(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: return "<f4";
    case PJRT_Buffer_Type_F64: return "<f8";
    case PJRT_Buffer_Type_S32: return "<i4";
    case PJRT_Buffer_Type_S64: return "<i8";
    case PJRT_Buffer_Type_U8: return "|u1";
    case PJRT_Buffer_Type_PRED: return "|b1";
    case PJRT_Buffer_Type_F16: return "<f2";
    case PJRT_Buffer_Type_BF16: return "<V2";
    default: return nullptr;
  }
}

bool read_npy(const std::string& path, Npy* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6)) {
    std::fclose(f);
    return false;
  }
  uint32_t hlen = 0;
  if (magic[6] == 1) {
    uint16_t h;
    if (std::fread(&h, 2, 1, f) != 1) { std::fclose(f); return false; }
    hlen = h;
  } else if (std::fread(&hlen, 4, 1, f) != 1) {
    std::fclose(f);
    return false;
  }
  std::string hdr(hlen, '\0');
  if (std::fread(hdr.data(), 1, hlen, f) != hlen) { std::fclose(f); return false; }
  if (hdr.find("'fortran_order': True") != std::string::npos) {
    std::fclose(f);
    return false;
  }
  size_t dp = hdr.find("'descr':");
  size_t q1 = hdr.find('\'', dp + 8), q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  struct { const char* d; PJRT_Buffer_Type t; } map[] = {
      {"<f4", PJRT_Buffer_Type_F32}, {"<f8", PJRT_Buffer_Type_F64},
      {"<i4", PJRT_Buffer_Type_S32}, {"<i8", PJRT_Buffer_Type_S64},
      {"|u1", PJRT_Buffer_Type_U8},  {"|b1", PJRT_Buffer_Type_PRED},
      {"<f2", PJRT_Buffer_Type_F16}, {"<V2", PJRT_Buffer_Type_BF16}};
  bool found = false;
  for (auto& m : map)
    if (descr == m.d) { out->type = m.t; found = true; }
  if (!found) { std::fclose(f); return false; }
  size_t sp = hdr.find("'shape':");
  size_t p1 = hdr.find('(', sp), p2 = hdr.find(')', p1);
  std::string shape = hdr.substr(p1 + 1, p2 - p1 - 1);
  out->dims.clear();
  const char* s = shape.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    out->dims.push_back(std::strtoll(s, const_cast<char**>(&s), 10));
  }
  int64_t n = 1;
  for (auto d : out->dims) n *= d;
  out->data.resize(static_cast<size_t>(n) * type_size(out->type));
  bool ok = out->data.empty() ||
            std::fread(out->data.data(), 1, out->data.size(), f) ==
                out->data.size();
  std::fclose(f);
  return ok;
}

bool write_npy(const std::string& path, const Npy& t) {
  const char* descr = type_descr(t.type);
  if (!descr) return false;
  std::string shape = "(";
  for (size_t i = 0; i < t.dims.size(); ++i) {
    shape += std::to_string(t.dims[i]);
    if (t.dims.size() == 1 || i + 1 < t.dims.size()) shape += ",";
    if (i + 1 < t.dims.size()) shape += " ";
  }
  shape += ")";
  std::string hdr = std::string("{'descr': '") + descr +
                    "', 'fortran_order': False, 'shape': " + shape + ", }";
  size_t total = 10 + hdr.size() + 1;
  hdr += std::string(((total + 63) / 64) * 64 - total, ' ');
  hdr += '\n';
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return false;
  uint16_t hlen = static_cast<uint16_t>(hdr.size());
  std::fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  std::fwrite(&hlen, 2, 1, f);
  std::fwrite(hdr.data(), 1, hdr.size(), f);
  std::fwrite(t.data.data(), 1, t.data.size(), f);
  std::fclose(f);
  return true;
}

std::vector<char> read_file(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return {};
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(n));
  if (n && std::fread(buf.data(), 1, buf.size(), f) != buf.size()) buf.clear();
  std::fclose(f);
  return buf;
}

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
  for (int i = 3; i < argc; ++i) {
    if (std::strcmp(argv[i], "--probe") == 0) probe = true;
    else if (std::strcmp(argv[i], "--out") == 0 && i + 1 < argc)
      out_prefix = argv[++i];
    else input_paths.push_back(argv[i]);
  }

  void* lib = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!lib) {
    std::fprintf(stderr, "dlopen failed: %s\n", dlerror());
    return 1;
  }
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) {
    std::fprintf(stderr, "GetPjrtApi not exported by %s\n", plugin_path);
    return 1;
  }
  g_api = get_api();
  std::printf("pjrt api %d.%d (struct_size %zu)\n",
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version, g_api->struct_size);

  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  CHECK_PJRT(g_api->PJRT_Plugin_Initialize(&init));

  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  {
    PJRT_Error* e = g_api->PJRT_Client_Create(&cc);
    if (e) {
      std::fprintf(stderr, "client create failed: %s\n", err_str(e).c_str());
      // --probe treats "plugin loaded + api negotiated but no device
      // attached" as success rc 3 (distinguishable from hard failures)
      return probe ? 3 : 1;
    }
  }
  PJRT_Client* client = cc.client;

  PJRT_Client_PlatformName_Args pn{};
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = client;
  CHECK_PJRT(g_api->PJRT_Client_PlatformName(&pn));
  std::printf("platform: %.*s\n", static_cast<int>(pn.platform_name_size),
              pn.platform_name);

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  CHECK_PJRT(g_api->PJRT_Client_AddressableDevices(&ad));
  std::printf("addressable devices: %zu\n", ad.num_addressable_devices);
  if (probe) return 0;
  if (ad.num_addressable_devices == 0) {
    std::fprintf(stderr, "no addressable devices\n");
    return 1;
  }
  PJRT_Device* device = ad.addressable_devices[0];

  std::vector<char> mlir = read_file(mlir_path);
  if (mlir.empty()) {
    std::fprintf(stderr, "cannot read %s\n", mlir_path);
    return 1;
  }
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  program.format = "mlir";
  program.format_size = 4;

  // minimal CompileOptionsProto: executable_build_options(field 3) with
  // num_replicas(4)=1, num_partitions(5)=1 — hand-encoded protobuf wire
  const unsigned char opts[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};
  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = reinterpret_cast<const char*>(opts);
  comp.compile_options_size = sizeof opts;
  CHECK_PJRT(g_api->PJRT_Client_Compile(&comp));
  PJRT_LoadedExecutable* exec = comp.executable;
  std::printf("compiled %s (%zu bytes mlir)\n", mlir_path, mlir.size());

  // inputs -> device buffers
  std::vector<PJRT_Buffer*> args_buf;
  for (const auto& p : input_paths) {
    Npy in;
    if (!read_npy(p, &in)) {
      std::fprintf(stderr, "cannot read npy %s\n", p.c_str());
      return 1;
    }
    PJRT_Client_BufferFromHostBuffer_Args bh{};
    bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bh.client = client;
    bh.data = in.data.data();
    bh.type = in.type;
    bh.dims = in.dims.data();
    bh.num_dims = in.dims.size();
    bh.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bh.device = device;
    CHECK_PJRT(g_api->PJRT_Client_BufferFromHostBuffer(&bh));
    if (!await_event(bh.done_with_host_buffer)) return 1;
    args_buf.push_back(bh.buffer);
  }

  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  CHECK_PJRT(g_api->PJRT_LoadedExecutable_GetExecutable(&ge));
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  CHECK_PJRT(g_api->PJRT_Executable_NumOutputs(&no));
  size_t n_out = no.num_outputs;

  std::vector<PJRT_Buffer*> outs(n_out, nullptr);
  PJRT_Buffer* const* arg_list = args_buf.data();
  PJRT_Buffer** out_list = outs.data();
  PJRT_Event* done = nullptr;
  PJRT_ExecuteOptions eopts{};
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  PJRT_LoadedExecutable_Execute_Args ex{};
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &eopts;
  ex.argument_lists = &arg_list;
  ex.num_devices = 1;
  ex.num_args = args_buf.size();
  ex.output_lists = &out_list;
  ex.device_complete_events = &done;
  CHECK_PJRT(g_api->PJRT_LoadedExecutable_Execute(&ex));
  if (!await_event(done)) return 1;

  for (size_t i = 0; i < n_out; ++i) {
    Npy out;
    PJRT_Buffer_ElementType_Args et{};
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = outs[i];
    CHECK_PJRT(g_api->PJRT_Buffer_ElementType(&et));
    out.type = et.type;
    PJRT_Buffer_Dimensions_Args bd{};
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = outs[i];
    CHECK_PJRT(g_api->PJRT_Buffer_Dimensions(&bd));
    out.dims.assign(bd.dims, bd.dims + bd.num_dims);

    PJRT_Buffer_ToHostBuffer_Args th{};
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = outs[i];
    CHECK_PJRT(g_api->PJRT_Buffer_ToHostBuffer(&th));  // query size
    out.data.resize(th.dst_size);
    th.dst = out.data.data();
    CHECK_PJRT(g_api->PJRT_Buffer_ToHostBuffer(&th));
    if (!await_event(th.event)) return 1;

    std::string path = out_prefix + std::to_string(i) + ".npy";
    if (!write_npy(path, out)) {
      std::fprintf(stderr, "write failed: %s\n", path.c_str());
      return 1;
    }
    std::printf("output %zu -> %s\n", i, path.c_str());
  }
  return 0;
}
