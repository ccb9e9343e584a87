// Shared PJRT C-API helpers for the native host tools (pjrt_runner.cpp,
// serve_host.cpp): plugin loading, client/compile, host<->device buffers.
// Header-only; needs the PJRT C API header on the include path and -ldl.
// Errors are returned as strings so long-running callers (the serving
// daemon) can report per-request failures without dying.
#ifndef VEON_NATIVE_PJRT_UTIL_H_
#define VEON_NATIVE_PJRT_UTIL_H_

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include <dlfcn.h>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace veon_pjrt {

inline const PJRT_Api* g_api = nullptr;

inline std::string err_str(PJRT_Error* err) {
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

// returns "" on success, the error message otherwise
inline std::string check(PJRT_Error* e) { return e ? err_str(e) : ""; }

inline bool await_event(PJRT_Event* ev, std::string* err) {
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
    *err = err_str(e);
    return false;
  }
  return true;
}

inline size_t type_size(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_F32: case PJRT_Buffer_Type_S32: return 4;
    case PJRT_Buffer_Type_F64: case PJRT_Buffer_Type_S64: return 8;
    case PJRT_Buffer_Type_U8: case PJRT_Buffer_Type_PRED: return 1;
    case PJRT_Buffer_Type_F16: case PJRT_Buffer_Type_BF16: return 2;
    default: return 0;
  }
}

// numpy descr <-> PJRT type (C order; bf16 rides as raw void2)
inline const char* type_descr(PJRT_Buffer_Type t) {
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

inline bool descr_type(const std::string& descr, PJRT_Buffer_Type* out) {
  struct { const char* d; PJRT_Buffer_Type t; } map[] = {
      {"<f4", PJRT_Buffer_Type_F32}, {"<f8", PJRT_Buffer_Type_F64},
      {"<i4", PJRT_Buffer_Type_S32}, {"<i8", PJRT_Buffer_Type_S64},
      {"|u1", PJRT_Buffer_Type_U8},  {"|b1", PJRT_Buffer_Type_PRED},
      {"<f2", PJRT_Buffer_Type_F16}, {"<V2", PJRT_Buffer_Type_BF16}};
  for (auto& m : map)
    if (descr == m.d) { *out = m.t; return true; }
  return false;
}

// serve-frame dtype code (veon_tpu/serve/protocol.py) <-> PJRT type
inline bool frame_code_type(uint8_t code, PJRT_Buffer_Type* out) {
  static const PJRT_Buffer_Type map[] = {
      PJRT_Buffer_Type_F32, PJRT_Buffer_Type_F64, PJRT_Buffer_Type_S32,
      PJRT_Buffer_Type_S64, PJRT_Buffer_Type_U8, PJRT_Buffer_Type_BF16,
      PJRT_Buffer_Type_PRED, PJRT_Buffer_Type_F16};
  if (code >= sizeof map / sizeof map[0]) return false;
  *out = map[code];
  return true;
}

inline bool type_frame_code(PJRT_Buffer_Type t, uint8_t* out) {
  switch (t) {
    case PJRT_Buffer_Type_F32: *out = 0; return true;
    case PJRT_Buffer_Type_F64: *out = 1; return true;
    case PJRT_Buffer_Type_S32: *out = 2; return true;
    case PJRT_Buffer_Type_S64: *out = 3; return true;
    case PJRT_Buffer_Type_U8: *out = 4; return true;
    case PJRT_Buffer_Type_BF16: *out = 5; return true;
    case PJRT_Buffer_Type_PRED: *out = 6; return true;
    case PJRT_Buffer_Type_F16: *out = 7; return true;
    default: return false;
  }
}

inline std::vector<char> read_file(const std::string& path) {
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

// dlopen + GetPjrtApi + Plugin_Initialize; sets g_api. "" on success.
inline std::string load_plugin(const char* plugin_path) {
  void* lib = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!lib) return std::string("dlopen failed: ") + dlerror();
  auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(lib, "GetPjrtApi"));
  if (!get_api) return std::string("GetPjrtApi not exported by ") + plugin_path;
  g_api = get_api();
  std::printf("pjrt api %d.%d (struct_size %zu)\n",
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version, g_api->struct_size);
  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  return check(g_api->PJRT_Plugin_Initialize(&init));
}

// typed client create option ("--copt k=v": all-digits v -> kInt64,
// otherwise kString — matches how jax encodes python int/str options).
// Plugins that need connection parameters (e.g. a remote-terminal proxy
// plugin wants session_id/topology/remote_compile) receive them here.
struct CreateOpt {
  std::string key;
  std::string sval;
  int64_t ival = 0;
  bool is_int = false;
};

inline CreateOpt parse_copt(const std::string& kv) {
  CreateOpt o;
  size_t eq = kv.find('=');
  o.key = kv.substr(0, eq);
  if (eq == std::string::npos) return o;
  o.sval = kv.substr(eq + 1);
  if (!o.sval.empty() &&
      o.sval.find_first_not_of("0123456789-") == std::string::npos) {
    o.is_int = true;
    o.ival = std::strtoll(o.sval.c_str(), nullptr, 10);
  }
  return o;
}

inline std::string create_client(PJRT_Client** out,
                                 const std::vector<CreateOpt>& opts = {}) {
  std::vector<PJRT_NamedValue> nv(opts.size());
  for (size_t i = 0; i < opts.size(); ++i) {
    nv[i] = PJRT_NamedValue{};
    nv[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv[i].name = opts[i].key.c_str();
    nv[i].name_size = opts[i].key.size();
    if (opts[i].is_int) {
      nv[i].type = PJRT_NamedValue_kInt64;
      nv[i].int64_value = opts[i].ival;
      nv[i].value_size = 1;
    } else {
      nv[i].type = PJRT_NamedValue_kString;
      nv[i].string_value = opts[i].sval.c_str();
      nv[i].value_size = opts[i].sval.size();
    }
  }
  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = nv.data();
  cc.num_options = nv.size();
  std::string e = check(g_api->PJRT_Client_Create(&cc));
  if (e.empty()) *out = cc.client;
  return e;
}

inline std::string platform_name(PJRT_Client* client, std::string* out) {
  PJRT_Client_PlatformName_Args pn{};
  pn.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pn.client = client;
  std::string e = check(g_api->PJRT_Client_PlatformName(&pn));
  if (e.empty()) out->assign(pn.platform_name, pn.platform_name_size);
  return e;
}

inline std::string first_device(PJRT_Client* client, PJRT_Device** out,
                                size_t* count = nullptr) {
  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  std::string e = check(g_api->PJRT_Client_AddressableDevices(&ad));
  if (!e.empty()) return e;
  if (count) *count = ad.num_addressable_devices;
  if (ad.num_addressable_devices == 0) return "no addressable devices";
  *out = ad.addressable_devices[0];
  return "";
}

inline std::string compile_mlir(PJRT_Client* client,
                                const std::vector<char>& mlir,
                                PJRT_LoadedExecutable** out,
                                const std::vector<char>* options_pb = nullptr) {
  PJRT_Program program{};
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = const_cast<char*>(mlir.data());
  program.code_size = mlir.size();
  program.format = "mlir";
  program.format_size = 4;
  // CompileOptionsProto. Default: minimal executable_build_options(field 3)
  // with num_replicas(4)=1, num_partitions(5)=1 — hand-encoded wire format.
  // Production bundles ship the FULL options jax would send
  // (export --native writes compile_options.pb; pass via options_pb): the
  // scheduling defaults in there matter at real graph scale — the minimal
  // proto compiled a toy module fine but blew the TPU's 2 KB sflag budget
  // (async-copy sync flags) by 32B on the full VEON graph.
  static const unsigned char min_opts[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};
  PJRT_Client_Compile_Args comp{};
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  if (options_pb && !options_pb->empty()) {
    comp.compile_options = options_pb->data();
    comp.compile_options_size = options_pb->size();
  } else {
    comp.compile_options = reinterpret_cast<const char*>(min_opts);
    comp.compile_options_size = sizeof min_opts;
  }
  std::string e = check(g_api->PJRT_Client_Compile(&comp));
  if (e.empty()) *out = comp.executable;
  return e;
}

inline std::string num_outputs(PJRT_LoadedExecutable* exec, size_t* out) {
  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = exec;
  std::string e = check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge));
  if (!e.empty()) return e;
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  e = check(g_api->PJRT_Executable_NumOutputs(&no));
  if (e.empty()) *out = no.num_outputs;
  return e;
}

inline std::string to_device(PJRT_Client* client, PJRT_Device* device,
                             PJRT_Buffer_Type type, const int64_t* dims,
                             size_t ndim, const void* data,
                             PJRT_Buffer** out) {
  PJRT_Client_BufferFromHostBuffer_Args bh{};
  bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bh.client = client;
  bh.data = data;
  bh.type = type;
  bh.dims = dims;
  bh.num_dims = ndim;
  // kImmutableOnlyDuringCall: the plugin must consume `data` before the
  // call returns, so done_with_host_buffer resolves immediately (or is
  // never deferred). Under kImmutableUntilTransferCompletes a LAZY proxy
  // plugin (remote-terminal backends that flush transfers on demand) can
  // leave that event unresolved indefinitely for large buffers — observed
  // as a hang on the full VEON param set while a toy module sailed
  // through. The extra host-side copy is once per bind / request tensor.
  bh.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableOnlyDuringCall;
  bh.device = device;
  std::string e = check(g_api->PJRT_Client_BufferFromHostBuffer(&bh));
  if (!e.empty()) return e;
  if (!await_event(bh.done_with_host_buffer, &e)) return e;
  *out = bh.buffer;
  return "";
}

// Await a buffer's device-side ready event. On lazy proxy plugins this is
// the per-buffer "flush now" lever: awaiting it right after
// BufferFromHostBuffer streams uploads incrementally instead of deferring
// the whole staged set to the first readback (where a relay may refuse or
// drop a multi-GB flush). Optional — plain local plugins resolve it
// trivially.
inline std::string await_buffer_ready(PJRT_Buffer* buf) {
  PJRT_Buffer_ReadyEvent_Args re{};
  re.struct_size = PJRT_Buffer_ReadyEvent_Args_STRUCT_SIZE;
  re.buffer = buf;
  std::string e = check(g_api->PJRT_Buffer_ReadyEvent(&re));
  if (!e.empty()) return e;
  if (!await_event(re.event, &e)) return e;
  return "";
}

inline void destroy_buffer(PJRT_Buffer* buf) {
  if (!buf) return;
  PJRT_Buffer_Destroy_Args d{};
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = buf;
  err_str(g_api->PJRT_Buffer_Destroy(&d));  // drop error text
}

inline std::string execute(PJRT_LoadedExecutable* exec,
                           const std::vector<PJRT_Buffer*>& args,
                           std::vector<PJRT_Buffer*>* outs) {
  // per-process launch counter: some remote-proxy plugins key execution
  // tracking on a NONZERO launch_id (validated: with launch_id set the
  // full VEON graph's device_complete event resolves through the relay;
  // jax sets one per dispatch too)
  static int32_t launch_counter = 0;
  PJRT_Buffer* const* arg_list = args.data();
  PJRT_Buffer** out_list = outs->data();
  PJRT_Event* done = nullptr;
  PJRT_ExecuteOptions eopts{};
  eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  eopts.launch_id = ++launch_counter;
  PJRT_LoadedExecutable_Execute_Args ex{};
  ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  ex.executable = exec;
  ex.options = &eopts;
  ex.argument_lists = &arg_list;
  ex.num_devices = 1;
  ex.num_args = args.size();
  ex.output_lists = &out_list;
  ex.device_complete_events = &done;
  std::string e = check(g_api->PJRT_LoadedExecutable_Execute(&ex));
  if (!e.empty()) return e;
  // Await completion HERE only because inputs were flushed per-buffer at
  // upload (await_buffer_ready in the callers): on lazy proxy plugins the
  // execute event only resolves once nothing big is left to flush — with
  // deferred uploads this await dead-locked / dropped the relay. The
  // output ToHostBuffer event in to_host() remains the final data sync.
  if (!await_event(done, &e)) return e;
  return "";
}

// fetch type/dims/bytes of a device buffer to host
inline std::string to_host(PJRT_Buffer* buf, PJRT_Buffer_Type* type,
                           std::vector<int64_t>* dims,
                           std::vector<uint8_t>* data) {
  PJRT_Buffer_ElementType_Args et{};
  et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
  et.buffer = buf;
  std::string e = check(g_api->PJRT_Buffer_ElementType(&et));
  if (!e.empty()) return e;
  *type = et.type;
  PJRT_Buffer_Dimensions_Args bd{};
  bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  bd.buffer = buf;
  e = check(g_api->PJRT_Buffer_Dimensions(&bd));
  if (!e.empty()) return e;
  dims->assign(bd.dims, bd.dims + bd.num_dims);
  PJRT_Buffer_ToHostBuffer_Args th{};
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = buf;
  e = check(g_api->PJRT_Buffer_ToHostBuffer(&th));  // query size
  if (!e.empty()) return e;
  data->resize(th.dst_size);
  th.dst = data->data();
  e = check(g_api->PJRT_Buffer_ToHostBuffer(&th));
  if (!e.empty()) return e;
  if (!await_event(th.event, &e)) return e;
  return "";
}

// Fetch SEVERAL device buffers with every transfer STARTED before any event
// is awaited. On lazy proxy plugins a multi-output result may only
// materialize once all outputs are demanded — the strictly sequential
// fetch-await loop (to_host per output) then blocks forever inside output
// 0's transfer (observed live on the axon proxy: a tiny 4-way split pred
// hung >8 min exactly there, while the same graph's single-output form
// reads back in seconds). Metadata + size queries are issued first (host-
// side), then all transfers, then all awaits. Plain local plugins see the
// same semantics as N to_host calls.
inline std::string to_host_all(const std::vector<PJRT_Buffer*>& bufs,
                               std::vector<PJRT_Buffer_Type>* types,
                               std::vector<std::vector<int64_t>>* dims,
                               std::vector<std::vector<uint8_t>>* datas,
                               std::FILE* progress = nullptr) {
  const size_t n = bufs.size();
  types->resize(n);
  dims->resize(n);
  datas->resize(n);
  std::vector<PJRT_Event*> events(n, nullptr);
  std::string first_err;
  for (size_t i = 0; i < n && first_err.empty(); ++i) {
    PJRT_Buffer_ElementType_Args et{};
    et.struct_size = PJRT_Buffer_ElementType_Args_STRUCT_SIZE;
    et.buffer = bufs[i];
    first_err = check(g_api->PJRT_Buffer_ElementType(&et));
    if (!first_err.empty()) break;
    (*types)[i] = et.type;
    PJRT_Buffer_Dimensions_Args bd{};
    bd.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    bd.buffer = bufs[i];
    first_err = check(g_api->PJRT_Buffer_Dimensions(&bd));
    if (!first_err.empty()) break;
    (*dims)[i].assign(bd.dims, bd.dims + bd.num_dims);
    // dst size computed locally (dense row-major: elems x type width) —
    // the "query size" ToHostBuffer call (dst=nullptr) is itself a
    // materialization trigger on lazy proxy plugins and can block exactly
    // like the transfer, defeating the start-all-first strategy
    size_t elems = 1;
    for (int64_t d : (*dims)[i]) elems *= size_t(d);
    const size_t width = type_size((*types)[i]);
    if (width == 0) {
      first_err = "unknown output element width";
      break;
    }
    (*datas)[i].resize(elems * width);
    PJRT_Buffer_ToHostBuffer_Args th{};
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = bufs[i];
    th.dst = (*datas)[i].data();
    th.dst_size = (*datas)[i].size();
    first_err = check(g_api->PJRT_Buffer_ToHostBuffer(&th));
    if (!first_err.empty()) break;
    events[i] = th.event;
    if (progress)
      std::fprintf(progress, "transfer %zu/%zu started (%zu bytes)\n",
                   i + 1, n, (*datas)[i].size());
  }
  if (progress) std::fprintf(progress, "awaiting %zu transfers...\n", n);
  // Await (and destroy) every started event even after an error — leaking
  // an in-flight transfer into a destroyed buffer is worse than waiting.
  for (size_t i = 0; i < n; ++i) {
    std::string e;
    if (events[i] && !await_event(events[i], &e) && first_err.empty())
      first_err = e;
    if (progress && events[i])
      std::fprintf(progress, "transfer %zu/%zu done\n", i + 1, n);
  }
  return first_err;
}

}  // namespace veon_pjrt

#endif  // VEON_NATIVE_PJRT_UTIL_H_
