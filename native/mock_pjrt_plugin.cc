// mock_pjrt_plugin — hermetic CPU stand-in for a real PJRT plugin.
//
// jaxlib ships no CPU PJRT C-API plugin .so (its CPU client lives inside
// _jax.so without a GetPjrtApi export) and the axon TPU plugin needs the
// live tunnel, so until this file existed the native serving host
// (pjrt_serve.cc) could only be exercised on real hardware.  This plugin
// implements exactly the PJRT C-API subset the host uses, over plain host
// memory, so the ENTIRE host — artifact validation, npy IO, buffer
// upload/fetch, device-layout un-permutation, the stdin serve loop, and
// the socket serve loop — runs in CI with zero TPU access.
//
// The "executable" artifact is a text descriptor instead of a serialized
// XLA program (see tools/export_model.py::write_mock_artifact):
//
//   MOCKEXEC1
//   out_shape=4,10
//   scale=2.0
//   shift=1.0
//   layout=reversed        # device layout of the OUTPUT buffer:
//                          # rowmajor | reversed (Fortran-order bytes)
//   mode=rowwise           # optional: row-aligned compute (see below)
//
// Execute computes out[j] = scale * in[j % in_elems] + shift over the
// flattened row-major input — deterministic, shape-generic, and cheap to
// replicate in Python for expected_logits.npy.  `layout=reversed` makes
// ToHostBuffer return Fortran-order bytes with minor_to_major=[0..r-1],
// which forces the host's n-d un-permute path — the exact trap the real
// axon plugin springs (ARCHITECTURE.md, PJRT layout notes).
//
// `mode=rowwise` switches to out[r, c] = scale * in[r, c % irow] + shift
// (r along dim 0, irow = elements per input row): output row r depends
// ONLY on input row r, like a real per-sample model.  That makes answers
// invariant to how the serving host groups rows into device batches — the
// property the coalescing (continuous-batching) tests rely on, which the
// default flattened indexing deliberately lacks.
//
// reference: none — SURVEY.md §2.3 (the reference ships no native layer;
// this is test infrastructure for the TPU build's own serving host).
//
// Build: `make -C native mock_pjrt_plugin.so`.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

// ---- opaque types the header forward-declares ----------------------------

struct PJRT_Error {
  std::string message;
};

struct PJRT_Event {};  // every mock operation completes synchronously

struct PJRT_Device {
  int id = 0;
};

struct MockProgram {
  std::vector<int64_t> out_shape;
  float scale = 1.0f;
  float shift = 0.0f;
  bool reversed_layout = false;
  bool rowwise = false;
};

struct PJRT_Client {
  PJRT_Device device;
  PJRT_Device* device_ptr[1];
};

struct PJRT_Executable {
  MockProgram prog;
};

struct PJRT_LoadedExecutable {
  MockProgram prog;
};

// Logical values are ALWAYS held row-major in `host`; `minor_to_major`
// describes the layout ToHostBuffer materializes (the "device" layout).
struct PJRT_Buffer {
  std::vector<int64_t> dims;
  std::vector<float> host;
  std::vector<int64_t> minor_to_major;  // physical-minor -> logical dim
};

namespace {

PJRT_Error* err(const std::string& msg) { return new PJRT_Error{msg}; }

size_t elems(const std::vector<int64_t>& dims) {
  size_t n = 1;
  for (int64_t d : dims) n *= static_cast<size_t>(d);
  return n;
}

// ---- error / event --------------------------------------------------------

void error_destroy(PJRT_Error_Destroy_Args* a) {
  delete a->error;
}

void error_message(PJRT_Error_Message_Args* a) {
  a->message = a->error->message.c_str();
  a->message_size = a->error->message.size();
}

PJRT_Error* error_getcode(PJRT_Error_GetCode_Args* a) {
  a->code = PJRT_Error_Code_INTERNAL;
  return nullptr;
}

PJRT_Error* event_destroy(PJRT_Event_Destroy_Args* a) {
  delete a->event;
  return nullptr;
}

PJRT_Error* event_await(PJRT_Event_Await_Args*) { return nullptr; }

PJRT_Error* event_isready(PJRT_Event_IsReady_Args* a) {
  a->is_ready = true;
  return nullptr;
}

// ---- plugin / client ------------------------------------------------------

PJRT_Error* plugin_initialize(PJRT_Plugin_Initialize_Args*) { return nullptr; }

PJRT_Error* client_create(PJRT_Client_Create_Args* a) {
  // A real plugin would validate create_options (topology, session_id, …);
  // the mock accepts anything — option assembly is covered by the
  // hardware probes.
  auto* c = new PJRT_Client;
  c->device_ptr[0] = &c->device;
  a->client = c;
  return nullptr;
}

PJRT_Error* client_destroy(PJRT_Client_Destroy_Args* a) {
  delete a->client;
  return nullptr;
}

PJRT_Error* client_platform_version(PJRT_Client_PlatformVersion_Args* a) {
  static const char kVersion[] = "mock-pjrt 1.0 (host memory)";
  a->platform_version = kVersion;
  a->platform_version_size = sizeof(kVersion) - 1;
  return nullptr;
}

PJRT_Error* client_addressable_devices(
    PJRT_Client_AddressableDevices_Args* a) {
  a->addressable_devices = a->client->device_ptr;
  a->num_addressable_devices = 1;
  return nullptr;
}

// ---- executable -----------------------------------------------------------

bool parse_program(const std::string& text, MockProgram& prog,
                   std::string& why) {
  if (text.rfind("MOCKEXEC1", 0) != 0) {
    why = "not a MOCKEXEC1 descriptor";
    return false;
  }
  size_t pos = 0;
  while (pos < text.size()) {
    size_t eol = text.find('\n', pos);
    if (eol == std::string::npos) eol = text.size();
    std::string line = text.substr(pos, eol - pos);
    pos = eol + 1;
    size_t eq = line.find('=');
    if (eq == std::string::npos) continue;
    std::string key = line.substr(0, eq);
    std::string val = line.substr(eq + 1);
    if (key == "out_shape") {
      prog.out_shape.clear();
      size_t i = 0;
      while (i < val.size()) {
        size_t j = val.find(',', i);
        if (j == std::string::npos) j = val.size();
        prog.out_shape.push_back(std::stoll(val.substr(i, j - i)));
        i = j + 1;
      }
    } else if (key == "scale") {
      prog.scale = std::stof(val);
    } else if (key == "shift") {
      prog.shift = std::stof(val);
    } else if (key == "layout") {
      prog.reversed_layout = (val == "reversed");
    } else if (key == "mode") {
      prog.rowwise = (val == "rowwise");
    }
  }
  if (prog.out_shape.empty()) {
    why = "descriptor lacks out_shape";
    return false;
  }
  return true;
}

PJRT_Error* deserialize_and_load(PJRT_Executable_DeserializeAndLoad_Args* a) {
  std::string text(a->serialized_executable, a->serialized_executable_size);
  MockProgram prog;
  std::string why;
  if (!parse_program(text, prog, why))
    return err("mock deserialize: " + why);
  a->loaded_executable = new PJRT_LoadedExecutable{prog};
  return nullptr;
}

PJRT_Error* loaded_get_executable(PJRT_LoadedExecutable_GetExecutable_Args* a) {
  a->executable = new PJRT_Executable{a->loaded_executable->prog};
  return nullptr;
}

PJRT_Error* executable_num_outputs(PJRT_Executable_NumOutputs_Args* a) {
  a->num_outputs = 1;
  return nullptr;
}

PJRT_Error* executable_destroy(PJRT_Executable_Destroy_Args* a) {
  delete a->executable;
  return nullptr;
}

PJRT_Error* loaded_destroy(PJRT_LoadedExecutable_Destroy_Args* a) {
  delete a->executable;
  return nullptr;
}

PJRT_Error* execute(PJRT_LoadedExecutable_Execute_Args* a) {
  if (a->num_devices != 1 || a->num_args != 1)
    return err("mock execute: expected 1 device / 1 arg");
  const MockProgram& prog = a->executable->prog;
  const PJRT_Buffer* in = a->argument_lists[0][0];
  auto* out = new PJRT_Buffer;
  out->dims = prog.out_shape;
  size_t n_out = elems(out->dims);
  size_t n_in = in->host.size();
  if (n_in == 0) {
    delete out;
    return err("mock execute: empty input");
  }
  out->host.resize(n_out);
  if (prog.rowwise && !out->dims.empty() && !in->dims.empty() &&
      in->dims[0] > 0 && out->dims[0] > 0 &&
      n_in % static_cast<size_t>(in->dims[0]) == 0 &&
      n_out % static_cast<size_t>(out->dims[0]) == 0) {
    // Row-aligned: output row r reads only input row r (per-sample model).
    size_t in_rows = static_cast<size_t>(in->dims[0]);
    size_t out_rows = static_cast<size_t>(out->dims[0]);
    size_t irow = n_in / in_rows;
    size_t orow = n_out / out_rows;
    for (size_t r = 0; r < out_rows; r++)
      for (size_t c = 0; c < orow; c++)
        out->host[r * orow + c] =
            prog.scale * in->host[(r % in_rows) * irow + (c % irow)] +
            prog.shift;
  } else {
    for (size_t j = 0; j < n_out; j++)
      out->host[j] = prog.scale * in->host[j % n_in] + prog.shift;
  }
  size_t r = out->dims.size();
  out->minor_to_major.resize(r);
  for (size_t i = 0; i < r; i++)
    out->minor_to_major[i] =
        prog.reversed_layout ? static_cast<int64_t>(i)
                             : static_cast<int64_t>(r - 1 - i);
  a->output_lists[0][0] = out;
  if (a->device_complete_events != nullptr)
    a->device_complete_events[0] = new PJRT_Event;
  return nullptr;
}

// ---- buffers ---------------------------------------------------------------

PJRT_Error* buffer_from_host(PJRT_Client_BufferFromHostBuffer_Args* a) {
  if (a->type != PJRT_Buffer_Type_F32)
    return err("mock upload: only F32 supported");
  if (a->num_byte_strides != 0)
    return err("mock upload: byte_strides unsupported (dense-major expected)");
  auto* b = new PJRT_Buffer;
  b->dims.assign(a->dims, a->dims + a->num_dims);
  size_t n = elems(b->dims);
  b->host.resize(n);
  std::memcpy(b->host.data(), a->data, n * sizeof(float));
  size_t r = b->dims.size();
  b->minor_to_major.resize(r);
  for (size_t i = 0; i < r; i++)
    b->minor_to_major[i] = static_cast<int64_t>(r - 1 - i);
  a->buffer = b;
  a->done_with_host_buffer = new PJRT_Event;
  return nullptr;
}

PJRT_Error* buffer_dimensions(PJRT_Buffer_Dimensions_Args* a) {
  a->dims = a->buffer->dims.data();
  a->num_dims = a->buffer->dims.size();
  return nullptr;
}

PJRT_Error* buffer_get_memory_layout(PJRT_Buffer_GetMemoryLayout_Args* a) {
  std::memset(&a->layout, 0, sizeof a->layout);
  a->layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
  a->layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
  a->layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
  a->layout.tiled.minor_to_major = a->buffer->minor_to_major.data();
  a->layout.tiled.minor_to_major_size = a->buffer->minor_to_major.size();
  return nullptr;
}

// Returns bytes in the buffer's OWN (mock-device) layout, mirroring the
// axon plugin's behaviour with host_layout=nullptr — the host is expected
// to un-permute.  An explicit host_layout is rejected like axon rejects
// Strides (and hangs on Tiled), so the host never grows a dependency on a
// path the real plugin lacks.
PJRT_Error* buffer_to_host(PJRT_Buffer_ToHostBuffer_Args* a) {
  if (a->host_layout != nullptr)
    return err("mock fetch: host_layout unsupported (fetch raw + un-permute)");
  const PJRT_Buffer* b = a->src;
  size_t n = b->host.size();
  if (a->dst == nullptr) {
    a->dst_size = n * sizeof(float);
    return nullptr;
  }
  if (a->dst_size < n * sizeof(float)) return err("mock fetch: dst too small");
  float* dst = static_cast<float*>(a->dst);
  size_t r = b->dims.size();
  bool row_major = true;
  for (size_t i = 0; i < r && row_major; i++)
    row_major = (b->minor_to_major[i] == static_cast<int64_t>(r - 1 - i));
  if (row_major || n <= 1 || r <= 1) {
    std::memcpy(dst, b->host.data(), n * sizeof(float));
  } else {
    // Physical linear order: odometer over physical dims (most minor
    // first is minor_to_major[0]); element = logical row-major lookup.
    std::vector<size_t> log_stride(r);  // row-major strides of logical dims
    size_t acc = 1;
    for (size_t d = r; d-- > 0;) {
      log_stride[d] = acc;
      acc *= static_cast<size_t>(b->dims[d]);
    }
    std::vector<size_t> idx(r, 0);  // logical index
    for (size_t lin = 0; lin < n; lin++) {
      size_t off = 0;
      for (size_t d = 0; d < r; d++) off += idx[d] * log_stride[d];
      dst[lin] = b->host[off];
      // odometer: increment the most-minor PHYSICAL dim first
      for (size_t i = 0; i < r; i++) {
        size_t d = static_cast<size_t>(b->minor_to_major[i]);
        if (++idx[d] < static_cast<size_t>(b->dims[d])) break;
        idx[d] = 0;
      }
    }
  }
  a->event = new PJRT_Event;
  return nullptr;
}

PJRT_Error* buffer_destroy(PJRT_Buffer_Destroy_Args* a) {
  delete a->buffer;
  return nullptr;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a;
    std::memset(&a, 0, sizeof a);
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = error_destroy;
    a.PJRT_Error_Message = error_message;
    a.PJRT_Error_GetCode = error_getcode;
    a.PJRT_Plugin_Initialize = plugin_initialize;
    a.PJRT_Event_Destroy = event_destroy;
    a.PJRT_Event_IsReady = event_isready;
    a.PJRT_Event_Await = event_await;
    a.PJRT_Client_Create = client_create;
    a.PJRT_Client_Destroy = client_destroy;
    a.PJRT_Client_PlatformVersion = client_platform_version;
    a.PJRT_Client_AddressableDevices = client_addressable_devices;
    a.PJRT_Client_BufferFromHostBuffer = buffer_from_host;
    a.PJRT_Executable_Destroy = executable_destroy;
    a.PJRT_Executable_NumOutputs = executable_num_outputs;
    a.PJRT_LoadedExecutable_Destroy = loaded_destroy;
    a.PJRT_LoadedExecutable_GetExecutable = loaded_get_executable;
    a.PJRT_LoadedExecutable_Execute = execute;
    a.PJRT_Executable_DeserializeAndLoad = deserialize_and_load;
    a.PJRT_Buffer_Destroy = buffer_destroy;
    a.PJRT_Buffer_Dimensions = buffer_dimensions;
    a.PJRT_Buffer_GetMemoryLayout = buffer_get_memory_layout;
    a.PJRT_Buffer_ToHostBuffer = buffer_to_host;
    return a;
  }();
  return &api;
}
