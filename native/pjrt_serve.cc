// pjrt_serve — native (C++) serving host for AOT-exported models.
//
// Loads a PJRT plugin (the axon TPU plugin on this box) with dlopen,
// creates a client, deserializes a pre-compiled executable artifact
// (written by `tools/export_model.py export-compiled`), and executes it
// against .npy inputs — ZERO Python in the serving process.
//
// This is the framework's native runtime layer for deployment: the
// reference ships no serving/native component at all (SURVEY.md §2.3 —
// pure Python on torch), so this EXCEEDS parity; the design instead
// follows the TPU-native deployment story: AOT-compile once in the
// training environment, serve the serialized executable from a slim
// native host that speaks the PJRT C API directly.
//
//   pjrt_serve <artifact_dir> [--selftest] [--bench N] [--serve]
//              [--input X.npy] [--output Y.npy] [--plugin SO] [--tol T]
//              [--deadline S] [--imgs N]
//
// --serve enters a persistent request loop after warmup: one
// "<in.npy> <out.npy>" pair per stdin line, "OK <out.npy> <secs>" per
// answer — session/executable/warmup paid once across all requests.
//
// Artifact layout (see tools/export_model.py::do_export_compiled):
//   executable.bin        PJRT serialized executable (platform-specific)
//   sample_input.npy      deterministic input batch  (f32, C-order)
//   expected_logits.npy   live-model logits for --selftest comparison
//   meta.json             shapes/dtypes/sha256/config (for humans/tools)
//
// Build: `make -C native` (uses the PJRT C API header vendored by the
// installed tensorflow package; the header is a self-contained C file).

#include <arpa/inet.h>
#include <dlfcn.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <poll.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cerrno>
#include <csignal>
#include <cstdarg>
#include <chrono>
#include <deque>
#include <memory>
#include <thread>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

double now_s() {
  using clk = std::chrono::steady_clock;
  return std::chrono::duration<double>(clk::now().time_since_epoch()).count();
}

double t0 = now_s();

void logf(const char* fmt, ...) {
  std::fprintf(stderr, "[%7.1fs] ", now_s() - t0);
  va_list ap;
  va_start(ap, fmt);
  std::vfprintf(stderr, fmt, ap);
  va_end(ap);
  std::fprintf(stderr, "\n");
  std::fflush(stderr);
}

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_serve: FATAL: %s\n", msg.c_str());
  std::exit(1);
}

const PJRT_Api* g_api = nullptr;

// Every PJRT call returns PJRT_Error* (nullptr on success).
void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args m;
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.extension_start = nullptr;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string text(m.message, m.message_size);
  PJRT_Error_Destroy_Args d;
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.extension_start = nullptr;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  die(std::string(what) + ": " + text);
}

void await_event(PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args a;
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.extension_start = nullptr;
  a.event = ev;
  check(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d;
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.extension_start = nullptr;
  d.event = ev;
  g_api->PJRT_Event_Destroy(&d);
}

// ---------------------------------------------------------------- npy io --
// Minimal NumPy .npy v1/v2 reader/writer for little-endian C-order arrays.

struct Npy {
  std::string descr;            // e.g. "<f4"
  std::vector<int64_t> shape;
  std::vector<char> data;       // raw bytes
  size_t elems() const {
    size_t n = 1;
    for (int64_t d : shape) n *= static_cast<size_t>(d);
    return n;
  }
};

// Non-fatal reader: returns false with `err` set. The persistent serve
// loop must answer ERR on a malformed request, never exit (requests can
// arrive truncated mid-write).
static bool try_npy_read_impl(const std::string& path, Npy& out,
                              std::string& err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { err = "cannot open " + path; return false; }
  char magic[8];
  f.read(magic, 8);
  if (!f || std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    err = path + ": not .npy";
    return false;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string hdr(hlen, '\0');
  f.read(hdr.data(), hlen);
  if (!f) { err = path + ": truncated header"; return false; }

  bool ok = true;
  auto find_val = [&](const std::string& key) -> std::string {
    size_t k = hdr.find("'" + key + "'");
    if (k == std::string::npos) {
      err = path + ": npy header missing " + key;
      ok = false;
      return "";
    }
    size_t c = hdr.find(':', k);
    return hdr.substr(c + 1);
  };
  std::string d = find_val("descr");
  if (!ok) return false;
  size_t q1 = d.find('\'');
  size_t q2 = d.find('\'', q1 + 1);
  if (q1 == std::string::npos || q2 == std::string::npos) {
    err = path + ": malformed descr";
    return false;
  }
  out.descr = d.substr(q1 + 1, q2 - q1 - 1);
  if (find_val("fortran_order").find("False") == std::string::npos) {
    if (ok) err = path + ": fortran_order arrays unsupported";
    return false;
  }
  std::string s = find_val("shape");
  if (!ok) return false;
  size_t p1 = s.find('(');
  size_t p2 = s.find(')');
  if (p1 == std::string::npos || p2 == std::string::npos || p2 < p1) {
    err = path + ": malformed shape";
    return false;
  }
  std::string tup = s.substr(p1 + 1, p2 - p1 - 1);
  out.shape.clear();
  for (size_t i = 0; i < tup.size();) {
    while (i < tup.size() && !isdigit(tup[i])) i++;
    if (i >= tup.size()) break;
    size_t j = i;
    while (j < tup.size() && isdigit(tup[j])) j++;
    out.shape.push_back(std::stoll(tup.substr(i, j - i)));
    i = j;
  }
  if (out.descr.size() < 3) { err = path + ": malformed descr"; return false; }
  size_t itemsize = std::stoul(out.descr.substr(2));
  // Overflow-checked byte count with a hard cap: a hostile shape like
  // (9999999999,9999999999) must answer ERR, not throw bad_alloc (or
  // silently wrap around) on resize.
  constexpr size_t kMaxBytes = size_t(1) << 31;  // 2 GiB
  size_t bytes = itemsize;
  if (bytes == 0 || bytes > kMaxBytes) {
    err = path + ": malformed descr itemsize";
    return false;
  }
  for (int64_t dim : out.shape) {
    if (dim < 0 || (dim > 0 && bytes > kMaxBytes / static_cast<size_t>(dim))) {
      err = path + ": shape too large";
      return false;
    }
    bytes *= static_cast<size_t>(dim);
  }
  out.data.resize(bytes);
  f.read(out.data.data(), static_cast<std::streamsize>(out.data.size()));
  if (!f) { err = path + ": truncated data"; return false; }
  return true;
}

bool try_npy_read(const std::string& path, Npy& out, std::string& err) {
  // Exception firewall for the never-exit serve loops: std::stoul/stoll on
  // hostile header text and vector::resize can throw; an escape here would
  // std::terminate the whole multi-client server (code-review r4).
  try {
    return try_npy_read_impl(path, out, err);
  } catch (const std::exception& e) {
    err = path + ": malformed npy (" + std::string(e.what()) + ")";
    return false;
  }
}

Npy npy_read(const std::string& path) {
  Npy out;
  std::string err;
  if (!try_npy_read(path, out, err)) die(err);
  return out;
}

[[nodiscard]] bool npy_write(const std::string& path,
                             const std::string& descr,
                             const std::vector<int64_t>& shape,
                             const void* data, size_t nbytes) {
  std::string shp = "(";
  for (size_t i = 0; i < shape.size(); i++)
    shp += std::to_string(shape[i]) + (shape.size() == 1 || i + 1 < shape.size() ? "," : "");
  shp += ")";
  std::string hdr = "{'descr': '" + descr +
                    "', 'fortran_order': False, 'shape': " + shp + ", }";
  size_t total = 10 + hdr.size() + 1;  // +1 for '\n'
  size_t pad = (64 - total % 64) % 64;
  hdr += std::string(pad, ' ');
  hdr += '\n';
  uint16_t hlen = static_cast<uint16_t>(hdr.size());
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  f.write("\x93NUMPY\x01\x00", 8);
  f.write(reinterpret_cast<char*>(&hlen), 2);
  f.write(hdr.data(), static_cast<std::streamsize>(hdr.size()));
  f.write(static_cast<const char*>(data), static_cast<std::streamsize>(nbytes));
  f.flush();
  return f.good();
}

std::vector<char> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) die("cannot open " + path);
  std::streamsize n = f.tellg();
  f.seekg(0);
  std::vector<char> buf(static_cast<size_t>(n));
  f.read(buf.data(), n);
  return buf;
}

// ------------------------------------------------------------- pjrt glue --

PJRT_NamedValue nv_str(const char* name, const char* val) {
  PJRT_NamedValue v;
  v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  v.extension_start = nullptr;
  v.name = name;
  v.name_size = std::strlen(name);
  v.type = PJRT_NamedValue_kString;
  v.string_value = val;
  v.value_size = std::strlen(val);
  return v;
}

PJRT_NamedValue nv_i64(const char* name, int64_t val) {
  PJRT_NamedValue v;
  v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
  v.extension_start = nullptr;
  v.name = name;
  v.name_size = std::strlen(name);
  v.type = PJRT_NamedValue_kInt64;
  v.int64_value = val;
  v.value_size = 1;
  return v;
}

std::string mint_session_id() {
  std::random_device rd;
  char buf[37];
  std::snprintf(buf, sizeof buf, "%08x-%04x-%04x-%04x-%012lx",
                rd(), rd() & 0xffff, (rd() & 0x0fff) | 0x4000,
                (rd() & 0x3fff) | 0x8000,
                (static_cast<uint64_t>(rd()) << 16 | (rd() & 0xffff)) &
                    0xffffffffffffUL);
  return std::string(buf);
}

struct Ctx {
  void* dso = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* exec = nullptr;
};

// Mirrors the option assembly of the Python registration path
// (axon.register.pjrt._register_backend as driven by the box's
// sitecustomize): pool mode over the loopback relay, remote_compile on,
// monoclient rank sentinel, fresh session id.
void client_create(Ctx& ctx) {
  // Env contract the Python sitecustomize establishes per-process.
  setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
  setenv("AXON_LOOPBACK_RELAY", "1", 0);
  setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
  setenv("TPU_SKIP_MDS_QUERY", "1", 0);

  const char* gen = getenv("PALLAS_AXON_TPU_GEN");
  std::string topology = std::string(gen ? gen : "v5e") + ":1x1x1";
  std::string session = mint_session_id();
  logf("client create: topology=%s session=%s", topology.c_str(),
       session.c_str());

  std::vector<PJRT_NamedValue> opts;
  opts.push_back(nv_str("topology", topology.c_str()));
  opts.push_back(nv_i64("n_slices", 1));
  opts.push_back(nv_i64("remote_compile",
                        getenv("PALLAS_AXON_REMOTE_COMPILE") &&
                                !std::strcmp(getenv("PALLAS_AXON_REMOTE_COMPILE"), "1")
                            ? 1
                            : 0));
  opts.push_back(nv_i64("local_only", 0));
  opts.push_back(nv_i64("priority", 0));
  opts.push_back(nv_i64("rank", 0xFFFFFFFFLL));  // monoclient sentinel
  opts.push_back(nv_str("session_id", session.c_str()));

  PJRT_Client_Create_Args a;
  std::memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  a.create_options = opts.data();
  a.num_options = opts.size();
  check(g_api->PJRT_Client_Create(&a), "PJRT_Client_Create");
  ctx.client = a.client;

  PJRT_Client_AddressableDevices_Args d;
  std::memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  d.client = ctx.client;
  check(g_api->PJRT_Client_AddressableDevices(&d),
        "PJRT_Client_AddressableDevices");
  if (d.num_addressable_devices == 0) die("no addressable devices");
  ctx.device = d.addressable_devices[0];

  PJRT_Client_PlatformVersion_Args pv;
  std::memset(&pv, 0, sizeof pv);
  pv.struct_size = PJRT_Client_PlatformVersion_Args_STRUCT_SIZE;
  pv.client = ctx.client;
  check(g_api->PJRT_Client_PlatformVersion(&pv), "PlatformVersion");
  logf("client up: %zu device(s), platform %.*s", d.num_addressable_devices,
       static_cast<int>(pv.platform_version_size), pv.platform_version);
}

void load_executable(Ctx& ctx, const std::vector<char>& blob) {
  logf("deserializing executable (%.2f MB)", blob.size() / 1e6);
  PJRT_Executable_DeserializeAndLoad_Args a;
  std::memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
  a.client = ctx.client;
  a.serialized_executable = blob.data();
  a.serialized_executable_size = blob.size();
  check(g_api->PJRT_Executable_DeserializeAndLoad(&a),
        "PJRT_Executable_DeserializeAndLoad");
  ctx.exec = a.loaded_executable;
  logf("executable loaded");
}

PJRT_Buffer* to_device(Ctx& ctx, const Npy& x) {
  if (x.descr != "<f4") die("only <f4 inputs supported, got " + x.descr);
  PJRT_Client_BufferFromHostBuffer_Args a;
  std::memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  a.client = ctx.client;
  a.data = x.data.data();
  a.type = PJRT_Buffer_Type_F32;
  a.dims = x.shape.data();
  a.num_dims = x.shape.size();
  a.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  a.device = ctx.device;
  check(g_api->PJRT_Client_BufferFromHostBuffer(&a), "BufferFromHostBuffer");
  await_event(a.done_with_host_buffer, "host buffer transfer");
  return a.buffer;
}

// Executes with one device and one argument; returns the output buffers.
std::vector<PJRT_Buffer*> execute(Ctx& ctx, PJRT_Buffer* input,
                                  size_t num_outputs) {
  PJRT_ExecuteOptions opts;
  std::memset(&opts, 0, sizeof opts);
  opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* args_dev0[1] = {input};
  PJRT_Buffer* const* arg_lists[1] = {args_dev0};
  std::vector<PJRT_Buffer*> out_dev0(num_outputs, nullptr);
  PJRT_Buffer** out_lists[1] = {out_dev0.data()};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args a;
  std::memset(&a, 0, sizeof a);
  a.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  a.executable = ctx.exec;
  a.options = &opts;
  a.argument_lists = arg_lists;
  a.num_devices = 1;
  a.num_args = 1;
  a.output_lists = out_lists;
  a.device_complete_events = done;
  check(g_api->PJRT_LoadedExecutable_Execute(&a), "Execute");
  await_event(done[0], "execute completion");
  return out_dev0;
}

size_t executable_num_outputs(Ctx& ctx) {
  PJRT_LoadedExecutable_GetExecutable_Args g;
  std::memset(&g, 0, sizeof g);
  g.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  g.loaded_executable = ctx.exec;
  check(g_api->PJRT_LoadedExecutable_GetExecutable(&g), "GetExecutable");
  PJRT_Executable_NumOutputs_Args n;
  std::memset(&n, 0, sizeof n);
  n.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  n.executable = g.executable;
  check(g_api->PJRT_Executable_NumOutputs(&n), "NumOutputs");
  PJRT_Executable_Destroy_Args d;
  std::memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
  d.executable = g.executable;
  g_api->PJRT_Executable_Destroy(&d);
  return n.num_outputs;
}

Npy from_device(PJRT_Buffer* buf) {
  Npy out;
  out.descr = "<f4";  // artifact contract: f32 logits
  PJRT_Buffer_Dimensions_Args dims;
  std::memset(&dims, 0, sizeof dims);
  dims.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
  dims.buffer = buf;
  check(g_api->PJRT_Buffer_Dimensions(&dims), "Buffer_Dimensions");
  out.shape.assign(dims.dims, dims.dims + dims.num_dims);

  // Fetch in the buffer's OWN layout and un-permute host-side. With
  // host_layout=nullptr the copy uses the source buffer's layout — on TPU
  // that is generally not row-major, and reading the raw bytes as C-order
  // silently permutes values (measured: logits argmax agreement dropped
  // to chance). Asking the plugin for a row-major copy does not work
  // here: host_layout=Strides is rejected outright, and
  // host_layout=Tiled{[r-1..0]} was observed to hang the relay fetch
  // (>15 min while concurrent jobs progressed), so the transpose is ours.
  PJRT_Buffer_GetMemoryLayout_Args la;
  std::memset(&la, 0, sizeof la);
  la.struct_size = PJRT_Buffer_GetMemoryLayout_Args_STRUCT_SIZE;
  la.buffer = buf;
  check(g_api->PJRT_Buffer_GetMemoryLayout(&la), "GetMemoryLayout");
  if (la.layout.type != PJRT_Buffer_MemoryLayout_Type_Tiled)
    die("unexpected device layout encoding");
  std::vector<int64_t> m2m(
      la.layout.tiled.minor_to_major,
      la.layout.tiled.minor_to_major + la.layout.tiled.minor_to_major_size);

  PJRT_Buffer_ToHostBuffer_Args a;
  std::memset(&a, 0, sizeof a);
  a.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  a.src = buf;
  a.dst = nullptr;  // query size
  check(g_api->PJRT_Buffer_ToHostBuffer(&a), "ToHostBuffer(size)");
  std::vector<char> raw(a.dst_size);
  a.dst = raw.data();
  check(g_api->PJRT_Buffer_ToHostBuffer(&a), "ToHostBuffer");
  await_event(a.event, "device->host copy");

  size_t n = out.elems();
  size_t r = out.shape.size();
  if (raw.size() != n * 4)
    die("fetched size " + std::to_string(raw.size()) + " != dense " +
        std::to_string(n * 4) + " (padded/tiled host copy?)");

  // Already row-major? (m2m == [r-1, ..., 0])
  bool row_major = m2m.size() == r;
  for (size_t i = 0; row_major && i < r; i++)
    row_major = (m2m[i] == static_cast<int64_t>(r - 1 - i));
  if (row_major || n <= 1 || r <= 1) {
    out.data = std::move(raw);
    return out;
  }

  // General n-d un-permute: the fetched bytes are dense in m2m order —
  // the element stride of logical dim d is the product of the sizes of
  // all dims more minor than d in the device layout.
  std::vector<size_t> stride(r);
  size_t acc2 = 1;
  for (size_t i = 0; i < r; i++) {  // i=0 is the most minor physical dim
    size_t d = static_cast<size_t>(m2m[i]);
    stride[d] = acc2;
    acc2 *= static_cast<size_t>(out.shape[d]);
  }
  out.data.resize(raw.size());
  const float* src = reinterpret_cast<const float*>(raw.data());
  float* dst = reinterpret_cast<float*>(out.data.data());
  std::vector<size_t> idx(r, 0);
  for (size_t lin = 0; lin < n; lin++) {
    size_t off = 0;
    for (size_t d = 0; d < r; d++) off += idx[d] * stride[d];
    dst[lin] = src[off];
    for (size_t d = r; d-- > 0;) {  // odometer in C-order
      if (++idx[d] < static_cast<size_t>(out.shape[d])) break;
      idx[d] = 0;
    }
  }
  return out;
}

void destroy_buffer(PJRT_Buffer* b) {
  PJRT_Buffer_Destroy_Args d;
  std::memset(&d, 0, sizeof d);
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = b;
  g_api->PJRT_Buffer_Destroy(&d);
}

// ------------------------------------------------------------ socket io --
// Raw-tensor ingest over a unix stream socket (--listen): the file-based
// stdin protocol costs two filesystem round trips per request (client
// writes in.npy, server reads it; server writes out.npy, client reads it).
// The socket mode streams the tensor BYTES instead — zero files, zero npy
// parsing per request (shapes are fixed by the artifact and announced in
// a hello frame), and the same depth-2 pipelining as the stdin loop.

bool write_full(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t w = write(fd, p, n);
    if (w <= 0) {
      if (w < 0 && errno == EINTR) continue;
      return false;
    }
    p += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

// Response frame: u8 status (0=OK payload=tensor bytes; 1=ERR payload=text)
// + u32 payload length + payload.
bool send_frame(int fd, uint8_t status, const void* payload, uint32_t len) {
  if (!write_full(fd, &status, 1)) return false;
  if (!write_full(fd, &len, 4)) return false;
  return len == 0 || write_full(fd, payload, len);
}

bool send_err(int fd, const std::string& msg) {
  return send_frame(fd, 1, msg.data(), static_cast<uint32_t>(msg.size()));
}

int listen_unix(const std::string& path) {
  sockaddr_un addr;
  std::memset(&addr, 0, sizeof addr);
  if (path.size() >= sizeof addr.sun_path)
    die("--listen path too long for AF_UNIX (" +
        std::to_string(sizeof addr.sun_path - 1) + " bytes max)");
  unlink(path.c_str());
  int fd = socket(AF_UNIX, SOCK_STREAM, 0);
  if (fd < 0) die(std::string("socket: ") + std::strerror(errno));
  addr.sun_family = AF_UNIX;
  std::strncpy(addr.sun_path, path.c_str(), sizeof addr.sun_path - 1);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof addr) != 0)
    die("bind " + path + ": " + std::strerror(errno));
  if (listen(fd, 8) != 0)
    die(std::string("listen: ") + std::strerror(errno));
  return fd;
}

// "tcp:HOST:PORT" — network serving; same frame protocol as AF_UNIX.
int listen_tcp(const std::string& spec) {
  size_t colon = spec.rfind(':');
  if (colon == std::string::npos || colon == 0)
    die("--listen tcp spec must be tcp:HOST:PORT, got tcp:" + spec);
  std::string host = spec.substr(0, colon);
  int port = std::atoi(spec.c_str() + colon + 1);
  if (port <= 0 || port > 65535) die("--listen: bad port in tcp:" + spec);
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) die(std::string("socket: ") + std::strerror(errno));
  int one = 1;
  setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
  sockaddr_in addr;
  std::memset(&addr, 0, sizeof addr);
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1)
    die("--listen: bad IPv4 host in tcp:" + spec);
  if (bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof addr) != 0)
    die("bind tcp:" + spec + ": " + std::strerror(errno));
  if (listen(fd, 8) != 0)
    die(std::string("listen: ") + std::strerror(errno));
  return fd;
}

bool fd_has_bytes(int fd) {
  struct pollfd pfd;
  pfd.fd = fd;
  pfd.events = POLLIN;
  pfd.revents = 0;
  return poll(&pfd, 1, 0) > 0 && (pfd.revents & (POLLIN | POLLHUP)) != 0;
}

}  // namespace

std::atomic<const char*> g_phase{"startup"};
std::atomic<bool> g_watchdog_off{false};

// The tunneled TPU backend on this box has wildly variable first-contact
// latency (0.9 s to >340 s measured); a serving host must never stall
// silently. The watchdog names the stuck phase and aborts with a
// distinctive exit code once the deadline passes.
void start_watchdog(double deadline_s) {
  std::thread([deadline_s] {
    while (true) {
      std::this_thread::sleep_for(std::chrono::seconds(1));
      if (g_watchdog_off.load()) return;
      if (now_s() - t0 > deadline_s) {
        std::fprintf(stderr,
                     "pjrt_serve: DEADLINE (%.0fs) exceeded in phase '%s'\n",
                     deadline_s, g_phase.load());
        std::printf("{\"error\": \"deadline\", \"phase\": \"%s\"}\n",
                    g_phase.load());
        std::fflush(nullptr);
        std::_Exit(3);
      }
    }
  }).detach();
}

int main(int argc, char** argv) {
  // A client that disconnects abruptly (RST) while we are writing its
  // response would otherwise raise SIGPIPE, whose default action kills the
  // whole server — taking every OTHER connection down with it. Ignoring it
  // turns the failed write into write()==-1/EPIPE, which write_full()
  // already reports as false and the serve loop handles as a dead client.
  std::signal(SIGPIPE, SIG_IGN);
  std::string artifact, plugin = "/opt/axon/libaxon_pjrt.so";
  std::string input_path, output_path, listen_path;
  bool selftest = false;
  bool serve = false;
  int bench = 0;
  double tol = 1e-5;
  double deadline = 0;
  long imgs = 0;  // images per request; default = input dim 0 (batch).
                  // Chained-throughput artifacts (export-compiled --chain K)
                  // carry (K, B, ...) inputs: pass --imgs K*B.
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) die("missing value for " + a);
      return argv[++i];
    };
    if (a == "--plugin") plugin = next();
    else if (a == "--input") input_path = next();
    else if (a == "--output") output_path = next();
    else if (a == "--selftest") selftest = true;
    else if (a == "--serve") serve = true;
    else if (a == "--listen") listen_path = next();
    else if (a == "--bench") bench = std::stoi(next());
    else if (a == "--tol") tol = std::stod(next());
    else if (a == "--deadline") deadline = std::stod(next());
    else if (a == "--imgs") imgs = std::stol(next());
    else if (a[0] == '-') die("unknown flag " + a);
    else artifact = a;
  }
  if (deadline > 0) start_watchdog(deadline);
  if (artifact.empty())
    die("usage: pjrt_serve <artifact_dir> [--selftest] [--bench N] "
        "[--serve] [--listen SOCK] [--input X.npy] [--output Y.npy] "
        "[--plugin SO] [--tol T] [--deadline S] [--imgs N]");
  if (serve && !listen_path.empty())
    die("--serve (stdin) and --listen (socket) are mutually exclusive");
  if (selftest && !input_path.empty())
    die("--selftest compares against the artifact's expected_logits for "
        "its OWN sample_input; it cannot be combined with --input");

  // Validate the artifact BEFORE any plugin/session work: a serving-box
  // misconfiguration must fail in milliseconds, not hang on a TPU claim.
  std::vector<char> blob = read_file(artifact + "/executable.bin");
  Npy x = npy_read(!input_path.empty() ? input_path
                                       : artifact + "/sample_input.npy");
  if (x.descr != "<f4") die("only <f4 inputs supported, got " + x.descr);
  logf("artifact ok: executable %.2f MB, input %zu elems, batch %lld",
       blob.size() / 1e6, x.elems(),
       static_cast<long long>(x.shape.empty() ? 0 : x.shape[0]));

  std::string meta_json;
  {
    std::ifstream mf(artifact + "/meta.json");
    if (mf)
      meta_json.assign(std::istreambuf_iterator<char>(mf),
                       std::istreambuf_iterator<char>());
  }
  // Row-independence flag written at export time (ADVICE r3): the exporter
  // PROBES whether output row r depends on input row r alone (rerunning the
  // compiled fn with other rows perturbed). Continuous batching — padding
  // and coalescing rows across clients — is only advertised when this is
  // true; a shape heuristic alone cannot see batch-coupled computation
  // (e.g. error_control='global', where every row's adaptive step sequence
  // is a whole-batch reduction). Absent key = old artifact = not advertised.
  const bool meta_rowwise =
      meta_json.find("\"rowwise\": true") != std::string::npos;
  if (imgs == 0) {
    // Default images-per-request: dim 0 (batch), or chain*batch for a
    // chained-throughput artifact — meta.json records "chain": K.
    long chain = 1;
    size_t k = meta_json.find("\"chain\":");
    if (k != std::string::npos) chain = std::atol(meta_json.c_str() + k + 8);
    imgs = (chain > 1 && x.shape.size() >= 2) ? chain * x.shape[1]
                                              : x.shape[0];
  }

  logf("loading plugin %s", plugin.c_str());
  void* dso = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!dso) die(std::string("dlopen: ") + dlerror());
  auto* get_api = reinterpret_cast<const PJRT_Api* (*)()>(
      dlsym(dso, "GetPjrtApi"));
  if (!get_api) die("plugin lacks GetPjrtApi");
  g_api = get_api();
  logf("PJRT API %d.%d (header %d.%d)", g_api->pjrt_api_version.major_version,
       g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR, PJRT_API_MINOR);

  PJRT_Plugin_Initialize_Args init;
  std::memset(&init, 0, sizeof init);
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(g_api->PJRT_Plugin_Initialize(&init), "PJRT_Plugin_Initialize");

  Ctx ctx;
  ctx.dso = dso;
  g_phase = "client_create (TPU session claim)";
  client_create(ctx);
  g_phase = "executable deserialize";
  load_executable(ctx, blob);
  size_t num_outputs = executable_num_outputs(ctx);
  logf("executable has %zu output(s)", num_outputs);
  g_phase = "input host->device";
  PJRT_Buffer* xbuf = to_device(ctx, x);

  g_phase = "first execute + output fetch";
  double t_exec0 = now_s();
  std::vector<PJRT_Buffer*> outs = execute(ctx, xbuf, num_outputs);
  logf("first execute: %.3f s (includes device warmup)", now_s() - t_exec0);
  Npy y = from_device(outs[0]);
  logf("first fetch done: %.3f s total", now_s() - t_exec0);
  g_phase = "post-warmup";

  int rc = 0;
  if (selftest) {
    Npy exp = npy_read(artifact + "/expected_logits.npy");
    if (exp.data.size() != y.data.size()) die("selftest: output size mismatch");
    const float* a = reinterpret_cast<const float*>(y.data.data());
    const float* b = reinterpret_cast<const float*>(exp.data.data());
    double maxd = 0;
    size_t n = y.data.size() / 4, agree = 0;
    // Argmax rows are per SAMPLE: the class axis is the trailing dim (10),
    // and every leading dim (batch; chain*batch for --chain artifacts) is
    // a sample — using shape[0] here would flatten a chained artifact's
    // whole (B,10) slice into one near-blind argmax.
    size_t ncls = static_cast<size_t>(y.shape.back());
    size_t batch = n / ncls;
    for (size_t i = 0; i < n; i++)
      maxd = std::max(maxd, static_cast<double>(std::abs(a[i] - b[i])));
    for (size_t r = 0; r < batch; r++) {
      size_t am_a = 0, am_b = 0;
      for (size_t c = 1; c < ncls; c++) {
        if (a[r * ncls + c] > a[r * ncls + am_a]) am_a = c;
        if (b[r * ncls + c] > b[r * ncls + am_b]) am_b = c;
      }
      agree += (am_a == am_b);
    }
    logf("selftest: max|diff| = %.3e, argmax agreement %zu/%zu", maxd, agree,
         batch);
    if (maxd > tol || agree != batch) {
      std::fprintf(stderr, "SELFTEST FAILED (tol %.1e)\n", tol);
      rc = 2;
    } else {
      std::printf("SELFTEST OK max_diff=%.3e batch=%zu\n", maxd, batch);
    }
  }

  if (bench > 0) {
    // Steady-state per-request serving latency: input stays
    // device-resident; each iteration is dispatch + completion await +
    // the logits fetch to host. The fetch IS the honest sync point — on
    // this relay the device-complete event can signal at enqueue, so an
    // execute-only loop would time dispatch, not work.
    std::vector<double> lat;
    for (int i = 0; i < bench; i++) {
      double s = now_s();
      std::vector<PJRT_Buffer*> o = execute(ctx, xbuf, num_outputs);
      Npy yy = from_device(o[0]);
      lat.push_back(now_s() - s);
      if (yy.data.size() != y.data.size()) die("bench: output size drift");
      for (PJRT_Buffer* b : o) destroy_buffer(b);
    }
    std::sort(lat.begin(), lat.end());
    double median = lat[lat.size() / 2];
    double best = lat.front();
    double batch = static_cast<double>(imgs);  // resolved above
    logf("bench: %d execs, median %.3f s (%.0f img/s), best %.3f s (%.0f "
         "img/s)",
         bench, median, batch / median, best, batch / best);
    std::printf(
        "{\"native_serve_img_per_s_median\": %.1f, \"img_per_s_best\": %.1f, "
        "\"median_s\": %.4f, \"best_s\": %.4f, \"batch\": %d, \"execs\": %d}\n",
        batch / median, batch / best, median, best,
        static_cast<int>(batch), bench);
  }

  if (!output_path.empty()) {
    if (!npy_write(output_path, y.descr, y.shape, y.data.data(),
                   y.data.size()))
      die("failed to write " + output_path);
    logf("wrote %s", output_path.c_str());
  }

  if (serve) {
    // Persistent request loop: one "<input.npy> <output.npy>" pair per
    // stdin line; answers "OK <output.npy> <seconds>" (or "ERR <msg>") on
    // stdout per request, in request order. The session, executable, and
    // warmup are paid once — each request is upload + execute + fetch +
    // write.
    //
    // Depth-2 pipelining: execute is asynchronous (on axon the
    // device-complete event signals at ENQUEUE — the blocking step is the
    // output fetch), so when the client has already queued the next
    // request on stdin, the fetch+write of request i is deferred until
    // request i+1 has been read, uploaded, and enqueued. The chip computes
    // i while the host does i+1's file IO and upload. A client that waits
    // for each answer before sending the next line sees the original
    // sequential behaviour (nothing pending on stdin -> answer
    // immediately); only a client that streams requests gets the overlap.
    // Caveat (documented, accepted): pipelining is gated on raw bytes
    // being available on stdin — a pathological client that writes HALF a
    // line and then blocks waiting for the previous answer would deadlock;
    // write whole lines atomically (any sane line-oriented writer does).
    // The --deadline watchdog covers STARTUP only; a server waiting for
    // requests is not stuck.
    g_watchdog_off = true;
    g_phase = "serve loop";

    struct PendingReq {
      std::vector<PJRT_Buffer*> outs;
      PJRT_Buffer* in;
      std::string out_path;
      double t0;
    };
    std::deque<PendingReq> pending;

    auto stdin_has_bytes = [] {
      if (std::cin.rdbuf()->in_avail() > 0) return true;
      struct pollfd pfd;
      pfd.fd = 0;
      pfd.events = POLLIN;
      pfd.revents = 0;
      return poll(&pfd, 1, 0) > 0 &&
             (pfd.revents & (POLLIN | POLLHUP)) != 0;
    };
    auto complete_oldest = [&] {
      PendingReq p = std::move(pending.front());
      pending.pop_front();
      Npy ry = from_device(p.outs[0]);
      for (PJRT_Buffer* b : p.outs) destroy_buffer(b);
      destroy_buffer(p.in);
      if (!npy_write(p.out_path, ry.descr, ry.shape, ry.data.data(),
                     ry.data.size())) {
        std::printf("ERR failed to write %s\n", p.out_path.c_str());
      } else {
        std::printf("OK %s %.4f\n", p.out_path.c_str(), now_s() - p.t0);
      }
      std::fflush(stdout);
    };
    auto drain_pending = [&] {
      while (!pending.empty()) complete_oldest();
    };

    logf("serve: ready (one '<in.npy> <out.npy>' pair per line; "
         "pipelined when requests are streamed)");
    std::printf("READY\n");
    std::fflush(stdout);
    std::string line;
    while (true) {
      // Client idle (no queued bytes) -> it is waiting on answers: flush
      // everything in flight before blocking on the next line.
      if (!pending.empty() && !stdin_has_bytes()) drain_pending();
      if (!std::getline(std::cin, line)) break;
      if (line.empty() || line == "quit") break;
      size_t sp = line.find(' ');
      if (sp == std::string::npos) {
        drain_pending();  // answers stay in request order
        std::printf("ERR expected '<in.npy> <out.npy>'\n");
        std::fflush(stdout);
        continue;
      }
      double s = now_s();
      std::string in_path = line.substr(0, sp);
      Npy req;
      std::string err;
      // A malformed/truncated/mid-write request must answer ERR, never
      // kill the server (the TPU session it holds took seconds-to-minutes
      // to claim).
      if (!try_npy_read(in_path, req, err)) {
        drain_pending();
        std::printf("ERR %s\n", err.c_str());
        std::fflush(stdout);
        continue;
      }
      if (req.descr != "<f4" || req.shape != x.shape) {
        drain_pending();
        std::printf("ERR input must be <f4 with the artifact's shape\n");
        std::fflush(stdout);
        continue;
      }
      PJRT_Buffer* rbuf = to_device(ctx, req);
      std::vector<PJRT_Buffer*> ro = execute(ctx, rbuf, num_outputs);
      pending.push_back(
          {std::move(ro), rbuf, line.substr(sp + 1), s});
      // Bound in-flight depth at 2: one computing, one being staged.
      if (pending.size() >= 2) complete_oldest();
    }
    drain_pending();
    logf("serve: loop ended");
  }

  if (!listen_path.empty()) {
    // Socket request loop: raw f32 tensor bytes over a stream socket —
    // AF_UNIX (`--listen /path/sock`) or TCP (`--listen tcp:HOST:PORT`) —
    // no temp files, no per-request npy parsing (shapes are pinned by the
    // artifact and announced once per connection in a hello frame).
    //
    //   hello    (server->client, once per connection):
    //            u32 len + JSON {proto, in_shape, out_shape, dtype,
    //                            in_bytes, out_bytes}
    //   request  (client->server): u32 len + payload
    //            len == in_bytes   raw row-major f32 input tensor
    //            len == 0          close this connection (server accepts
    //                              the next client)
    //            len == 0xFFFFFFFF shut the server down (clean exit)
    //            other             protocol error -> ERR frame; the
    //                              payload is consumed (up to a 64 MiB
    //                              sanity cap) to keep the stream in sync
    //   response (server->client): u8 status + u32 len + payload
    //            status 0: payload = raw row-major f32 output tensor
    //            status 1: payload = error message text
    //
    // Requests pipeline exactly like the stdin loop: while request i
    // computes on the chip, the host reads + uploads request i+1 if its
    // bytes are already queued on the socket (depth bounded at 2).
    //
    // CONCURRENT CLIENTS: the loop multiplexes every open connection with
    // poll() — a single chip serializes the work anyway, so requests from
    // all clients feed one global depth-2 pipeline, round-robin across
    // connections, with responses delivered strictly in request order PER
    // CONNECTION.  A slow or dead client never blocks the others: reads
    // are poll-gated and a failed response write closes only that
    // connection (its in-flight work is still retired so device buffers
    // never leak).  The shutdown frame from any client stops the server
    // after delivering everything already on the chip.
    g_watchdog_off = true;
    g_phase = "socket serve loop";

    const size_t in_bytes = x.data.size();
    // Continuous batching (ragged requests): when input and output share a
    // leading batch dim, a request may carry any 1..B rows (len = a multiple
    // of row_bytes).  The host coalesces whatever is queued — across ALL
    // connections — into one padded device batch per dispatch and answers
    // each request with its own output-row slice.  Two rules make the
    // queue actually form (measured r5: without them a single flooding
    // connection got 64 requests = 64 dispatches, because one 64 KB read
    // per poll cycle never completes a 393 KB frame before the eager
    // dispatch drains the queue):
    //   1. each poll cycle DRAINS the kernel buffer of a ready socket
    //      (bounded per cycle), not just one read() worth;
    //   2. a batch that would dispatch PARTIALLY FILLED is deferred while
    //      any open connection still has readable bytes — the imminent
    //      parse may top it up.  A lone request still dispatches the
    //      moment its socket is dry (zero added latency); a flood
    //      dispatches full batches.
    // Gated on meta_rowwise (the exporter's measured row-independence
    // flag), THEN the shape sanity checks — never shape alone (ADVICE r3).
    const long max_rows =
        (meta_rowwise && !x.shape.empty() && !y.shape.empty() &&
         x.shape[0] == y.shape[0] && x.shape[0] > 0 &&
         in_bytes % static_cast<size_t>(x.shape[0]) == 0 &&
         y.data.size() % static_cast<size_t>(x.shape[0]) == 0)
            ? x.shape[0]
            : 0;
    const size_t row_bytes =
        max_rows ? in_bytes / static_cast<size_t>(max_rows) : 0;
    const size_t out_row_bytes =
        max_rows ? y.data.size() / static_cast<size_t>(max_rows) : 0;

    std::string hello = "{\"proto\": \"pjrt-serve-socket-1\", \"dtype\": "
                        "\"<f4\", \"in_shape\": [";
    for (size_t i = 0; i < x.shape.size(); i++)
      hello += (i ? "," : "") + std::to_string(x.shape[i]);
    hello += "], \"out_shape\": [";
    for (size_t i = 0; i < y.shape.size(); i++)
      hello += (i ? "," : "") + std::to_string(y.shape[i]);
    hello += "], \"in_bytes\": " + std::to_string(in_bytes) +
             ", \"out_bytes\": " + std::to_string(y.data.size());
    if (max_rows > 0)
      hello += ", \"rows\": " + std::to_string(max_rows) +
               ", \"row_bytes\": " + std::to_string(row_bytes) +
               ", \"out_row_bytes\": " + std::to_string(out_row_bytes);
    hello += "}";

    bool is_tcp = listen_path.rfind("tcp:", 0) == 0;
    int lfd = is_tcp ? listen_tcp(listen_path.substr(4))
                     : listen_unix(listen_path);
    logf("listen: ready on %s (in %zu B, out %zu B per request)",
         listen_path.c_str(), in_bytes, y.data.size());
    std::printf("READY %s\n", listen_path.c_str());
    std::fflush(stdout);

    Npy req;           // reused upload holder (shape fixed)
    req.descr = "<f4";
    req.shape = x.shape;
    req.data.resize(in_bytes);

    // Per-connection state. Heap-allocated so Flight::conn pointers stay
    // stable across vector growth; a Conn is only erased once it has no
    // in-flight work.
    struct Conn {
      int fd;
      std::vector<char> rbuf;     // received, not yet parsed
      size_t discard = 0;         // bytes of a wrong-length frame to sink
      std::string discard_err;    // ERR queued once the sink completes
      struct Item {               // parsed work, strictly ordered
        bool is_input;
        std::vector<char> payload;  // input tensor bytes (is_input)
        std::string err;            // error text (!is_input)
        size_t rows = 0;            // rows in payload (0 = full tensor)
      };
      std::deque<Item> queue;
      size_t in_flight = 0;       // this conn's executions on the chip
      bool draining = false;      // saw close/shutdown/EOF: no more reads
      bool open = true;           // fd still writable
      explicit Conn(int f) : fd(f) {}
    };
    std::vector<std::unique_ptr<Conn>> conns;

    struct Seg {                  // one request's slice of a device batch
      Conn* conn;
      size_t rows;                // 0 = the full tensor
    };
    struct Flight {               // chip FIFO entry (global order)
      std::vector<Seg> segs;      // request order within the batch
      std::vector<PJRT_Buffer*> outs;
      PJRT_Buffer* in;
    };
    std::deque<Flight> flights;

    bool shutdown = false;
    size_t rr = 0;  // round-robin dispatch cursor
    size_t n_flights = 0, n_requests = 0, n_rows = 0;  // coalescing stats

    auto complete_oldest = [&] {
      Flight f = std::move(flights.front());
      flights.pop_front();
      Npy ry = from_device(f.outs[0]);
      for (PJRT_Buffer* b : f.outs) destroy_buffer(b);
      destroy_buffer(f.in);
      size_t off = 0;  // output bytes consumed by earlier segments
      for (Seg& s : f.segs) {
        size_t nbytes = s.rows ? s.rows * out_row_bytes : ry.data.size();
        s.conn->in_flight--;
        if (s.conn->open &&
            !send_frame(s.conn->fd, 0, ry.data.data() + off,
                        static_cast<uint32_t>(nbytes))) {
          s.conn->open = false;  // dead client; other work still retires
          s.conn->draining = true;
        }
        off += nbytes;
      }
    };

    // Turn a connection's raw bytes into ordered queue items. Never
    // blocks: partial frames stay in rbuf until more bytes arrive.
    auto parse = [&](Conn& c) {
      size_t pos = 0;
      while (!c.draining) {
        if (c.discard > 0) {  // sinking a wrong-length frame's payload
          size_t take = std::min(c.discard, c.rbuf.size() - pos);
          pos += take;
          c.discard -= take;
          if (c.discard > 0) break;
          c.queue.push_back({false, {}, c.discard_err});
          continue;
        }
        if (c.rbuf.size() - pos < 4) break;
        uint32_t len;
        std::memcpy(&len, c.rbuf.data() + pos, 4);
        if (len == 0) {  // close frame: answer what's queued, then close
          pos += 4;
          c.draining = true;
          break;
        }
        if (len == 0xFFFFFFFFu) {
          pos += 4;
          c.draining = true;
          shutdown = true;
          break;
        }
        // Acceptable request lengths: the full tensor, or (when the
        // artifact has a batch dim) any whole number of rows up to it.
        bool ragged = max_rows > 0 && len < in_bytes && len > 0 &&
                      len % row_bytes == 0;
        if (len != in_bytes && !ragged) {
          pos += 4;
          if (len > 64u * 1024 * 1024) {
            c.queue.push_back({false, {},
                               "frame length " + std::to_string(len) +
                                   " exceeds sanity cap; closing"});
            c.draining = true;  // cannot trust the stream any more
            break;
          }
          c.discard = len;
          c.discard_err =
              "expected " + std::to_string(in_bytes) + " bytes (f32, " +
              "artifact input shape)" +
              (max_rows > 0 ? " or a multiple of " +
                                  std::to_string(row_bytes) + " (1.." +
                                  std::to_string(max_rows) + " rows)"
                            : "") +
              ", got " + std::to_string(len);
          continue;
        }
        if (c.rbuf.size() - pos < 4 + static_cast<size_t>(len)) break;
        Conn::Item it;
        it.is_input = true;
        it.rows = ragged ? len / row_bytes : 0;
        it.payload.assign(c.rbuf.begin() + pos + 4,
                          c.rbuf.begin() + pos + 4 + static_cast<long>(len));
        pos += 4 + static_cast<size_t>(len);
        c.queue.push_back(std::move(it));
      }
      c.rbuf.erase(c.rbuf.begin(), c.rbuf.begin() + static_cast<long>(pos));
    };

    // Feed the global pipeline, round-robin over connections; per-conn
    // items run strictly in order (an ERR at the head waits for that
    // conn's in-flight responses so answers never reorder).  Ragged
    // requests COALESCE: each device batch is filled with as many queued
    // requests (from any mix of connections) as fit, in dispatch order,
    // padded with zeros; complete_oldest slices the output back out per
    // request.  A full-tensor request occupies a batch alone by size.
    //
    // input_dry: no open connection has readable-but-unparsed bytes.
    // While input is NOT dry, only batches that assemble FULL are
    // dispatched — a partial batch waits one read cycle for the queue to
    // top up (see the coalescing comment above; this is what turns a
    // single flooding connection's 64 lone dispatches into 8 full ones).
    auto queued_input_bytes = [&] {
      size_t tot = 0;
      for (auto& up : conns)
        for (auto& it : up->queue)
          if (it.is_input) tot += it.payload.size();
      return tot;
    };
    auto try_dispatch = [&](bool input_dry) {
      size_t n = conns.size();
      if (n == 0) return;
      while (flights.size() < 2) {
        if (!input_dry && queued_input_bytes() < in_bytes)
          break;  // more bytes are imminently parseable: let the batch fill
        std::vector<Seg> segs;
        size_t used = 0;  // bytes staged into req.data so far
        for (size_t k = 0; k < n; k++) {
          Conn& c = *conns[(rr + k) % n];
          bool staged_here = false;  // c contributes to THIS batch
          while (!c.queue.empty()) {
            Conn::Item& head = c.queue.front();
            if (!head.is_input) {
              // An ERR answer must not overtake this conn's earlier
              // responses — neither dispatched ones nor rows staged into
              // the batch being assembled right now.
              if (c.in_flight > 0 || staged_here) break;
              if (c.open && !send_err(c.fd, head.err)) {
                c.open = false;
                c.draining = true;
              }
              c.queue.pop_front();
              continue;
            }
            size_t need = head.payload.size();
            if (used + need > in_bytes) break;  // no room in this batch
            std::memcpy(req.data.data() + used, head.payload.data(), need);
            used += need;
            segs.push_back({&c, head.rows});
            n_requests++;
            n_rows += head.rows ? head.rows : static_cast<size_t>(max_rows);
            c.in_flight++;
            staged_here = true;
            c.queue.pop_front();
          }
        }
        if (segs.empty()) break;
        if (used < in_bytes)  // padding rows: zeros (ignored on return)
          std::memset(req.data.data() + used, 0, in_bytes - used);
        if (segs.size() > 1)
          logf("listen: coalesced %zu requests into one batch (%zu/%zu B)",
               segs.size(), used, in_bytes);
        PJRT_Buffer* rbuf = to_device(ctx, req);
        flights.push_back(
            {std::move(segs), execute(ctx, rbuf, num_outputs), rbuf});
        n_flights++;
        rr = (rr + 1) % n;
      }
    };

    // True when the loop can make progress without retiring chip work:
    // a dispatchable head item, or bytes already readable on a socket.
    auto can_progress_without_chip = [&] {
      for (auto& up : conns) {
        Conn& c = *up;
        if (!c.queue.empty() &&
            (c.queue.front().is_input ? flights.size() < 2
                                      : c.in_flight == 0))
          return true;
        if (c.open && !c.draining && fd_has_bytes(c.fd)) return true;
      }
      return false;
    };

    while (true) {
      if (shutdown) {
        // Deliver everything already on the chip, then stop. Queued
        // not-yet-dispatched requests are dropped (the shutdown frame is
        // an administrative kill, not a graceful drain barrier).
        while (!flights.empty()) complete_oldest();
        break;
      }

      std::vector<pollfd> pfds;
      pfds.push_back({lfd, POLLIN, 0});
      std::vector<Conn*> polled;
      bool have_work = !flights.empty();
      for (auto& up : conns) {
        if (up->open && !up->draining) {
          pfds.push_back({up->fd, POLLIN, 0});
          polled.push_back(up.get());
        }
        if (!up->queue.empty()) have_work = true;
      }
      int nready = poll(pfds.data(), pfds.size(), have_work ? 0 : -1);
      if (nready < 0) {
        if (errno == EINTR) continue;
        logf("poll: %s — stopping", std::strerror(errno));
        break;
      }

      if (pfds[0].revents & POLLIN) {
        int cfd = accept(lfd, nullptr, nullptr);
        if (cfd >= 0) {
          // Widen the receive queue (best effort; kernel clamps): the
          // coalescing factor for a flooding client is bounded by how
          // many whole frames fit in kernel buffers when a batch is
          // assembled — at the 208 KB default a 393 KB frame doesn't
          // even fit once (unix sockets honor the WRITER's SO_SNDBUF,
          // TCP this side's SO_RCVBUF; set both ends, r5).
          int rcv = 4 << 20;
          setsockopt(cfd, SOL_SOCKET, SO_RCVBUF, &rcv, sizeof rcv);
          uint32_t hlen = static_cast<uint32_t>(hello.size());
          if (write_full(cfd, &hlen, 4) &&
              write_full(cfd, hello.data(), hello.size())) {
            conns.push_back(std::make_unique<Conn>(cfd));
            logf("listen: client connected (%zu open)", conns.size());
          } else {
            close(cfd);
          }
        }
      }

      for (size_t i = 1; i < pfds.size(); i++) {
        if (!(pfds[i].revents & (POLLIN | POLLHUP | POLLERR))) continue;
        Conn& c = *polled[i - 1];
        char buf[1 << 16];
        ssize_t r = read(c.fd, buf, sizeof buf);
        if (r > 0) {
          c.rbuf.insert(c.rbuf.end(), buf, buf + r);
          // Drain what the kernel already holds (bounded per cycle so one
          // firehose connection cannot starve the others): a request frame
          // can span many 64 KB reads, and coalescing needs whole frames
          // in the queue before the dispatch decision below.
          size_t drained = static_cast<size_t>(r);
          bool eof = false;  // parse() skips draining conns, so an EOF
                             // seen mid-drain must be flagged AFTER the
                             // bytes read in this cycle are parsed (a
                             // shutdown/close frame followed by an
                             // immediate client close would otherwise be
                             // dropped unread).
          while (drained < in_bytes + sizeof buf && fd_has_bytes(c.fd)) {
            r = read(c.fd, buf, sizeof buf);
            if (r > 0) {
              c.rbuf.insert(c.rbuf.end(), buf, buf + r);
              drained += static_cast<size_t>(r);
            } else {
              if (r == 0 || errno != EINTR) eof = true;
              break;
            }
          }
          parse(c);
          if (eof) c.draining = true;
        } else if (r == 0 || errno != EINTR) {
          c.draining = true;  // EOF/error: answer what's queued, close
        }
      }

      bool input_dry = true;
      for (auto& up : conns)
        if (up->open && !up->draining && fd_has_bytes(up->fd)) {
          input_dry = false;
          break;
        }
      try_dispatch(input_dry);
      if (!flights.empty() &&
          (flights.size() >= 2 || !can_progress_without_chip()))
        complete_oldest();

      for (size_t i = 0; i < conns.size();) {
        Conn& c = *conns[i];
        if (c.draining && c.queue.empty() && c.in_flight == 0) {
          close(c.fd);
          conns.erase(conns.begin() + static_cast<long>(i));
          logf("listen: connection closed (%zu open)", conns.size());
        } else {
          i++;
        }
      }
    }
    for (auto& up : conns) close(up->fd);
    close(lfd);
    if (!is_tcp) unlink(listen_path.c_str());
    logf("listen: loop ended%s — %zu requests (%zu rows) in %zu dispatches",
         shutdown ? " (shutdown)" : "", n_requests, n_rows, n_flights);
  }

  for (PJRT_Buffer* b : outs) destroy_buffer(b);
  destroy_buffer(xbuf);
  PJRT_LoadedExecutable_Destroy_Args ed;
  std::memset(&ed, 0, sizeof ed);
  ed.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
  ed.executable = ctx.exec;
  g_api->PJRT_LoadedExecutable_Destroy(&ed);
  PJRT_Client_Destroy_Args cd;
  std::memset(&cd, 0, sizeof cd);
  cd.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
  cd.client = ctx.client;
  g_api->PJRT_Client_Destroy(&cd);
  logf("done rc=%d", rc);
  return rc;
}
