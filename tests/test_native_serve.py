"""Native serving host (native/pjrt_serve) — hermetic end-to-end coverage.

jaxlib ships no CPU PJRT C-API plugin ``.so`` (the CPU client is linked
into ``_jax.so`` without a ``GetPjrtApi`` export) and the axon TPU plugin
needs the real tunnel — so the host's PJRT execute path is driven here
against ``native/mock_pjrt_plugin.so``: a host-memory implementation of
the exact API subset the host uses, whose ``layout=reversed`` output
buffers force the device-layout un-permute path (the real axon trap).
Hardware verification of the REAL plugin lives in
``probes/native_serve_probe.sh`` (committed log: --selftest on the v5e).

Covered hermetically: build, fail-fast contract, --selftest parity (both
OK and corrupted-expectation FAIL), the stdin file serve loop, and the
--listen unix-socket loop (hello frame, raw-tensor roundtrip, protocol
errors keeping the stream in sync, reconnect, shutdown frame, pipelined
streaming via tools/serve_client.py).

reference: none — SURVEY.md §2.3 (the reference has no native layer; the
serving host EXCEEDS parity).
"""

import json
import pathlib
import re
import socket
import struct
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
NATIVE = ROOT / "native"
TF_INC = None
try:
    import tensorflow  # noqa: F401

    TF_INC = (
        pathlib.Path(tensorflow.__file__).parent / "include"
    )
except Exception:  # pragma: no cover - tensorflow always in this image
    pass

sys.path.insert(0, str(ROOT / "tools"))
from export_model import write_mock_artifact  # noqa: E402


@pytest.fixture(scope="module")
def binary():
    if TF_INC is None or not TF_INC.exists():
        pytest.skip("tensorflow include tree (PJRT header) not available")
    # Build exactly once per SOURCE STATE, under a file lock: xdist runs
    # this module-scoped fixture in every worker, and an unconditional
    # `make -B` from worker B would rewrite pjrt_serve / the mock .so
    # while worker A's server is executing/dlopening it (observed:
    # ConnectionError from a server killed mid-test). A content-hash
    # stamp replaces -B's job (mtime-equal staleness after a fresh
    # checkout) without ever rebuilding concurrently.
    import fcntl
    import hashlib

    srcs = sorted(NATIVE.glob("*.cc")) + [NATIVE / "Makefile"]
    digest = hashlib.sha256(
        b"".join(p.read_bytes() for p in srcs)).hexdigest()
    stamp = NATIVE / ".build_stamp"
    with open(NATIVE / ".build_lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        fresh = (stamp.exists() and stamp.read_text() == digest
                 and (NATIVE / "pjrt_serve").exists()
                 and (NATIVE / "mock_pjrt_plugin.so").exists())
        if not fresh:
            subprocess.run(
                ["make", "-B", "all", f"TF_INC={TF_INC}"], cwd=NATIVE,
                check=True, capture_output=True, text=True, timeout=600,
            )
            stamp.write_text(digest)
    return NATIVE / "pjrt_serve"


MOCK_PLUGIN = NATIVE / "mock_pjrt_plugin.so"
IN_SHAPE, OUT_SHAPE = (3, 4, 2), (4, 10)
SCALE, SHIFT = 2.0, 1.0


def mock_logits(x):
    """The mock plugin's function, computed independently in NumPy."""
    flat = np.ascontiguousarray(x).ravel()
    n = int(np.prod(OUT_SHAPE))
    return (SCALE * flat[np.arange(n) % flat.size] + SHIFT).astype(
        np.float32).reshape(OUT_SHAPE)


@pytest.fixture(scope="module")
def mock_artifact(binary, tmp_path_factory):
    del binary  # ensure the plugin .so exists before any consumer runs
    art = tmp_path_factory.mktemp("native") / "mock.npexec"
    write_mock_artifact(art, in_shape=IN_SHAPE, out_shape=OUT_SHAPE,
                        scale=SCALE, shift=SHIFT, layout="reversed")
    return art


def test_builds(binary):
    assert binary.exists() and binary.stat().st_size > 0


def test_usage_error_fails_fast(binary):
    p = subprocess.run([str(binary)], capture_output=True, text=True,
                       timeout=60)
    assert p.returncode != 0
    assert "usage:" in (p.stdout + p.stderr)


def test_missing_artifact_fails_before_plugin(binary, tmp_path):
    # Point at a bogus plugin path AND a missing artifact: artifact
    # validation runs first (fail-fast contract), so the error must be the
    # artifact's — never a dlopen attempt or a session claim.
    p = subprocess.run(
        [str(binary), str(tmp_path / "nope.npexec"),
         "--plugin", str(tmp_path / "no_plugin.so")],
        capture_output=True, text=True, timeout=60,
    )
    assert p.returncode != 0
    out = p.stdout + p.stderr
    assert "cannot open" in out
    assert "dlopen" not in out


def test_artifact_validation_precedes_session(binary, tmp_path):
    # Artifact checks run before ANY plugin/session work (the runner's
    # fail-fast contract), so these complete in milliseconds without a
    # TPU claim even on a box with the real plugin installed.
    art = tmp_path / "a.npexec"
    art.mkdir()
    # 1. missing executable.bin
    np.save(art / "sample_input.npy", np.zeros((2, 2), np.float32))
    p = subprocess.run([str(binary), str(art)], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode != 0
    assert "cannot open" in (p.stdout + p.stderr)
    # 2. non-f32 input
    (art / "executable.bin").write_bytes(b"not-a-real-executable")
    np.save(art / "sample_input.npy", np.zeros((2, 2), np.float64))
    p = subprocess.run([str(binary), str(art)], capture_output=True,
                       text=True, timeout=60)
    assert p.returncode != 0
    assert "only <f4" in (p.stdout + p.stderr)


# ---- hermetic end-to-end against the mock plugin ---------------------------


def test_mock_selftest_parity(binary, mock_artifact):
    # Full PJRT path on CPU: upload, execute, reversed-layout fetch +
    # un-permute, bit-exact comparison against expected_logits.npy.
    p = subprocess.run(
        [str(binary), str(mock_artifact), "--selftest",
         "--plugin", str(MOCK_PLUGIN)],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 0, p.stderr
    assert "SELFTEST OK max_diff=0.000e+00" in p.stdout


def test_mock_selftest_detects_corruption(binary, mock_artifact, tmp_path):
    # A wrong expectation must FAIL the selftest — proves the parity check
    # actually discriminates (and that the un-permute isn't vacuous).
    art = tmp_path / "bad.npexec"
    write_mock_artifact(art, in_shape=IN_SHAPE, out_shape=OUT_SHAPE,
                        scale=SCALE, shift=SHIFT, layout="reversed")
    bad = np.load(art / "expected_logits.npy")
    bad[0, 0] += 1.0
    np.save(art / "expected_logits.npy", bad)
    p = subprocess.run(
        [str(binary), str(art), "--selftest", "--plugin", str(MOCK_PLUGIN)],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 2
    assert "SELFTEST FAILED" in p.stderr


def test_mock_stdin_serve_loop(binary, mock_artifact, tmp_path):
    # The real stdin serve loop (not the Python mock server): two good
    # requests, one malformed (answers ERR, server survives), quit.
    proc = subprocess.Popen(
        [str(binary), str(mock_artifact), "--serve",
         "--plugin", str(MOCK_PLUGIN)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1)
    try:
        assert proc.stdout.readline().strip() == "READY"
        rng = np.random.default_rng(1)
        for i in range(2):
            x = rng.normal(size=IN_SHAPE).astype(np.float32)
            in_p, out_p = tmp_path / f"in{i}.npy", tmp_path / f"out{i}.npy"
            np.save(in_p, x)
            proc.stdin.write(f"{in_p} {out_p}\n")
            resp = proc.stdout.readline()
            assert resp.startswith("OK "), resp
            np.testing.assert_array_equal(np.load(out_p), mock_logits(x))
        proc.stdin.write(f"{tmp_path / 'missing.npy'} {tmp_path / 'o'}\n")
        assert proc.stdout.readline().startswith("ERR ")
        # Server must still answer after an ERR.
        proc.stdin.write(f"{tmp_path / 'in0.npy'} {tmp_path / 'out2.npy'}\n")
        assert proc.stdout.readline().startswith("OK ")
        proc.stdin.write("quit\n")
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def _recv_exact(conn, n):
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        assert chunk, "server closed mid-frame"
        buf.extend(chunk)
    return bytes(buf)


def _recv_response(conn):
    status = _recv_exact(conn, 1)[0]
    (length,) = struct.unpack("<I", _recv_exact(conn, 4))
    return status, _recv_exact(conn, length)


def _send_req(conn, payload_bytes):
    conn.sendall(struct.pack("<I", len(payload_bytes)))
    conn.sendall(payload_bytes)


@pytest.fixture()
def socket_server(binary, mock_artifact, tmp_path):
    sock = tmp_path / "s.sock"
    proc = subprocess.Popen(
        [str(binary), str(mock_artifact), "--listen", str(sock),
         "--plugin", str(MOCK_PLUGIN)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1)
    ready = proc.stdout.readline().strip()
    assert ready == f"READY {sock}", ready
    yield proc, str(sock)
    if proc.poll() is None:
        proc.kill()
        proc.wait(timeout=30)


def _connect(sock_path):
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.connect(sock_path)
    (hlen,) = struct.unpack("<I", _recv_exact(conn, 4))
    return conn, json.loads(_recv_exact(conn, hlen))


def test_socket_roundtrip_and_protocol(socket_server):
    proc, sock_path = socket_server
    conn, hello = _connect(sock_path)
    assert hello["proto"] == "pjrt-serve-socket-1"
    assert tuple(hello["in_shape"]) == IN_SHAPE
    assert tuple(hello["out_shape"]) == OUT_SHAPE
    assert hello["in_bytes"] == int(np.prod(IN_SHAPE)) * 4

    rng = np.random.default_rng(2)
    x = rng.normal(size=IN_SHAPE).astype(np.float32)
    _send_req(conn, x.tobytes())
    status, payload = _recv_response(conn)
    assert status == 0
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(OUT_SHAPE),
        mock_logits(x))

    # Wrong-size frame: ERR response AND the stream stays usable.
    _send_req(conn, b"\x00" * 12)
    status, payload = _recv_response(conn)
    assert status == 1
    assert b"expected" in payload
    _send_req(conn, x.tobytes())
    status, payload = _recv_response(conn)
    assert status == 0

    # len==0 closes the CONNECTION; the server then accepts a new client.
    conn.sendall(struct.pack("<I", 0))
    conn.close()
    conn2, hello2 = _connect(sock_path)
    assert hello2 == hello
    _send_req(conn2, x.tobytes())
    status, _ = _recv_response(conn2)
    assert status == 0

    # Shutdown frame: clean server exit.
    conn2.sendall(struct.pack("<I", 0xFFFFFFFF))
    conn2.close()
    assert proc.wait(timeout=30) == 0


def test_socket_pipelined_stream_in_order(socket_server):
    # Stream 6 requests with ≤2 in flight; the answers must come back in
    # request order with correct values (the depth-2 pipeline must not
    # reorder or cross-wire buffers).
    proc, sock_path = socket_server
    conn, _ = _connect(sock_path)
    rng = np.random.default_rng(3)
    xs = [rng.normal(size=IN_SHAPE).astype(np.float32) for _ in range(6)]
    sent = 0
    for i in range(6):
        while sent < 6 and sent - i < 2:
            _send_req(conn, xs[sent].tobytes())
            sent += 1
        status, payload = _recv_response(conn)
        assert status == 0
        np.testing.assert_array_equal(
            np.frombuffer(payload, np.float32).reshape(OUT_SHAPE),
            mock_logits(xs[i]))
    conn.sendall(struct.pack("<I", 0xFFFFFFFF))
    conn.close()
    assert proc.wait(timeout=30) == 0


@pytest.mark.parametrize("extra", [[], ["--pipeline"], ["--clients", "3"]])
def test_serve_client_socket_end_to_end(binary, mock_artifact, extra):
    p = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(mock_artifact), "--transport", "socket",
         "--plugin", str(MOCK_PLUGIN), "--requests", "5", *extra],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    if "--clients" in extra:
        # Concurrent mode checks parity internally on every connection.
        assert "concurrent(socket): 3 clients" in p.stdout
    else:
        assert "max|diff|=0.000e+00" in p.stdout
    if "--pipeline" in extra:
        assert "pipelined(socket)" in p.stdout


def test_socket_concurrent_clients(socket_server):
    # Two clients interleave requests on one server: each must get its own
    # answers, in its own request order, even when both stream (the global
    # chip pipeline is shared; response routing is per connection).
    from neural_ode_features_tpu.serving import SocketClient

    proc, sock_path = socket_server
    a = SocketClient(sock_path)
    b = SocketClient(sock_path)
    rng = np.random.default_rng(7)
    xa = [rng.normal(size=IN_SHAPE).astype(np.float32) for _ in range(4)]
    xb = [rng.normal(size=IN_SHAPE).astype(np.float32) for _ in range(4)]

    # Interleave sends BEFORE reading any answer (both streams queued).
    for i in range(4):
        a._send_request(xa[i])
        b._send_request(xb[i])
    ya = [a._recv_response() for _ in range(4)]
    yb = [b._recv_response() for _ in range(4)]
    for x, y in zip(xa, ya):
        np.testing.assert_array_equal(y, mock_logits(x))
    for x, y in zip(xb, yb):
        np.testing.assert_array_equal(y, mock_logits(x))

    # One client vanishes mid-stream (no close frame): the other continues.
    a._send_request(xa[0])
    a._conn.close()
    x = rng.normal(size=IN_SHAPE).astype(np.float32)
    np.testing.assert_array_equal(b.infer(x), mock_logits(x))
    b.close(shutdown_server=True)
    assert proc.wait(timeout=30) == 0


def test_serving_library_client(socket_server):
    # The public library API (neural_ode_features_tpu.serving.SocketClient):
    # hello metadata, infer(), streamed infer_stream() order/values,
    # ServeError on a bad input shape, clean server shutdown via close().
    from neural_ode_features_tpu.serving import SocketClient

    proc, sock_path = socket_server
    with SocketClient(sock_path) as client:
        assert client.in_shape == IN_SHAPE
        assert client.out_shape == OUT_SHAPE
        rng = np.random.default_rng(5)
        x = rng.normal(size=IN_SHAPE).astype(np.float32)
        np.testing.assert_array_equal(client.infer(x), mock_logits(x))
        with pytest.raises(ValueError, match="input shape"):
            client.infer(np.zeros((2, 2), np.float32))
        xs = [rng.normal(size=IN_SHAPE).astype(np.float32)
              for _ in range(5)]
        ys = list(client.infer_stream(xs))
        assert len(ys) == 5
        for xi, yi in zip(xs, ys):
            np.testing.assert_array_equal(yi, mock_logits(xi))
    # Context exit sent a close frame (not shutdown): server still alive.
    client2 = SocketClient(sock_path)
    np.testing.assert_array_equal(client2.infer(x), mock_logits(x))
    client2.close(shutdown_server=True)
    assert proc.wait(timeout=30) == 0


# ---- continuous batching (ragged rowwise requests) -------------------------
# ADVICE r3: the riskiest code in the socket loop — ragged parsing, batch
# assembly, output slicing, ERR-vs-staged ordering — needs a mock artifact
# whose in/out leading dims MATCH (the module-level one is 3 vs 4, which
# disables the whole path).  mode='rowwise' makes the mock compute
# per-sample-aligned so coalesced/padded answers are checkable per row.

RIN_SHAPE, ROUT_SHAPE = (4, 6), (4, 10)


def rowwise_logits(rows2d):
    """Per-row expected output for the rowwise mock compute."""
    from export_model import mock_expected

    rows2d = np.asarray(rows2d, np.float32).reshape(-1, RIN_SHAPE[1])
    n = rows2d.shape[0]
    full = np.zeros(RIN_SHAPE, np.float32)
    full[:n] = rows2d
    y = mock_expected(full, ROUT_SHAPE, SCALE, SHIFT, mode="rowwise")
    return y[:n]


@pytest.fixture()
def rowwise_server(binary, tmp_path):
    art = tmp_path / "rowwise.npexec"
    write_mock_artifact(art, in_shape=RIN_SHAPE, out_shape=ROUT_SHAPE,
                        scale=SCALE, shift=SHIFT, layout="reversed",
                        mode="rowwise")
    sock = tmp_path / "r.sock"
    proc = subprocess.Popen(
        [str(binary), str(art), "--listen", str(sock),
         "--plugin", str(MOCK_PLUGIN)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        bufsize=1)
    ready = proc.stdout.readline().strip()
    assert ready == f"READY {sock}", ready
    yield proc, str(sock)
    if proc.poll() is None:
        proc.kill()
        proc.wait(timeout=30)


def test_rowwise_hello_advertises_rows(rowwise_server):
    proc, sock_path = rowwise_server
    conn, hello = _connect(sock_path)
    assert hello["rows"] == RIN_SHAPE[0]
    assert hello["row_bytes"] == RIN_SHAPE[1] * 4
    assert hello["out_row_bytes"] == ROUT_SHAPE[1] * 4
    conn.sendall(struct.pack("<I", 0xFFFFFFFF))
    conn.close()
    assert proc.wait(timeout=30) == 0


def test_flat_artifact_never_advertises_rows(binary, tmp_path):
    # The gating itself (ADVICE r3 medium #1): a FLAT-mode artifact whose
    # in/out leading dims happen to match must NOT advertise 'rows' — its
    # output rows read the flattened whole input, so coalescing/padding
    # would silently corrupt real rows.  meta.json rowwise=false wins over
    # the shape heuristic.
    art = tmp_path / "flat_matching.npexec"
    write_mock_artifact(art, in_shape=(4, 5), out_shape=(4, 10),
                        scale=SCALE, shift=SHIFT, layout="reversed",
                        mode="flat")
    meta = json.loads((art / "meta.json").read_text())
    assert meta["rowwise"] is False
    sock = tmp_path / "f.sock"
    proc = subprocess.Popen(
        [str(binary), str(art), "--listen", str(sock),
         "--plugin", str(MOCK_PLUGIN)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        bufsize=1)
    try:
        assert proc.stdout.readline().strip() == f"READY {sock}"
        conn, hello = _connect(str(sock))
        assert "rows" not in hello
        # A row-sized (ragged) frame must be a protocol error here.
        _send_req(conn, b"\x00" * (5 * 4))
        status, payload = _recv_response(conn)
        assert status == 1 and b"expected" in payload
        # ...and the full tensor still works afterwards.
        x = np.arange(20, dtype=np.float32).reshape(4, 5)
        _send_req(conn, x.tobytes())
        status, payload = _recv_response(conn)
        assert status == 0
        np.testing.assert_array_equal(
            np.frombuffer(payload, np.float32).reshape(4, 10),
            __import__("export_model").mock_expected(
                x, (4, 10), SCALE, SHIFT, mode="flat"))
        conn.sendall(struct.pack("<I", 0xFFFFFFFF))
        conn.close()
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_ragged_single_connection(rowwise_server):
    # 1..B-row requests + the full tensor + a bad length, one connection:
    # per-request output slices, stream resync after the ERR, order kept.
    proc, sock_path = rowwise_server
    conn, hello = _connect(sock_path)
    rng = np.random.default_rng(11)
    row_bytes = hello["row_bytes"]

    r2 = rng.normal(size=(2, RIN_SHAPE[1])).astype(np.float32)
    r1 = rng.normal(size=(1, RIN_SHAPE[1])).astype(np.float32)
    full = rng.normal(size=RIN_SHAPE).astype(np.float32)
    _send_req(conn, r2.tobytes())           # 2 rows
    _send_req(conn, b"\x00" * (row_bytes + 3))  # bad length (not row mult)
    _send_req(conn, full.tobytes())         # full tensor
    _send_req(conn, r1.tobytes())           # 1 row

    status, payload = _recv_response(conn)
    assert status == 0 and len(payload) == 2 * hello["out_row_bytes"]
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(2, ROUT_SHAPE[1]),
        rowwise_logits(r2))
    status, payload = _recv_response(conn)
    assert status == 1 and b"rows" in payload  # the ragged hint in the ERR
    status, payload = _recv_response(conn)
    assert status == 0 and len(payload) == hello["out_bytes"]
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(ROUT_SHAPE),
        rowwise_logits(full))
    status, payload = _recv_response(conn)
    assert status == 0 and len(payload) == hello["out_row_bytes"]
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(1, ROUT_SHAPE[1]),
        rowwise_logits(r1))

    conn.sendall(struct.pack("<I", 0xFFFFFFFF))
    conn.close()
    assert proc.wait(timeout=30) == 0


def test_ragged_interleaved_connections(rowwise_server):
    # Multiple connections interleave ragged, full-tensor, and bad-length
    # frames BEFORE reading anything — the server may coalesce any mix of
    # queued rows into padded device batches; every answer must still be
    # the right rows, in per-connection request order.
    proc, sock_path = rowwise_server
    ca, ha = _connect(sock_path)
    cb, hb = _connect(sock_path)
    assert ha == hb
    rng = np.random.default_rng(13)

    a1 = rng.normal(size=(2, RIN_SHAPE[1])).astype(np.float32)
    b1 = rng.normal(size=(3, RIN_SHAPE[1])).astype(np.float32)
    a2 = rng.normal(size=RIN_SHAPE).astype(np.float32)      # full
    b2 = b"\x00" * 10                                       # bad length
    a3 = rng.normal(size=(1, RIN_SHAPE[1])).astype(np.float32)
    b3 = rng.normal(size=(4, RIN_SHAPE[1])).astype(np.float32)  # ragged==B

    _send_req(ca, a1.tobytes())
    _send_req(cb, b1.tobytes())
    _send_req(ca, a2.tobytes())
    _send_req(cb, b2)
    _send_req(ca, a3.tobytes())
    _send_req(cb, b3.tobytes())

    # Connection A: three OK answers, each its own rows.
    for want in (a1, a2.reshape(-1, RIN_SHAPE[1]), a3):
        status, payload = _recv_response(ca)
        assert status == 0
        got = np.frombuffer(payload, np.float32).reshape(-1, ROUT_SHAPE[1])
        np.testing.assert_array_equal(got, rowwise_logits(want))
    # Connection B: OK, ERR (kept in order), OK.
    status, payload = _recv_response(cb)
    assert status == 0
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(-1, ROUT_SHAPE[1]),
        rowwise_logits(b1))
    status, payload = _recv_response(cb)
    assert status == 1 and b"expected" in payload
    status, payload = _recv_response(cb)
    assert status == 0
    np.testing.assert_array_equal(
        np.frombuffer(payload, np.float32).reshape(-1, ROUT_SHAPE[1]),
        rowwise_logits(b3))

    ca.sendall(struct.pack("<I", 0))
    ca.close()
    cb.sendall(struct.pack("<I", 0xFFFFFFFF))
    cb.close()
    assert proc.wait(timeout=30) == 0
    # The server's exit summary proves requests actually coalesced: fewer
    # dispatches than OK requests is expected but timing-dependent, so only
    # assert the stats line exists and parses.
    err = proc.stderr.read()
    assert "requests" in err and "dispatches" in err


def test_serve_client_rows_end_to_end(binary, tmp_path):
    # --rows against a rowwise artifact: ragged requests, parity on the
    # sample's first R rows.
    art = tmp_path / "rowwise.npexec"
    write_mock_artifact(art, in_shape=RIN_SHAPE, out_shape=ROUT_SHAPE,
                        scale=SCALE, shift=SHIFT, layout="reversed",
                        mode="rowwise")
    p = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(art), "--transport", "socket",
         "--plugin", str(MOCK_PLUGIN), "--requests", "4", "--rows", "2"],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "max|diff|=0.000e+00" in p.stdout


def test_serve_client_rows_fails_early_on_flat_artifact(binary,
                                                        mock_artifact):
    # ADVICE r3 low: --rows against a non-rowwise artifact must fail with
    # a diagnostic pointing at the cause, not a bare PARITY MISMATCH.
    p = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(mock_artifact), "--transport", "socket",
         "--plugin", str(MOCK_PLUGIN), "--requests", "2", "--rows", "1"],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 1
    assert "rowwise" in p.stderr
    assert "PARITY MISMATCH" not in p.stderr


def test_serve_client_tcp_end_to_end(binary, mock_artifact):
    # Same frame protocol over TCP (--listen tcp:HOST:PORT) — the network
    # deployment path. Pick a free port by binding port 0 first.
    probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    p = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(mock_artifact), "--transport", "socket",
         "--listen-addr", f"tcp:127.0.0.1:{port}",
         "--plugin", str(MOCK_PLUGIN), "--requests", "4"],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "max|diff|=0.000e+00" in p.stdout


def test_hostile_npy_headers_answer_err(binary, mock_artifact, tmp_path):
    """Malformed .npy headers that make std::stoul/stoll throw or request
    absurd allocations must answer ERR and leave the server alive — an
    escaped exception used to std::terminate the whole process
    (code-review r4: try_npy_read exception firewall + size cap)."""

    def hostile_npy(name: str, header: str) -> str:
        body = header.encode()
        pad = (64 - (10 + len(body)) % 64) % 64
        body += b" " * pad + b"\n"
        raw = b"\x93NUMPY\x01\x00" + len(body).to_bytes(2, "little") + body
        p = tmp_path / name
        p.write_bytes(raw + b"\x00" * 16)
        return str(p)

    cases = [
        hostile_npy("bad_descr.npy",
                    "{'descr': '<fa', 'fortran_order': False, "
                    "'shape': (3, 4), }"),
        hostile_npy("huge_digits.npy",
                    "{'descr': '<f4', 'fortran_order': False, "
                    "'shape': (99999999999999999999,), }"),
        hostile_npy("overflow_shape.npy",
                    "{'descr': '<f4', 'fortran_order': False, "
                    "'shape': (9999999999, 9999999999), }"),
    ]

    proc = subprocess.Popen(
        [str(binary), str(mock_artifact), "--serve",
         "--plugin", str(MOCK_PLUGIN)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1)
    try:
        assert proc.stdout.readline().strip() == "READY"
        for path in cases:
            proc.stdin.write(f"{path} {tmp_path / 'o.npy'}\n")
            resp = proc.stdout.readline()
            assert resp.startswith("ERR "), resp
            assert proc.poll() is None, "server died on hostile npy"
        # Still serves a good request afterwards.
        x = np.zeros(IN_SHAPE, np.float32)
        in_p, out_p = tmp_path / "good.npy", tmp_path / "good_out.npy"
        np.save(in_p, x)
        proc.stdin.write(f"{in_p} {out_p}\n")
        assert proc.stdout.readline().startswith("OK ")
        proc.stdin.write("quit\n")
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_infer_burst_single_connection_coalesces(binary, tmp_path):
    """A lone connection's BURST of ragged requests coalesces into few
    device batches (VERDICT r4 #6): infer_stream's depth-2 window never
    queues more than one request server-side, so r4 measured a single
    pipelined client at 481 img/s vs 1,181 for 8 concurrent clients on
    identical work.  SocketClient.infer_burst floods the queue instead;
    the batch assembler packs this one connection's requests together.
    Wide artifact (16 rows) so the packing is unmistakable."""
    from neural_ode_features_tpu.serving import SocketClient

    bin_shape, bout_shape = (16, 6), (16, 10)
    art = tmp_path / "burst.npexec"
    write_mock_artifact(art, in_shape=bin_shape, out_shape=bout_shape,
                        scale=SCALE, shift=SHIFT, layout="reversed",
                        mode="rowwise")
    sock = tmp_path / "burst.sock"
    proc = subprocess.Popen(
        [str(binary), str(art), "--listen", str(sock),
         "--plugin", str(MOCK_PLUGIN)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        bufsize=1)
    try:
        ready = proc.stdout.readline().strip()
        assert ready == f"READY {sock}", ready

        rng = np.random.default_rng(23)
        reqs = [rng.normal(size=(2, bin_shape[1])).astype(np.float32)
                for _ in range(32)]

        client = SocketClient(str(sock))
        assert client.rows == bin_shape[0]
        outs = client.infer_burst(reqs)
        assert len(outs) == 32
        full = np.zeros(bin_shape, np.float32)
        from export_model import mock_expected

        for x, y in zip(reqs, outs):
            assert y.shape == (2, bout_shape[1])
            full[:2] = x
            want = mock_expected(full, bout_shape, SCALE, SHIFT,
                                 mode="rowwise")[:2]
            np.testing.assert_array_equal(y, want)
        client.close(shutdown_server=True)
        assert proc.wait(timeout=30) == 0

        # The exit summary proves SAME-CONNECTION coalescing: 32 requests
        # in far fewer dispatches (16-row batches hold eight 2-row
        # requests; the burst arrives in one TCP segment, so at most the
        # first couple of dispatches go underfilled).
        err = proc.stderr.read()
        m = re.search(r"(\d+) requests \((\d+) rows\) in (\d+) dispatches",
                      err)
        assert m, err
        n_req, n_rows, n_disp = map(int, m.groups())
        assert n_req == 32 and n_rows == 64
        assert n_disp <= 16, (
            f"expected same-connection coalescing (<=16 dispatches for 32 "
            f"burst requests), got {n_disp}:\n{err}")
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_client_burst_end_to_end(binary, tmp_path):
    # --burst --rows: the single-connection continuous-batching CLI mode;
    # parity on request 0 and the burst summary line printed.
    art = tmp_path / "rowwise.npexec"
    write_mock_artifact(art, in_shape=RIN_SHAPE, out_shape=ROUT_SHAPE,
                        scale=SCALE, shift=SHIFT, layout="reversed",
                        mode="rowwise")
    p = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(art), "--transport", "socket",
         "--plugin", str(MOCK_PLUGIN), "--requests", "16", "--rows", "2",
         "--burst"],
        capture_output=True, text=True, timeout=120)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "max|diff|=0.000e+00" in p.stdout
    assert "burst(socket): 16 requests" in p.stdout
