"""serve_client.py protocol driver — CPU-only, against a mock server.

The real server (native/pjrt_serve) needs the TPU plugin; its hardware runs
are probes/native_serve_probe.{sh,log}.  What the CPU suite CAN pin is the
client side of the wire protocol, which is where a consumer integration
would break:

  * sequential mode: one request line -> one in-order "OK" answer, request-0
    parity checked bit-for-bit against the artifact's expected_logits;
  * --pipeline mode: the client must stream EVERY request line before
    reading any answer (that is the contract that lets the server overlap
    request i's execute/fetch with i+1's staging).  The mock server refuses
    to answer until it has received all N lines — a client that waits for
    answers between sends would deadlock here, so test success proves the
    streaming behaviour, and the subprocess timeout converts a regression
    into a clean failure.

reference: none — SURVEY.md §2.3 (the reference ships no serving layer).
"""

import pathlib
import stat
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

# Speaks the pjrt_serve --serve wire protocol: "READY", then one
# "OK <out.npy> <seconds>" per "<in.npy> <out.npy>" request line, answering
# with the artifact's expected_logits so the client's request-0 bit-for-bit
# parity check passes.  MOCK_HOLD_N != 0 switches to pipeline-assert mode:
# hold every answer until N request lines have arrived.
MOCK_SERVER = """#!{python}
import os, sys
import numpy as np

art = sys.argv[1]  # remaining argv (--serve, --deadline S) ignored
exp = np.load(os.path.join(art, "expected_logits.npy"))
hold_n = int(os.environ.get("MOCK_HOLD_N", "0"))

print("READY", flush=True)
held = []


def answer(line):
    in_p, out_p = line.split(" ", 1)
    np.load(in_p)  # input must exist by the time the line arrives
    np.save(out_p, exp)
    print("OK %s 0.0" % out_p, flush=True)


for line in sys.stdin:
    line = line.strip()
    if not line or line == "quit":
        break
    held.append(line)
    if hold_n == 0:
        answer(held.pop())
    elif len(held) == hold_n:
        for l in held:
            answer(l)
        held = []
"""


@pytest.fixture()
def artifact(tmp_path):
    art = tmp_path / "mock.npexec"
    art.mkdir()
    rng = np.random.default_rng(0)
    np.save(art / "sample_input.npy",
            rng.normal(size=(4, 8, 8, 1)).astype(np.float32))
    np.save(art / "expected_logits.npy",
            rng.normal(size=(4, 10)).astype(np.float32))
    return art


@pytest.fixture()
def mock_binary(tmp_path):
    p = tmp_path / "mock_server"
    p.write_text(MOCK_SERVER.format(python=sys.executable))
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    return p


def _run_client(artifact, binary, *extra, env=None):
    import os

    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    return subprocess.run(
        [sys.executable, str(ROOT / "tools" / "serve_client.py"),
         "--artifact", str(artifact), "--binary", str(binary), *extra],
        capture_output=True, text=True, timeout=120, env=full_env,
    )


def test_sequential_protocol(artifact, mock_binary):
    p = _run_client(artifact, mock_binary, "--requests", "3")
    assert p.returncode == 0, p.stdout + p.stderr
    assert "max|diff|=0.000e+00" in p.stdout
    assert "median client-side round trip" in p.stdout


def test_pipeline_streams_before_reading(artifact, mock_binary):
    # The mock holds ALL answers until 4 request lines have arrived: only a
    # client that streams every request before reading any answer can
    # finish.  (A waits-between-sends client deadlocks -> timeout -> fail.)
    p = _run_client(artifact, mock_binary, "--requests", "4", "--pipeline",
                    env={"MOCK_HOLD_N": "4"})
    assert p.returncode == 0, p.stdout + p.stderr
    assert "max|diff|=0.000e+00" in p.stdout
    assert "img/s aggregate" in p.stdout


def test_pipeline_surfaces_server_error(artifact, mock_binary, tmp_path):
    # Nonexistent input file -> the mock dies mid-protocol -> the client
    # must exit non-zero, not hang or report success.
    bad = tmp_path / "bad_server"
    bad.write_text(MOCK_SERVER.format(python=sys.executable).replace(
        "np.load(in_p)", "raise SystemExit(3)"))
    bad.chmod(bad.stat().st_mode | stat.S_IXUSR)
    p = _run_client(artifact, bad, "--requests", "2", "--pipeline")
    assert p.returncode != 0
