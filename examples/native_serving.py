#!/usr/bin/env python
"""Example: the native serving loop, end to end, on any machine.

Spawns the C++ serving host (``native/pjrt_serve --listen``) on a socket
and drives it through the library client
(:class:`neural_ode_features_tpu.serving.SocketClient`) — one round trip,
then a pipelined stream where the host computes request *i* while it
stages *i+1*.

By default this uses the MOCK PJRT plugin (``native/mock_pjrt_plugin.so``,
built automatically) and a fabricated artifact, so it runs hermetically —
no TPU, no trained model. Point ``--artifact`` at a real
``export-compiled`` artifact on a TPU box and drop ``--plugin`` to serve
the actual model the same way:

    python tools/export_model.py export-compiled --run runs_tpu/<dir> \
        --batch 256 --out model.npexec
    python examples/native_serving.py --artifact model.npexec --plugin ''

reference: none — SURVEY.md §2.3 (the reference ships no serving layer).
"""

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

from neural_ode_features_tpu.serving import SocketClient  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default=None,
                   help="a .npexec dir (default: fabricate a mock one)")
    p.add_argument("--plugin",
                   default=str(ROOT / "native" / "mock_pjrt_plugin.so"),
                   help="PJRT plugin .so ('' = the server's TPU default)")
    p.add_argument("--requests", type=int, default=8)
    args = p.parse_args(argv)

    subprocess.run(["make", "-C", str(ROOT / "native"), "all"],
                   check=True, capture_output=True)

    artifact = args.artifact
    if artifact is None:
        from export_model import write_mock_artifact

        artifact = tempfile.mkdtemp(prefix="mock_") + "/model.npexec"
        write_mock_artifact(artifact, in_shape=(8, 32, 32, 3),
                            out_shape=(8, 10))
        print(f"fabricated mock artifact: {artifact}")

    sock = tempfile.mkdtemp(prefix="serve_") + "/serve.sock"
    cmd = [str(ROOT / "native" / "pjrt_serve"), str(artifact),
           "--listen", sock]
    if args.plugin:
        cmd += ["--plugin", args.plugin]
    server = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, text=True,
                              bufsize=1)
    try:
        ready = server.stdout.readline().strip()
        assert ready.startswith("READY "), ready
        print(f"server: {ready}")

        with SocketClient(sock) as client:
            print(f"hello: input {client.in_shape} -> output "
                  f"{client.out_shape}")
            rng = np.random.default_rng(0)
            x = rng.normal(size=client.in_shape).astype(np.float32)

            t0 = time.perf_counter()
            y = client.infer(x)
            print(f"one round trip: {1e3*(time.perf_counter()-t0):.1f} ms, "
                  f"output mean {float(y.mean()):+.4f}")

            xs = [rng.normal(size=client.in_shape).astype(np.float32)
                  for _ in range(args.requests)]
            t0 = time.perf_counter()
            ys = list(client.infer_stream(xs))
            wall = time.perf_counter() - t0
            print(f"pipelined stream: {len(ys)} requests in {wall:.3f} s "
                  f"({wall/len(ys)*1e3:.1f} ms/request)")

        # A fresh connection still works; then ask the server to exit.
        closer = SocketClient(sock)
        closer.close(shutdown_server=True)
        assert server.wait(timeout=60) == 0
        print("server shut down cleanly")
    finally:
        if server.poll() is None:
            server.kill()


if __name__ == "__main__":
    main()
