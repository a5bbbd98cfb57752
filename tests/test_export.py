"""AOT export/serve round trip (tools/export_model.py).

``jax.export`` serialises the lowered inference function to StableHLO; a
consumer deserialises and calls it with no model code.  This tests the full
CLI surface: export from a checkpointed run dir, then run the artifact and
check parity against the live model (reference: none — serving layer
EXCEEDS parity, SURVEY.md §2.3)."""

import json
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from neural_ode_features_tpu.models import init_odenet
from neural_ode_features_tpu.models.common import ModelConfig
from neural_ode_features_tpu.utils.checkpoint import save_checkpoint
from tools import export_model


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    run = tmp_path_factory.mktemp("run")
    cfg = ModelConfig(in_channels=1, hidden=16, groups=8, tol=1e-2)
    params = init_odenet(jax.random.PRNGKey(0), cfg)
    save_checkpoint(run / "ckpt_best.msgpack", params, cfg,
                    extra={"model": "odenet"})
    return run


def test_export_then_run_parity(tiny_run, capsys):
    export_model.main(["export", "--run", str(tiny_run), "--batch", "4",
                       "--cpu"])
    artifact = tiny_run / "model_b4.nodeexport"
    assert artifact.exists()
    meta = json.loads(Path(str(artifact) + ".json").read_text())
    assert meta["input_shape"] == [4, 28, 28, 1]
    assert meta["bytes"] == artifact.stat().st_size

    # Deserialize + execute + parity vs the live model (asserts agreement).
    export_model.main(["run", "--artifact", str(artifact), "--run",
                       str(tiny_run), "--reps", "1", "--cpu"])
    out = capsys.readouterr().out
    assert "argmax agreement=1.0000" in out


def test_export_compiled_artifact(tiny_run):
    """export-compiled writes the native-host artifact; the serialized
    executable must deserialize and execute (the C++ host's exact calls,
    driven here through the in-process PJRT client on CPU; the hardware
    run is probes/native_serve_probe.log)."""
    import numpy as np

    export_model.main(["export-compiled", "--run", str(tiny_run),
                       "--batch", "4", "--chain", "2"])
    art = tiny_run / "native_b4_c2.npexec"
    assert (art / "executable.bin").exists()
    meta = json.loads((art / "meta.json").read_text())
    assert meta["inputs"][0]["shape"] == [2, 4, 28, 28, 1]
    assert meta["chain"] == 2
    x = np.load(art / "sample_input.npy")
    expected = np.load(art / "expected_logits.npy")
    assert x.flags["C_CONTIGUOUS"] and expected.flags["C_CONTIGUOUS"]
    assert expected.shape == (2, 4, 10)

    client = jax.devices()[0].client
    exe = client.deserialize_executable(
        (art / "executable.bin").read_bytes(), [jax.devices()[0]])
    outs = exe.execute_sharded([jax.device_put(x, jax.devices()[0])])
    got = np.asarray(outs.disassemble_into_single_device_arrays()[0][0])
    np.testing.assert_array_equal(got, expected)


def test_export_is_code_free(tiny_run):
    """The artifact must execute through jax.export alone (the serving
    process needs no model/config code)."""
    from jax import export as jexport
    import numpy as np

    artifact = tiny_run / "model_b4.nodeexport"
    exported = jexport.deserialize(artifact.read_bytes())
    x = np.zeros((4, 28, 28, 1), np.float32)
    logits = exported.call(x)
    assert logits.shape == (4, 10)
