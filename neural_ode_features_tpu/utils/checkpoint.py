"""Checkpointing: msgpack param pytrees + bidirectional torch conversion.

BASELINE.json: "Preserve the repo's public surface — … checkpoint format".
The reference stores a torch ``state_dict`` (reference: train.py
``torch.save`` — UNVERIFIED, SURVEY.md §5).  Our native format is a flax
msgpack serialisation of the nested param dict; the torch-parity surface is
the documented name map below plus :func:`to_torch_state_dict` /
:func:`from_torch_state_dict`, which make checkpoints convertible in both
directions (torch itself is only imported inside the converter helpers).

Two torch naming styles are supported (``style=`` on both converters):

``'internal'`` (default, canonical): our dotted module paths —
``stem.conv0.weight``, ``odefunc.conv1.weight``, ``head.fc.weight`` … —
with torch tensor layouts (OIHW convs, (out,in) linears).  This is what the
torch oracle consumes and what round-trips exactly.

``'reference'``: best-effort translation to the reference repo's presumed
``state_dict`` names (layout conversions identical):

  stem.conv0           downsampling_layers.0
  stem.norm1           downsampling_layers.1
  stem.conv1           downsampling_layers.3
  stem.norm2           downsampling_layers.4
  stem.conv2           downsampling_layers.6
  odefunc.normK        feature_layers.0.odefunc.normK
  odefunc.convK        feature_layers.0.odefunc.convK._layer
  head.norm            fc_layers.0
  head.fc              fc_layers.4
  blocks.K.*           feature_layers.K.*            (ResNet)

The reference layout is UNVERIFIED (empty mount, SURVEY.md §0) — the table
encodes the Chen-et-al. nn.Sequential structure the repo copies; adjust the
prefix map below if a real checkpoint ever disagrees.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..models.common import ModelConfig

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "resolve_checkpoint",
    "to_torch_state_dict",
    "from_torch_state_dict",
]


def resolve_checkpoint(path: str | Path,
                       name: str = "ckpt_best.msgpack") -> Path:
    """Resolve a CLI ``--run`` argument to a checkpoint file.

    Accepts either a checkpoint file (returned as-is) or a run directory —
    inside one, prefer ``name`` and fall back to ``ckpt_last.msgpack`` when
    it is missing (a run interrupted before its first eval never wrote a
    "best").  The ONE place this policy lives: eval_ckpt/bench/sweep/
    export_model/extract/parity_eval previously each had a hand-rolled copy
    with diverging fallbacks (code-review r4)."""
    p = Path(path)
    if p.is_dir():
        ckpt = p / name
        if not ckpt.exists():
            ckpt = p / "ckpt_last.msgpack"
        return ckpt
    return p


def save_checkpoint(path: str | Path, params: Any, cfg: ModelConfig,
                    extra: dict | None = None) -> None:
    """Write ``<path>`` (msgpack params) and ``<path>.json`` (config+extra)."""
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(params)))
    meta = {"config": dataclasses.asdict(cfg), "extra": extra or {}}
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: str | Path, init_fn=None) -> tuple[Any, ModelConfig, dict]:
    """Read params + config.  ``init_fn(key, cfg) -> template`` defaults to
    the right initialiser for the persisted ``extra['model']`` family."""
    from flax import serialization

    path = Path(path)
    meta = json.loads(path.with_suffix(path.suffix + ".json").read_text())
    cfg = ModelConfig(**meta["config"])
    if init_fn is None:
        from ..models import init_odenet, init_resnet

        model = meta.get("extra", {}).get("model", "odenet")
        init_fn = init_resnet if model == "resnet" else init_odenet
    template = init_fn(jax.random.PRNGKey(0), cfg)
    params = serialization.from_bytes(template, path.read_bytes())
    return params, cfg, meta.get("extra", {})


# ---------------------------------------------------------------------------
# Torch conversion
# ---------------------------------------------------------------------------
def _flatten(params: Any, prefix="") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


# internal dotted prefix → reference-style prefix ('reference' naming style).
_REFERENCE_PREFIX = {
    "stem.conv0": "downsampling_layers.0",
    "stem.norm1": "downsampling_layers.1",
    "stem.conv1": "downsampling_layers.3",
    "stem.norm2": "downsampling_layers.4",
    "stem.conv2": "downsampling_layers.6",
    "odefunc.norm1": "feature_layers.0.odefunc.norm1",
    "odefunc.conv1": "feature_layers.0.odefunc.conv1._layer",
    "odefunc.norm2": "feature_layers.0.odefunc.norm2",
    "odefunc.conv2": "feature_layers.0.odefunc.conv2._layer",
    "odefunc.norm3": "feature_layers.0.odefunc.norm3",
    "head.norm": "fc_layers.0",
    "head.fc": "fc_layers.4",
}


def _style_prefix(prefix: str, style: str) -> str:
    if style == "internal":
        return prefix
    if prefix in _REFERENCE_PREFIX:
        return _REFERENCE_PREFIX[prefix]
    if prefix.startswith("blocks."):  # ResNet blocks.K.sub → feature_layers.K.sub
        return "feature_layers." + prefix[len("blocks."):]
    return prefix


def _to_torch_name_and_layout(name: str, arr: np.ndarray):
    """Map 'stem/conv0/kernel' style names to torch-style dotted names with
    torch tensor layouts (OIHW convs, (out,in) linears)."""
    parts = name.split("/")
    leaf = parts[-1]
    tname = ".".join(parts[:-1])
    if leaf == "kernel":
        if arr.ndim == 4:  # HWIO → OIHW
            return f"{tname}.weight", arr.transpose(3, 2, 0, 1)
        return f"{tname}.weight", arr.T  # linear DIO → OI
    if leaf == "scale":
        return f"{tname}.weight", arr
    return f"{tname}.{leaf}", arr


def to_torch_state_dict(params: Any, style: str = "internal") -> dict[str, np.ndarray]:
    """Export params as a torch-convention state dict (numpy values; wrap
    with ``torch.from_numpy`` to feed a torch model).  ``style``: 'internal'
    (canonical) or 'reference' (see module docstring)."""
    out = {}
    for name, arr in _flatten(params).items():
        tname, tarr = _to_torch_name_and_layout(name, arr)
        prefix, leaf = tname.rsplit(".", 1)
        out[f"{_style_prefix(prefix, style)}.{leaf}"] = np.ascontiguousarray(tarr)
    return out


def from_torch_state_dict(template: Any, state: dict[str, np.ndarray]) -> Any:
    """Inverse of :func:`to_torch_state_dict`: fill a params template from a
    torch-convention dict (accepts torch tensors or numpy arrays, in either
    'internal' or 'reference' naming style)."""

    def _get(name, like):
        parts = name.split("/")
        leaf = parts[-1]
        tname = ".".join(parts[:-1])
        tleaf = "weight" if leaf in ("kernel", "scale") else leaf
        key = f"{tname}.{tleaf}"
        if key not in state:  # accept reference-style names transparently
            key = f"{_style_prefix(tname, 'reference')}.{tleaf}"
        arr = state[key]
        arr = np.asarray(arr.detach().cpu() if hasattr(arr, "detach") else arr)
        if leaf == "kernel":
            arr = arr.transpose(2, 3, 1, 0) if arr.ndim == 4 else arr.T
        return arr.astype(like.dtype).reshape(like.shape)

    flat_names = _flatten(template)
    filled = {n: _get(n, a) for n, a in flat_names.items()}

    def _rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: _rebuild(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = [_rebuild(v, f"{prefix}{i}/") for i, v in enumerate(node)]
            return type(node)(t) if isinstance(node, tuple) else t
        return filled[prefix[:-1]]

    return _rebuild(template)
