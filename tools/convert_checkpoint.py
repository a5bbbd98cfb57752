#!/usr/bin/env python
"""Convert checkpoints between this framework's msgpack format and a
torch-convention ``state_dict`` pickle (BASELINE.json: checkpoint format is
public surface; the name map is documented in utils/checkpoint.py).

    # ours -> torch (loadable with torch.load, tensors as numpy arrays)
    python tools/convert_checkpoint.py to-torch runs/<run>/ckpt_best.msgpack out.pt

    # torch -> ours (requires a config json to rebuild the template)
    python tools/convert_checkpoint.py from-torch out.pt ckpt.msgpack \
        --config runs/<run>/ckpt_best.msgpack.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["to-torch", "from-torch"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default=None,
                   help="(from-torch) checkpoint .json with the model config")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from neural_ode_features_tpu.models import ModelConfig, init_odenet, init_resnet
    from neural_ode_features_tpu.utils import (
        from_torch_state_dict,
        load_checkpoint,
        save_checkpoint,
        to_torch_state_dict,
    )

    if args.mode == "to-torch":
        params, cfg, extra = load_checkpoint(
            args.src,
            init_resnet if extra_model(args.src) == "resnet" else init_odenet,
        )
        sd = {k: torch.from_numpy(v.copy())
              for k, v in to_torch_state_dict(params).items()}
        torch.save({"state_dict": sd, "config": cfg.__dict__, "extra": extra},
                   args.dst)
        print(f"wrote torch checkpoint {args.dst} ({len(sd)} tensors)")
    else:
        blob = torch.load(args.src, weights_only=False)
        sd = blob["state_dict"] if "state_dict" in blob else blob
        if args.config:
            meta = json.loads(Path(args.config).read_text())
            cfg = ModelConfig(**meta["config"])
            extra = meta.get("extra", {})
        elif "config" in blob:
            cfg = ModelConfig(**blob["config"])
            extra = blob.get("extra", {})
        else:
            raise SystemExit("need --config to rebuild the architecture")
        model = extra.get("model", "odenet")
        init_fn = init_resnet if model == "resnet" else init_odenet
        template = init_fn(jax.random.PRNGKey(0), cfg)
        params = from_torch_state_dict(template, sd)
        save_checkpoint(args.dst, params, cfg, extra=extra)
        print(f"wrote {args.dst}")


def extra_model(path) -> str:
    meta = Path(str(path) + ".json")
    if meta.exists():
        return json.loads(meta.read_text()).get("extra", {}).get("model",
                                                                 "odenet")
    return "odenet"


if __name__ == "__main__":
    main()
