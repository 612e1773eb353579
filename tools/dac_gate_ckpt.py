"""Gate-evaluate a DAC .ckpt.npz sibling (or any saved codec npz) and
optionally ship it through the same should_ship guard the trainers use.

A killed guarded run leaves its candidate in pretrained_<type>.ckpt.npz;
this evaluates it against the shipped incumbent without retraining.

PYTHONPATH=/root/repo:/root/.axon_site python tools/dac_gate_ckpt.py 44khz [--ship]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

from egregora_tpu.models.dac.model import DACModel
from egregora_tpu.models.dac.train import (PRETRAINED, gate_metrics,
                                           load_pretrained, save_pretrained,
                                           should_ship)


def load_npz(path: Path):
    import json

    from egregora_tpu.models.dac.model import DACConfig
    from egregora_tpu.utils.weights import _unflatten
    with np.load(path) as z:
        files = list(z.files)
        assert "__config__" in files, f"{path} lacks an embedded config"
        d = json.loads(bytes(z["__config__"].tobytes()).decode())
        d["strides"] = tuple(d["strides"])
        cfg = DACConfig(**d)
        files.remove("__config__")
        params = _unflatten({k: z[k].astype(np.float32) for k in files})
    return cfg, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_type", choices=("16khz", "24khz", "44khz"))
    ap.add_argument("--path", default=None,
                    help="npz to evaluate (default: the .ckpt.npz sibling)")
    ap.add_argument("--ship", action="store_true",
                    help="overwrite the shipped npz if should_ship passes")
    a = ap.parse_args()
    path = Path(a.path) if a.path else \
        PRETRAINED[a.model_type].with_suffix(".ckpt.npz")
    if not path.exists():
        sys.exit(f"no candidate at {path}")
    cfg, params = load_npz(path)
    model = DACModel(cfg)
    after = gate_metrics(model, params)
    print(f"[gate:{a.model_type}] candidate {path.name}: {after}", flush=True)
    shipped = load_pretrained(a.model_type)
    if shipped is None:
        print("no incumbent — candidate would ship unconditionally")
        ok = True
    else:
        before = gate_metrics(DACModel(shipped[0]), shipped[1])
        print(f"[gate:{a.model_type}] incumbent: {before}", flush=True)
        ok = should_ship(before, after)
        print(f"[gate:{a.model_type}] should_ship -> {ok}", flush=True)
    if a.ship and ok:
        save_pretrained(params, PRETRAINED[a.model_type], cfg=cfg)
        print(f"[gate:{a.model_type}] SHIPPED -> {PRETRAINED[a.model_type]}")
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
