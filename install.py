"""Bootstrap / environment check (the reference install.py's analog).

The reference installer pip-installs a dozen packages, downloads the
FlashSR repo zip + weights, and runs model warmups
(reference install.py:104-172).  Here the runtime deps are baked
(jax/flax/optax/numpy), so bootstrap means:

1. verify the baked dependency set imports,
2. build the native host-edge components (native/wavcodec.cc),
3. prepare the weight-store directories and report which checkpoint
   files are present vs missing (no network fetch in zero-egress
   environments — mirrors the reference's actionable-error style),
4. run tiny jit warmups of each engine so first real use is fast.

Run: python install.py [--skip-warmup]
"""
from __future__ import annotations

import argparse
import sys


def check_deps() -> bool:
    ok = True
    for mod in ("jax", "flax", "optax", "numpy"):
        try:
            __import__(mod)
            print(f"[deps] {mod}: ok")
        except Exception as e:
            print(f"[deps] {mod}: MISSING ({e})")
            ok = False
    for mod in ("soundfile", "matplotlib", "torch"):
        try:
            __import__(mod)
            print(f"[deps] {mod}: ok (optional)")
        except Exception:
            print(f"[deps] {mod}: absent (optional; degraded gracefully)")
    return ok


def build_native() -> None:
    from egregora_tpu.utils.native import load
    lib = load()
    print(f"[native] wavcodec: {'built' if lib is not None else 'unavailable (g++ missing?); stdlib fallback active'}")


def check_weights(fetch: bool = True) -> None:
    from egregora_tpu.utils.weights import (FLASHSR_FILES, HF_DATASET, flashsr_ckpt_dir,
                                            missing_flashsr_files)
    d = flashsr_ckpt_dir()
    missing = missing_flashsr_files()
    if missing and fetch:
        # reference install.py:78-101 (try_fetch_weights): hf_hub ->
        # streaming HTTP, env-overridable repo, degrade with instructions
        from egregora_tpu.utils.fetch import fetch_flashsr_weights
        print(f"[weights] FlashSR: fetching {', '.join(missing)} ...")
        missing = fetch_flashsr_weights(timeout=30.0)
    if missing:
        print(f"[weights] FlashSR: missing {', '.join(missing)} in {d}")
        print(f"[weights]   place the files from HF dataset {HF_DATASET} there; "
              "the shipped distilled trio serves until then")
    else:
        print(f"[weights] FlashSR: all of {', '.join(FLASHSR_FILES)} present in {d}")

    # shipped distilled sets (every engine must serve REAL weights out
    # of the box; random-init serve paths warn loudly)
    from egregora_tpu.models.dac.train import PRETRAINED as DAC_PRE
    from egregora_tpu.models.deepfilternet.train import pretrained_path as dfn_path
    from egregora_tpu.models.flashsr.distill import PRETRAINED as SR_PRE
    from egregora_tpu.models.flashsr.distill import PRETRAINED_ISTFT
    from egregora_tpu.models.rnnoise.train import pretrained_path as rn_path
    rows = [("FlashSR distilled trio", SR_PRE.exists()),
            ("RNNoise", rn_path().exists()),
            ("DeepFilterNet2", dfn_path("DeepFilterNet2").exists()),
            ("DeepFilterNet3", dfn_path("DeepFilterNet3").exists())]
    rows += [(f"DAC {t}", p.exists()) for t, p in sorted(DAC_PRE.items())]
    for name, ok in rows:
        print(f"[weights] shipped {name}: {'present' if ok else 'MISSING'}")
    if PRETRAINED_ISTFT.exists():   # optional variant, not a MISSING-able set
        print("[weights] shipped FlashSR istft trio: present "
              "(serve with EGREGORA_FLASHSR_VARIANT=istft)")


def warmups() -> None:
    import numpy as np
    import jax.numpy as jnp
    silence = jnp.zeros((1, 4800), jnp.float32)  # 100 ms @ 48 kHz

    from egregora_tpu.eval.loudness import loudness_report
    loudness_report(silence, 48000)
    print("[warmup] loudness: ok")

    from egregora_tpu.ops.spectral import spectral_enhance
    spectral_enhance(silence, 2, 4, 0.6)
    print("[warmup] spectral enhance: ok")

    from egregora_tpu.models.rnnoise.model import denoise, init_params
    denoise(init_params(0), jnp.zeros((1, 4800), jnp.float32))
    print("[warmup] rnnoise: ok")

    from egregora_tpu.models.deepfilternet.model import enhance, init_params as dfn_init
    enhance(dfn_init(0), silence)
    print("[warmup] deepfilternet: ok")

    # DAC warmup mirrors the reference's warmup_dac (install.py:151-158):
    # resolve weights (converted > shipped distilled > random) + tiny encode
    from egregora_tpu.models.dac.model import build_dac
    model, params, _sr = build_dac("44khz")
    model.encode(params, jnp.zeros((1, model.cfg.hop * 4), jnp.float32))
    print("[warmup] dac: ok")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-warmup", action="store_true")
    ap.add_argument("--offline", action="store_true",
                    help="skip the weight fetch attempt")
    args = ap.parse_args(argv)
    ok = check_deps()
    build_native()
    check_weights(fetch=not args.offline)
    if not args.skip_warmup:
        warmups()
    print("[install] done" if ok else "[install] finished with missing required deps")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
