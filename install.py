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


# (module, pip name, try --no-deps first) — the reference's _ensure list
# (install.py:104-136).  --no-deps first for packages whose declared
# dependency pins would drag a second torch/jax into the environment
# (the reference does exactly this for deepfilternet, :117-119).
REQUIRED_DEPS = (("jax", "jax", False), ("flax", "flax", False),
                 ("optax", "optax", False), ("numpy", "numpy", False))
OPTIONAL_DEPS = (("soundfile", "soundfile", False),
                 ("matplotlib", "matplotlib", False),
                 ("torch", "torch", True))


def _ensure(mod: str, pip_name: str, try_no_deps: bool = False,
            install: bool = False, runner=None) -> bool:
    """Import ``mod``; optionally pip-install ``pip_name`` and retry
    (reference ``_ensure``, install.py:35-61).  ``try_no_deps`` attempts
    ``pip install --no-deps`` first so a package's own pins can't
    replace the environment's torch/jax; a plain install follows only
    if the import still fails.  ``runner`` injects the subprocess call
    (tests).  Returns importability."""
    import importlib
    import subprocess

    def importable() -> bool:
        try:
            importlib.import_module(mod)
            return True
        except Exception:
            return False

    if importable():
        return True
    if not install:
        return False
    run = runner or (lambda args: subprocess.run(args).returncode)
    base = [sys.executable, "-m", "pip", "install"]
    attempts = ([base + ["--no-deps", pip_name], base + [pip_name]]
                if try_no_deps else [base + [pip_name]])
    for args in attempts:
        try:
            run(args)
        except Exception as e:
            print(f"[deps] pip install {pip_name} failed: {e}")
            return False
        importlib.invalidate_caches()
        if importable():
            return True
    return importable()


def check_deps(install: bool = False) -> bool:
    ok = True
    for mod, pip_name, no_deps in REQUIRED_DEPS:
        if _ensure(mod, pip_name, no_deps, install=install):
            print(f"[deps] {mod}: ok")
        else:
            print(f"[deps] {mod}: MISSING"
                  + ("" if install else " (re-run with --install-deps)"))
            ok = False
    for mod, pip_name, no_deps in OPTIONAL_DEPS:
        if _ensure(mod, pip_name, no_deps, install=install):
            print(f"[deps] {mod}: ok (optional)")
        else:
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
    ap.add_argument("--install-deps", action="store_true",
                    help="pip-install missing dependencies (reference "
                         "install.py behavior; default only checks)")
    args = ap.parse_args(argv)
    ok = check_deps(install=args.install_deps)
    build_native()
    check_weights(fetch=not args.offline)
    if not args.skip_warmup:
        warmups()
    print("[install] done" if ok else "[install] finished with missing required deps")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
