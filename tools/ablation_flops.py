"""Per-stage FLOP attribution for the fused full-config pipeline.

Companion to tools/profile_fused_ablation.py: that tool measures WALL
deltas per ablated stage; this one extracts each variant's XLA
cost-analysis FLOPs so stage MFU = (flops_full - flops_variant) /
(wall_full - wall_variant) / peak can be computed honestly.  The
variants are byte-identical to the ablation tool's, so the relay
compile cache makes this cheap right after an ablation run.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablation_flops.py
"""
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from profile_fused_ablation import IN_SR, SECS, make_program

from egregora_tpu.models.flashsr.pipeline import FlashSRConfig, FlashSRPipeline


def main():
    print("devices:", jax.devices(), flush=True)
    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)
    params = jax.device_put(pipe.params)
    rng = np.random.default_rng(4)
    import jax.numpy as jnp
    x = jnp.asarray((rng.standard_normal((1, IN_SR * SECS)) * 0.1)
                    .astype(np.float32))

    variants = [
        ("full", ()),
        ("-voc", ("voc",)),
        ("-unet", ("unet",)),
        ("-vae", ("vae", "unet")),
        ("-post", ("post",)),
        ("glue-only", ("vae", "unet", "voc", "post")),
    ]
    base = None
    for name, skip in variants:
        run = make_program(pipe, frozenset(skip))
        ca = run.lower(params, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        if base is None:
            base = fl
            print(f"{name:10s} flops {fl/1e9:9.1f} G  bytes {by/1e9:7.2f} G",
                  flush=True)
        else:
            print(f"{name:10s} flops {fl/1e9:9.1f} G  bytes {by/1e9:7.2f} G"
                  f"   stage flops {(base-fl)/1e9:9.1f} G", flush=True)


if __name__ == "__main__":
    main()
