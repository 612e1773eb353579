"""In-context HiFi-GAN vocoder engine shootout at the bench geometry.

The full-config program's vocoder stage (182 ms of 476 ms, 38% MFU —
PARITY stage table) runs the plain flax ``SRVocoder.apply`` NWC convs
by default; ``apply_fused`` (pallas / dense / packed MRF engines) is
opt-in with no in-context bench evidence (VERDICT r4 weak #1).  This
times the WHOLE vocoder stage — upsample ConvTransposes + MRFs + post
conv — per engine at the real 120 s bench shape ([26, 512, 256] mel),
over-null, so the winner can ship as the default with a number behind
it.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/voc_lab.py [names...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from egregora_tpu.models.flashsr.vocoder import (SRVocoder, VocoderConfig,
                                                 apply_fused)
from egregora_tpu.utils.weights import fast_init_like

B, FRAMES, NMELS = 26, 512, 256
ROUNDS = 6


def _sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1])[0])


def time_fn(fn, *args):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.time()
        _sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = VocoderConfig()
    model = SRVocoder(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, FRAMES, NMELS))
                      .astype(np.float32))
    params = fast_init_like(
        jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mel)),
        seed=0)
    params = jax.device_put(params)

    null = jax.jit(lambda a: a.sum())
    null_dt = time_fn(null, mel)
    print(f"null dispatch: {null_dt*1e3:7.1f} ms", flush=True)

    def flax_fwd(p, m):
        return model.apply(p, m).sum()

    def fused(path):
        def f(p, m):
            os.environ["EGREGORA_MRF_PATH"] = path
            try:
                return apply_fused(p, m, cfg).sum()
            finally:
                os.environ.pop("EGREGORA_MRF_PATH", None)
        return f

    variants = [
        ("flax-nwc", flax_fwd),
        ("fused-packed", fused("packed")),
        ("fused-pallas", fused("pallas")),
        ("fused-dense", fused("dense")),
    ]
    only = set(sys.argv[1:])
    if only:
        variants = [v for v in variants if v[0] in only]

    base = None
    for name, fn in variants:
        jf = jax.jit(fn)
        fl = 0.0
        try:
            ca = jf.lower(params, mel).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
        except Exception:
            pass
        dt = time_fn(jf, params, mel)
        over = (dt - null_dt) * 1e3
        mfu = 100.0 * fl / (max(over, 1e-9) * 1e-3) / 197e12
        line = (f"{name:13s} {dt*1e3:7.1f} ms  over-null {over:7.1f} ms"
                f"  flops {fl/1e9:8.1f} G  MFU {mfu:5.1f}%")
        if base is None:
            base = over
        else:
            line += f"  saves {base - over:6.1f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
