"""Verify the unrolled attention engine against the lax.map chunked
engine on the real TPU, at the three shapes the full-config stack runs:

  LDM UNet ds=2:  [26, 8, 2048, 32]
  LDM UNet ds=4:  [26, 8, 512, 64]
  VAE mid-block:  [26, 1, 8192, 256]

The engines share every matmul so max|delta| must be 0.0 (bit-exact);
also prints per-shape walls (NOTE: ~50-70 ms of each wall is fixed
relay dispatch latency — compare deltas, not absolutes).  Run whenever
ops/attention.py changes:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_verify.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from egregora_tpu.ops import attention


def _sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1])[0])


def main():
    print("devices:", jax.devices(), flush=True)
    shapes = [
        ("unet-ds2", (26, 8, 2048, 32)),
        ("unet-ds4", (26, 8, 512, 64)),
        ("vae-mid", (26, 1, 8192, 256)),
    ]
    for name, (b, h, n, d) in shapes:
        rng = np.random.default_rng(1)
        mk = lambda: jnp.asarray(
            rng.standard_normal((b, h, n, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()

        def eng(path):
            def f(q, k, v):
                os.environ["EGREGORA_ATTN_PATH"] = path
                try:
                    return attention.mha(q, k, v)
                finally:
                    os.environ.pop("EGREGORA_ATTN_PATH", None)
            return jax.jit(f)

        paths = sys.argv[1:] or ["unroll", "chunked"]
        engines = [(p, eng(p)) for p in paths]
        outs = [f(q, k, v) for _, f in engines]
        for o in outs:
            o.block_until_ready()
        # complex/host quirks: move via f32
        ref = outs[0].astype(jnp.float32)
        delta = max(float(jnp.max(jnp.abs(ref - o.astype(jnp.float32))))
                    for o in outs[1:])
        scale = float(jnp.max(jnp.abs(ref)))

        walls = {}
        for tag, fn in engines:
            _sync(fn(q, k, v))
            best = float("inf")
            for _ in range(5):
                t0 = time.time()
                _sync(fn(q, k, v))
                best = min(best, time.time() - t0)
            walls[tag] = best * 1e3
        print(f"{name:9s} max|d| {delta:.4f} (max|o| {scale:.2f})  "
              + "  ".join(f"{t} {w:7.1f} ms" for t, w in walls.items()),
              flush=True)


if __name__ == "__main__":
    main()
