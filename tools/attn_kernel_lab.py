"""Standalone timing: whole-row Pallas attention vs the unrolled XLA
engine at the real FlashSR shapes (no model context — kernel-only).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_kernel_lab.py

Shapes: UNet ds=2 (B*H=208, N=2048, D=32, 5 calls/bench-program),
UNet ds=4 (B*H=208, N=512, D=64, 6 calls), VAE mid (B=26, N=8192,
D=256, 2 calls: enc+dec).  Numbers are best-of-6 over-null walls.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from egregora_tpu.ops.attention import unrolled_attention
from egregora_tpu.ops.attn_pallas import flash_rows

ROUNDS = 6


def _sync(a):
    a.block_until_ready()
    return float(np.asarray(jax.device_get(a.reshape(-1)[:1]))[0])


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
    rng = np.random.default_rng(0)
    null = jax.jit(lambda a: a.sum())
    shapes = [("unet-ds2", 208, 2048, 32), ("unet-ds4", 208, 512, 64),
              ("vae-mid", 26, 8192, 256)]
    un = jax.jit(unrolled_attention)
    fl = jax.jit(flash_rows)
    for name, b, n, d in shapes:
        q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        null_dt = time_fn(null, q)
        t_un = time_fn(un, q, k, v) - null_dt
        t_fl = time_fn(fl, q, k, v) - null_dt
        r = np.asarray(un(q, k, v), np.float32)
        g = np.asarray(fl(q, k, v), np.float32)
        flops = 4 * b * n * n * d
        print(f"{name:9s} unroll {t_un*1e3:7.2f} ms ({flops/t_un/1e12:5.1f} TF/s)"
              f"  pallas {t_fl*1e3:7.2f} ms ({flops/t_fl/1e12:5.1f} TF/s)"
              f"  |d|max {np.abs(r-g).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
