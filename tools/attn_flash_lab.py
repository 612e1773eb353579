"""Schedule sweep: whole-row flash_rows vs online-softmax flash_online
at the real FlashSR attention shapes (kernel-only, over-null walls).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_flash_lab.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from egregora_tpu.ops.attn_flash import flash_online
from egregora_tpu.ops.attn_pallas import flash_rows
from egregora_tpu.ops.attention import unrolled_attention

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
    shapes = [("vae-mid", 26, 8192, 256), ("unet-ds2", 208, 2048, 32)]
    import functools
    for name, b, n, d in shapes:
        q = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
        null_dt = time_fn(null, q)
        ref = np.asarray(unrolled_attention(q, k, v), np.float32)
        flops = 4 * b * n * n * d
        cands = [("rows-cur", jax.jit(flash_rows))]
        for bq, bk in ((512, 1024), (512, 2048), (1024, 1024),
                       (256, 2048), (1024, 512)):
            if bk > n or bq > n:
                continue
            cands.append((f"online-q{bq}k{bk}", jax.jit(functools.partial(
                flash_online, block_q=bq, block_k=bk))))
        for cname, fn in cands:
            try:
                t = time_fn(fn, q, k, v) - null_dt
                g = np.asarray(fn(q, k, v), np.float32)
                err = np.abs(ref - g).max()
                print(f"{name:9s} {cname:14s} {t*1e3:7.2f} ms "
                      f"({flops/t/1e12:5.1f} TF/s, MFU {flops/t/1.97e12:4.1f}%)"
                      f"  |d|max {err:.3e}", flush=True)
            except Exception as e:
                print(f"{name:9s} {cname:14s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
