"""Time the VAE's 1-channel edge convs and lane-friendly rewrites.

The decoder's final ``nn.Conv(1, (3,3))`` on [26,512,256,64] and the
encoder's input ``nn.Conv(64, (3,3))`` on [26,512,256,1] sit at the
known 1-channel XLA-conv trap (CLAUDE.md: ops/fir.py exists because
1-channel convs lower badly on TPU).  The visible-FLOP gap in the
round-5 vae_lab (decoder conv stack ~64 ms vs 34 ms at peak) points
here.  Variants:

  dec-conv1     nn.Conv(1,(3,3)) as-is
  dec-conv128   kernel zero-padded to 128 out-channels, slice [...,0:1]
  dec-matmul    im2col-free: 9 shifted [.,64]@[64,1] dot accumulations
  enc-conv     nn.Conv(64,(3,3)) on C_in=1 as-is
  enc-matmul   9 shifted broadcasts * w[i,j,0,:] accumulated (C_in=1
               conv is just a 9-tap spatial stencil per out channel)

  PYTHONPATH=/root/repo:/root/.axon_site python tools/edge_conv_lab.py [names...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, F, M = 26, 512, 256
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


def conv2d(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.standard_normal((B, F, M, 64)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    x1 = jnp.asarray(rng.standard_normal((B, F, M, 1)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 64, 1)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, 3, 1, 64)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    null = jax.jit(lambda a: a.sum())
    null_dt = time_fn(null, x1)
    print(f"null dispatch: {null_dt*1e3:7.1f} ms", flush=True)

    def dec_conv1(x):
        return conv2d(x, w1, 0.1).sum()

    def dec_conv128(x):
        wpad = jnp.pad(w1, ((0, 0), (0, 0), (0, 0), (0, 127)))
        return conv2d(x, wpad, 0.1)[..., :1].sum()

    def dec_matmul(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((B, F, M), jnp.float32)
        for i in range(3):
            for j in range(3):
                tap = jax.lax.slice(xp, (0, i, j, 0), (B, i + F, j + M, 64))
                out = out + jax.lax.dot_general(
                    tap, w1[i, j, :, 0], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return (out + 0.1).sum()

    def enc_conv(x):
        return conv2d(x, w64, 0.1).sum()

    def enc_matmul(x):
        xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
        out = jnp.zeros((B, F, M, 64), jnp.float32)
        for i in range(3):
            for j in range(3):
                tap = jax.lax.slice(xp, (0, i, j), (B, i + F, j + M))
                out = out + tap[..., None].astype(jnp.float32) * \
                    w64[i, j, 0].astype(jnp.float32)
        return (out + 0.1).sum()

    def dec_3x1d(x):
        """3x3x64->1 2D conv as three 3-tap 1D NWC convs over M (one
        per F-offset), shift-added.  The 1D C_out=1 conv lowers well
        (the vocoder post conv runs at ~bandwidth); the 2D one does
        not."""
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        out = jnp.zeros((B, F, M, 1), jnp.float32)
        for i in range(3):
            row = jax.lax.slice(xp, (0, i, 0, 0), (B, i + F, M, 64))
            y = jax.lax.conv_general_dilated(
                row.reshape(B * F, M, 64), w1[i], (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32)
            out = out + y.reshape(B, F, M, 1)
        return (out + 0.1).sum()

    def dec_pallas(x):
        from egregora_tpu.ops.conv_edge import conv3x3_out1
        return conv3x3_out1(x, w1, jnp.full((1,), 0.1, jnp.float32)).sum()

    variants = [("dec-conv1", dec_conv1, x64), ("dec-conv128", dec_conv128, x64),
                ("dec-matmul", dec_matmul, x64), ("dec-3x1d", dec_3x1d, x64),
                ("dec-pallas", dec_pallas, x64),
                ("enc-conv", enc_conv, x1),
                ("enc-matmul", enc_matmul, x1)]
    only = set(sys.argv[1:])
    if only:
        variants = [v for v in variants if v[0] in only]

    ref = {}
    for name, fn, arg in variants:
        jf = jax.jit(fn)
        dt = time_fn(jf, arg)
        over = (dt - null_dt) * 1e3
        print(f"{name:12s} {dt*1e3:7.1f} ms  over-null {over:7.1f} ms",
              flush=True)
        ref[name] = float(np.asarray(jax.device_get(jf(arg))))
    # numeric cross-checks (bf16 tolerance)
    if "dec-conv1" in ref and "dec-matmul" in ref:
        print("dec delta:", abs(ref["dec-conv1"] - ref["dec-matmul"]) /
              max(1.0, abs(ref["dec-conv1"])), flush=True)
    if "dec-conv1" in ref and "dec-3x1d" in ref:
        print("dec3x1d delta:", abs(ref["dec-conv1"] - ref["dec-3x1d"]) /
              max(1.0, abs(ref["dec-conv1"])), flush=True)
    if "enc-conv" in ref and "enc-matmul" in ref:
        print("enc delta:", abs(ref["enc-conv"] - ref["enc-matmul"]) /
              max(1.0, abs(ref["enc-conv"])), flush=True)


if __name__ == "__main__":
    main()
