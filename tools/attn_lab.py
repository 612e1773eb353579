"""UNet attention engine lab: beat the 64 ms chunked in-context wall.

Findings so far (tools/unet_lab.py, B=26 real bench geometry):

  no-attn        27.1 ms over-null   (UNet convs alone, ~83% MFU)
  attn-chunked   64.0 ms             (lax.map q-block chunked, the ship)
  flash          180.6 ms            (pallas flash kernel: d=32 lane
                                      padding + grid overhead — DEAD)

True attention FLOPs are ~642 G (5 ds2 calls x 112 G + 6 ds4 x 14 G;
XLA cost_analysis undercounts lax.map bodies by the trip count), so
chunked runs at ~17 TFLOP/s — under the ~25% MXU ceiling the d=32
contraction imposes, and the standalone-call sum is only ~26 ms, so
~2/3 of the in-context cost is scan/layout overhead, not math.

Variants (each patches ldm_unet.mha):

  chunked      lax.map over q blocks, [B*H, N, D] (the ship)
  unroll       python-unrolled q blocks, [B*H, N, D] (XLA pipelines)
  4d           one einsum bhqc,bhkc->bhqk per q block, unrolled —
               never flattens B*H, so the head swapaxes stays logical
  4d-bf16      4d with bf16 score buffers (halves the score transient)
  whole-4d     no chunking at all: one [B,H,N,N] score tensor (ds2:
               26*8*2048^2 f32 = 3.5 GB — expect HBM blowup; bounds
               what fusion-free XLA does)

  PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_lab.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from egregora_tpu.models.flashsr import ldm_unet
from egregora_tpu.models.flashsr.ldm_unet import LDMUNet, LDMUNetConfig
from egregora_tpu.utils.weights import fast_init_like

B, F, M = 26, 128, 64
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


def mha_chunked(q, k, v):
    from egregora_tpu.ops.attention import chunked_attention
    b, h, n, d = q.shape
    o = chunked_attention(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                          v.reshape(b * h, n, d))
    return o.reshape(b, h, n, d)


def mha_unroll(q, k, v, block=256):
    b, h, n, d = q.shape
    q = q.reshape(b * h, n, d) * (d ** -0.5)
    k = k.reshape(b * h, n, d)
    v = v.reshape(b * h, n, d)
    outs = []
    for i in range(0, n, block):
        s = jnp.einsum("bqc,bkc->bqk", q[:, i:i + block], k,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bqk,bkc->bqc", w, v))
    return jnp.concatenate(outs, axis=1).reshape(b, h, n, d)


def _mha_4d(q, k, v, block=256, score_dtype=jnp.float32):
    b, h, n, d = q.shape
    q = q * (d ** -0.5)
    outs = []
    for i in range(0, n, block):
        s = jnp.einsum("bhqc,bhkc->bhqk", q[:, :, i:i + block], k,
                       preferred_element_type=score_dtype)
        w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        outs.append(jnp.einsum("bhqk,bhkc->bhqc", w, v))
    return jnp.concatenate(outs, axis=2)


def mha_4d(q, k, v):
    return _mha_4d(q, k, v)


def mha_4d_bf16(q, k, v):
    return _mha_4d(q, k, v, score_dtype=jnp.bfloat16)


def mha_whole_4d(q, k, v):
    b, h, n, d = q.shape
    return _mha_4d(q, k, v, block=n)


def run_variant(name, mha_fn, x, t):
    model = LDMUNet(LDMUNetConfig())
    saved = ldm_unet.mha
    ldm_unet.mha = mha_fn
    try:
        params = fast_init_like(
            jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t)),
            seed=0)
        fn = jax.jit(lambda p, z, tt: model.apply(p, z, tt).sum())
        params = jax.device_put(params)
        dt = time_fn(fn, params, x, t)
        val = float(np.asarray(fn(params, x, t)))
    finally:
        ldm_unet.mha = saved
    return dt, val


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, M, 32)).astype(np.float32))
    t = jnp.ones((B,), jnp.float32)

    null = jax.jit(lambda a: a.sum())
    null_dt = time_fn(null, x)
    print(f"null dispatch: {null_dt*1e3:7.1f} ms", flush=True)

    variants = [
        ("chunked", mha_chunked),
        ("unroll", mha_unroll),
        ("4d", mha_4d),
        ("4d-bf16", mha_4d_bf16),
    ]
    base = ref = None
    for name, fn in variants:
        dt, val = run_variant(name, fn, x, t)
        over = (dt - null_dt) * 1e3
        line = f"{name:9s} {dt*1e3:7.1f} ms  over-null {over:7.1f} ms"
        if base is None:
            base, ref = over, val
        else:
            line += f"  saves {base - over:6.1f} ms  |sum d|/|sum| " \
                    f"{abs(val - ref) / (abs(ref) + 1e-9):.2e}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
