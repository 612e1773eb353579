"""Standalone LDM-UNet ablation lab: where do the 137 ms / 29% MFU go?

The fused-pipeline ablation (tools/profile_fused_ablation.py +
tools/ablation_flops.py) pinned the UNet as the biggest low-utilization
stage of the full-config program.  This times the UNet ALONE at the
real geometry ([8, 128, 64, 32] latent, the 120 s/B=8 bench shape) with
single mechanisms ablated, so each compile is small and the relay
queue stays usable while trainers run:

  full        unmodified LDMUNet
  no-attn     attention blocks return their input (bounds attn wall)
  attn-1024   chunked attention block 256 -> 1024 (fewer serial steps)
  no-resize   nearest-resize upsample -> reshape-broadcast
  no-gn       GroupNorm -> identity (bounds normalization wall)

Each variant re-inits its own params (fast_init_like over eval_shape —
some ablations change the tree).  A null program calibrates the fixed
relay dispatch overhead out of every line.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/unet_lab.py
"""
import contextlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import flax.linen as nn

from egregora_tpu.models.flashsr import ldm_unet
from egregora_tpu.models.flashsr.ldm_unet import LDMUNet, LDMUNetConfig
from egregora_tpu.utils.weights import fast_init_like

B, F, M = 26, 128, 64   # the 120 s bench program's real chunk batch
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


@contextlib.contextmanager
def patched(**kw):
    """Temporarily replace module-level names in ldm_unet (and the nn
    alias it uses) for one variant's trace."""
    saved = {}
    for name, val in kw.items():
        obj, attr = (nn, name[3:]) if name.startswith("nn_") else \
            (ldm_unet, name)
        saved[name] = getattr(obj, attr)
        setattr(obj, attr, val)
    try:
        yield
    finally:
        for name, val in saved.items():
            obj, attr = (nn, name[3:]) if name.startswith("nn_") else \
                (ldm_unet, name)
            setattr(obj, attr, val)


class _IdGN(nn.Module):
    """GroupNorm stand-in: same call surface, no normalization work."""
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x.astype(self.dtype)


def _attn_identity(q, k, v):
    return v


def _attn_chunked(q, k, v):
    from egregora_tpu.ops.attention import chunked_attention
    b, h, n, d = q.shape
    o = chunked_attention(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                          v.reshape(b * h, n, d))
    return o.reshape(b, h, n, d)


def _attn_unroll_block(block):
    def f(q, k, v):
        from egregora_tpu.ops.attention import unrolled_attention
        b, h, n, d = q.shape
        o = unrolled_attention(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                               v.reshape(b * h, n, d), block=block)
        return o.reshape(b, h, n, d)
    return f


def _attn_bf16_scores(block=512):
    """Unrolled engine writing the raw scores in bf16 (halves the
    dominant [blk, N] HBM transient); softmax still reduces in f32."""
    def f(q, k, v):
        b, h, n, d = q.shape
        q2 = q.reshape(b * h, n, d) * (d ** -0.5)
        k2, v2 = k.reshape(b * h, n, d), v.reshape(b * h, n, d)
        outs = []
        for i in range(0, n, block):
            s = jnp.einsum("bqc,bkc->bqk", q2[:, i:i + block], k2,
                           preferred_element_type=jnp.bfloat16)
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v2.dtype)
            outs.append(jnp.einsum("bqk,bkc->bqc", w, v2))
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        return o.reshape(b, h, n, d)
    return f


def _resize_broadcast(h, shape, method="nearest"):
    b, f2, m2, c = shape
    b0, f0, m0, c0 = h.shape
    h = jnp.broadcast_to(h[:, :, None, :, None, :],
                         (b0, f0, f2 // f0, m0, m2 // m0, c0))
    return h.reshape(shape)


def run_variant(name, patches, x, t):
    model = LDMUNet(LDMUNetConfig())
    with patched(**patches):
        params = fast_init_like(
            jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t)),
            seed=0)
        fn = jax.jit(lambda p, z, tt: model.apply(p, z, tt).sum())
        params = jax.device_put(params)
        fl = 0.0
        try:
            ca = fn.lower(params, x, t).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
        except Exception:
            pass
        dt = time_fn(fn, params, x, t)
    return dt, fl


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, M, 32)).astype(np.float32))
    t = jnp.ones((B,), jnp.float32)

    null = jax.jit(lambda a: a.sum())
    null_dt = time_fn(null, x)
    print(f"null dispatch: {null_dt*1e3:7.1f} ms", flush=True)

    class _Resize:
        resize = staticmethod(_resize_broadcast)

    def _attn_pallas(q, k, v):
        from egregora_tpu.ops.attn_pallas import flash_rows
        b, h, n, d = q.shape
        o = flash_rows(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                       v.reshape(b * h, n, d))
        return o.reshape(b, h, n, d)

    variants = [
        ("full", {}),                              # unrolled attn on TPU
        ("attn-pallas", {"mha": _attn_pallas}),
        ("attn-b512", {"mha": _attn_unroll_block(512)}),
        ("attn-b2048", {"mha": _attn_unroll_block(2048)}),
        ("attn-bf16s", {"mha": _attn_bf16_scores(512)}),
        ("no-attn", {"mha": _attn_identity}),
        ("no-gn", {"nn_GroupNorm": _IdGN}),
    ]
    import types
    fake_image = types.SimpleNamespace(resize=_resize_broadcast)
    fake_jax = types.SimpleNamespace(**{**jax.__dict__, "image": fake_image})
    variants.append(("no-resize", {"jax": fake_jax}))

    only = set(sys.argv[1:])
    if only:
        variants = [v for v in variants if v[0] in only]

    base = None
    for name, patches in variants:
        dt, fl = run_variant(name, patches, x, t)
        over = (dt - null_dt) * 1e3
        mfu = 100.0 * fl / (max(over, 1e-9) * 1e-3) / 197e12
        line = (f"{name:10s} {dt*1e3:7.1f} ms  over-null {over:7.1f} ms"
                f"  flops {fl/1e9:7.1f} G  MFU {mfu:5.1f}%")
        if base is None:
            base = over
        else:
            line += f"  saves {base - over:6.1f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
