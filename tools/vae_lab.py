"""Standalone MelVAE encode/decode ablation lab at the bench geometry.

After round 5 broke the UNet wall (pallas attention), the quiet B=8
stage profile puts the VAE at enc 14.9 / dec 22.9 ms over-null — the
decoder is now the second-biggest stage after the HiFi-GAN vocoder.
This times encode and decode ALONE at the real 120 s/B=26 bench shape
([26, 512, 256, 1] mel image) with single mechanisms ablated:

  dec-full      unmodified Decoder (incl. mid attention)
  dec-no-gn     GroupNorm -> identity (bounds normalization wall)
  dec-no-attn   mid attention -> identity (bounds the N=8192 attn)
  dec-no-resize nearest-resize upsample -> reshape-broadcast
  enc-full      unmodified Encoder

A null program calibrates the fixed relay dispatch overhead out of
every line.  Run on a QUIET TPU (trainer-sharing pollutes 2-5x).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/vae_lab.py [names...]
"""
import contextlib
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import flax.linen as nn

from egregora_tpu.models.flashsr import vae as vae_mod
from egregora_tpu.models.flashsr.vae import MelVAE, VAEConfig
from egregora_tpu.utils.weights import fast_init_like

B, F, M = 26, 512, 256   # the 120 s bench program's real chunk batch
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
    saved = {}
    for name, val in kw.items():
        obj, attr = (nn, name[3:]) if name.startswith("nn_") else \
            (vae_mod, name)
        saved[name] = getattr(obj, attr)
        setattr(obj, attr, val)
    try:
        yield
    finally:
        for name, val in saved.items():
            obj, attr = (nn, name[3:]) if name.startswith("nn_") else \
                (vae_mod, name)
            setattr(obj, attr, val)


class _IdGN(nn.Module):
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x.astype(self.dtype)


class _IdAttn(nn.Module):
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return x


def _resize_broadcast(h, shape, method="nearest"):
    b0, f0, m0, c0 = h.shape
    b, f2, m2, c = shape
    h = jnp.broadcast_to(h[:, :, None, :, None, :],
                         (b0, f0, f2 // f0, m0, m2 // m0, c0))
    return h.reshape(shape)


def main():
    import types

    print("devices:", jax.devices(), flush=True)
    cfg = VAEConfig()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, F, M, 1)).astype(np.float32))
    zs = jnp.asarray(rng.standard_normal(
        (B, F // 4, M // 4, cfg.latent_channels)).astype(np.float32))

    null = jax.jit(lambda a: a.sum())
    null_dt = time_fn(null, mel)
    print(f"null dispatch: {null_dt*1e3:7.1f} ms", flush=True)

    fake_image = types.SimpleNamespace(resize=_resize_broadcast)
    fake_jax = types.SimpleNamespace(**{**jax.__dict__, "image": fake_image})

    variants = [
        ("dec-full", "dec", {}),
        ("dec-no-gn", "dec", {"nn_GroupNorm": _IdGN}),
        ("dec-no-attn", "dec", {"AttnBlock2D": _IdAttn}),
        ("dec-no-resize", "dec", {"jax": fake_jax}),
        ("enc-full", "enc", {}),
        ("enc-no-gn", "enc", {"nn_GroupNorm": _IdGN}),
        ("enc-no-attn", "enc", {"AttnBlock2D": _IdAttn}),
    ]
    only = set(sys.argv[1:])
    if only:
        variants = [v for v in variants if v[0] in only]

    base = {"dec": None, "enc": None}
    for name, kind, patches in variants:
        model = MelVAE(cfg)
        with patched(**patches):
            params = fast_init_like(
                jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mel)),
                seed=0)
            params = jax.device_put(params)
            if kind == "dec":
                fn = jax.jit(lambda p, z: model.apply(
                    p, z, method=MelVAE.decode).sum())
                arg = zs
            else:
                fn = jax.jit(lambda p, m: model.apply(
                    p, m, method=MelVAE.encode).sum())
                arg = mel
            fl = 0.0
            try:
                ca = fn.lower(params, arg).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                fl = float(ca.get("flops", 0.0))
            except Exception:
                pass
            dt = time_fn(fn, params, arg)
        over = (dt - null_dt) * 1e3
        mfu = 100.0 * fl / (max(over, 1e-9) * 1e-3) / 197e12
        line = (f"{name:14s} {dt*1e3:7.1f} ms  over-null {over:7.1f} ms"
                f"  flops {fl/1e9:7.1f} G  MFU {mfu:5.1f}%")
        if base[kind] is None:
            base[kind] = over
        else:
            line += f"  saves {base[kind] - over:7.1f} ms"
        print(line, flush=True)


if __name__ == "__main__":
    main()
