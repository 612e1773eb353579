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

    import flax.linen as nn_

    from egregora_tpu.models.flashsr import vocoder as voc_mod

    def subpix_ct(p, x, f, k):
        """Exact nn.ConvTranspose(ch,(k,),strides=(f,)) as f-tap matmul
        slabs + shifted adds (kernel flipped, crop (k-f)//2) — verified
        max|d| 6e-8 vs flax on CPU.  One [T, ns*f*Co] einsum instead of
        a giant-kernel strided conv."""
        w = jnp.asarray(p["kernel"])[::-1].astype(x.dtype)
        b = jnp.asarray(p["bias"]).astype(x.dtype)
        ns = -(-k // f)
        wp = jnp.pad(w, ((0, ns * f - k), (0, 0), (0, 0)))
        bb, t, ci = x.shape
        co = w.shape[-1]
        z = jnp.einsum("btc,kcd->btkd", x, wp).reshape(bb, t, ns, f, co)
        full = jnp.zeros((bb, (t - 1) * f + ns * f, co), x.dtype)
        for s in range(ns):
            full = full.at[:, s * f: s * f + t * f].add(
                z[:, :, s].reshape(bb, t * f, co))
        o = (k - f) // 2
        return full[:, o: o + t * f] + b

    def subpix_fwd(p, m):
        c = cfg
        pp = p["params"]
        h = nn_.Conv(c.upsample_initial, (7,), dtype=c.dtype).apply(
            {"params": pp["Conv_0"]}, m)
        ch = c.upsample_initial
        for i, (f, k) in enumerate(zip(c.upsample_factors,
                                       c.upsample_kernels)):
            ch = max(ch // 2, c.channel_floor)
            h = nn_.leaky_relu(h, 0.1)
            h = subpix_ct(pp[f"ConvTranspose_{i}"], h, f, k)
            h = voc_mod.MRF(ch, c.resblock_kernels, c.resblock_dilations,
                            c.dtype).apply({"params": pp[f"MRF_{i}"]}, h)
        h = nn_.leaky_relu(h, 0.1)
        h = nn_.Conv(1, (7,), dtype=c.dtype).apply({"params": pp["Conv_1"]}, h)
        return jnp.tanh(h.astype(jnp.float32))[..., 0].sum()

    class _IdMRF(nn_.Module):
        channels: int
        kernels: tuple = ()
        dilations: tuple = ()
        dtype: jnp.dtype = jnp.bfloat16

        @nn_.compact
        def __call__(self, x):
            return x

    def nomrf_fwd(p, m):
        # params tree rebuilt at main level (nomrf_params); patch MRF
        # only for the trace
        saved = voc_mod.MRF
        voc_mod.MRF = _IdMRF
        try:
            return SRVocoder(cfg).apply(p, m).sum()
        finally:
            voc_mod.MRF = saved

    saved_mrf = voc_mod.MRF
    voc_mod.MRF = _IdMRF
    try:
        nomrf_params = jax.device_put(fast_init_like(
            jax.eval_shape(lambda: SRVocoder(cfg).init(
                jax.random.PRNGKey(0), mel)), seed=0))
    finally:
        voc_mod.MRF = saved_mrf

    variants = [
        ("flax-nwc", flax_fwd),
        ("subpix", subpix_fwd),
        ("no-mrf", nomrf_fwd),
        ("fused-rows", fused("rows")),
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
        pv = nomrf_params if name == "no-mrf" else params
        fl = 0.0
        try:
            ca = jf.lower(pv, mel).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
        except Exception:
            pass
        dt = time_fn(jf, pv, mel)
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
