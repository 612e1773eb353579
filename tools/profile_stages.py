"""Per-stage device timing of the FULL-config FlashSR pipeline (MFU work).

Times each pipeline stage as its own jitted program on a B=8 chunk
batch, calibrated against a null program (the relay adds ~37-60 ms of
fixed dispatch overhead to every measurement; CLAUDE.md).  Run on the
TPU: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from egregora_tpu.models.flashsr.mel import log_mel
from egregora_tpu.models.flashsr.pipeline import (CHUNK_SAMPLES, MEL_FRAMES,
                                                  FlashSRConfig, FlashSRPipeline)
from egregora_tpu.models.flashsr.vae import MelVAE


def sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1])[0])


def timeit(fn, *args, n=6):
    sync(fn(*args))          # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    b = 8
    cfg = FlashSRConfig()
    pipe = FlashSRPipeline(cfg, seed=0)
    params = jax.device_put(pipe.params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, CHUNK_SAMPLES)).astype(np.float32) * 0.1)

    null = jax.jit(lambda v: v.sum())
    overhead = timeit(null, x)
    print(f"null-program dispatch overhead: {overhead*1e3:.1f} ms", flush=True)

    mel = log_mel(x)[:, :MEL_FRAMES, :]
    f_mel = jax.jit(lambda x: log_mel(x)[:, :MEL_FRAMES, :].sum())

    modules = pipe.modules
    f_enc = jax.jit(lambda p, m: modules.vae.apply(
        p["vae"], m[..., None], method=MelVAE.encode).sum())
    z = modules.vae.apply(params["vae"], mel[..., None], method=MelVAE.encode)
    noise = jax.random.normal(jax.random.PRNGKey(0), z.shape, jnp.float32)
    zi = jnp.concatenate([noise, z], axis=-1)
    t1 = jnp.ones((b,), jnp.float32)
    f_unet = jax.jit(lambda p, zi, t: modules.unet.apply(
        p["student_ldm"], zi, t).sum())
    zh = modules.unet.apply(params["student_ldm"], zi, t1)
    f_dec = jax.jit(lambda p, zh: modules.vae.apply(
        p["vae"], zh, method=MelVAE.decode).sum())
    mel_hr = modules.vae.apply(params["vae"], zh, method=MelVAE.decode)[..., 0]

    from egregora_tpu.models.flashsr.vocoder import apply_fused
    f_voc = jax.jit(lambda p, m: apply_fused(p["sr_vocoder"], m,
                                             cfg.vocoder).sum())
    f_voc_xla = jax.jit(lambda p, m: modules.vocoder.apply(
        p["sr_vocoder"], m).sum())
    wav = apply_fused(params["sr_vocoder"], mel_hr, cfg.vocoder)[:, :CHUNK_SAMPLES]
    f_post = jax.jit(lambda x, w, m: pipe._postprocess(x, w, m).sum())

    rows = [
        ("log_mel", timeit(f_mel, x)),
        ("vae_encode", timeit(f_enc, params, mel)),
        ("unet", timeit(f_unet, params, zi, t1)),
        ("vae_decode", timeit(f_dec, params, zh)),
        ("vocoder_fused", timeit(f_voc, params, mel_hr)),
        ("vocoder_xla", timeit(f_voc_xla, params, mel_hr)),
        ("postprocess", timeit(f_post, x, wav, mel_hr)),
    ]
    full = jax.jit(lambda p, x: pipe.chunk_forward(p, x).sum())
    rows.append(("FULL chunk_forward", timeit(full, params, x)))

    # --- vocoder substages (full config): which stage dominates?  The
    # C<=64 MRFs run the fused Pallas kernel; C=128/256 stay XLA NWC
    # convs — this decides whether wide-C fusion (VERDICT r3 #5) pays. ---
    import flax.linen as nn_

    from egregora_tpu.models.flashsr.vocoder import MRF
    vc = cfg.vocoder
    vp = params["sr_vocoder"]["params"]
    h = nn_.Conv(vc.upsample_initial, (7,), dtype=vc.dtype).apply(
        {"params": vp["Conv_0"]}, mel_hr)
    ch = vc.upsample_initial
    for i, (f, k) in enumerate(zip(vc.upsample_factors, vc.upsample_kernels)):
        ch = max(ch // 2, vc.channel_floor)
        ct = nn_.ConvTranspose(ch, (k,), strides=(f,), dtype=vc.dtype)
        cparams = {"params": vp[f"ConvTranspose_{i}"]}
        f_ct = jax.jit(lambda p, h, ct=ct: ct.apply(p, nn_.leaky_relu(h, 0.1)).sum())
        rows.append((f"voc_convT_{i} C{ch}", timeit(f_ct, cparams, h)))
        h = ct.apply(cparams, nn_.leaky_relu(h, 0.1))
        mrf = MRF(ch, vc.resblock_kernels, vc.resblock_dilations, vc.dtype)
        mparams = {"params": vp[f"MRF_{i}"]}
        f_mrf = jax.jit(lambda p, h, mrf=mrf: mrf.apply(p, h).sum())
        rows.append((f"voc_mrf_{i} C{ch} xla", timeit(f_mrf, mparams, h)))
        if ch <= 64:
            from egregora_tpu.ops.mrf_pallas import (mrf_fused_cm,
                                                     pack_resblock_weights)
            w = pack_resblock_weights(vp[f"MRF_{i}"], vc.resblock_kernels,
                                      vc.resblock_dilations[0], dtype=vc.dtype)
            f_mrfp = jax.jit(lambda hcm, w=tuple(w): mrf_fused_cm(
                hcm, list(w), kernels=vc.resblock_kernels,
                dilations=vc.resblock_dilations[0]).sum())
            hcm = jnp.swapaxes(h.astype(vc.dtype), -1, -2)
            rows.append((f"voc_mrf_{i} C{ch} plls", timeit(f_mrfp, hcm)))
        h = mrf.apply(mparams, h)
    f_post2 = jax.jit(lambda p, h: jnp.tanh(nn_.Conv(1, (7,), dtype=vc.dtype)
                      .apply(p, nn_.leaky_relu(h, 0.1)).astype(jnp.float32)).sum())
    rows.append(("voc_postconv", timeit(f_post2, {"params": vp["Conv_1"]}, h)))

    # --- the default-SERVED topology (istft vocoder trio) ---
    import dataclasses as dc

    from egregora_tpu.models.flashsr.vocoder import VocoderConfig
    icfg = dc.replace(cfg, vocoder=VocoderConfig(kind="istft"))
    ipipe = FlashSRPipeline(icfg, seed=0)
    iparams = jax.device_put(ipipe.params)
    f_ivoc = jax.jit(lambda p, m: ipipe.modules.vocoder.apply(
        p["sr_vocoder"], m).sum())
    rows.append(("vocoder_istft", timeit(f_ivoc, iparams, mel_hr)))
    ifull = jax.jit(lambda p, x: ipipe.chunk_forward(p, x).sum())
    rows.append(("FULL istft chunk_fwd", timeit(ifull, iparams, x)))
    from egregora_tpu.ops.stft import istft_dense
    nfft = icfg.vocoder.istft_nfft
    nb = nfft // 2 + 1
    sr_ = jax.random.normal(jax.random.PRNGKey(3),
                            (b, mel_hr.shape[1], nb), jnp.float32)
    si_ = jax.random.normal(jax.random.PRNGKey(4), sr_.shape, jnp.float32)
    f_id = jax.jit(lambda a, c: istft_dense(a, c, nfft, 480).sum())
    rows.append(("istft_dense alone", timeit(f_id, sr_, si_)))

    for name, dt in rows:
        print(f"{name:20s} {dt*1e3:8.1f} ms wall   {max(dt-overhead,0)*1e3:8.1f} ms over-null", flush=True)

    # --- dispatch-amortization probe: k back-to-back enqueues of the
    # fused 120 s pipeline, ONE sync.  If the relay pipelines enqueues,
    # total ~= latency + k*device_time and per-call wall drops below the
    # single-dispatch wall — the honest way to amortize the ~40-60 ms
    # fixed overhead out of the MFU measurement (bench.py). ---
    secs = 120
    rng2 = np.random.default_rng(4)
    x_dev = jnp.asarray((rng2.standard_normal((1, 16000 * secs)) * 0.1)
                        .astype(np.float32))
    fn = ipipe._fused_process(None, False, 16000, 48000, 1)
    red = jax.jit(lambda p, x: fn(p, x).sum())
    sync(red(iparams, x_dev))          # compile
    for k in (1, 4, 8):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [red(iparams, x_dev) for _ in range(k)]
            for o in outs:
                sync(o)
            best = min(best, (time.time() - t0) / k)
        print(f"pipelined k={k}: {best*1e3:8.1f} ms/call  "
              f"RTF {secs/best:7.1f}x", flush=True)


if __name__ == "__main__":
    main()
