"""Per-stage device timing of the fullchain program (VERDICT r3 #7).

Times each stage of bench.py::bench_fullchain as its own jitted program
on the same 30 s input, calibrated against a null program (the relay
adds ~37-60 ms fixed dispatch overhead to every measurement).  Run on
the TPU:
PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fullchain.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from egregora_tpu.eval.loudness import loudness_report
from egregora_tpu.eval.metrics import lsd_sisdr_report
from egregora_tpu.models.flashsr.distill import resolve_flashsr
from egregora_tpu.models.flashsr.pipeline import FlashSRPipeline
from egregora_tpu.models.rnnoise.model import FRAME, denoise
from egregora_tpu.nodes.enhance_extras import Egregora_RNNoise_Denoise
from egregora_tpu.ops.mix import adaptive_mix
from egregora_tpu.ops.resample import resample
from egregora_tpu.ops.spectral import spectral_enhance


def sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1] if hasattr(a, "reshape") else a)[0])


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
    in_sr, secs = 16000, 30
    use_mm = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(6)
    x16 = jnp.asarray((rng.standard_normal((1, in_sr * secs)) * 0.1)
                      .astype(np.float32))
    rn_params = jax.device_put(Egregora_RNNoise_Denoise._params())
    cfg_s, params_s, src = resolve_flashsr()
    pipe = FlashSRPipeline(cfg_s, params=params_s)
    params = jax.device_put(pipe.params)
    sr_fn = pipe._fused_process(None, False, 48000, 48000, 1)

    null = jax.jit(lambda v: v.sum())
    overhead = timeit(null, x16)
    print(f"null-program dispatch overhead: {overhead*1e3:.1f} ms", flush=True)

    x48 = resample(x16, in_sr, 48000)
    pad = (-x48.shape[1]) % FRAME
    x48p = jnp.pad(x48, ((0, 0), (0, pad)))
    wet, vads = denoise(rn_params, x48p)
    wet = wet[:, : x48.shape[1]]
    den = adaptive_mix(x48[0], wet[0], vads[0], strength=0.8,
                       mix_curve="equal_power", adaptive_mode="more_on_noise",
                       adaptive_amount=0.5, vad_threshold=0.9,
                       vad_smooth_ms=50, frame_hop=FRAME)[None]
    y48 = sr_fn(params, den)
    out96 = spectral_enhance(y48, 2, 50, 0.6, use_matmul_fft=use_mm)
    ref96 = resample(x16, in_sr, 96000)
    n = min(ref96.shape[1], out96.shape[1])

    stages = [
        ("resample_16_48", jax.jit(lambda x: resample(x, in_sr, 48000).sum()),
         (x16,)),
        ("rnnoise", jax.jit(lambda p, x: denoise(p, x)[0].sum()),
         (rn_params, x48p)),
        ("adaptive_mix", jax.jit(lambda a, w, v: adaptive_mix(
            a, w, v, strength=0.8, mix_curve="equal_power",
            adaptive_mode="more_on_noise", adaptive_amount=0.5,
            vad_threshold=0.9, vad_smooth_ms=50, frame_hop=FRAME).sum()),
         (x48[0], wet[0], vads[0])),
        ("flashsr_48_48", jax.jit(lambda p, x: sr_fn(p, x).sum()),
         (params, den)),
        ("fatllama_50it_96k", jax.jit(lambda y: spectral_enhance(
            y, 2, 50, 0.6, use_matmul_fft=use_mm).sum()),
         (y48,)),
        ("loudness_96k", jax.jit(lambda y: loudness_report(
            y, 96000)["lufs_integrated"]), (out96,)),
        ("resample_16_96", jax.jit(lambda x: resample(x, in_sr, 96000).sum()),
         (x16,)),
        ("lsd_sisdr_96k", jax.jit(lambda a, b: lsd_sisdr_report(
            a[0, :n], b[0, :n])["lsd_mean_db"]), (ref96, out96)),
    ]
    total = 0.0
    for name, fn, args in stages:
        dt = timeit(fn, *args)
        over = max(0.0, dt - overhead)
        total += over
        print(f"{name:22s} {dt*1e3:8.1f} ms wall  {over*1e3:8.1f} ms over-null",
              flush=True)
    print(f"{'SUM over-null':22s} {'':8s}        {total*1e3:8.1f} ms", flush=True)

    @jax.jit
    def chain(params, x):
        x48 = resample(x, in_sr, 48000)
        pad = (-x48.shape[1]) % FRAME
        wet, vads = denoise(rn_params, jnp.pad(x48, ((0, 0), (0, pad))))
        wet = wet[:, : x48.shape[1]]
        den = adaptive_mix(x48[0], wet[0], vads[0], strength=0.8,
                           mix_curve="equal_power",
                           adaptive_mode="more_on_noise", adaptive_amount=0.5,
                           vad_threshold=0.9, vad_smooth_ms=50,
                           frame_hop=FRAME)[None]
        y48 = sr_fn(params, den)
        out96 = spectral_enhance(y48, 2, 50, 0.6, use_matmul_fft=use_mm)
        loud = loudness_report(out96, 96000)
        ref96 = resample(x, in_sr, 96000)
        n = min(ref96.shape[1], out96.shape[1])
        m = lsd_sisdr_report(ref96[0, :n], out96[0, :n])
        return out96.sum() + loud["lufs_integrated"] + m["lsd_mean_db"]

    dt = timeit(chain, params, x16)
    print(f"{'FULL chain':22s} {dt*1e3:8.1f} ms wall  "
          f"{(dt-overhead)*1e3:8.1f} ms over-null  RTF {secs/dt:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
