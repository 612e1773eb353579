"""Stage attribution of the EXACT bench flagship program by ablation.

The per-stage profiler (tools/profile_stages.py) times each stage as
its own dispatch, so every number carries its own ±10 ms relay-overhead
calibration error and the stage sum misses the real program by ~40 ms
(round-4 session).  This tool instead compiles VARIANTS of the real
120 s fused full-config pipeline with single stages replaced by
identities (keeping data dependencies so XLA cannot dead-code-eliminate
the remaining stages) and reports wall deltas vs the full program —
the only attribution that survives relay-dispatch noise.

Run on the TPU (one compile per variant, ~10 min each through the
relay queue — schedule on a quiet TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fused_ablation.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from egregora_tpu.models.flashsr.mel import log_mel
from egregora_tpu.models.flashsr.pipeline import (CHUNK_SAMPLES, HOP_SAMPLES,
                                                  MEL_FRAMES, REQ_SR,
                                                  FlashSRConfig,
                                                  FlashSRPipeline)
from egregora_tpu.models.flashsr.vae import MelVAE
from egregora_tpu.ops.resample import resample
from egregora_tpu.ops.wola import chunk_batch, wola_stitch

SECS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
IN_SR = 16000


def _sync(a):
    a.block_until_ready()
    return float(np.asarray(a.reshape(-1)[:1])[0])


def make_forward(pipe, skip):
    """chunk_forward with the stages named in ``skip`` ablated.

    Scalar 0*sum() couplings keep skipped stages' INPUTS alive so the
    comparison isolates exactly one stage's work."""
    cfg = pipe.cfg
    modules = pipe.modules

    def fwd(params, chunks):
        x = chunks.astype(jnp.float32)
        mel = log_mel(x)[:, :MEL_FRAMES, :]
        if "vae" in skip:
            mel_hr = mel
        else:
            z_lr = modules.vae.apply(params["vae"], mel[..., None],
                                     method=MelVAE.encode)
            noise = jax.random.normal(jax.random.PRNGKey(cfg.noise_seed),
                                      (1,) + z_lr.shape[1:], jnp.float32)
            noise = jnp.broadcast_to(noise, z_lr.shape)
            z_in = jnp.concatenate([noise, z_lr], axis=-1)
            if "unet" in skip:
                # take the z_lr HALF of z_in (the noise half would let
                # XLA dead-code-eliminate the whole VAE encoder, folding
                # its cost into the "unet" delta — round-4 bug)
                z_hr = z_in[..., z_lr.shape[-1]:] * 1.0
            else:
                t = jnp.ones((z_in.shape[0],), jnp.float32)
                z_hr = modules.unet.apply(params["student_ldm"], z_in, t)
            if "dec" in skip:
                # shape-faithful stand-in for decode: nearest 4x4
                # upsample + channel mean (keeps z_hr alive, ~free)
                b2, f2, m2, c2 = z_hr.shape
                mel_hr = jnp.broadcast_to(
                    z_hr.mean(-1)[:, :, None, :, None],
                    (b2, f2, 4, m2, 4)).reshape(b2, 4 * f2, 4 * m2)
            else:
                mel_hr = modules.vae.apply(params["vae"], z_hr,
                                           method=MelVAE.decode)[..., 0]
        if "voc" in skip:
            wav = x * (1.0 + 0.0 * mel_hr.sum())
        else:
            from egregora_tpu.models.flashsr.vocoder import apply_fused
            from egregora_tpu.models.flashsr.pipeline import _fused_vocoder_enabled
            if cfg.vocoder.kind == "hifigan" and _fused_vocoder_enabled():
                wav = apply_fused(params["sr_vocoder"], mel_hr, cfg.vocoder)
            else:
                wav = modules.vocoder.apply(params["sr_vocoder"], mel_hr)
        wav = wav[:, :CHUNK_SAMPLES]
        if "post" in skip:
            return (wav * (1.0 + 0.0 * mel_hr.sum())).astype(jnp.float32)
        return pipe._postprocess(x, wav, mel_hr).astype(jnp.float32)

    return fwd


def make_program(pipe, skip):
    fwd = make_forward(pipe, skip)

    @jax.jit
    def run(params, x):
        x48 = resample(x, IN_SR, REQ_SR)
        c, total = x48.shape
        chunks, starts, lengths = chunk_batch(x48, CHUNK_SAMPLES, HOP_SAMPLES,
                                              pad_to_multiple=1)
        k = chunks.shape[0]
        flat = chunks.reshape(k * c, CHUNK_SAMPLES)
        preds = fwd(params, flat)
        preds = preds.reshape(k, c, CHUNK_SAMPLES)
        out = wola_stitch(preds, starts, lengths, total, CHUNK_SAMPLES)
        return out

    return run


def timeit(fn, params, x, n=3):
    _sync(fn(params, x))
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        _sync(fn(params, x))
        best = min(best, time.time() - t0)
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)
    params = jax.device_put(pipe.params)
    rng = np.random.default_rng(4)
    x = jnp.asarray((rng.standard_normal((1, IN_SR * SECS)) * 0.1)
                    .astype(np.float32))

    variants = [
        ("full", ()),
        ("-voc", ("voc",)),
        ("-unet", ("unet",)),
        ("-dec", ("dec",)),
        ("-vae", ("vae", "unet")),       # vae skip implies no unet input
        ("-post", ("post",)),
        ("glue-only", ("vae", "unet", "voc", "post")),
    ]
    base = None
    for name, skip in variants:
        run = make_program(pipe, frozenset(skip))
        dt = timeit(run, params, x)
        if name == "full":
            base = dt
            try:
                ca = run.lower(params, x).compile().cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                fl = float(ca.get("flops", 0.0))
                print(f"full: {dt*1e3:8.1f} ms  flops {fl/1e9:.1f} G  "
                      f"MFU {100.0*fl/dt/197e12:.1f}%", flush=True)
            except Exception as e:
                print(f"full: {dt*1e3:8.1f} ms (cost_analysis failed: {e})",
                      flush=True)
            continue
        print(f"{name:10s} {dt*1e3:8.1f} ms   stage cost {max(0.0, base-dt)*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
