"""Full production chain (BASELINE.json config #5):

  denoise (RNNoise) -> FlashSR super-resolution -> Fat Llama light pass
  -> 96 kHz delivery + on-device evaluation (loudness, SI-SDR vs input,
  null-test against the pre-enhance signal).

Audio stays on device between stages (no temp-file round trips — the
reference crosses process<->filesystem twice per Fat Llama call alone).

Usage: python examples/full_chain.py input.wav output_96k.wav
"""
import json
import sys
import time

import jax.numpy as jnp
import numpy as np

from egregora_tpu.core.audio import AudioBuffer, make_audio
from egregora_tpu.eval.loudness import loudness_report
from egregora_tpu.eval.metrics import lsd_sisdr_report
from egregora_tpu.models.flashsr.pipeline import FlashSRPipeline
from egregora_tpu.models.rnnoise.model import FRAME, denoise
from egregora_tpu.ops.mix import adaptive_mix
from egregora_tpu.ops.resample import resample
from egregora_tpu.ops.spectral import spectral_enhance, upscale_factor
from egregora_tpu.utils.wavio import read_audio, write_audio


def main(in_path: str, out_path: str) -> None:
    t0 = time.time()
    cs, sr = read_audio(in_path)
    audio = make_audio(sr, cs)
    print(f"[load] {audio.duration_s:.1f}s @{sr} ({audio.channels} ch)")

    # 1) denoise at 48 kHz with VAD-adaptive mix
    from egregora_tpu.nodes.enhance_extras import Egregora_RNNoise_Denoise
    rn_params = Egregora_RNNoise_Denoise._params()   # shipped weights
    x48 = resample(audio.samples, sr, 48000) if sr != 48000 else audio.samples
    pad = (-x48.shape[1]) % FRAME
    wet, vads = denoise(rn_params, jnp.pad(x48, ((0, 0), (0, pad))))
    wet = wet[:, : x48.shape[1]]
    den = jnp.stack([
        adaptive_mix(x48[c], wet[c], vads[c], strength=0.8,
                     mix_curve="equal_power", adaptive_mode="more_on_noise",
                     adaptive_amount=0.5, vad_threshold=0.9, vad_smooth_ms=50)
        for c in range(x48.shape[0])])
    print(f"[denoise] done ({time.time()-t0:.1f}s)")

    # 2) FlashSR chunked super-resolution (stays at 48 kHz); real
    # converted checkpoints > shipped distilled > random (loud warning)
    from egregora_tpu.models.flashsr.distill import resolve_flashsr
    cfg, params, source = resolve_flashsr()
    print(f"[flashsr] weights: {source}")
    pipe = FlashSRPipeline(cfg, params=params)
    sr_out = pipe.process(AudioBuffer(den, 48000, {}), output_sr=48000,
                          max_batch=8)
    print(f"[flashsr] done ({time.time()-t0:.1f}s)")

    # 3) Fat Llama light pass (few iterations), then 96 kHz delivery
    import jax
    use_mm = jax.devices()[0].platform not in ("cpu",)
    factor = max(2, upscale_factor(48000, sr_out.channels, 1411))
    enh = spectral_enhance(sr_out.samples, factor, 50, 0.6,
                           use_matmul_fft=use_mm)
    out96 = resample(enh, 48000 * factor, 96000)
    print(f"[enhance] factor {factor} -> 96 kHz ({time.time()-t0:.1f}s)")

    # 4) evaluation, all on device
    rep = loudness_report(out96, 96000)
    ref96 = resample(audio.samples, sr, 96000)
    n = min(ref96.shape[1], out96.shape[1])
    m = lsd_sisdr_report(jnp.mean(ref96[:, :n], 0), jnp.mean(out96[:, :n], 0))
    metrics = {**{k: float(v) for k, v in rep.items()},
               **{k: float(v) for k, v in m.items()},
               "wall_s": round(time.time() - t0, 2),
               "realtime_factor": round(audio.duration_s / (time.time() - t0), 2)}
    print(json.dumps(metrics, indent=2))

    write_audio(out_path, np.asarray(out96), 96000)
    print(f"[save] {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
