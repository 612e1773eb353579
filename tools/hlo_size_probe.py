"""Measure the serialized-HLO size of the fullchain bench program and
report the largest embedded literals.

The relay's /remote_compile endpoint buffers the whole request body and
rejects it over a size limit (observed HTTP 413 for the 120 s fullchain
program, bench run r4a).  Big literals come from numpy constants closed
over / built at trace time.  Run on CPU; lowering is platform-agnostic
enough for a size census.
"""
import re
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SECS = int(sys.argv[1]) if len(sys.argv) > 1 else 120


def main():
    from egregora_tpu.eval.loudness import loudness_report
    from egregora_tpu.eval.metrics import lsd_sisdr_report
    from egregora_tpu.models.rnnoise.model import FRAME, denoise
    from egregora_tpu.nodes.enhance_extras import Egregora_RNNoise_Denoise
    from egregora_tpu.ops.mix import adaptive_mix
    from egregora_tpu.ops.resample import resample
    from egregora_tpu.ops.spectral import spectral_enhance
    from egregora_tpu.models.flashsr.distill import resolve_flashsr
    from egregora_tpu.models.flashsr.pipeline import FlashSRPipeline

    cfg_s, params_s, src = resolve_flashsr()
    pipe = FlashSRPipeline(cfg_s, params=params_s)
    rn_params = Egregora_RNNoise_Denoise._params()
    in_sr = 16000
    x16 = jnp.zeros((1, in_sr * SECS), jnp.float32)
    sr_fn = pipe._fused_process(None, False, 48000, 48000, 1)

    @jax.jit
    def chain(params, x):
        x48 = resample(x, in_sr, 48000)
        pad = (-x48.shape[1]) % FRAME
        wet, vads = denoise(rn_params, jnp.pad(x48, ((0, 0), (0, pad))))
        wet = wet[:, : x48.shape[1]]
        den = adaptive_mix(x48[0], wet[0], vads[0], strength=0.8,
                           mix_curve="equal_power",
                           adaptive_mode="more_on_noise",
                           adaptive_amount=0.5,
                           vad_threshold=0.9, vad_smooth_ms=50,
                           frame_hop=FRAME)[None]
        y48 = sr_fn(params, den)
        out96 = spectral_enhance(y48, 2, 50, 0.6, use_matmul_fft=True)
        loud = loudness_report(out96, 96000)
        ref96 = resample(x, in_sr, 96000)
        n = min(ref96.shape[1], out96.shape[1])
        m = lsd_sisdr_report(ref96[0, :n], out96[0, :n])
        return out96.sum() + loud["lufs_integrated"] + m["lsd_mean_db"]

    lowered = chain.lower(pipe.params, x16)
    txt = lowered.as_text()
    print(f"HLO text bytes: {len(txt)/1e6:.1f} MB")
    # census: dense<...> literal payloads by tensor type
    sizes = {}
    for mt in re.finditer(r"dense<[^>]{1,80000000}?> : tensor<([^>]+)>", txt):
        shape = mt.group(1)
        dims = re.findall(r"(\d+)x", shape + "x")
        n = 1
        for d in re.findall(r"(\d+)(?=x)", shape):
            n *= int(d)
        bytes_per = 4
        if "f64" in shape or "i64" in shape or "complex64" in shape:
            bytes_per = 8
        elif "bf16" in shape or "f16" in shape or "i16" in shape:
            bytes_per = 2
        elif "i8" in shape:
            bytes_per = 1
        sizes[shape] = sizes.get(shape, 0) + n * bytes_per
    top = sorted(sizes.items(), key=lambda kv: -kv[1])[:20]
    total = sum(sizes.values())
    print(f"total literal payload (approx): {total/1e6:.1f} MB")
    for shape, b in top:
        print(f"  {b/1e6:9.2f} MB  tensor<{shape}>")


if __name__ == "__main__":
    main()
