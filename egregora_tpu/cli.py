"""Command-line interface.

The reference ships a vestigial ``flashsr_min.py`` CLI that never runs
the model (it pads/truncates a WAV; reference flashsr_min.py:5-26).
This CLI is the functional version, plus subcommands for the other
engines:

  python -m egregora_tpu.cli flashsr  --in a.wav --out b.wav --target-sr 48000
  python -m egregora_tpu.cli enhance  --in a.wav --out b.wav --iterations 300
  python -m egregora_tpu.cli eval     --ref a.wav --proc b.wav
  python -m egregora_tpu.cli nulltest --ref a.wav --proc b.wav
  python -m egregora_tpu.cli loudness --in a.wav
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load(path: str):
    from .core.audio import make_audio
    from .utils.wavio import read_audio
    cs, sr = read_audio(path)
    return make_audio(sr, cs)


def _save(path: str, buf) -> None:
    from .utils.wavio import write_audio
    write_audio(path, buf.numpy(), buf.sample_rate)


def cmd_flashsr(args) -> int:
    from .models.flashsr.distill import resolve_flashsr
    from .models.flashsr.pipeline import FlashSRPipeline
    buf = _load(args.infile)
    cfg, params, source = resolve_flashsr()
    print(f"[flashsr] weights: {source}")
    pipe = FlashSRPipeline(cfg, params=params)
    out = pipe.process(buf, lowpass_input=args.lowpass_input,
                       output_sr=args.target_sr)
    _save(args.outfile, out)
    print(f"[flashsr] {buf.duration_s:.2f}s @{buf.sample_rate} -> "
          f"{args.outfile} @{out.sample_rate}")
    return 0


def cmd_enhance(args) -> int:
    import jax
    from .core.audio import AudioBuffer
    from .ops.spectral import spectral_enhance, upscale_factor
    buf = _load(args.infile)
    factor = upscale_factor(buf.sample_rate, buf.channels, args.target_bitrate_kbps)
    y = spectral_enhance(buf.samples, factor, args.iterations, args.threshold,
                         use_matmul_fft=jax.default_backend() != "cpu")
    _save(args.outfile, AudioBuffer(y, buf.sample_rate * factor, {}))
    print(f"[enhance] factor {factor}, {args.iterations} iterations -> {args.outfile}")
    return 0


def cmd_eval(args) -> int:
    import jax.numpy as jnp
    from .eval.metrics import lsd_sisdr_report
    a, b = _load(args.ref), _load(args.proc)
    am, bm = jnp.mean(a.samples, 0), jnp.mean(b.samples, 0)
    n = min(am.shape[0], bm.shape[0])
    rep = lsd_sisdr_report(am[:n], bm[:n])
    print(json.dumps({k: float(v) for k, v in rep.items()}))
    return 0


def cmd_nulltest(args) -> int:
    import egregora_tpu
    from .nodes.base import comfy_audio
    a, b = _load(args.ref), _load(args.proc)
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Null Test (Full)"]()
    _m, _null, delay_ms, gain_db, metrics, *_ = node.execute(
        comfy_audio(a.sample_rate, a.numpy()),
        comfy_audio(b.sample_rate, b.numpy()),
        draw_waveforms=False, draw_spectrograms=False, draw_diffspec=False)
    metrics = dict(metrics)
    metrics["delay_ms"] = delay_ms
    metrics["gain_db"] = gain_db
    print(json.dumps({k: float(v) for k, v in metrics.items()}))
    return 0


def cmd_loudness(args) -> int:
    from .eval.loudness import loudness_report
    buf = _load(args.infile)
    rep = loudness_report(buf.samples, buf.sample_rate)
    print(json.dumps({k: float(v) for k, v in rep.items()}))
    return 0


def cmd_codec(args) -> int:
    """DAC encode->decode roundtrip (the reference's DAC node pair as a
    batch command; enhance_extras :750-857)."""
    import numpy as np

    from .core.audio import AudioBuffer
    from .models.dac.model import build_dac
    from .ops.resample import resample

    buf = _load(args.infile)
    model, params, model_sr = build_dac(args.model_type)
    x = buf.samples
    if buf.sample_rate != model_sr:
        x = resample(x, buf.sample_rate, model_sr)
    z_q, codes = model.encode(params, x)
    rec = model.decode(params, z_q)[:, : x.shape[-1]]
    out = AudioBuffer(rec, model_sr, dict(buf.meta))
    _save(args.outfile, out)
    c = np.asarray(codes)
    print(json.dumps({"model_type": args.model_type, "sample_rate": model_sr,
                      "codes_shape": list(c.shape),
                      "bitrate_kbps": round(
                          c.shape[1] * np.log2(model.cfg.codebook_size)
                          * (model_sr / model.cfg.hop) / 1000.0, 2)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="egregora_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("flashsr", help="FlashSR audio super-resolution")
    # flag names follow the reference CLI (flashsr_min.py:7-12)
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint dir override (EGREGORA_TPU_WEIGHTS)")
    p.add_argument("--in", dest="infile", required=True)
    p.add_argument("--out", dest="outfile", required=True)
    p.add_argument("--target-sr", type=int, default=48000,
                   choices=(48000, 44100, 96000))
    p.add_argument("--lowpass-input", action="store_true")
    p.add_argument("--device", default=None, help="accepted for parity; "
                   "backend selection is jax-level")
    p.set_defaults(fn=cmd_flashsr)

    p = sub.add_parser("enhance", help="Fat-Llama-style spectral enhance")
    p.add_argument("--in", dest="infile", required=True)
    p.add_argument("--out", dest="outfile", required=True)
    p.add_argument("--iterations", type=int, default=300)
    p.add_argument("--threshold", type=float, default=0.6)
    p.add_argument("--target-bitrate-kbps", type=int, default=1411)
    p.set_defaults(fn=cmd_enhance)

    p = sub.add_parser("eval", help="SI-SDR / LSD metrics")
    p.add_argument("--ref", required=True)
    p.add_argument("--proc", required=True)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("nulltest", help="align + gain match + null test")
    p.add_argument("--ref", required=True)
    p.add_argument("--proc", required=True)
    p.set_defaults(fn=cmd_nulltest)

    p = sub.add_parser("codec", help="DAC encode/decode roundtrip")
    p.add_argument("--in", dest="infile", required=True)
    p.add_argument("--out", dest="outfile", required=True)
    p.add_argument("--model-type", default="44khz",
                   choices=("44khz", "24khz", "16khz"))
    p.set_defaults(fn=cmd_codec)

    p = sub.add_parser("loudness", help="BS.1770-style loudness report")
    p.add_argument("--in", dest="infile", required=True)
    p.set_defaults(fn=cmd_loudness)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "ckpt_dir", None):
        import os
        os.environ["EGREGORA_TPU_WEIGHTS"] = args.ckpt_dir
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
