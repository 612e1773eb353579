"""Benchmark suite — prints one JSON line per metric, flagship LAST.

Flagship line (the driver records the last line): the full FlashSR
pipeline — resample 16k->48k, chunk, batched model forward, WOLA
stitch — as ONE fused device program, timed over multiple rounds (best
round reported; each round fully synced).  This is the north star's own
metric: BASELINE.json specifies "all resampling, spectral transforms,
and diffusion steps live in HBM" with host duties shrunk to decode +
weights, i.e. audio-seconds/sec of device-resident SR per chip.

Earlier lines cover the other BASELINE.json configs and the honest
host<->host edges:

  flashsr_chunk_rtf_48k    model-forward-only RTF, full config (r1-comparable)
  fatllama_ist_iters_s     config #1: IST iterations/s, 30 s 16 kHz mono
  evalpack_pairs_s         config #2: SI-SDR+LSD+LUFS on paired 48 kHz clips
  nullsuite_pairs_s        config #3: GCC-PHAT align + gain match + subtract
  rnnoise_rtf_48k          RNNoise engine on the accelerator, one program
  fullchain_rtf_96k        config #5: denoise->FlashSR->FatLlama->96 kHz
                           + eval, ONE fused device program (served weights)
  relay_d2h_MBps           measured tunnel bandwidth at bench time
  flashsr_node_rtf_48k     full node path incl. host edges THROUGH THE
                           RELAY TUNNEL, pcm16 wire both ways (served
                           weights; the tunnel moves 1-70 MB/s hour to
                           hour; on a real TPU host the same edges are
                           GB/s PCIe)
  flashsr_pipeline_mfu_pct full-config program MFU (cost-analysis FLOPs
                           / wall / v5e bf16 peak)
  flashsr_pipeline_fullcfg_rtf_48k  full-config fused pipeline (r1-r3's
                           flagship line; random-init timing standard)
  flashsr_serving_mfu_pct  MFU of the default-served (gated) pipeline
  flashsr_pipeline_rtf_48k FLAGSHIP: fused device-resident pipeline with
                           the weights the node serves by default — the
                           quality-gated shipped istft trio

vs_baseline for RTF metrics is against the 100x-per-chip north star;
throughput metrics report vs_baseline 0.0 (no published reference
number to compare against — BASELINE.json "published" is empty).
"""
from __future__ import annotations

import json
import sys
import time
import traceback

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
    # fold-domain IST (ops/spectral.py) runs ~4k iters/s on v5e — 4000
    # iters keeps the measured interval ~1 s so the ~50-60 ms relay
    # dispatch overhead stays in the noise instead of dominating
    iters = 4000
    factor = upscale_factor(sr, 1, 1411)
    use_mm = jax.devices()[0].platform not in ("cpu",)
    y = spectral_enhance(jnp.asarray(x), factor, iters, 0.6, use_matmul_fft=use_mm)
    _sync(y)  # compile
    best = 0.0
    for _ in range(2):   # best-of rounds: relay dispatch jitter is not device work
        t0 = time.time()
        y = spectral_enhance(jnp.asarray(x), factor, iters, 0.6,
                             use_matmul_fft=use_mm)
        _sync(y)
        best = max(best, iters / (time.time() - t0))
    _emit("fatllama_ist_iters_s", best, "iters_per_s", 0.0)


def bench_evalpack(jnp) -> None:
    """Config #2: fused SI-SDR/LSD + LUFS loudness on BATCHED paired
    48 kHz clips — one jitted program evaluates a whole [P, T] pair
    batch per dispatch (eval/batch.py).  Per-pair dispatch capped this
    at ~16 pairs/s against the ~60 ms relay floor three rounds running
    (VERDICT r4 #5); batching amortizes the dispatch across P pairs."""
    from egregora_tpu.eval.batch import evalpack_report_batch

    sr = 48000
    rng = np.random.default_rng(1)
    for p, emit_name in ((8, "evalpack_pairs_s_p8"), (64, "evalpack_pairs_s")):
        a = jnp.asarray(
            rng.standard_normal((p, sr * 10)).astype(np.float32) * 0.1)
        b = a + 0.01 * jnp.asarray(
            rng.standard_normal((p, sr * 10)).astype(np.float32))
        rep = evalpack_report_batch(a, b, sr)
        _sync(rep["si_sdr_db"])  # compile
        trials = 3
        t0 = time.time()
        for _ in range(trials):
            rep = evalpack_report_batch(a, b, sr)
            _sync(rep["si_sdr_db"])  # host-sync each batch, honest loop
        dt = time.time() - t0
        _emit(emit_name, trials * p / dt, "pairs_per_s", 0.0)


def bench_nullsuite(jnp) -> None:
    """Config #3: GCC-PHAT align + gain match + null subtract on a
    BATCHED [P, T] pair set — one program per batch (eval/batch.py),
    P=8 and P=64 (VERDICT r4 #5)."""
    from egregora_tpu.eval.batch import nullsuite_batch

    sr = 48000
    rng = np.random.default_rng(2)
    for p, emit_name in ((8, "nullsuite_pairs_s_p8"), (64, "nullsuite_pairs_s")):
        a = jnp.asarray(
            rng.standard_normal((p, sr * 10)).astype(np.float32) * 0.1)
        b = jnp.roll(a, 333, axis=1) * 0.8
        nulls, _ = nullsuite_batch(a, b, sr, max_shift=sr // 5)
        _sync(nulls)  # compile
        trials = 3
        t0 = time.time()
        for _ in range(trials):
            nulls, _ = nullsuite_batch(a, b, sr, max_shift=sr // 5)
            _sync(nulls)
        dt = time.time() - t0
        _emit(emit_name, trials * p / dt, "pairs_per_s", 0.0)


def bench_link(jnp) -> None:
    """Measured relay d2h bandwidth at bench time — context for the
    node-path line (the tunnel swings 1-70 MB/s hour to hour)."""
    import jax

    a = jax.random.normal(jax.random.PRNGKey(9), (2880000,), jnp.float32)
    _sync(a)
    t0 = time.time()
    y = np.asarray(a)
    dt = time.time() - t0
    _emit("relay_d2h_MBps", y.nbytes / 1e6 / dt, "MB_per_s", 0.0)


def bench_node_path(pipe, jnp) -> None:
    """Full FlashSR node flow with nothing excluded — numpy host input
    at 16 kHz, resample to 48 kHz on device, chunk, batched forward,
    WOLA stitch, host float32 out (configs #4/#5 core).  Through the
    relay tunnel the host edges dominate whenever the tunnel is slow —
    see the relay_d2h_MBps line printed just before this one."""
    from egregora_tpu.core.audio import AudioBuffer

    in_sr = 16000
    secs = 60
    rng = np.random.default_rng(3)
    x_host = (rng.standard_normal((1, in_sr * secs)) * 0.1).astype(np.float32)

    def dispatch():
        # host numpy in -> process() moves both edges as pcm16 wire
        # (2 bytes/sample; half the relay traffic of float32)
        buf = AudioBuffer(x_host, in_sr, {})
        return pipe.process(buf, lowpass_input=False, output_sr=48000,
                            max_batch=32)

    dispatch().numpy()  # compile everything + settle
    trials = 3
    rtf = 0.0
    for _ in range(2):   # best-of rounds: the tunnel's bandwidth swings
        t0 = time.time()
        outs = [dispatch() for _ in range(trials)]
        for o in outs:   # start d2h copies early; they overlap queued compute
            try:
                o.samples.copy_to_host_async()
            except Exception:
                pass
        ys = [o.numpy() for o in outs]
        dt = time.time() - t0
        assert all(np.isfinite(y).all() for y in ys)
        rtf = max(rtf, trials * secs / dt)
    _emit("flashsr_node_rtf_48k", rtf, "x_realtime_per_chip", rtf / 100.0)


def bench_rnnoise(jnp, secs: int = 60) -> None:
    """RNNoise engine RTF on the accelerator: stereo 60 s @48 kHz
    through ONE jitted program (channels vmapped through a single
    lax.scan — not per-channel dispatches).  The reference runs xiph C
    on one CPU core; this line records what the TPU path actually does
    (VERDICT r2 weak #8: previously a CPU anecdote)."""
    import jax

    from egregora_tpu.models.rnnoise.model import FRAME, denoise
    from egregora_tpu.nodes.enhance_extras import Egregora_RNNoise_Denoise

    params = Egregora_RNNoise_Denoise._params()
    sr, ch = 48000, 2
    rng = np.random.default_rng(5)
    t = sr * secs
    x = jnp.asarray((rng.standard_normal((ch, (t // FRAME) * FRAME)) * 0.1)
                    .astype(np.float32))

    # throughput mode: the frame recurrence runs as 16 parallel segment
    # scans with a 1 s warm-up halo (segment 0 exact; boundary diff SNR
    # ~55-60 dB, tests/test_rnnoise_restructure.py) — the sequential GRU
    # latency was the dominant stage of the whole fullchain
    run = jax.jit(lambda p, x: denoise(p, x, segments=16)[0])
    _sync(run(params, x))                   # compile
    best = 0.0
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _sync(run(params, x))
        dt = time.time() - t0
        best_dt = min(best_dt, dt)
        best = max(best, secs / dt)
    _emit_cost_mfu(lambda: run.lower(params, x).compile().cost_analysis(),
                   best_dt, "rnnoise_mfu_pct")
    _emit("rnnoise_rtf_48k", best, "x_realtime_per_chip", 0.0)


def bench_dfn(jnp, secs: int = 60) -> None:
    """DeepFilterNet2 engine RTF on the accelerator: mono 60 s @48 kHz
    through the jitted enhance path (conv enc/dec batched over frames,
    GRU x-projections hoisted out of the scans — models/deepfilternet).
    The reference runs the torch DeepFilterNet on CPU/CUDA; this line
    records the TPU engine."""
    import jax

    from egregora_tpu.models.deepfilternet.model import DFNConfig, enhance
    from egregora_tpu.nodes.enhance_extras import Egregora_DeepFilterNet_Denoise

    params = Egregora_DeepFilterNet_Denoise._params("DeepFilterNet2")
    sr = 48000
    rng = np.random.default_rng(9)
    x = jnp.asarray((rng.standard_normal((1, sr * secs)) * 0.1)
                    .astype(np.float32))
    cfg = DFNConfig.for_variant("DeepFilterNet2")
    run = jax.jit(lambda p, x: enhance(p, x, cfg))
    _sync(run(params, x))                   # compile
    best = 0.0
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _sync(run(params, x))
        dt = time.time() - t0
        best_dt = min(best_dt, dt)
        best = max(best, secs / dt)
    _emit_cost_mfu(lambda: run.lower(params, x).compile().cost_analysis(),
                   best_dt, "dfn2_mfu_pct")
    _emit("dfn2_rtf_48k", best, "x_realtime_per_chip", 0.0)


def bench_fullchain(pipe, jnp, secs: int = 120) -> None:
    """Config #5 (the last BASELINE config without a machine-readable
    number): denoise -> FlashSR -> Fat Llama light pass -> 96 kHz
    delivery + eval metrics, fused into ONE device program (audio never
    leaves HBM between stages; the reference crosses process<->
    filesystem twice per Fat Llama call alone).  120 s window: the r3
    30 s program ran ~0.34 s of which ~50-60 ms was fixed relay
    dispatch latency — ~17% of the measurement was not device work."""
    import jax

    from egregora_tpu.eval.loudness import loudness_report
    from egregora_tpu.eval.metrics import lsd_sisdr_report
    from egregora_tpu.models.rnnoise.model import FRAME, denoise
    from egregora_tpu.nodes.enhance_extras import Egregora_RNNoise_Denoise
    from egregora_tpu.ops.mix import adaptive_mix
    from egregora_tpu.ops.resample import resample
    from egregora_tpu.ops.spectral import spectral_enhance

    rn_params = Egregora_RNNoise_Denoise._params()
    in_sr = 16000
    use_mm = jax.devices()[0].platform not in ("cpu",)
    rng = np.random.default_rng(6)
    x16 = jnp.asarray((rng.standard_normal((1, in_sr * secs)) * 0.1)
                      .astype(np.float32))
    sr_fn = pipe._fused_process(None, False, 48000, 48000, 1)

    @jax.jit
    def chain(params, x):
        x48 = resample(x, in_sr, 48000)
        pad = (-x48.shape[1]) % FRAME
        # segmented frame recurrence (throughput mode): RNNoise's
        # sequential GRU latency was 53 ms of this chain's 119 ms
        # device time at 30 s (PARITY.md stage table)
        wet, vads = denoise(rn_params, jnp.pad(x48, ((0, 0), (0, pad))),
                            segments=16)
        wet = wet[:, : x48.shape[1]]
        den = adaptive_mix(x48[0], wet[0], vads[0], strength=0.8,
                           mix_curve="equal_power",
                           adaptive_mode="more_on_noise", adaptive_amount=0.5,
                           vad_threshold=0.9, vad_smooth_ms=50,
                           frame_hop=FRAME)[None]
        y48 = sr_fn(params, den)
        # matmul-FFT path on accelerators, as the node layer does — the
        # native TPU FFT on a 2.88M non-pow2 signal is a measured trap
        # (first fullchain run: 4.1x RTF; everything else summed <1 s)
        out96 = spectral_enhance(y48, 2, 50, 0.6, use_matmul_fft=use_mm)
        loud = loudness_report(out96, 96000)
        ref96 = resample(x, in_sr, 96000)
        n = min(ref96.shape[1], out96.shape[1])
        m = lsd_sisdr_report(ref96[0, :n], out96[0, :n])
        return out96.sum() + loud["lufs_integrated"] + m["lsd_mean_db"]

    _sync(chain(pipe.params, x16))          # compile + settle
    best = 0.0
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _sync(chain(pipe.params, x16))
        dt = time.time() - t0
        best_dt = min(best_dt, dt)
        best = max(best, secs / dt)
    _emit_cost_mfu(lambda: chain.lower(pipe.params, x16).compile()
                   .cost_analysis(), best_dt, "fullchain_mfu_pct")
    _emit("fullchain_rtf_96k", best, "x_realtime_per_chip", 0.0)


# TPU v5e (v5 lite) peak dense bf16 throughput per chip.
_V5E_PEAK_FLOPS = 197e12


def _emit_cost_mfu(cost_analysis_fn, best_dt: float, metric: str,
                   extra_flops: float = 0.0) -> None:
    """MFU line from an XLA cost analysis (flops / wall / v5e bf16
    peak); failures emit a parseable `<metric>_failed` line instead of
    killing the bench.  ``extra_flops`` adds FLOPs XLA cannot see —
    Pallas custom calls report zero (ops/attn_pallas.FLOP_LOG carries
    the attention kernel's true count)."""
    try:
        ca = cost_analysis_fn()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) + float(extra_flops)
        if flops > 0:
            _emit(metric, 100.0 * flops / best_dt / _V5E_PEAK_FLOPS,
                  "pct_of_v5e_bf16_peak", 0.0)
    except Exception as e:
        _emit(f"{metric}_failed", 0.0, f"error:{type(e).__name__}", 0.0)


def _time_fused(pipe, jnp, x_dev, secs: int, rounds: int = 3):
    """(best_rtf, best_dt, red_fn): compile + time the fused pipeline."""
    import jax

    fn = pipe._fused_process(None, False, 16000, 48000, 1)
    red = jax.jit(lambda p, x: fn(p, x).sum())
    _sync(red(pipe.params, x_dev))          # compile + settle
    best_dt = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        _sync(red(pipe.params, x_dev))
        best_dt = min(best_dt, time.time() - t0)
    return secs / best_dt, best_dt, red


def _emit_mfu(red, pipe, x_dev, best_dt: float, metric: str,
              extra_flops: float = 0.0) -> None:
    _emit_cost_mfu(lambda: red.lower(pipe.params, x_dev).compile()
                   .cost_analysis(), best_dt, metric, extra_flops)


def bench_device_pipeline(pipe, jnp) -> None:
    """Full-config timing standard: the fused pipeline (resample
    16k->48k -> chunk -> batched forward -> WOLA stitch) as one
    device-resident program at the FULL FlashSRConfig geometry
    (random-init; the layout real converted checkpoints load into).
    Comparable across rounds — r1-r3's flagship line.  Each round is
    fully synced via a 4-byte reduction transfer; best of 3 reported
    (the relay adds variable per-dispatch latency that is not device
    work).  Also emits this program's MFU (XLA cost-analysis FLOPs /
    wall / v5e bf16 peak).

    Stays at 120 s: 240 s doubles the chunk batch to 52 and the
    HiFi-GAN MRF's NWC intermediates (bf16[52,245760,64], 2.2x lane
    padding) blow the 16G HBM (measured: 19.9G).  Instead the fixed
    relay dispatch latency — ~37-60 ms of every dispatch that is relay
    infrastructure, not device work (PARITY.md ablation) — is measured
    IN THIS RUN via a null program and reported as its own metric; the
    headline MFU uses the dispatch-corrected wall, the raw-wall value
    ships alongside."""
    import jax

    in_sr = 16000
    secs = 120
    rng = np.random.default_rng(4)
    x_dev = jnp.asarray((rng.standard_normal((1, in_sr * secs)) * 0.1)
                        .astype(np.float32))

    from egregora_tpu.ops import attn_pallas
    n0 = len(attn_pallas.FLOP_LOG)
    rtf, best_dt, red = _time_fused(pipe, jnp, x_dev, secs)
    # Pallas attention FLOPs logged while _time_fused's first call
    # traced the program (XLA cost_analysis sees zero for custom calls)
    attn_fl = float(sum(attn_pallas.FLOP_LOG[n0:]))

    # measured null-dispatch floor: same sync discipline, ~zero device work
    null = jax.jit(lambda x: x.sum())
    tiny = jnp.zeros((8,), jnp.float32)
    _sync(null(tiny))
    null_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sync(null(tiny))
        null_dt = min(null_dt, time.time() - t0)
    _emit("relay_dispatch_ms", null_dt * 1e3, "ms_fixed_per_dispatch", 0.0)

    _emit_mfu(red, pipe, x_dev, max(best_dt - null_dt, 1e-6),
              "flashsr_pipeline_mfu_pct", extra_flops=attn_fl)
    _emit_mfu(red, pipe, x_dev, best_dt, "flashsr_pipeline_mfu_raw_pct",
              extra_flops=attn_fl)

    try:
        bench_istft_pipeline(pipe, jnp, x_dev, secs)
    except Exception as e:
        _emit("flashsr_pipeline_istft_rtf_48k_failed", 0.0,
              f"error:{type(e).__name__}", 0.0)

    _emit("flashsr_pipeline_fullcfg_rtf_48k", rtf, "x_realtime_per_chip",
          rtf / 100.0)


def bench_serving_pipeline(spipe, jnp) -> None:
    """FLAGSHIP (emitted LAST): the fused device-resident pipeline with
    the weights the node actually serves by default — the GATED shipped
    istft trio (resolve_flashsr; LSD 4.91-5.73 on every eval seed,
    pretrained_istft.json).  This is the north-star metric on the real
    product path: quality-gated weights, everything in HBM (VERDICT r3
    next #1: 'make the istft trio the flagship').  The full-config
    timing standard stays as flashsr_pipeline_fullcfg_rtf_48k above.

    Timed on a 480 s input: at these speeds a 120 s program finishes in
    ~0.25 s of which ~60 ms is fixed relay dispatch latency (not device
    work) — the longer window measures SUSTAINED throughput/MFU with
    the fixed latency amortized to <6%."""
    in_sr = 16000
    secs = 480
    rng = np.random.default_rng(4)
    x_dev = jnp.asarray((rng.standard_normal((1, in_sr * secs)) * 0.1)
                        .astype(np.float32))
    rtf, best_dt, red = _time_fused(spipe, jnp, x_dev, secs)
    _emit_mfu(red, spipe, x_dev, best_dt, "flashsr_serving_mfu_pct")
    src = getattr(spipe, "weight_source", "?")
    _emit(f"flashsr_serving_weights_{src}", 1.0, "provenance", 0.0)
    _emit("flashsr_pipeline_rtf_48k", rtf, "x_realtime_per_chip", rtf / 100.0)


def bench_istft_pipeline(pipe, jnp, x_dev, secs: int, vcfg=None) -> None:
    """Same fused pipeline with the complex-spectrum SpectralVocoder
    head (vocoder kind="istft": ConvNeXt backbone at 100 Hz frame rate
    + one iDFT matmul) in place of the HiFi-GAN generator — the
    vocoder is the dominant stage of the default config, so this line
    shows what the Vocos-style head buys.  Timing-only: weights are
    the same random-init standard as the flagship line."""
    import dataclasses as dc

    import jax

    from egregora_tpu.models.flashsr.pipeline import FlashSRPipeline
    from egregora_tpu.models.flashsr.vocoder import VocoderConfig

    cfg = dc.replace(pipe.cfg, vocoder=vcfg or VocoderConfig(kind="istft"))
    ipipe = FlashSRPipeline(cfg, seed=0)
    fn = ipipe._fused_process(None, False, 16000, 48000, 1)
    red = jax.jit(lambda p, x: fn(p, x).sum())
    _sync(red(ipipe.params, x_dev))         # compile + settle
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sync(red(ipipe.params, x_dev))
        best_dt = min(best_dt, time.time() - t0)
    _emit("flashsr_pipeline_istft_rtf_48k", secs / best_dt,
          "x_realtime_per_chip", (secs / best_dt) / 100.0)


def _probe_backend(q) -> None:  # subprocess target (spawn-safe, module-level)
    import os

    import jax

    # sitecustomize's register() pins jax_platforms="axon,cpu" via
    # jax.config at interpreter start, which OVERRIDES the env var —
    # re-apply the env so the probe respects JAX_PLATFORMS=cpu (tests).
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        jax.config.update("jax_platforms", plats)
    q.put(jax.devices()[0].platform)


def _backend_watchdog(timeout_s: float = 900.0) -> bool:
    """True if the configured jax backend answers device enumeration.

    The axon relay terminal can wedge (a client killed mid-remote-
    compile leaves ``jax.devices()`` hanging for every process —
    observed 2026-08-17, >90 min).  Probing in a *subprocess* keeps the
    hang out of this process so the driver's bench run fails loudly in
    ``timeout_s`` with a parseable JSON line instead of hanging the
    round.  Only the probe child is killed (by PID) — it is blocked at
    device enumeration, not mid-compile, so the kill cannot wedge the
    relay further (the recovery probe loop does the same every 5 min).
    """
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe_backend, args=(q,), daemon=True)
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(10)
        _emit("backend_unreachable", 0.0,
              f"jax.devices() no answer in {timeout_s:.0f}s "
              "(relay wedged?)", 0.0)
        return False
    return True


def main() -> None:
    if not _backend_watchdog():
        return

    import jax
    import jax.numpy as jnp

    from egregora_tpu.models.flashsr.distill import resolve_flashsr
    from egregora_tpu.models.flashsr.pipeline import FlashSRConfig, FlashSRPipeline

    pipe = FlashSRPipeline(FlashSRConfig(), seed=0)   # full-config standard
    # the default-served pipeline (gated shipped weights) — what the
    # node/user path actually runs; node/fullchain/flagship lines use it
    cfg_s, params_s, src = resolve_flashsr()
    spipe = FlashSRPipeline(cfg_s, params=params_s)
    spipe.weight_source = src

    for fn, args in ((bench_chunk_forward, (pipe, jnp)),
                     (bench_fatllama, (jnp,)),
                     (bench_evalpack, (jnp,)),
                     (bench_nullsuite, (jnp,)),
                     (bench_rnnoise, (jnp,)),
                     (bench_dfn, (jnp,)),
                     (bench_fullchain, (spipe, jnp)),
                     (bench_link, (jnp,)),
                     (bench_node_path, (spipe, jnp)),
                     (bench_device_pipeline, (pipe, jnp))):
        try:
            fn(*args)
        except Exception as e:  # a sub-bench must not kill the flagship line
            _emit(f"{fn.__name__}_failed", 0.0, f"error:{type(e).__name__}", 0.0)
            # the JSON line only carries the type; put the evidence on
            # stderr (the r4a fullchain HTTP-413 failure cost a
            # reproduce-from-scratch to see the message)
            traceback.print_exc(file=sys.stderr)

    bench_serving_pipeline(spipe, jnp)


if __name__ == "__main__":
    main()
