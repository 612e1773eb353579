"""FlashSR end-to-end pipeline: chunked, batched, mesh-shardable.

TPU-native counterpart of the reference's ``_FlashSRRunner`` + node
``run`` flow (``egregora_audio_super_resolution.py:254-431``):

  coerce -> resample to 48 kHz -> chunk (5.12 s win / 0.5 s overlap)
  -> model forward on ALL chunks as one sharded batch -> Hann WOLA
  stitch -> optional resample to 44.1/96 kHz.

Differences by design (SURVEY.md §7): the per-chunk Python loop with a
host<->device round trip per 5.12 s chunk (reference :410-418) becomes
ONE jitted program over a ``[K*C, win]`` batch; audio stays on device
from resample through stitch; chunks shard across the ICI mesh.

Model: mel front-end -> VAE encode -> one-step student UNet
(conditioned on the LR latent, fed a deterministic seeded noise
latent) -> VAE decode -> SR vocoder -> waveform; the observed low band
of the input is re-imposed on the output through an FFT crossover
(standard practice in diffusion audio SR so the model only contributes
the band it actually generates).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.audio import AudioBuffer
from ...ops.resample import resample
from ...ops.wola import chunk_batch, num_chunks, wola_stitch
from .ldm_unet import LDMUNet, LDMUNetConfig
from .mel import (HOP, N_MELS, SAMPLE_RATE, envelope_gain, log_mel,
                  mel_envelope_match)
from .unet import StudentUNet, UNetConfig
from .vae import MelVAE, VAEConfig
from .vocoder import VocoderConfig, build_vocoder

REQ_SR = SAMPLE_RATE                  # 48000 (reference :255)
CHUNK_S = 5.12                        # reference :256
OVERLAP_S = 0.50                      # reference :257
CHUNK_SAMPLES = int(REQ_SR * CHUNK_S)  # 245760 (reference :258)
HOP_SAMPLES = int((CHUNK_S - OVERLAP_S) * REQ_SR)  # 221760 (reference :401)
MEL_FRAMES = CHUNK_SAMPLES // HOP      # 512 frames per chunk


@dataclasses.dataclass(frozen=True)
class FlashSRConfig:
    vae: VAEConfig = VAEConfig()
    # default = the upstream UNetModel layout (what student_ldm.pth
    # converts into); the compact distilled config passes a UNetConfig
    # and gets the attention-free StudentUNet instead
    unet: object = LDMUNetConfig()
    vocoder: VocoderConfig = VocoderConfig()
    crossover_hz: float = 11000.0   # low-band preservation crossover
    noise_seed: int = 0             # deterministic one-step noise latent
    # re-impose the predicted mel envelope on the vocoder output's STFT
    # magnitude (mel.mel_envelope_match) before the crossover merge:
    # False, True (per-band gain match), or "replace" (smooth envelope
    # magnitude + vocoder phase)
    envelope_match: object = False
    # detect the input's real bandwidth per item and lower the merge
    # point to it (_bandwidth_mask_vs_pred in _postprocess); False =
    # fixed-frequency FIR crossover at crossover_hz even when the
    # input is narrower
    adaptive_crossover: bool = True


class FlashSRModules:
    """The three sub-models (mirrors the three reference checkpoints)."""

    def __init__(self, cfg: FlashSRConfig = FlashSRConfig()):
        self.cfg = cfg
        self.vae = MelVAE(cfg.vae)
        self.unet = (LDMUNet(cfg.unet) if isinstance(cfg.unet, LDMUNetConfig)
                     else StudentUNet(cfg.unet))
        self.vocoder = build_vocoder(cfg.vocoder)

    def init_params(self, seed: int = 0) -> dict:
        """Random-init parameter trio (stand-in until ``.pth`` conversion;
        the tree layout is what utils/weights.py converts into).

        Initialization runs on the host CPU backend and transfers once:
        eager per-layer init through a remote-TPU relay costs hundreds
        of round trips (measured minutes of wall clock).
        """
        def build():
            k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
            mel_img = jnp.zeros((1, MEL_FRAMES, N_MELS, 1), jnp.float32)
            z = jnp.zeros((1, MEL_FRAMES // 4, N_MELS // 4,
                           self.cfg.unet.in_channels), jnp.float32)
            mel = jnp.zeros((1, MEL_FRAMES, N_MELS), jnp.float32)
            vkw = ({"ref": jnp.zeros((1, MEL_FRAMES * 480), jnp.float32)}
                   if getattr(self.cfg.vocoder, "phase_cond", False) else {})
            return {
                "vae": self.vae.init(k1, mel_img),
                "student_ldm": self.unet.init(k2, z, jnp.zeros((1,))),
                "sr_vocoder": self.vocoder.init(k3, mel, **vkw),
            }

        from ...utils.weights import fast_init_like
        shapes = jax.eval_shape(build)
        return fast_init_like(shapes, seed)


def _fused_vocoder_enabled() -> bool:
    """Whether the HiFi-GAN path routes MRFs through the Pallas fused
    kernel (``vocoder.apply_fused``/ops/mrf_pallas.py) instead of the
    flax module (same weights, same semantics — test-pinned).

    Default is now OFF everywhere: the kernel's 4x advantage was
    measured at C=16 stages (8x NWC lane padding); at the current
    channel floor of 64 the round-4 kernel lab measured plain XLA NWC
    *faster* (33.2 vs 38.3 ms over-null at stage-2 geometry, and
    whole-vocoder 48.1 vs 56.6 — tools/mrf_kernel_lab.py), and the
    module path carries no Mosaic compile risk.
    ``EGREGORA_FUSED_VOCODER=1`` opts back in on accelerators (e.g.
    for narrow-stage configs); ``EGREGORA_NO_FUSED_VOCODER=1`` still
    forces the module path and wins when both are set."""
    import os
    if os.environ.get("EGREGORA_NO_FUSED_VOCODER"):
        return False
    if not os.environ.get("EGREGORA_FUSED_VOCODER"):
        return False
    return jax.devices()[0].platform not in ("cpu",)


def lowpass_fir(x: jnp.ndarray, sr: int, cutoff_hz: float, taps: int = 255) -> jnp.ndarray:
    """Linear-phase windowed-sinc lowpass along the last axis.

    Runs as an overlap-save Toeplitz matmul (ops/fir.py) — a 1-channel
    XLA conv never reaches the MXU (measured 260 ms vs ~2 ms per
    batch-8 chunk pair)."""
    from ...ops.fir import fir_same
    n = np.arange(taps) - (taps - 1) / 2.0
    wc = cutoff_hz / (sr / 2.0)
    h = np.sinc(wc * n) * wc * np.hamming(taps)
    h = (h / h.sum()).astype(np.float32)
    return fir_same(x, h)


def _crossover_merge(low_src: jnp.ndarray, high_src: jnp.ndarray,
                     sr: int, crossover_hz: float) -> jnp.ndarray:
    """Linear-phase FIR crossover: low band from ``low_src``, high band
    from ``high_src`` (both ``[..., T]``, same length).

    Implemented as two lowpass convs (complementary highpass = x - lp),
    which XLA maps onto the MXU — the earlier FFT brick wall needed a
    245760-point (non-pow2) native TPU FFT per chunk, a measured
    bottleneck."""
    lo = lowpass_fir(low_src, sr, crossover_hz)
    hi = high_src - lowpass_fir(high_src, sr, crossover_hz)
    return lo + hi


def _bandwidth_mask_vs_pred(rl: jnp.ndarray, il: jnp.ndarray,
                            log_mel_pred: jnp.ndarray, sr: int,
                            max_hz: float, n_fft: int,
                            delta: float = 2.0) -> jnp.ndarray:
    """Low-band weight ``[..., 1, bins]`` referenced against the
    model's own predicted mel envelope: trust the input up to the
    highest mel band whose observed level reaches the prediction
    (within ``delta`` nats), never above ``max_hz``.

    Self-calibrating per frequency, unlike a peak-relative threshold
    (an earlier ``ref - 50 dB`` rule overshot by 1-4 kHz on the STFT
    leakage skirt of brick-limited input — deleting the model's
    reconstruction there, the exact bug this merge exists to fix — and
    undershot on passbands that slope tens of dB below the spectrum's
    peak).  Degradation is bounded both ways: a garbage-quiet
    prediction makes everything active = the fixed crossover, and a
    uniformly hot prediction (nothing active) falls back to ``max_hz``
    rather than deleting the observed low band."""
    from .mel import mel_band_peaks, mel_filterbank

    n_mels = log_mel_pred.shape[-1]
    mag = jnp.sqrt(rl * rl + il * il + 1e-20)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    in_band = jnp.log(jnp.clip(mag @ fb, 1e-5, None)).mean(axis=-2)
    pred_band = log_mel_pred.mean(axis=-2)             # [..., mels]
    active = in_band > pred_band - delta
    peaks = jnp.asarray(mel_band_peaks(sr, n_fft, n_mels))
    edge_hz = jnp.max(jnp.where(active, peaks, 0.0), axis=-1, keepdims=True)
    # OOD guard (review finding): an input sitting > delta below the
    # prediction in EVERY band would give edge 0 -> w ~= 0, deleting
    # the real observed low band; fall back to the fixed crossover
    edge_hz = jnp.where(jnp.any(active, axis=-1, keepdims=True),
                        edge_hz, max_hz)
    cut = jnp.minimum(edge_hz, max_hz) / (sr / n_fft)
    nbins = n_fft // 2 + 1
    bins = jnp.arange(nbins, dtype=jnp.float32)
    return jax.nn.sigmoid((cut - bins) / 4.0)[..., None, :]


class FlashSRPipeline:
    """Jitted chunk-forward + host-side orchestration (runner analog)."""

    def __init__(self, cfg: FlashSRConfig = FlashSRConfig(), params: Optional[dict] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.modules = FlashSRModules(cfg)
        self.params = params if params is not None else self.modules.init_params(seed)

    # ---- the single-chunk-batch forward (THE flagship jit unit) ----
    def chunk_forward(self, params: dict, chunks: jnp.ndarray,
                      lowpass_input: bool = False) -> jnp.ndarray:
        """``[B, CHUNK_SAMPLES] @48k -> [B, CHUNK_SAMPLES] @48k``."""
        cfg = self.cfg
        x = chunks.astype(jnp.float32)
        if lowpass_input:
            x = lowpass_fir(x, REQ_SR, cfg.crossover_hz)

        mel = log_mel(x)[:, :MEL_FRAMES, :]          # [B, 512, 256]
        z_lr = self.modules.vae.apply(params["vae"], mel[..., None],
                                      method=MelVAE.encode)
        # one deterministic noise map broadcast over the batch: results
        # are independent of how chunks are batched (streaming == one
        # shot) and overlapping chunks see consistent noise
        noise = jax.random.normal(jax.random.PRNGKey(cfg.noise_seed),
                                  (1,) + z_lr.shape[1:], jnp.float32)
        noise = jnp.broadcast_to(noise, z_lr.shape)
        z_in = jnp.concatenate([noise, z_lr], axis=-1)
        t = jnp.ones((z_in.shape[0],), jnp.float32)
        z_hr = self.modules.unet.apply(params["student_ldm"], z_in, t)
        mel_hr = self.modules.vae.apply(params["vae"], z_hr,
                                        method=MelVAE.decode)[..., 0]
        if cfg.vocoder.kind == "hifigan" and _fused_vocoder_enabled():
            from .vocoder import apply_fused
            wav = apply_fused(params["sr_vocoder"], mel_hr, cfg.vocoder)
        elif getattr(cfg.vocoder, "phase_cond", False):
            # istft head conditioned on the input chunk's complex STFT
            # (harmonic phase extrapolation — see VocoderConfig)
            wav = self.modules.vocoder.apply(params["sr_vocoder"], mel_hr,
                                             ref=x)
        else:
            wav = self.modules.vocoder.apply(params["sr_vocoder"], mel_hr)
        wav = wav[:, :CHUNK_SAMPLES]
        return self._postprocess(x, wav, mel_hr).astype(jnp.float32)

    def _postprocess(self, x: jnp.ndarray, wav: jnp.ndarray,
                     mel_hr: jnp.ndarray) -> jnp.ndarray:
        """Envelope projection + low-band crossover merge.

        With the adaptive merge both stages share ONE analysis/
        synthesis pass: projecting the vocoder band onto the predicted
        mel envelope (mel.envelope_gain — the mel->waveform stage owns
        the pipeline's residual LSD) is a per-bin gain on the same
        spectrum the bandwidth mask blends, so running them separately
        would just pay an extra STFT + iSTFT + OLA round trip."""
        from ...ops.stft import istft_dense, stft_conv

        cfg = self.cfg
        if not cfg.adaptive_crossover:
            if cfg.envelope_match:
                wav = mel_envelope_match(wav, mel_hr,
                                         replace=cfg.envelope_match == "replace")
            return _crossover_merge(x, wav, REQ_SR, cfg.crossover_hz)

        n_fft, hop = 2048, 512
        t = x.shape[-1]
        pad = n_fft // 2
        padw = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        rl, il = stft_conv(jnp.pad(x, padw, mode="reflect"), n_fft, hop)
        rh, ih = stft_conv(jnp.pad(wav, padw, mode="reflect"), n_fft, hop)
        if cfg.envelope_match:
            g = envelope_gain(rh, ih, mel_hr, sr=REQ_SR, n_fft=n_fft, hop=hop,
                              replace=cfg.envelope_match == "replace")
            rh, ih = rh * g, ih * g
        w = _bandwidth_mask_vs_pred(rl, il, mel_hr, REQ_SR,
                                    cfg.crossover_hz, n_fft)
        y = istft_dense(rl * w + rh * (1.0 - w), il * w + ih * (1.0 - w),
                        n_fft, hop)
        return y[..., pad: pad + t]

    @functools.cached_property
    def _jit_forward(self):
        """Standalone jitted chunk forward (model-only benches/tests;
        ``process`` runs the fused whole-pipeline programs instead)."""
        return jax.jit(self.chunk_forward, static_argnames=("lowpass_input",))

    @staticmethod
    def _resolve_mesh(mesh):
        """'auto' -> a chunk mesh over all devices when >1, else None."""
        if mesh != "auto":
            return mesh
        devs = jax.devices()
        if len(devs) <= 1:
            return None
        from ...parallel.mesh import make_chunk_mesh
        return make_chunk_mesh(devs)

    def _fused_process(self, mesh, lowpass_input: bool, in_sr: int, out_sr: int,
                       pad_mult: int, wire: bool = False):
        """ONE jitted program for the whole one-shot node path:
        resample-in -> chunk -> batched forward -> WOLA stitch ->
        resample-out.

        Through a remote-TPU relay every dispatch costs ~50-60 ms fixed;
        the previous eager glue (pad/gather/stitch/resample as separate
        ops) spent more wall clock on round trips than on compute.  One
        program = one dispatch, and XLA fuses the glue into the batch
        pipeline.  Cached per (mesh, flags, rates); shapes recompile per
        input length as usual.

        ``wire=True`` compiles the pcm16-wire variant: the program takes
        int16 input and returns int16 output, so both host<->device
        transfers move 2 bytes/sample instead of 4 (core.audio pcm16
        helpers at the host edges).  Dequantize/quantize are the first/
        last fused ops; everything between is identical float32.

        The wire output is ``(int16, scale)`` with ``scale =
        max(1, peak)``: outputs exceeding full scale (the f32 path
        preserves peaks ~1.2 on hot program material) are divided down
        before the int16 cast and multiplied back at decode
        (``AudioBuffer.numpy``), instead of being silently hard-clipped
        — the reference returns unclipped float tensors
        (``egregora_audio_super_resolution.py:431``).  For peaks <= 1
        the scale is exactly 1.0 and the wire is bit-identical to the
        unscaled encoding.
        """
        if not hasattr(self, "_proc_cache"):
            self._proc_cache = {}
        key = (mesh, bool(lowpass_input), int(in_sr), int(out_sr), int(pad_mult),
               bool(wire))
        fn = self._proc_cache.get(key)
        if fn is not None:
            return fn

        def run(params, x, in_scale=None):
            if wire:
                x = x.astype(jnp.float32) * (in_scale / 32767.0)
            if in_sr != REQ_SR:
                x = resample(x, in_sr, REQ_SR)
            c, total = x.shape
            chunks, starts, lengths = chunk_batch(x, CHUNK_SAMPLES, HOP_SAMPLES,
                                                  pad_to_multiple=pad_mult)
            k = chunks.shape[0]
            flat = chunks.reshape(k * c, CHUNK_SAMPLES)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                flat = jax.lax.with_sharding_constraint(
                    flat, NamedSharding(mesh, P("chunk")))
            preds = self.chunk_forward(params, flat,
                                       lowpass_input=lowpass_input)
            preds = preds.reshape(k, c, CHUNK_SAMPLES)
            out = wola_stitch(preds, starts, lengths, total, CHUNK_SAMPLES)
            if out_sr != REQ_SR:
                out = resample(out, REQ_SR, out_sr)
            if wire:
                scale = jnp.maximum(1.0, jnp.max(jnp.abs(out)))
                out = jnp.rint(jnp.clip(out / scale, -1.0, 1.0)
                               * 32767.0).astype(jnp.int16)
                return out, scale
            return out

        fn = jax.jit(run) if wire else jax.jit(lambda params, x: run(params, x))
        self._proc_cache[key] = fn
        return fn

    # ---- full-file processing (node-facing) ----
    def process(self, audio: AudioBuffer, lowpass_input: bool = False,
                output_sr: int = 48000, pad_to_multiple: int = 1,
                max_batch: Optional[int] = None, mesh="auto",
                wire: str = "auto") -> AudioBuffer:
        """The reference node flow (``run``, :388-431) on device.

        ``mesh``: 'auto' shards the chunk batch over all devices
        (SURVEY.md §2c — chunks are this domain's sequence axis) when
        more than one is visible; pass a ``jax.sharding.Mesh`` to pin
        one, or ``None`` to force single-device.

        ``max_batch`` bounds device memory for long inputs: fixed-shape
        chunk batches stream through one compiled program and fold into
        running Hann-weighted sums (O(batch) activations, O(total)
        accumulators); None processes everything in one batch.

        ``wire``: transfer format for the host<->device edges.  "auto"
        uses pcm16 (2 bytes/sample each way, -90 dBFS quantization
        floor) when the samples are still host-resident numpy on an
        accelerator backend and the input fits the one-shot path;
        "pcm16" forces it; "f32" disables (also via ``EGREGORA_WIRE=f32``).
        The returned buffer then carries int16 wire samples —
        ``AudioBuffer.numpy()``/``to_comfy()`` dequantize on the host
        side of the transfer.

        The wire program is bit-exact with the f32 program on the
        quantized input (measured on TPU: max |delta| 0.0).  Note the
        pipeline itself is NOT sample-stable under a 1-LSB input dither
        when ``adaptive_crossover`` is on: the per-item band-edge
        detector takes a discrete max over active mel bands, so a
        borderline band can flip and move the merge edge one band —
        both outputs are equally valid reconstructions (same LSD), they
        just disagree sample-wise above the input's bandwidth.
        """
        import os

        in_sr = audio.sample_rate
        mesh = self._resolve_mesh(mesh)
        pad_mult = int(np.lcm(max(pad_to_multiple, 1), mesh.size)) if mesh else pad_to_multiple

        # host-side span count at 48 kHz decides one-shot vs streaming
        from ...ops.resample import resampled_length
        total48 = resampled_length(audio.samples.shape[-1], in_sr, REQ_SR)
        k = -(-num_chunks(total48, CHUNK_SAMPLES, HOP_SAMPLES) // pad_mult) * pad_mult

        if max_batch is None or k <= max_batch:
            env_f32 = os.environ.get("EGREGORA_WIRE", "").lower() == "f32"
            use_wire = wire == "pcm16" or (
                wire == "auto" and not env_f32
                and isinstance(audio.samples, np.ndarray)
                and jax.devices()[0].platform != "cpu")
            fn = self._fused_process(mesh, lowpass_input, in_sr, int(output_sr),
                                     pad_mult, wire=use_wire)
            if use_wire:
                from ...core.audio import pcm16_encode
                xs = np.asarray(audio.samples)
                # >1-peak inputs ride the wire divided down (mirror of
                # the output scale) — pcm16_encode would hard-clip them
                in_scale = max(1.0, float(np.max(np.abs(xs))) if xs.size else 1.0)
                x = jnp.asarray(pcm16_encode(xs / np.float32(in_scale)
                                             if in_scale != 1.0 else xs))
                meta = dict(audio.meta)
                meta["wire"] = "pcm16"
                out, scale = fn(self.params, x, jnp.float32(in_scale))
                # queue the tiny scale transfer alongside the samples so
                # decode never adds a blocking round trip; numpy()
                # resolves it lazily
                try:
                    scale.copy_to_host_async()
                except Exception:
                    pass
                meta["wire_scale"] = scale
                return AudioBuffer(out, int(output_sr), meta)
            out = fn(self.params, audio.samples)
            return AudioBuffer(out, int(output_sr), dict(audio.meta))

        # streaming: fixed-shape batches through ONE compiled per-batch
        # program (dynamic-slice the batch -> forward -> dense OLA fold
        # at a traced offset), O(batch) activations, O(total) accumulators
        from ...ops.wola import wola_finalize
        x = audio.samples
        if in_sr != REQ_SR:
            x = resample(x, in_sr, REQ_SR)
        c, total = x.shape
        b = int(max_batch)
        if mesh:
            b = -(-b // mesh.size) * mesh.size
        chunks, starts, lengths = chunk_batch(
            x, CHUNK_SAMPLES, HOP_SAMPLES,
            pad_to_multiple=int(np.lcm(pad_mult, b)))
        k = chunks.shape[0]               # multiple of b; starts = i*hop
        n_batches = k // b
        alloc = (k + 1) * HOP_SAMPLES     # covers total + last batch's span
        acc = jnp.zeros((c, alloc), jnp.float32)
        wsum = jnp.zeros((alloc,), jnp.float32)
        lengths_dev = jnp.asarray(lengths, jnp.int32)
        step = self._stream_step(mesh, lowpass_input, b)
        for i in range(n_batches):
            acc, wsum = step(self.params, chunks, lengths_dev, acc, wsum, i)
        out = wola_finalize(acc[:, :total], wsum[:total])
        if int(output_sr) != REQ_SR:
            out = resample(out, REQ_SR, int(output_sr))
        return AudioBuffer(out, int(output_sr), dict(audio.meta))

    def _stream_step(self, mesh, lowpass_input: bool, b: int):
        """One jitted streaming-batch program: slice batch ``i`` out of
        the chunk tensor (traced offset), run the forward, fold into the
        running dense-OLA accumulators.  One program serves every batch
        index and input length at a given geometry."""
        if not hasattr(self, "_stream_cache"):
            self._stream_cache = {}
        key = (mesh, bool(lowpass_input), int(b))
        fn = self._stream_cache.get(key)
        if fn is not None:
            return fn

        def run(params, chunks, lengths, acc, wsum, i):
            from ...ops.wola import wola_accumulate_dense
            c = chunks.shape[1]
            s0 = jnp.asarray(i, jnp.int32) * b
            batch = jax.lax.dynamic_slice(
                chunks, (s0, 0, 0), (b, c, CHUNK_SAMPLES))
            lens = jax.lax.dynamic_slice(lengths, (s0,), (b,))
            flat = batch.reshape(b * c, CHUNK_SAMPLES)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                flat = jax.lax.with_sharding_constraint(
                    flat, NamedSharding(mesh, P("chunk")))
            pred = self.chunk_forward(params, flat,
                                      lowpass_input=lowpass_input)
            pred = pred.reshape(b, c, CHUNK_SAMPLES)
            return wola_accumulate_dense(pred, lens, HOP_SAMPLES,
                                         acc, wsum, s0 * HOP_SAMPLES)

        fn = jax.jit(run, donate_argnums=(3, 4))
        self._stream_cache[key] = fn
        return fn
