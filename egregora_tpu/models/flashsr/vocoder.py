"""SR vocoder (``sr_vocoder.pth`` equivalent): mel -> 48 kHz waveform.

HiFi-GAN-family generator matching the FlashSR stack's third
checkpoint (reference loads it at
``egregora_audio_super_resolution.py:350-353``): transposed-conv
upsampling through the 480x hop (10*8*6) with multi-receptive-field
(MRF) residual stacks between stages.

TPU-first choices: 1-D convs carried as NWC (XLA's native 1-D conv
layout), bf16 compute, channel floor of 64 (vanilla HiFi-GAN decay;
a 128 floor was tried to keep MXU lanes full but quadruples the
dominant full-rate stage's FLOPs for only 2x utilization — measured
net slower).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    n_mels: int = 256
    upsample_initial: int = 512
    upsample_factors: Sequence[int] = (10, 8, 6)   # product == hop 480
    upsample_kernels: Sequence[int] = (20, 16, 12)
    resblock_kernels: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    channel_floor: int = 64
    dtype: jnp.dtype = jnp.bfloat16
    # ---- complex-spectrum ("istft") variant (SpectralVocoder) ----
    # kind="hifigan" is the upstream sr_vocoder.pth layout; "istft" is
    # the TPU-first head: all compute at 100 Hz frame rate + one iDFT
    # matmul, instead of transposed-conv stacks at 48 kHz sample rate.
    kind: str = "hifigan"
    hidden: int = 256            # istft backbone width
    depth: int = 6               # istft ConvNeXt-1D blocks
    mlp_ratio: int = 3
    istft_nfft: int = 1920       # 4 * hop(480) -> slice-add OLA
    # condition the istft head on the INPUT chunk's complex STFT (round
    # 5): a mel-only vocoder invents phase, so its high band is
    # uncorrelated with the truth and always loses SI-SDR to the LR
    # passthrough; with the input's low-band phase in view, harmonic
    # phase extrapolation becomes learnable.
    phase_cond: bool = False
    # exciter phase candidates (round 5, needs phase_cond): the u^2/u^3
    # per-bin candidates only cover harmonics whose half/third falls in
    # the observed band — odd-prime harmonics (7th, 11th, 13th ...) have
    # none, and the phase of u_a*conj(u_b) cross-products is not
    # representable from per-bin features.  The time-domain squares
    # x^2 / x^3 of the input generate ALL sum-frequency products
    # f_i + f_j (+ f_k) phase-locked to the source — the classic
    # harmonic-exciter trick — so their STFT phasors give every
    # coherent-stack harmonic a candidate, tracking vibrato/AM for free.
    exciter: bool = False


class ResBlock1D(nn.Module):
    channels: int
    kernel: int
    dilations: Sequence[int]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.channels, (self.kernel,), kernel_dilation=(d,),
                        dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel,), dtype=self.dtype)(h)
            x = x + h
        return x


class MRF(nn.Module):
    channels: int
    kernels: Sequence[int]
    dilations: Sequence[Sequence[int]]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        acc = None
        for k, ds in zip(self.kernels, self.dilations):
            h = ResBlock1D(self.channels, k, ds, self.dtype)(x)
            acc = h if acc is None else acc + h
        return acc / len(self.kernels)


class SRVocoder(nn.Module):
    """``mel [B, F, n_mels] -> waveform [B, F * 480]``."""
    cfg: VocoderConfig = VocoderConfig()

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        h = nn.Conv(c.upsample_initial, (7,), dtype=c.dtype)(mel)
        ch = c.upsample_initial
        for f, k in zip(c.upsample_factors, c.upsample_kernels):
            ch = max(ch // 2, c.channel_floor)
            h = nn.leaky_relu(h, 0.1)
            h = nn.ConvTranspose(ch, (k,), strides=(f,), dtype=c.dtype)(h)
            # ConvTranspose 'SAME' yields length*f directly
            h = MRF(ch, c.resblock_kernels, c.resblock_dilations, c.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(1, (7,), dtype=c.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))[..., 0]


class ConvNeXtBlock1D(nn.Module):
    """Frame-rate ConvNeXt block: depthwise k=7 mixing along frames as
    seven shifted multiply-adds (a 1-channel-group XLA conv never
    reaches the MXU — same trap as ops/fir.py) + pointwise MLP."""
    dim: int
    mlp: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):                         # [B, F, D]
        w = self.param("dw_kernel", nn.initializers.normal(7 ** -0.5),
                       (7, self.dim))
        b = self.param("dw_bias", nn.initializers.zeros, (self.dim,))
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (3, 3), (0, 0)))
        f = x.shape[1]
        h = b.astype(self.dtype)
        for j in range(7):
            h = h + xp[:, j: j + f, :] * w[j].astype(self.dtype)
        h = nn.LayerNorm(dtype=self.dtype)(h)      # stats in f32 (flax)
        h = nn.Dense(self.mlp, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class SpectralVocoder(nn.Module):
    """Complex-spectrum vocoder head: ``mel [B, F, n_mels] -> [B, F*480]``.

    Vocos-style decoding (arXiv:2306.00814 pattern, original
    implementation): a ConvNeXt backbone at FRAME rate predicts
    log-magnitude + phase of the (n_fft=4*hop) STFT, and the waveform is
    the windowed-OLA inverse — ops/stft.istft_dense, one iDFT basis
    matmul + four shifted adds.

    Two wins over the HiFi-GAN generator (reference lineage,
    ``egregora_audio_super_resolution.py:350-353``):
    * quality — the round-3 post-mortem localized the pipeline LSD floor
      in the mel->waveform stage; LSD is a log-magnitude metric and this
      head regresses the log-magnitude *directly* (mel is 256 compressed
      magnitude bins; inverting to 961 linear bins is near-deterministic),
      rather than asking time-domain convs to reconstruct magnitudes
      through phase-blurred waveform regression;
    * speed — every FLOP runs at 100 Hz frame rate as full-width
      matmuls (D>=128 keeps MXU lanes full) vs transposed-conv stacks at
      48 kHz whose narrow stages move 8x their bytes in lane padding.
    """
    cfg: VocoderConfig = VocoderConfig(kind="istft")

    @nn.compact
    def __call__(self, mel, ref=None):
        c = self.cfg
        n_fft = c.istft_nfft
        hop = 480
        nbins = n_fft // 2 + 1
        x = nn.Conv(c.hidden, (7,), dtype=c.dtype)(mel.astype(c.dtype))
        x = nn.LayerNorm(dtype=c.dtype)(x)
        if c.phase_cond:
            if ref is None:
                raise ValueError("phase_cond vocoder needs the input chunk")
            # the input chunk's complex STFT on the head's own synthesis
            # grid (frame f centered at f*hop, like log_mel's frames):
            # unit-phase cos/sin + log-magnitude per bin, projected into
            # the backbone width and added to the stem.
            from ...ops.stft import stft_conv
            pad = [(0, 0)] * (ref.ndim - 1) + [(n_fft // 2, n_fft // 2)]
            rr, ri = stft_conv(jnp.pad(ref.astype(jnp.float32), pad,
                                       mode="reflect"), n_fft, hop)
            m = jnp.sqrt(rr * rr + ri * ri)
            inv = 1.0 / (m + 1e-6)
            cos, sin = rr * inv, ri * inv
            # harmonic phase candidates: the phase a 2nd/3rd harmonic of
            # the content at bin k/2 (k/3) would have AT bin k is the
            # complex square (cube) of that bin's unit phasor — handing
            # the head multiplicative phase algebra (cos 2phi = 2c^2-1,
            # ...) it would otherwise have to synthesize through GELUs.
            idx2 = jnp.arange(nbins) // 2
            idx3 = jnp.arange(nbins) // 3
            c2 = cos * cos - sin * sin
            s2 = 2.0 * cos * sin
            c2h, s2h = c2[..., idx2], s2[..., idx2]
            c3 = c2 * cos - s2 * sin
            s3 = s2 * cos + c2 * sin
            c3h, s3h = c3[..., idx3], s3[..., idx3]
            f = mel.shape[-2]
            def _cut(a):
                a = a[:, :f]
                return jnp.pad(a, ((0, 0), (0, f - a.shape[1]), (0, 0)))
            cos, sin, logm_in = _cut(cos), _cut(sin), _cut(jnp.log(m + 1e-5))
            c2h, s2h, c3h, s3h = _cut(c2h), _cut(s2h), _cut(c3h), _cut(s3h)
            feats = [cos, sin, logm_in, c2h, s2h, c3h, s3h]
            if c.exciter:
                # sum-frequency exciter candidates (see VocoderConfig):
                # unit phasors of stft(x^2) and stft(x^3) on the same
                # synthesis grid
                xn = ref.astype(jnp.float32)
                xn = xn * jax.lax.rsqrt(
                    jnp.mean(xn * xn, axis=-1, keepdims=True) + 1e-12)
                e2 = xn * xn
                e3 = e2 * xn
                exc = []
                for e in (e2, e3):
                    er, ei = stft_conv(jnp.pad(e, pad, mode="reflect"),
                                       n_fft, hop)
                    em = jnp.sqrt(er * er + ei * ei)
                    einv = 1.0 / (em + 1e-6)
                    exc += [_cut(er * einv), _cut(ei * einv),
                            _cut(jnp.log(em + 1e-5))]
                ce2, se2, lme2, ce3, se3, lme3 = exc
                feats += exc
            feats = jnp.concatenate(feats, axis=-1)
            x = x + nn.Dense(c.hidden, dtype=c.dtype,
                             name="phase_in")(feats.astype(c.dtype))
        for _ in range(c.depth):
            x = ConvNeXtBlock1D(c.hidden, c.hidden * c.mlp_ratio, c.dtype)(x)
        x = nn.LayerNorm(dtype=c.dtype)(x)
        logmag = nn.Dense(nbins, dtype=c.dtype)(x).astype(jnp.float32)
        ph = nn.Dense(2 * nbins, dtype=c.dtype)(x).astype(jnp.float32)
        pr, pi = ph[..., :nbins], ph[..., nbins:]
        if c.phase_cond:
            # identity-capable head: the hidden-width backbone is an
            # information bottleneck (961 bins of phase cannot round-trip
            # 256 channels — measured corr 0.43 even on clean HR mel), so
            # the phase output is a per-bin COMPLEX-GATED combination of
            # the input phasor and its harmonic candidates plus the free
            # term, and the log-magnitude gets a gated input residual:
            # exact band passthrough is representable (gate_in=(A,0),
            # gm=1), which is what SI-SDR-vs-passthrough demands.
            # bias init (+1, 0, 0, ...) puts g_in at the POSITIVE copy
            # from step 0: every other loss term is polarity-invariant
            # and a zero init let training settle at the inverted copy
            # (measured corr -0.96), which the downstream crossover then
            # destructively blends with the (+) input low band.
            def _copy_bias(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[:nbins].set(1.0)
            n_g = 10 if c.exciter else 6
            g = nn.Dense(n_g * nbins, dtype=c.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=_copy_bias,
                         name="phase_gates")(x).astype(jnp.float32)
            gs = jnp.split(g, n_g, axis=-1)
            g1r, g1i, g2r, g2i, g3r, g3i = gs[:6]
            pr = (pr + g1r * cos - g1i * sin + g2r * c2h - g2i * s2h
                  + g3r * c3h - g3i * s3h)
            pi = (pi + g1r * sin + g1i * cos + g2r * s2h + g2i * c2h
                  + g3r * s3h + g3i * c3h)
            if c.exciter:
                g4r, g4i, g5r, g5i = gs[6:]
                pr = pr + g4r * ce2 - g4i * se2 + g5r * ce3 - g5i * se3
                pi = pi + g4r * se2 + g4i * ce2 + g5r * se3 + g5i * ce3
            gm = nn.sigmoid(nn.Dense(nbins, dtype=c.dtype,
                                     kernel_init=nn.initializers.zeros,
                                     name="mag_gate")(x).astype(jnp.float32))
            logmag = logmag + gm * logm_in
        inv = jax.lax.rsqrt(pr * pr + pi * pi + 1e-6)
        mag = jnp.exp(jnp.clip(logmag, -30.0, 9.0))
        from ...ops.stft import istft_dense
        y = istft_dense(mag * pr * inv, mag * pi * inv, n_fft, hop)
        # mel frame f is centered at sample f*hop (log_mel center-pads
        # by n_fft//2); synthesis frame f's window center sits at OLA
        # coordinate f*hop + n_fft//2 — shift by n_fft//2 to align.
        f = mel.shape[-2]
        return y[..., n_fft // 2: n_fft // 2 + f * hop]


def build_vocoder(cfg: VocoderConfig):
    """Module for ``cfg.kind`` ("hifigan" -> SRVocoder, the upstream
    sr_vocoder.pth layout; "istft" -> SpectralVocoder)."""
    if cfg.kind == "istft":
        return SpectralVocoder(cfg)
    return SRVocoder(cfg)


def apply_fused(variables: dict, mel: jnp.ndarray,
                cfg: VocoderConfig = VocoderConfig(), *,
                interpret: bool = False) -> jnp.ndarray:
    """Inference-path vocoder forward: identical param tree and
    semantics to ``SRVocoder.apply`` (bf16 tolerance; test-pinned), but
    each stage's MRF runs as the fused channel-major Pallas kernel
    (ops/mrf_pallas.py) instead of 18 padded-NWC XLA convs — the NWC
    lane padding at C=16..64 made the vocoder move ~6-8x its logical
    bytes and dominate the fused pipeline's device time.

    Pre/post convs and the strided ConvTransposes stay as the flax
    modules (bit-identical weights application); activations transpose
    to ``[B, C, T]`` around each MRF.
    """
    import os

    import flax.linen as nn_

    from ...ops.mrf_dense import mrf_dense_cm
    from ...ops.mrf_packed import (conv_packed, mrf_packed, pack_batch,
                                   unpack_batch)
    from ...ops.mrf_pallas import mrf_fused_cm, pack_resblock_weights

    p = variables["params"]
    c = cfg
    # the fused kernel applies ONE dilation schedule to every branch;
    # heterogeneous per-branch dilations (some HiFi-GAN variants) must
    # fail loudly rather than silently convolve with wrong fields
    if any(tuple(d) != tuple(c.resblock_dilations[0])
           for d in c.resblock_dilations):
        raise NotImplementedError(
            "apply_fused: per-branch resblock_dilations differ "
            f"({c.resblock_dilations}); the fused MRF kernel assumes one "
            "schedule — use SRVocoder.apply for this config")
    h = nn_.Conv(c.upsample_initial, (7,), dtype=c.dtype).apply(
        {"params": p["Conv_0"]}, mel)
    ch = c.upsample_initial
    packed_g = 0          # >0: h is batch-packed [B/g, T, g*ch]
    for i, (f, k) in enumerate(zip(c.upsample_factors, c.upsample_kernels)):
        ch = max(ch // 2, c.channel_floor)
        h = nn_.leaky_relu(h, 0.1)
        h = nn_.ConvTranspose(ch, (k,), strides=(f,), dtype=c.dtype).apply(
            {"params": p[f"ConvTranspose_{i}"]}, h)
        path = os.environ.get("EGREGORA_MRF_PATH", "pallas")
        if path == "rows":
            # NWC fused-chain kernel (ops/mrf_rows.py): each branch's
            # whole leaky->conv->leaky->conv residual chain runs in
            # VMEM on halo-framed time tiles — one HBM read + write
            # per branch instead of per conv
            from ...ops.mrf_rows import mrf_rows
            tile = next((tt for tt in (4096, 2048, 1024, 512, 256, 128)
                         if h.shape[1] % tt == 0), None)
            if tile is None:
                h = MRF(ch, c.resblock_kernels, c.resblock_dilations,
                        c.dtype).apply({"params": p[f"MRF_{i}"]}, h)
            else:
                h = mrf_rows(h.astype(c.dtype), p[f"MRF_{i}"],
                             c.resblock_kernels, c.resblock_dilations,
                             tile=tile, interpret=interpret)
        elif ch <= 64 and path == "packed" and h.shape[0] % 2 == 0:
            # batch-packed grouped convs: [B, T, 64] pads 2x into the
            # 128 lanes; two items folded into the channel axis make
            # the stage exactly lane-wide (ops/mrf_packed.py).  The
            # LAST stage stays packed through the 1-ch post conv so
            # the unpack transposes g channels, not 64.
            g = 2
            hp = mrf_packed(pack_batch(h.astype(c.dtype), g),
                            p[f"MRF_{i}"], g, c.resblock_kernels,
                            c.resblock_dilations[0])
            if i == len(c.upsample_factors) - 1:
                packed_g = g
                h = hp
            else:
                h = unpack_batch(hp, g)
        elif ch <= 64:
            # fuse the small-channel stages — where NWC lane padding
            # multiplies traffic AND where the samples-per-second are
            # highest.  Wide early stages (C >= 128) keep the XLA
            # convs: they are MXU-efficient already, and the fully
            # unrolled Mosaic kernel at C=256 compiles pathologically
            # (>30 min observed through the relay).
            w = pack_resblock_weights(p[f"MRF_{i}"], c.resblock_kernels,
                                      c.resblock_dilations[0], dtype=c.dtype)
            h_cm = jnp.swapaxes(h.astype(c.dtype), -1, -2)  # [B, C, T]
            # EGREGORA_MRF_PATH selects the channel-major engine:
            # "pallas" (fused Mosaic kernel) or "dense" (static-slice
            # XLA, ops/mrf_dense.py).  The kernel lab measures both at
            # stage-2 geometry (tools/mrf_kernel_lab.py).
            if os.environ.get("EGREGORA_MRF_PATH", "pallas") == "dense":
                h_cm = mrf_dense_cm(h_cm, w, kernels=c.resblock_kernels,
                                    dilations=c.resblock_dilations[0])
            else:
                h_cm = mrf_fused_cm(h_cm, w, kernels=c.resblock_kernels,
                                    dilations=c.resblock_dilations[0],
                                    interpret=interpret)
            h = jnp.swapaxes(h_cm, -1, -2)
        else:
            h = MRF(ch, c.resblock_kernels, c.resblock_dilations,
                    c.dtype).apply({"params": p[f"MRF_{i}"]}, h)
    h = nn_.leaky_relu(h, 0.1)
    if packed_g:
        h = conv_packed(h, jnp.asarray(p["Conv_1"]["kernel"]),
                        jnp.asarray(p["Conv_1"]["bias"]), 1, packed_g)
        h = unpack_batch(h, packed_g)          # [M, T, g] -> [B, T, 1]
    else:
        h = nn_.Conv(1, (7,), dtype=c.dtype).apply({"params": p["Conv_1"]}, h)
    return jnp.tanh(h.astype(jnp.float32))[..., 0]


def hifigan_name_map(cfg: VocoderConfig = VocoderConfig()):
    """Upstream HiFi-GAN generator (jik876 layout, the lineage FlashSR's
    ``sr_vocoder.pth`` descends from) -> SRVocoder tree paths.

    ``ups.N`` are ConvTranspose1d (torch ``[in, out, k]``) and need the
    explicit ``(2, 0, 1)`` perm; ``resblocks.{s*K+j}.convs1.{d}`` is the
    dilated conv (our ``Conv_{2d}``) and ``convs2.{d}`` the plain one
    (``Conv_{2d+1}``).  weight_norm pairs fold upstream of this map.
    """
    m = {
        "conv_pre.weight": "params/Conv_0/kernel",
        "conv_pre.bias": "params/Conv_0/bias",
        "conv_post.weight": "params/Conv_1/kernel",
        "conv_post.bias": "params/Conv_1/bias",
    }
    nk = len(cfg.resblock_kernels)
    for i in range(len(cfg.upsample_factors)):
        m[f"ups.{i}.weight"] = (f"params/ConvTranspose_{i}/kernel", (2, 0, 1))
        m[f"ups.{i}.bias"] = f"params/ConvTranspose_{i}/bias"
        for j in range(nk):
            idx = i * nk + j
            base = f"params/MRF_{i}/ResBlock1D_{j}"
            for d in range(len(cfg.resblock_dilations[j])):
                m[f"resblocks.{idx}.convs1.{d}.weight"] = f"{base}/Conv_{2*d}/kernel"
                m[f"resblocks.{idx}.convs1.{d}.bias"] = f"{base}/Conv_{2*d}/bias"
                m[f"resblocks.{idx}.convs2.{d}.weight"] = f"{base}/Conv_{2*d+1}/kernel"
                m[f"resblocks.{idx}.convs2.{d}.bias"] = f"{base}/Conv_{2*d+1}/bias"
    return m.get
