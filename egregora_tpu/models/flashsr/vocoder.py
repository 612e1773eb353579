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
    import flax.linen as nn_

    from ...ops.mrf_pallas import mrf_fused_cm, pack_resblock_weights

    p = variables["params"]
    c = cfg
    h = nn_.Conv(c.upsample_initial, (7,), dtype=c.dtype).apply(
        {"params": p["Conv_0"]}, mel)
    ch = c.upsample_initial
    for i, (f, k) in enumerate(zip(c.upsample_factors, c.upsample_kernels)):
        ch = max(ch // 2, c.channel_floor)
        h = nn_.leaky_relu(h, 0.1)
        h = nn_.ConvTranspose(ch, (k,), strides=(f,), dtype=c.dtype).apply(
            {"params": p[f"ConvTranspose_{i}"]}, h)
        if ch <= 64:
            # fuse the small-channel stages — where NWC lane padding
            # multiplies traffic AND where the samples-per-second are
            # highest.  Wide early stages (C >= 128) keep the XLA
            # convs: they are MXU-efficient already, and the fully
            # unrolled Mosaic kernel at C=256 compiles pathologically
            # (>30 min observed through the relay).
            w = pack_resblock_weights(p[f"MRF_{i}"], c.resblock_kernels,
                                      c.resblock_dilations[0], dtype=c.dtype)
            h_cm = jnp.swapaxes(h.astype(c.dtype), -1, -2)  # [B, C, T]
            h_cm = mrf_fused_cm(h_cm, w, kernels=c.resblock_kernels,
                                dilations=c.resblock_dilations[0],
                                interpret=interpret)
            h = jnp.swapaxes(h_cm, -1, -2)
        else:
            h = MRF(ch, c.resblock_kernels, c.resblock_dilations,
                    c.dtype).apply({"params": p[f"MRF_{i}"]}, h)
    h = nn_.leaky_relu(h, 0.1)
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
            for d in range(3):
                m[f"resblocks.{idx}.convs1.{d}.weight"] = f"{base}/Conv_{2*d}/kernel"
                m[f"resblocks.{idx}.convs1.{d}.bias"] = f"{base}/Conv_{2*d}/bias"
                m[f"resblocks.{idx}.convs2.{d}.weight"] = f"{base}/Conv_{2*d+1}/kernel"
                m[f"resblocks.{idx}.convs2.{d}.bias"] = f"{base}/Conv_{2*d+1}/bias"
    return m.get
