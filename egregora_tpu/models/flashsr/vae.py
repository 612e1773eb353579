"""Mel-spectrogram VAE (FlashSR's ``vae.pth`` equivalent) in Flax.

The reference loads a torch VAE checkpoint through the downloaded
FlashSR_Inference code (``egregora_audio_super_resolution.py:346-359``);
this is the TPU-native counterpart: an AudioLDM-family 2D conv VAE over
the log-mel "image" ``[B, frames, mels, 1]`` with 4x spatial
downsampling into a ``latent_channels``-deep latent.

TPU-first choices: NHWC layout (native conv layout on TPU), GroupNorm +
SiLU, bf16-friendly (params f32, activations castable), no attention in
the autoencoder (keeps the chunk batch fully conv-parallel on the MXU).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    # base 64: the full-resolution level dominates VAE cost (measured
    # 97 ms of a 213 ms batch-8 forward at base 128); 64 keeps the MXU
    # lanes full while quartering the level-0 FLOPs.
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2, 4)   # 2 downsamples => 4x
    latent_channels: int = 16
    num_res_blocks: int = 2
    groups: int = 32
    scaling_factor: float = 0.18215  # latent scale, AudioLDM lineage
    dtype: jnp.dtype = jnp.bfloat16


class ResBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), dtype=jnp.float32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.channels), dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        """``[B, F, M, 1] -> (mean, logvar)`` each ``[B, F/4, M/4, Z]``."""
        c = self.cfg
        h = nn.Conv(c.base_channels, (3, 3), dtype=c.dtype)(x)
        for i, mult in enumerate(c.channel_mults):
            ch = c.base_channels * mult
            for _ in range(c.num_res_blocks):
                h = ResBlock(ch, c.groups, c.dtype)(h)
            if i < len(c.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype)(h)
        h = nn.GroupNorm(num_groups=c.groups, dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Conv(2 * c.latent_channels, (3, 3), dtype=c.dtype)(h)
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        """``[B, F/4, M/4, Z] -> [B, F, M, 1]`` log-mel reconstruction."""
        c = self.cfg
        mults = tuple(reversed(c.channel_mults))
        h = nn.Conv(c.base_channels * mults[0], (3, 3), dtype=c.dtype)(z)
        for i, mult in enumerate(mults):
            ch = c.base_channels * mult
            for _ in range(c.num_res_blocks):
                h = ResBlock(ch, c.groups, c.dtype)(h)
            if i < len(mults) - 1:
                b, f, m, cc = h.shape
                h = jax.image.resize(h, (b, f * 2, m * 2, cc), method="nearest")
                h = nn.Conv(ch, (3, 3), dtype=c.dtype)(h)
        h = nn.GroupNorm(num_groups=c.groups, dtype=jnp.float32)(h)
        h = nn.silu(h)
        return nn.Conv(1, (3, 3), dtype=c.dtype)(h).astype(jnp.float32)


class MelVAE(nn.Module):
    """Encode/decode log-mel images; deterministic (mean) inference path."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, mel_img):
        mean, logvar = self.encoder(mel_img)
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.cfg.scaling_factor)

    def __call__(self, mel_img):
        return self.decode(self.encode(mel_img))


def audioldm_vae_name_map(cfg: VAEConfig = VAEConfig()):
    """AudioLDM/Stable-Diffusion AutoencoderKL naming (``encoder.down.*``
    / ``decoder.up.*``, the layout FlashSR's ``vae.pth`` descends from)
    -> MelVAE tree paths.

    Covers the layers this architecture shares (conv_in, per-level res
    blocks with nin_shortcut, down/upsample convs, norm_out, conv_out);
    upstream-only extras (mid attention) are dropped by the converter.
    Note the SD decoder indexing quirk: ``up.{u}`` lists levels in
    REVERSE application order, so u = L-1-i for our i-th applied level.
    """
    L = len(cfg.channel_mults)
    R = cfg.num_res_blocks
    m = {}

    def res_block(prefix_t, path_f, has_shortcut):
        m[f"{prefix_t}.norm1.weight"] = f"{path_f}/GroupNorm_0/scale"
        m[f"{prefix_t}.norm1.bias"] = f"{path_f}/GroupNorm_0/bias"
        m[f"{prefix_t}.conv1.weight"] = f"{path_f}/Conv_0/kernel"
        m[f"{prefix_t}.conv1.bias"] = f"{path_f}/Conv_0/bias"
        m[f"{prefix_t}.norm2.weight"] = f"{path_f}/GroupNorm_1/scale"
        m[f"{prefix_t}.norm2.bias"] = f"{path_f}/GroupNorm_1/bias"
        m[f"{prefix_t}.conv2.weight"] = f"{path_f}/Conv_1/kernel"
        m[f"{prefix_t}.conv2.bias"] = f"{path_f}/Conv_1/bias"
        if has_shortcut:
            m[f"{prefix_t}.nin_shortcut.weight"] = f"{path_f}/Conv_2/kernel"
            m[f"{prefix_t}.nin_shortcut.bias"] = f"{path_f}/Conv_2/bias"

    # encoder
    m["encoder.conv_in.weight"] = "params/encoder/Conv_0/kernel"
    m["encoder.conv_in.bias"] = "params/encoder/Conv_0/bias"
    for i in range(L):
        ch_in = cfg.channel_mults[i - 1] if i else 1
        for j in range(R):
            shortcut = (j == 0 and cfg.channel_mults[i] != ch_in)
            res_block(f"encoder.down.{i}.block.{j}",
                      f"params/encoder/ResBlock_{i * R + j}", shortcut)
        if i < L - 1:
            m[f"encoder.down.{i}.downsample.conv.weight"] = f"params/encoder/Conv_{i + 1}/kernel"
            m[f"encoder.down.{i}.downsample.conv.bias"] = f"params/encoder/Conv_{i + 1}/bias"
    m["encoder.norm_out.weight"] = "params/encoder/GroupNorm_0/scale"
    m["encoder.norm_out.bias"] = "params/encoder/GroupNorm_0/bias"
    m["encoder.conv_out.weight"] = f"params/encoder/Conv_{L}/kernel"
    m["encoder.conv_out.bias"] = f"params/encoder/Conv_{L}/bias"

    # decoder (applied mults are reversed; upstream up.{u}: u = L-1-i)
    mults = tuple(reversed(cfg.channel_mults))
    m["decoder.conv_in.weight"] = "params/decoder/Conv_0/kernel"
    m["decoder.conv_in.bias"] = "params/decoder/Conv_0/bias"
    for i in range(L):
        u = L - 1 - i
        ch_in = mults[i - 1] if i else mults[0]
        for j in range(R):
            shortcut = (j == 0 and mults[i] != ch_in)
            res_block(f"decoder.up.{u}.block.{j}",
                      f"params/decoder/ResBlock_{i * R + j}", shortcut)
        if i < L - 1:
            m[f"decoder.up.{u}.upsample.conv.weight"] = f"params/decoder/Conv_{i + 1}/kernel"
            m[f"decoder.up.{u}.upsample.conv.bias"] = f"params/decoder/Conv_{i + 1}/bias"
    m["decoder.norm_out.weight"] = "params/decoder/GroupNorm_0/scale"
    m["decoder.norm_out.bias"] = "params/decoder/GroupNorm_0/bias"
    m["decoder.conv_out.weight"] = f"params/decoder/Conv_{L}/kernel"
    m["decoder.conv_out.bias"] = f"params/decoder/Conv_{L}/bias"
    return m.get
