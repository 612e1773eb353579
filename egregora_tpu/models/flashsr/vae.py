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
