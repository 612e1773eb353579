"""Mel-spectrogram VAE (FlashSR's ``vae.pth`` equivalent) in Flax.

The reference loads a torch VAE checkpoint through the downloaded
FlashSR_Inference code (``egregora_audio_super_resolution.py:346-359``);
this is the TPU-native counterpart: an AudioLDM-family 2D conv VAE over
the log-mel "image" ``[B, frames, mels, 1]`` with 4x spatial
downsampling into a ``latent_channels``-deep latent.

TPU-first choices: NHWC layout (native conv layout on TPU), GroupNorm +
SiLU, bf16-friendly (params f32, activations castable).  The upstream
mid-block attention pair runs as exact query-chunked attention so the
[N, N] score matrix (N = 8192 tokens at the full config's bottleneck)
never materializes — each query block sees its full score row, so the
softmax is exact, and every matmul lands on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import upsample2x_nearest


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
    # Upstream AutoencoderKL structure (what the real ``vae.pth``
    # contains): ResBlock/Attn/ResBlock mid pair in both coders plus the
    # 1x1 (post_)quant convs.  The compact distilled config turns both
    # off (attention-free trains/extrapolates better at small scale).
    mid_attn: bool = True
    use_quant_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16


class ResBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(self.groups, self.channels), dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, (3, 3), dtype=self.dtype)(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        return x + h


# re-export: the implementation (and its Pallas flash fast path) moved
# to ops.attention; kept importable here for back-compat
from ...ops.attention import chunked_attention as _chunked_attention  # noqa: E402,F401
from ...ops.attention import mha as _mha  # noqa: E402


class AttnBlock2D(nn.Module):
    """Upstream AutoencoderKL ``mid.attn_1``: GroupNorm -> 1x1 q/k/v ->
    single-head attention over the flattened token grid -> 1x1 proj_out,
    residual.  Submodules are named q/k/v/proj_out so the checkpoint
    name map is positional-index-free."""
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, f, m, c = x.shape
        h = nn.GroupNorm(num_groups=min(self.groups, c), dtype=self.dtype)(x)
        h = h.astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        o = _mha(q.reshape(b, 1, f * m, c), k.reshape(b, 1, f * m, c),
                 v.reshape(b, 1, f * m, c))[:, 0]
        o = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o.reshape(b, f, m, c))
        return x + o


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        """``[B, F, M, 1] -> moments [B, F/4, M/4, 2Z]`` (mean ++ logvar)."""
        c = self.cfg
        h = nn.Conv(c.base_channels, (3, 3), dtype=c.dtype)(x)
        for i, mult in enumerate(c.channel_mults):
            ch = c.base_channels * mult
            for _ in range(c.num_res_blocks):
                h = ResBlock(ch, c.groups, c.dtype)(h)
            if i < len(c.channel_mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype)(h)
        if c.mid_attn:
            ch = c.base_channels * c.channel_mults[-1]
            h = ResBlock(ch, c.groups, c.dtype)(h)
            h = AttnBlock2D(c.groups, c.dtype)(h)
            h = ResBlock(ch, c.groups, c.dtype)(h)
        h = nn.GroupNorm(num_groups=c.groups, dtype=c.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), dtype=c.dtype)(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        """``[B, F/4, M/4, Z] -> [B, F, M, 1]`` log-mel reconstruction."""
        c = self.cfg
        mults = tuple(reversed(c.channel_mults))
        h = nn.Conv(c.base_channels * mults[0], (3, 3), dtype=c.dtype)(z)
        if c.mid_attn:
            ch = c.base_channels * mults[0]
            h = ResBlock(ch, c.groups, c.dtype)(h)
            h = AttnBlock2D(c.groups, c.dtype)(h)
            h = ResBlock(ch, c.groups, c.dtype)(h)
        for i, mult in enumerate(mults):
            ch = c.base_channels * mult
            for _ in range(c.num_res_blocks):
                h = ResBlock(ch, c.groups, c.dtype)(h)
            if i < len(mults) - 1:
                # broadcast-reshape == nearest x2 exactly; jax.image.
                # resize's gather cost 17.5 ms of the 98 ms decode
                # stage at the bench geometry (tools/vae_lab.py)
                h = upsample2x_nearest(h)
                h = nn.Conv(ch, (3, 3), dtype=c.dtype)(h)
        h = nn.GroupNorm(num_groups=c.groups, dtype=c.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(1, (3, 3), dtype=c.dtype)(h).astype(jnp.float32)


class MelVAE(nn.Module):
    """Encode/decode log-mel images; deterministic (mean) inference path."""
    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        if self.cfg.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                      dtype=self.cfg.dtype)
            self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                           dtype=self.cfg.dtype)

    def moments(self, mel_img):
        """``(mean, logvar)`` each ``[B, F/4, M/4, Z]`` (unscaled)."""
        h = self.encoder(mel_img)
        if self.cfg.use_quant_conv:
            h = self.quant_conv(h)
        mean, logvar = jnp.split(h.astype(jnp.float32), 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, mel_img):
        mean, _ = self.moments(mel_img)
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        z = z / self.cfg.scaling_factor
        if self.cfg.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, mel_img):
        return self.decode(self.encode(mel_img))


def audioldm_vae_name_map(cfg: VAEConfig = VAEConfig()):
    """AudioLDM/Stable-Diffusion AutoencoderKL naming (``encoder.down.*``
    / ``decoder.up.*``, the layout FlashSR's ``vae.pth`` descends from)
    -> MelVAE tree paths.

    Covers the full upstream structure: conv_in, per-level res blocks
    with nin_shortcut, down/upsample convs, the mid ResBlock/Attn/
    ResBlock pair (when ``cfg.mid_attn``), norm_out, conv_out, and the
    (post_)quant 1x1 convs (when ``cfg.use_quant_conv``).  Note the SD
    decoder indexing quirk: ``up.{u}`` lists levels in REVERSE
    application order, so u = L-1-i for our i-th applied level.
    """
    L = len(cfg.channel_mults)
    R = cfg.num_res_blocks
    m = {}

    def attn_block(prefix_t, path_f):
        m[f"{prefix_t}.norm.weight"] = f"{path_f}/GroupNorm_0/scale"
        m[f"{prefix_t}.norm.bias"] = f"{path_f}/GroupNorm_0/bias"
        for lin in ("q", "k", "v", "proj_out"):
            m[f"{prefix_t}.{lin}.weight"] = f"{path_f}/{lin}/kernel"
            m[f"{prefix_t}.{lin}.bias"] = f"{path_f}/{lin}/bias"

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
    if cfg.mid_attn:
        res_block("encoder.mid.block_1", f"params/encoder/ResBlock_{L * R}", False)
        attn_block("encoder.mid.attn_1", "params/encoder/AttnBlock2D_0")
        res_block("encoder.mid.block_2", f"params/encoder/ResBlock_{L * R + 1}", False)
    m["encoder.norm_out.weight"] = "params/encoder/GroupNorm_0/scale"
    m["encoder.norm_out.bias"] = "params/encoder/GroupNorm_0/bias"
    m["encoder.conv_out.weight"] = f"params/encoder/Conv_{L}/kernel"
    m["encoder.conv_out.bias"] = f"params/encoder/Conv_{L}/bias"

    # decoder (applied mults are reversed; upstream up.{u}: u = L-1-i)
    mults = tuple(reversed(cfg.channel_mults))
    m["decoder.conv_in.weight"] = "params/decoder/Conv_0/kernel"
    m["decoder.conv_in.bias"] = "params/decoder/Conv_0/bias"
    off = 0
    if cfg.mid_attn:
        res_block("decoder.mid.block_1", "params/decoder/ResBlock_0", False)
        attn_block("decoder.mid.attn_1", "params/decoder/AttnBlock2D_0")
        res_block("decoder.mid.block_2", "params/decoder/ResBlock_1", False)
        off = 2
    for i in range(L):
        u = L - 1 - i
        ch_in = mults[i - 1] if i else mults[0]
        for j in range(R):
            shortcut = (j == 0 and mults[i] != ch_in)
            res_block(f"decoder.up.{u}.block.{j}",
                      f"params/decoder/ResBlock_{off + i * R + j}", shortcut)
        if i < L - 1:
            m[f"decoder.up.{u}.upsample.conv.weight"] = f"params/decoder/Conv_{i + 1}/kernel"
            m[f"decoder.up.{u}.upsample.conv.bias"] = f"params/decoder/Conv_{i + 1}/bias"
    m["decoder.norm_out.weight"] = "params/decoder/GroupNorm_0/scale"
    m["decoder.norm_out.bias"] = "params/decoder/GroupNorm_0/bias"
    m["decoder.conv_out.weight"] = f"params/decoder/Conv_{L}/kernel"
    m["decoder.conv_out.bias"] = f"params/decoder/Conv_{L}/bias"
    if cfg.use_quant_conv:
        m["quant_conv.weight"] = "params/quant_conv/kernel"
        m["quant_conv.bias"] = "params/quant_conv/bias"
        m["post_quant_conv.weight"] = "params/post_quant_conv/kernel"
        m["post_quant_conv.bias"] = "params/post_quant_conv/bias"
    return m.get
