"""Latent-diffusion UNetModel (CompVis lineage) in Flax — the upstream
layout of FlashSR's ``student_ldm.pth``.

FlashSR (arXiv 2501.10807) distills AudioSR's latent-diffusion UNet —
the CompVis ``UNetModel`` family — into a one-step student; the
reference executes that torch module from the downloaded
FlashSR_Inference repo (``egregora_audio_super_resolution.py:361-369``).
This is the TPU-native implementation of the same structure with the
same parameter layout: ``time_embed.{0,2}``, ``input_blocks.{i}.{j}``
(ResBlock ``in_layers/emb_layers/out_layers/skip_connection``,
AttentionBlock ``norm/qkv/proj_out``, Downsample ``op``),
``middle_block.{0,1,2}``, ``output_blocks.{i}.{j}`` (+ ``conv`` for
Upsample), ``out.{0,2}`` — so a real checkpoint maps leaf-for-leaf
through ``ldm_unet_name_map`` + ``convert_state_dict``.

TPU-first: NHWC, bf16 matmuls with f32 norms, attention via
ops.attention.mha (round 5: the whole-row Pallas kernel with exact
softmax is the TPU default — in-context it beat the unrolled engine
by ~14 ms here and ~9 ms in the VAE; see ops/attn_pallas.py and the
labs in tools/attn_kernel_lab.py), broadcast-reshape nearest
upsampling (ops/resize.py — exact, gather-free), zero-init output
convs (LDM convention — also the right init for distillation).

The compact attention-free ``StudentUNet`` (unet.py) remains the
architecture of the shipped synthetic-distilled weights;
``FlashSRModules`` picks the module by config type.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.attention import mha
from ...ops.resize import upsample2x_nearest
from .unet import timestep_embedding


@dataclasses.dataclass(frozen=True)
class LDMUNetConfig:
    in_channels: int = 32           # z_noise (16) ++ z_lr cond (16)
    out_channels: int = 16
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    # downsample factors at which attention runs (LDM convention):
    # ds=2 -> 2048 tokens, ds=4 -> 512 tokens at the 128x64 latent
    attention_resolutions: Sequence[int] = (2, 4)
    num_heads: int = 8
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16


def _zeros_conv(ch, name, dtype):
    return nn.Conv(ch, (3, 3), kernel_init=nn.initializers.zeros,
                   dtype=dtype, name=name)


class LDMResBlock(nn.Module):
    """CompVis ResBlock: in_layers (GN,silu,conv) + emb_layers (silu,
    linear) added per-channel + out_layers (GN,silu,[drop],zero conv),
    1x1 skip_connection when channels change."""
    out_ch: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]),
                         dtype=self.dtype, name="in_layers_0")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype, name="in_layers_2")(h)
        e = nn.Dense(self.out_ch, dtype=jnp.float32, name="emb_layers_1")(nn.silu(emb))
        # cast the (tiny) time-embedding bias to the block dtype so the
        # full-resolution tensor is not promoted back to f32
        h = h + e[:, None, None, :].astype(self.dtype)
        h = nn.GroupNorm(num_groups=min(self.groups, self.out_ch),
                         dtype=self.dtype, name="out_layers_0")(h)
        h = nn.silu(h)
        h = _zeros_conv(self.out_ch, "out_layers_3", self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


class LDMAttentionBlock(nn.Module):
    """CompVis AttentionBlock: GN -> fused qkv (1x1) -> multi-head
    attention over the flattened grid -> zero-init proj_out, residual."""
    num_heads: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, f, m, c = x.shape
        hd = c // self.num_heads
        h = nn.GroupNorm(num_groups=min(self.groups, c), dtype=self.dtype,
                         name="norm")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(
            h.reshape(b, f * m, c).astype(self.dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):   # [B, N, C] -> [B, H, N, hd]
            return t.reshape(b, f * m, self.num_heads, hd).swapaxes(1, 2)

        o = mha(heads(q), heads(k), heads(v))
        o = o.swapaxes(1, 2).reshape(b, f * m, c)
        o = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
                     name="proj_out")(o)
        return x + o.reshape(b, f, m, c)


class LDMUNet(nn.Module):
    """``(z [B,F,M,Cin], t [B]) -> [B,F,M,Cout]`` with the upstream
    UNetModel block graph (every input block's output is a skip)."""
    cfg: LDMUNetConfig = LDMUNetConfig()

    @nn.compact
    def __call__(self, z, t):
        c = self.cfg
        mc = c.model_channels
        emb = timestep_embedding(t, mc)
        emb = nn.Dense(4 * mc, dtype=jnp.float32, name="time_embed_0")(emb)
        emb = nn.Dense(4 * mc, dtype=jnp.float32, name="time_embed_2")(nn.silu(emb))

        def res(idx, sub, ch_out, h):
            return LDMResBlock(ch_out, c.groups, c.dtype,
                               name=f"{idx}_{sub}")(h, emb)

        def attn(idx, sub, h):
            return LDMAttentionBlock(c.num_heads, c.groups, c.dtype,
                                     name=f"{idx}_{sub}")(h)

        h = nn.Conv(mc, (3, 3), dtype=c.dtype, name="input_blocks_0_0")(
            z.astype(c.dtype))
        hs = [h]
        ch, ds, idx = mc, 1, 1
        for level, mult in enumerate(c.channel_mult):
            for _ in range(c.num_res_blocks):
                ch = mult * mc
                h = res(f"input_blocks_{idx}", 0, ch, h)
                if ds in c.attention_resolutions:
                    h = attn(f"input_blocks_{idx}", 1, h)
                hs.append(h)
                idx += 1
            if level != len(c.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=c.dtype,
                            name=f"input_blocks_{idx}_0_op")(h)
                hs.append(h)
                ds *= 2
                idx += 1

        h = res("middle_block", 0, ch, h)
        h = attn("middle_block", 1, h)
        h = res("middle_block", 2, h.shape[-1], h)

        idx = 0
        for level, mult in reversed(list(enumerate(c.channel_mult))):
            for i in range(c.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = mult * mc
                h = res(f"output_blocks_{idx}", 0, ch, h)
                sub = 1
                if ds in c.attention_resolutions:
                    h = attn(f"output_blocks_{idx}", sub, h)
                    sub += 1
                if level and i == c.num_res_blocks:
                    # broadcast-reshape == nearest x2 exactly; the
                    # resize gather was a measured UNet wall
                    # (tools/unet_lab.py no-resize variant)
                    cc = h.shape[-1]
                    h = upsample2x_nearest(h)
                    h = nn.Conv(cc, (3, 3), dtype=c.dtype,
                                name=f"output_blocks_{idx}_{sub}_conv")(h)
                    ds //= 2
                idx += 1

        h = nn.GroupNorm(num_groups=min(c.groups, h.shape[-1]),
                         dtype=c.dtype, name="out_0")(h)
        h = nn.silu(h)
        return _zeros_conv(c.out_channels, "out_2", c.dtype)(h).astype(jnp.float32)


def attn_qkv_transforms(num_heads: int):
    """Converter transforms for the upstream AttentionBlock's fused qkv.

    Upstream (use_new_attention_order=False, the CompVis/LDM default)
    feeds qkv through QKVAttentionLegacy, which reads the 3C out-channels
    HEAD-MAJOR: ``reshape(B*H, 3*hd, N)`` then split — channel index
    ``h*(3*hd) + s*hd + d`` for head h, slot s in (q,k,v), dim d.
    ``LDMAttentionBlock`` splits 3C into three C blocks (slot-major:
    ``s*C + h*hd + d``), so converted kernels/biases permute
    (h, s, d) -> (s, h, d).  Returns ``(kernel_tr, bias_tr)``.
    """

    def qkv_kernel(v):
        w = v[:, :, 0] if v.ndim == 3 else v          # conv1d -> [3C, Cin]
        oc = w.shape[0]
        hd = oc // (3 * num_heads)
        w = (w.reshape(num_heads, 3, hd, -1)
             .transpose(1, 0, 2, 3).reshape(oc, -1))
        return w.T                                     # dense [Cin, 3C]

    def qkv_bias(v):
        hd = v.shape[0] // (3 * num_heads)
        return v.reshape(num_heads, 3, hd).transpose(1, 0, 2).reshape(-1)

    return qkv_kernel, qkv_bias


def ldm_unet_name_map(cfg: LDMUNetConfig = LDMUNetConfig()):
    """Upstream ``UNetModel`` torch keys -> this tree ('/'-joined), built
    by replaying the exact block/channel bookkeeping of the forward."""
    m = {}
    dense_t = lambda v: v[:, :, 0].T if v.ndim == 3 else v.T  # 1d conv -> dense

    def gn(t, f):
        m[f"{t}.weight"] = f"params/{f}/scale"
        m[f"{t}.bias"] = f"params/{f}/bias"

    def conv(t, f):
        m[f"{t}.weight"] = f"params/{f}/kernel"
        m[f"{t}.bias"] = f"params/{f}/bias"

    def dense(t, f):
        m[f"{t}.weight"] = (f"params/{f}/kernel", dense_t)
        m[f"{t}.bias"] = f"params/{f}/bias"

    def res(t, f, ch_in, ch_out):
        gn(f"{t}.in_layers.0", f"{f}/in_layers_0")
        conv(f"{t}.in_layers.2", f"{f}/in_layers_2")
        dense(f"{t}.emb_layers.1", f"{f}/emb_layers_1")
        gn(f"{t}.out_layers.0", f"{f}/out_layers_0")
        conv(f"{t}.out_layers.3", f"{f}/out_layers_3")
        if ch_in != ch_out:
            conv(f"{t}.skip_connection", f"{f}/skip_connection")

    qkv_kernel, qkv_bias = attn_qkv_transforms(cfg.num_heads)

    def attn(t, f):
        gn(f"{t}.norm", f"{f}/norm")
        m[f"{t}.qkv.weight"] = (f"params/{f}/qkv/kernel", qkv_kernel)
        m[f"{t}.qkv.bias"] = (f"params/{f}/qkv/bias", qkv_bias)
        dense(f"{t}.proj_out", f"{f}/proj_out")

    mc = cfg.model_channels
    dense("time_embed.0", "time_embed_0")
    dense("time_embed.2", "time_embed_2")
    conv("input_blocks.0.0", "input_blocks_0_0")

    ch, ds, idx = mc, 1, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            res(f"input_blocks.{idx}.0", f"input_blocks_{idx}_0", ch, mult * mc)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                attn(f"input_blocks.{idx}.1", f"input_blocks_{idx}_1")
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            conv(f"input_blocks.{idx}.0.op", f"input_blocks_{idx}_0_op")
            ds *= 2
            idx += 1

    res("middle_block.0", "middle_block_0", ch, ch)
    attn("middle_block.1", "middle_block_1")
    res("middle_block.2", "middle_block_2", ch, ch)

    # skip-channel replay for the concat widths
    chans = [mc]
    c2, d2 = mc, 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            c2 = mult * mc
            chans.append(c2)
        if level != len(cfg.channel_mult) - 1:
            chans.append(c2)
            d2 *= 2

    idx = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            res(f"output_blocks.{idx}.0", f"output_blocks_{idx}_0",
                ch + ich, mult * mc)
            ch = mult * mc
            sub = 1
            if ds in cfg.attention_resolutions:
                attn(f"output_blocks.{idx}.{sub}", f"output_blocks_{idx}_{sub}")
                sub += 1
            if level and i == cfg.num_res_blocks:
                conv(f"output_blocks.{idx}.{sub}.conv",
                     f"output_blocks_{idx}_{sub}_conv")
                ds //= 2
            idx += 1

    gn("out.0", "out_0")
    conv("out.2", "out_2")
    return m.get
