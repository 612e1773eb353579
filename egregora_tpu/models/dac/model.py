"""Descript Audio Codec (DAC) in Flax — SURVEY.md #31's TPU equivalent.

The reference shells out to the torch ``dac`` package
(``egregora_audio_enhance_extras.py:750-857``): auto-download a
checkpoint per model_type (44khz/24khz/16khz), ``encode`` to latents,
``decode`` back.  This module implements the DAC architecture natively:

* Encoder: conv stem -> 4 strided blocks of Snake-activated residual
  units (dilations 1/3/9), channel-doubling per stride.
* Residual vector quantizer: ``n_codebooks`` stages, each with a
  low-dim (8) projected codebook of 1024 entries.
* Decoder: mirrored transposed-conv stack.
* Strides per model_type match upstream: 44khz (2,4,8,8) hop 512,
  24khz/16khz (2,4,5,8) hop 320.

Weights: seeded init through the weight store (utils/weights) until a
converted checkpoint is provided; ``build_dac`` caches per model_type
like the reference's auto-download cache.  Channels ride the batch
axis; everything jits.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DACConfig:
    sample_rate: int = 44100
    encoder_dim: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    # residual-BRANCH scale: upstream checkpoints expect plain adds
    # (1.0, their weight_norm keeps activations tame); the in-repo
    # distilled config trains without weight norm and uses 0.5 to stop
    # the Snake stack's variance compounding (std ~14 at the decoder
    # output saturated the final tanh and froze training)
    res_scale: float = 1.0
    # upstream decoders end in tanh; the distilled config disables it:
    # with un-weight-normed kernels the pre-activation scale makes tanh
    # saturation an absorbing state under training (observed repeatedly
    # in overfit probes — mse pinned at signal+1.0, zero gradients)
    output_tanh: bool = True
    # Snake alpha floor: 0.0 (off) for converted upstream checkpoints —
    # flooring would silently change outputs for any learned alpha below
    # the floor (x + sin^2(ax)/(a+1e-9) upstream).  The distilled
    # training configs set 0.05: as alpha -> 0 the term tends to
    # alpha*x^2, a quadratic amplifier that measurably exploded latent
    # RMS (18 -> 655) during in-repo distillation.
    alpha_floor: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def latent_dim(self) -> int:
        return self.encoder_dim * (2 ** len(self.strides))

    @property
    def hop(self) -> int:
        h = 1
        for s in self.strides:
            h *= s
        return h


MODEL_TYPES = {
    "44khz": DACConfig(sample_rate=44100, strides=(2, 4, 8, 8)),
    "24khz": DACConfig(sample_rate=24000, strides=(2, 4, 5, 8)),
    "16khz": DACConfig(sample_rate=16000, strides=(2, 4, 5, 8)),
}


def snake(x: jnp.ndarray, alpha: jnp.ndarray, floor: float = 0.0) -> jnp.ndarray:
    """Snake activation ``x + sin^2(alpha x)/alpha`` (periodic inductive
    bias for audio; DAC/BigVGAN lineage).

    ``floor`` > 0 clamps alpha from below (distilled-training configs:
    as alpha -> 0 the term tends to ``alpha * x^2``, a quadratic
    amplifier that measurably exploded latent RMS 18 -> 655).  Converted
    upstream checkpoints run floor=0.0 — exact upstream semantics
    ``x + sin^2(ax)/(a+1e-9)`` whatever alpha the checkpoint learned."""
    a = (jnp.maximum(alpha, floor) if floor > 0.0 else alpha)[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


class Snake(nn.Module):
    channels: int
    floor: float = 0.0

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        return snake(x, alpha, self.floor)


class ResidualUnit(nn.Module):
    channels: int
    dilation: int
    dtype: jnp.dtype
    res_scale: float = 1.0
    alpha_floor: float = 0.0

    @nn.compact
    def __call__(self, x):
        h = Snake(self.channels, self.alpha_floor)(x)
        h = nn.Conv(self.channels, (7,), kernel_dilation=(self.dilation,),
                    dtype=self.dtype)(h)
        h = Snake(self.channels, self.alpha_floor)(h)
        h = nn.Conv(self.channels, (1,), dtype=self.dtype)(h)
        # scale ONLY the residual branch: scaling the sum (x+h) decays
        # the identity path by res_scale^12 across a coder (~0.016 at
        # 0.707), which destroyed autoencoder learnability
        return x + self.res_scale * h


class EncoderBlock(nn.Module):
    out_channels: int
    stride: int
    dtype: jnp.dtype
    res_scale: float = 1.0
    alpha_floor: float = 0.0

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        for d in (1, 3, 9):
            x = ResidualUnit(ch, d, self.dtype, self.res_scale,
                             self.alpha_floor)(x)
        x = Snake(ch, self.alpha_floor)(x)
        return nn.Conv(self.out_channels, (2 * self.stride,),
                       strides=(self.stride,), dtype=self.dtype)(x)


class DecoderBlock(nn.Module):
    out_channels: int
    stride: int
    dtype: jnp.dtype
    res_scale: float = 1.0
    alpha_floor: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = Snake(x.shape[-1], self.alpha_floor)(x)
        x = nn.ConvTranspose(self.out_channels, (2 * self.stride,),
                             strides=(self.stride,), dtype=self.dtype)(x)
        for d in (1, 3, 9):
            x = ResidualUnit(self.out_channels, d, self.dtype,
                             self.res_scale, self.alpha_floor)(x)
        return x


class DACEncoder(nn.Module):
    cfg: DACConfig

    @nn.compact
    def __call__(self, x):
        """``[B, T, 1] -> [B, T/hop, latent_dim]``."""
        c = self.cfg
        h = nn.Conv(c.encoder_dim, (7,), dtype=c.dtype)(x)
        ch = c.encoder_dim
        for s in c.strides:
            ch *= 2
            h = EncoderBlock(ch, s, c.dtype, c.res_scale, c.alpha_floor)(h)
        h = Snake(ch, c.alpha_floor)(h)
        return nn.Conv(c.latent_dim, (3,), dtype=c.dtype)(h).astype(jnp.float32)


class DACDecoder(nn.Module):
    cfg: DACConfig

    @nn.compact
    def __call__(self, z):
        """``[B, T/hop, latent_dim] -> [B, T]``."""
        c = self.cfg
        h = nn.Conv(c.decoder_dim, (7,), dtype=c.dtype)(z)
        ch = c.decoder_dim
        for s in reversed(c.strides):
            ch //= 2
            h = DecoderBlock(ch, s, c.dtype, c.res_scale, c.alpha_floor)(h)
        h = Snake(ch, c.alpha_floor)(h)
        # zero-init: the un-weight-normed Snake stack reaches this layer
        # with std ~14, which saturates tanh at any reasonable kernel
        # scale and kills training gradients; init only (converted real
        # checkpoints overwrite it)
        h = nn.Conv(1, (7,), kernel_init=nn.initializers.zeros,
                    dtype=c.dtype)(h)
        h = h.astype(jnp.float32)[..., 0]
        return jnp.tanh(h) if c.output_tanh else h


class ResidualVQ(nn.Module):
    """Residual vector quantization with projected codebooks."""
    cfg: DACConfig

    @nn.compact
    def __call__(self, z, with_losses: bool = False,
                 collect_stage_data: bool = False):
        """``[B, T, D] -> (z_q [B, T, D], codes [B, n_q, T])``.

        ``with_losses=True`` (training) additionally returns
        ``(commit, codebook)``: the VQ-VAE commitment loss (pulls the
        encoder toward its quantized projection) and the codebook loss
        (pulls codebook entries toward the encoder projections), both in
        the per-stage projected space — the straight-through estimator's
        standard companion terms.  ``collect_stage_data=True``
        additionally appends ``r_stack [n_q, B, T, d]``, the per-stage
        projected residuals (stop-gradient) that EMA codebook updates
        consume."""
        c = self.cfg
        residual = z
        z_q = jnp.zeros_like(z)
        codes = []
        r_stages = []
        commit = codebook_loss = 0.0
        for i in range(c.n_codebooks):
            proj_in = nn.Dense(c.codebook_dim, name=f"proj_in_{i}",
                               dtype=jnp.float32)
            proj_out = nn.Dense(c.latent_dim, name=f"proj_out_{i}",
                                dtype=jnp.float32)
            book = self.param(f"codebook_{i}", nn.initializers.normal(1.0),
                              (c.codebook_size, c.codebook_dim))
            r = proj_in(residual)                               # [B, T, d]
            d2 = (jnp.sum(r ** 2, -1, keepdims=True)
                  - 2.0 * r @ book.T
                  + jnp.sum(book ** 2, -1)[None, None, :])      # [B, T, K]
            idx = jnp.argmin(d2, axis=-1)                       # [B, T]
            q_r = book[idx]                                     # [B, T, d]
            if collect_stage_data:
                r_stages.append(jax.lax.stop_gradient(r))
            if with_losses:
                # scale-invariant: the un-weight-normed encoder's output
                # magnitude is init-dependent; normalizing by sg(E[r^2])
                # keeps these terms O(1) at any scale
                denom = jax.lax.stop_gradient(jnp.mean(jnp.square(r))) + 1e-6
                commit = commit + jnp.mean(
                    jnp.square(r - jax.lax.stop_gradient(q_r))) / denom
                codebook_loss = codebook_loss + jnp.mean(
                    jnp.square(jax.lax.stop_gradient(r) - q_r)) / denom
                # straight-through in projected space so decoder grads
                # reach proj_in/encoder through the quantizer
                q_r = r + jax.lax.stop_gradient(q_r - r)
            q = proj_out(q_r)                                   # [B, T, D]
            z_q = z_q + q
            residual = residual - q
            codes.append(idx)
        if with_losses and collect_stage_data:
            return (z_q, jnp.stack(codes, axis=1), commit, codebook_loss,
                    jnp.stack(r_stages, axis=0))
        if with_losses:
            return z_q, jnp.stack(codes, axis=1), commit, codebook_loss
        return z_q, jnp.stack(codes, axis=1)


class DACModel:
    """encode/decode wrapper holding the three Flax modules."""

    def __init__(self, cfg: DACConfig):
        self.cfg = cfg
        self.encoder = DACEncoder(cfg)
        self.decoder = DACDecoder(cfg)
        self.rvq = ResidualVQ(cfg)

    def init_params(self, seed: int = 0) -> Dict:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        t = self.cfg.hop * 4
        x = jnp.zeros((1, t, 1), jnp.float32)
        z = jnp.zeros((1, 4, self.cfg.latent_dim), jnp.float32)
        return {
            "encoder": self.encoder.init(k1, x),
            "decoder": self.decoder.init(k2, z),
            "rvq": self.rvq.init(k3, z),
        }

    def preprocess(self, x_ct: jnp.ndarray) -> jnp.ndarray:
        """Right-pad ``[C, T]`` to a hop multiple (reference
        ``model.preprocess`` analog)."""
        t = x_ct.shape[-1]
        pad = (-t) % self.cfg.hop
        return jnp.pad(x_ct, ((0, 0), (0, pad)))

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode(self, params, x_ct):
        z = self.encoder.apply(params["encoder"], x_ct[..., None])
        z_q, codes = self.rvq.apply(params["rvq"], z)
        return z_q, codes

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode(self, params, z):
        return self.decoder.apply(params["decoder"], z)

    def encode(self, params, x_ct: jnp.ndarray):
        """``[C, T] -> (z_q [C, T/hop, D], codes [C, n_q, T/hop])``."""
        return self._encode(params, self.preprocess(x_ct))

    def decode(self, params, z: jnp.ndarray) -> jnp.ndarray:
        return self._decode(params, z)


_CACHE: Dict[str, Tuple[DACModel, Dict, int]] = {}


def build_dac(model_type: str = "44khz", seed: int = 0):
    """(model, params, sample_rate) per model_type, cached — the analog
    of the reference's ``dac.utils.download`` + ``DAC.load`` (:760-761),
    backed by the weight store instead of the network."""
    if model_type not in MODEL_TYPES:
        raise ValueError(f"unknown DAC model_type {model_type!r}")
    if model_type not in _CACHE:
        cfg = MODEL_TYPES[model_type]
        model = DACModel(cfg)
        from ...utils.weights import load_params, save_params, weights_dir
        cache = weights_dir() / f"dac_{model_type}.npz"
        if cache.exists():                 # converted real checkpoint
            params = load_params(cache)
        else:
            from .train import load_pretrained
            shipped = load_pretrained(model_type)
            if shipped is not None:        # in-repo distilled compact codec
                cfg, params = shipped
                model = DACModel(cfg)
            else:
                # fail-loud, matching the weight store's FlashSR report
                # (install.py): a random-init codec roundtrip is garbage
                print(f"[egregora] WARNING: no DAC weights for "
                      f"{model_type!r} (no converted checkpoint at "
                      f"{cache} and no shipped distilled weights) — "
                      f"serving RANDOM-INIT params; encode/decode output "
                      f"will be garbage", flush=True)
                params = model.init_params(seed)
        _CACHE[model_type] = (model, params, cfg.sample_rate)
    return _CACHE[model_type]


def dac_name_map(cfg: DACConfig = DACConfig()):
    """Upstream descript-audio-codec checkpoint naming -> this tree.

    Upstream modules (dac/model/dac.py): ``encoder.block.{i}`` /
    ``decoder.model.{i}`` Sequentials of Snake1d + WNConv1d layers,
    ``quantizer.quantizers.{q}.{in_proj,out_proj,codebook}``.
    weight_norm pairs fold before this map; Snake1d alphas are
    ``[1, C, 1]`` (-> flat ``[C]``) and the RVQ projections are 1x1
    convs ``[out, in, 1]`` (-> dense ``[in, out]``) — both handled via
    callable transforms.
    """
    flat = lambda v: v.reshape(-1)                       # Snake alpha
    px = lambda v: v[:, :, 0].T                          # 1x1 conv -> dense
    m = {}

    def res_unit(t_prefix, f_prefix):
        m[f"{t_prefix}.block.0.alpha"] = (f"{f_prefix}/Snake_0/alpha", flat)
        m[f"{t_prefix}.block.1.weight"] = f"{f_prefix}/Conv_0/kernel"
        m[f"{t_prefix}.block.1.bias"] = f"{f_prefix}/Conv_0/bias"
        m[f"{t_prefix}.block.2.alpha"] = (f"{f_prefix}/Snake_1/alpha", flat)
        m[f"{t_prefix}.block.3.weight"] = f"{f_prefix}/Conv_1/kernel"
        m[f"{t_prefix}.block.3.bias"] = f"{f_prefix}/Conv_1/bias"

    n = len(cfg.strides)
    # encoder: block.0 stem, block.{1..n} EncoderBlocks, then Snake + conv
    m["encoder.block.0.weight"] = "encoder/params/Conv_0/kernel"
    m["encoder.block.0.bias"] = "encoder/params/Conv_0/bias"
    for b in range(n):
        base_t = f"encoder.block.{b + 1}"
        base_f = f"encoder/params/EncoderBlock_{b}"
        for r in range(3):
            res_unit(f"{base_t}.block.{r}", f"{base_f}/ResidualUnit_{r}")
        m[f"{base_t}.block.3.alpha"] = (f"{base_f}/Snake_0/alpha", flat)
        m[f"{base_t}.block.4.weight"] = f"{base_f}/Conv_0/kernel"
        m[f"{base_t}.block.4.bias"] = f"{base_f}/Conv_0/bias"
    m[f"encoder.block.{n + 1}.alpha"] = ("encoder/params/Snake_0/alpha", flat)
    m[f"encoder.block.{n + 2}.weight"] = "encoder/params/Conv_1/kernel"
    m[f"encoder.block.{n + 2}.bias"] = "encoder/params/Conv_1/bias"

    # decoder: model.0 stem, model.{1..n} DecoderBlocks, Snake, conv out
    m["decoder.model.0.weight"] = "decoder/params/Conv_0/kernel"
    m["decoder.model.0.bias"] = "decoder/params/Conv_0/bias"
    for b in range(n):
        base_t = f"decoder.model.{b + 1}"
        base_f = f"decoder/params/DecoderBlock_{b}"
        m[f"{base_t}.block.0.alpha"] = (f"{base_f}/Snake_0/alpha", flat)
        m[f"{base_t}.block.1.weight"] = (f"{base_f}/ConvTranspose_0/kernel",
                                         (2, 0, 1))     # torch [in,out,k]
        m[f"{base_t}.block.1.bias"] = f"{base_f}/ConvTranspose_0/bias"
        for r in range(3):
            res_unit(f"{base_t}.block.{r + 2}", f"{base_f}/ResidualUnit_{r}")
    m[f"decoder.model.{n + 1}.alpha"] = ("decoder/params/Snake_0/alpha", flat)
    m[f"decoder.model.{n + 2}.weight"] = "decoder/params/Conv_1/kernel"
    m[f"decoder.model.{n + 2}.bias"] = "decoder/params/Conv_1/bias"

    # residual VQ
    for q in range(cfg.n_codebooks):
        base = f"quantizer.quantizers.{q}"
        m[f"{base}.in_proj.weight"] = (f"rvq/params/proj_in_{q}/kernel", px)
        m[f"{base}.in_proj.bias"] = f"rvq/params/proj_in_{q}/bias"
        m[f"{base}.out_proj.weight"] = (f"rvq/params/proj_out_{q}/kernel", px)
        m[f"{base}.out_proj.bias"] = f"rvq/params/proj_out_{q}/bias"
        m[f"{base}.codebook.weight"] = f"rvq/params/codebook_{q}"
    return m.get
