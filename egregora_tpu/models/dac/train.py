"""DAC synthetic distillation — functional in-repo codec weights.

The reference consumes upstream descript-audio-codec checkpoints
(``egregora_audio_enhance_extras.py:750-857``: auto-download per
model_type, encode to codes, decode back).  This environment has zero
egress, so — exactly as for RNNoise/DFN/FlashSR — a compact DAC is
trained here on synthetic music-like audio and shipped as
``pretrained_44khz.npz``; real converted checkpoints (``dac_name_map``)
always take precedence in ``build_dac``.

Objective: VQ-VAE with straight-through residual quantization —
multi-scale log-STFT + waveform L2 reconstruction, plus the standard
commitment/codebook terms from ``ResidualVQ(with_losses=True)``.
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import DACConfig, DACModel

PRETRAINED = {"44khz": Path(__file__).parent / "pretrained_44khz.npz"}


def distilled_config(model_type: str = "44khz") -> DACConfig:
    """Compact trio of the upstream 44 kHz structure (same strides ->
    same hop/code rate, fewer channels/codebooks)."""
    assert model_type == "44khz", "shipped distilled weights are 44khz-only"
    return DACConfig(sample_rate=44100, encoder_dim=16, strides=(2, 4, 8, 8),
                     decoder_dim=256, n_codebooks=6, codebook_size=1024,
                     codebook_dim=8)


def _stft_l2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    from ...ops.stft import stft_conv
    total = 0.0
    for n_fft, hop in ((512, 128), (2048, 512)):
        rx, ix = stft_conv(x, n_fft, hop, window="hann_periodic")
        ry, iy = stft_conv(y, n_fft, hop, window="hann_periodic")
        mx = jnp.sqrt(rx * rx + ix * ix + 1e-9)
        my = jnp.sqrt(ry * ry + iy * iy + 1e-9)
        # spectral convergence (scale-normalized) + log-mag L1 — the
        # standard multi-resolution pair; an unnormalized linear-mag L2
        # is dominated by tonal peak bins and destabilizes training
        total = total + jnp.sum(jnp.square(mx - my)) / (jnp.sum(jnp.square(my)) + 1e-9)
        total = total + jnp.mean(jnp.abs(jnp.log(mx) - jnp.log(my)))
    return total


def loss_fn(model: DACModel, params: dict, wav: jnp.ndarray) -> jnp.ndarray:
    """``wav [B, T]`` -> scalar.  Encoder/RVQ-ST/decoder roundtrip.

    ``scale_reg`` anchors the encoder's output RMS at 1: without it the
    scale-invariant VQ terms admit runaway latent drift (RMS 18 -> 655
    observed).  ``(rms - 1)^2`` keeps a scale-independent restoring
    gradient (~z/N) where a log-power penalty's force vanishes as the
    scale grows."""
    z = model.encoder.apply(params["encoder"], wav[..., None])
    z_q, _, commit, codebook = model.rvq.apply(params["rvq"], z,
                                               with_losses=True)
    rec = model.decoder.apply(params["decoder"], z_q)[:, : wav.shape[-1]]
    wave_l2 = jnp.mean(jnp.square(rec - wav))
    rms = jnp.sqrt(jnp.mean(jnp.square(z)) + 1e-9)
    scale_reg = jnp.square(rms - 1.0)
    return (20.0 * wave_l2 + _stft_l2(rec, wav) + 0.25 * commit + codebook
            + 0.5 * scale_reg)


def make_train_step(model: DACModel, tx: optax.GradientTransformation):
    @jax.jit
    def step(params, opt_state, wav):
        loss, grads = jax.value_and_grad(
            functools.partial(loss_fn, model))(params, wav)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_scan_step(model: DACModel, tx: optax.GradientTransformation,
                   batch: int, length: int, sr: int, scan_size: int):
    """``scan_size`` optimizer steps per dispatch, data synthesized on
    device — the host sends one PRNG key per dispatch.  Through the
    remote-TPU relay each dispatch costs ~50-60 ms fixed, so unbatched
    stepping would spend more time on round trips than on training."""
    from ..flashsr.distill import synth_pair_batch

    def one(carry, k):
        params, opt_state = carry
        _, hr = synth_pair_batch(k, batch, length, sr=sr)
        loss, grads = jax.value_and_grad(
            functools.partial(loss_fn, model))(params, hr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def steps(params, opt_state, key):
        keys = jax.random.split(key, scan_size)
        (params, opt_state), losses = jax.lax.scan(one, (params, opt_state), keys)
        return params, opt_state, jnp.mean(losses)

    return steps


def train(cfg: DACConfig = None, steps: int = 2000, batch: int = 8,
          length: int = 16384, lr: float = 3e-4, seed: int = 0,
          log_every: int = 100, scan_size: int = 1):
    """Returns trained params (and the loss curve tail for gating)."""
    from ..flashsr.distill import synth_pair_batch

    cfg = cfg or distilled_config()
    model = DACModel(cfg)
    params = model.init_params(seed)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps, 0.1),
                    weight_decay=1e-5))
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + 1)
    if scan_size > 1:
        scan_step = make_scan_step(model, tx, batch, length, cfg.sample_rate,
                                   scan_size)
        for i in range(0, steps, scan_size):
            key, k = jax.random.split(key)
            params, opt_state, loss = scan_step(params, opt_state, k)
            if log_every:
                print(f"[dac-distill] step {i}..{i + scan_size - 1} "
                      f"mean loss {float(loss):.4f}", flush=True)
        return model, params
    step = make_train_step(model, tx)
    for i in range(steps):
        key, k = jax.random.split(key)
        _, hr = synth_pair_batch(k, batch, length, sr=cfg.sample_rate)
        params, opt_state, loss = step(params, opt_state, hr)
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[dac-distill] step {i} loss {float(loss):.4f}", flush=True)
    return model, params


def save_pretrained(params, path: Path) -> None:
    from ...utils.weights import _flatten
    flat = {k: np.asarray(v, np.float16) for k, v in _flatten(params).items()}
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_pretrained(model_type: str = "44khz"):
    """(config, params) for the shipped compact codec, or None."""
    path = PRETRAINED.get(model_type)
    if path is None or not path.exists():
        return None
    from ...utils.weights import _unflatten
    with np.load(path) as z:
        params = _unflatten({k: z[k].astype(np.float32) for k in z.files})
    return distilled_config(model_type), params


def roundtrip_snr_db(model: DACModel, params, wav: np.ndarray) -> float:
    """Codec roundtrip SNR on ``[C, T]`` — the quality-gate metric."""
    x = jnp.asarray(wav, jnp.float32)
    z_q, _ = model.encode(params, x)
    rec = np.asarray(model.decode(params, z_q))[:, : wav.shape[-1]]
    err = np.mean(np.square(rec - np.asarray(wav)))
    sig = np.mean(np.square(np.asarray(wav))) + 1e-12
    return float(10.0 * np.log10(sig / (err + 1e-12)))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="Distill compact DAC weights")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=16384)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan", type=int, default=1,
                    help="optimizer steps per dispatch (use ~20 on TPU)")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("devices:", jax.devices(), flush=True)
    model, params = train(steps=a.steps, batch=a.batch, length=a.length,
                          lr=a.lr, seed=a.seed, scan_size=a.scan)
    from ..flashsr.distill import synth_pair_batch
    _, hr = synth_pair_batch(jax.random.PRNGKey(99), 4, 44100)
    snr = roundtrip_snr_db(model, params, np.asarray(hr))
    print(f"[dac-distill] held-out roundtrip SNR {snr:.2f} dB", flush=True)
    save_pretrained(params, PRETRAINED["44khz"])
    print(f"[dac-distill] wrote {PRETRAINED['44khz']}", flush=True)
