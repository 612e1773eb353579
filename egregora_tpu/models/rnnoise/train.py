"""Train the RNNoise-class denoiser on synthetic mixtures.

The reference consumes xiph's pretrained RNNoise weights through the C
library; in a zero-egress environment those can't be fetched, so this
module makes the denoiser *functionally real* instead of random: the
whole frame pipeline (band analysis -> GRU stack -> gains -> OLA) is
differentiable, so we distill a denoiser from synthetic speech-proxy +
noise mixtures generated on the fly.

Data: "speech" = harmonic stacks with random f0 and syllabic (≈4 Hz)
on/off envelopes; "noise" = white + lowpassed noise at random SNR.
Loss: mel-ish band-domain MSE between the denoised output and the
clean target, plus BCE of the per-frame VAD against the envelope.
~100K params; a few hundred Adam steps suffice for a clearly
functional denoiser (see tests/test_rnnoise_training.py).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import FRAME, denoise_channel, init_params

SR = 48000


def synth_batch(rng: np.random.Generator, batch: int, frames: int
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(noisy, clean, vad_target[frames]) batches of ``frames*FRAME`` samples."""
    t = frames * FRAME
    time = np.arange(t) / SR
    noisy = np.empty((batch, t), np.float32)
    clean = np.empty((batch, t), np.float32)
    vad = np.empty((batch, frames), np.float32)
    for b in range(batch):
        f0 = rng.uniform(100, 300)
        n_h = 8
        amps = rng.uniform(0.05, 0.3, n_h) / np.arange(1, n_h + 1)
        speech = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * time + rng.uniform(0, 6.28))
                     for h, a in enumerate(amps))
        # syllabic on/off envelope, smoothed
        env_rate = rng.uniform(2.0, 6.0)
        gate = (np.sin(2 * np.pi * env_rate * time + rng.uniform(0, 6.28)) > 0)
        k = int(0.01 * SR)
        env = np.convolve(gate.astype(np.float32), np.ones(k) / k, mode="same")
        s = (speech * env).astype(np.float32)

        noise = rng.standard_normal(t).astype(np.float32)
        if rng.uniform() < 0.5:  # lowpass-ish colored noise half the time
            noise = np.convolve(noise, np.ones(8) / 8, mode="same").astype(np.float32)
        snr_db = rng.uniform(0.0, 15.0)
        s_pow = np.mean(s ** 2) + 1e-9
        n_pow = np.mean(noise ** 2) + 1e-9
        noise *= np.sqrt(s_pow / n_pow / 10 ** (snr_db / 10))

        clean[b] = s
        noisy[b] = s + noise
        fr_env = env.reshape(frames, FRAME).mean(axis=1)
        vad[b] = (fr_env > 0.3).astype(np.float32)
    peak = np.abs(noisy).max(axis=1, keepdims=True) + 1e-6
    scale = np.minimum(1.0, 0.8 / peak)
    return noisy * scale, clean * scale, vad


def _band_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Log band-energy distance on 960-sample windows (differentiable,
    matches the model's own analysis bands)."""
    from .model import WINDOW, _band_matrix_energy, _vorbis_window
    win = jnp.asarray(_vorbis_window())
    bm = jnp.asarray(_band_matrix_energy())
    n = a.shape[-1] // FRAME - 1

    def spec_bands(x):
        fr = jnp.stack([x[..., i * FRAME:(i * FRAME + WINDOW)] for i in range(n)],
                       axis=-2) * win
        s = jnp.fft.rfft(fr, axis=-1)
        return jnp.log10((jnp.abs(s) ** 2) @ bm + 1e-6)

    return jnp.mean(jnp.square(spec_bands(a) - spec_bands(b)))


def filtered_target(clean: jnp.ndarray) -> jnp.ndarray:
    """RNNoise's input DC-blocking biquad applied to the clean target.

    The model denoises the FILTERED signal (exactly like the C library,
    whose output keeps the filter's coloration: |H|=0.95 / +12° at
    220 Hz).  Training against the raw clean would demand the network
    undo that phase lead — impossible with real band gains — and caps
    attainable SNR at ~14 dB for low fundamentals (measured).
    """
    from ...ops.iir import biquad
    from .model import PCM_SCALE
    return biquad(clean * PCM_SCALE,
                  b=(-1.99599, 0.99600), a=(-1.98989, 0.98990)) / PCM_SCALE


def loss_fn(params: Dict, noisy: jnp.ndarray, clean: jnp.ndarray,
            vad_t: jnp.ndarray) -> jnp.ndarray:
    """Oracle band-gain distillation (the xiph training formulation):
    the RNN's 22 gains regress the ideal ratio sqrt(Eclean/Enoisy) per
    band under a gamma=0.5 warp, plus VAD BCE and a small end-to-end
    spectral/waveform term that keeps the comb/floor stages honest.
    """
    from .model import band_energies, denoise_channel_full

    clean = filtered_target(clean)
    out, vad, gains, ex = jax.vmap(
        lambda x: denoise_channel_full(params, x))(noisy)

    ec = jax.vmap(band_energies)(clean)               # [B, F, 22]
    g_star = jnp.clip(jnp.sqrt(ec / (ex + 1e-9)), 0.0, 1.0)
    gamma = 0.5
    # only bands that carry signal in the mixture are supervised
    # (RNNoise leaves untrainable gains out of its loss the same way)
    active = (ex > 1e-2).astype(jnp.float32)
    l_gain = jnp.sum(active * jnp.square(gains ** gamma - g_star ** gamma)
                     ) / (jnp.sum(active) + 1.0)

    # the OLA pipeline has RNNoise's inherent one-frame (10 ms)
    # lookahead delay: out[n] reconstructs input sample n - FRAME.
    out_a = out[:, 2 * FRAME:]
    clean_a = clean[:, FRAME:-FRAME]
    l_spec = _band_mse(out_a, clean_a)
    l_wave = 10.0 * jnp.mean(jnp.square(out_a - clean_a))

    eps = 1e-6
    vad_a = vad[:, 1:]
    vad_ta = vad_t[:, :-1]
    l_vad = -jnp.mean(vad_ta * jnp.log(vad_a + eps)
                      + (1 - vad_ta) * jnp.log(1 - vad_a + eps))
    return 10.0 * l_gain + 0.2 * l_vad + 0.2 * l_spec + l_wave


def train(steps: int = 300, batch: int = 8, frames: int = 50, lr: float = 3e-3,
          seed: int = 0, log_every: int = 50) -> Dict:
    params = init_params(seed)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1), 0.05)))
    opt = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt, noisy, clean, vad_t):
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean, vad_t)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(steps):
        noisy, clean, vad_t = synth_batch(rng, batch, frames)
        params, opt, loss = step(params, opt, jnp.asarray(noisy),
                                 jnp.asarray(clean), jnp.asarray(vad_t))
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[rnnoise-train] step {i}: loss {float(loss):.4f}", flush=True)
    return params


def synth_batch_device(key, batch: int, frames: int):
    """Device-side mirror of rnnoise.train.synth_batch (harmonic
    speech-proxy + noise at random SNR): lets distillation run on the
    TPU with the generator fused into the jitted step — no host synth,
    no transfers (this box has ONE cpu core; numpy generation would
    serialize against everything else)."""
    import jax

    from .model import FRAME
    _SR = SR
    t = frames * FRAME
    time = jnp.arange(t, dtype=jnp.float32) / _SR

    def movavg(x, k):
        cs = jnp.cumsum(jnp.pad(x, (k // 2 + 1, k - k // 2)))
        return (cs[k:] - cs[:-k])[:t] / k

    def one(k):
        ks = jax.random.split(k, 8)
        f0 = jax.random.uniform(ks[0], (), minval=100.0, maxval=300.0)
        h = jnp.arange(1, 9, dtype=jnp.float32)
        amps = jax.random.uniform(ks[1], (8,), minval=0.05, maxval=0.3) / h
        ph = jax.random.uniform(ks[2], (8,), maxval=6.28)
        sp = jnp.sum(amps[:, None] * jnp.sin(
            2 * jnp.pi * f0 * h[:, None] * time[None, :] + ph[:, None]), axis=0)
        env_rate = jax.random.uniform(ks[3], (), minval=2.0, maxval=6.0)
        gate = (jnp.sin(2 * jnp.pi * env_rate * time
                        + jax.random.uniform(ks[4], (), maxval=6.28)) > 0)
        env = movavg(gate.astype(jnp.float32), int(0.01 * _SR))
        s = sp * env

        noise = jax.random.normal(ks[5], (t,), jnp.float32)
        noise = jnp.where(jax.random.uniform(ks[6], ()) < 0.5,
                          movavg(noise, 8), noise)
        snr_db = jax.random.uniform(ks[7], (), minval=0.0, maxval=15.0)
        s_pow = jnp.mean(s * s) + 1e-9
        n_pow = jnp.mean(noise * noise) + 1e-9
        noise = noise * jnp.sqrt(s_pow / n_pow / 10 ** (snr_db / 10))

        vad = (env.reshape(frames, FRAME).mean(axis=1) > 0.3).astype(jnp.float32)
        return s + noise, s, vad

    noisy, clean, vad = jax.vmap(one)(jax.random.split(key, batch))
    peak = jnp.max(jnp.abs(noisy), axis=1, keepdims=True) + 1e-6
    scale = jnp.minimum(1.0, 0.8 / peak)
    return noisy * scale, clean * scale, vad


def pretrained_path() -> Path:
    return Path(__file__).resolve().parent / "pretrained.npz"


def load_pretrained() -> Dict | None:
    """Shipped synthetic-distilled weights, if present."""
    p = pretrained_path()
    if not p.exists():
        return None
    from ...utils.weights import load_params
    return load_params(p)


def train_device(steps: int = 4000, batch: int = 16, frames: int = 50,
                 lr: float = 3e-3, seed: int = 0, log_every: int = 250) -> Dict:
    """Distill on the default backend (TPU) with on-device data synth."""
    params = init_params(seed)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05)))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        noisy, clean, vad_t = synth_batch_device(key, batch, frames)
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean, vad_t)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    base = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.fold_in(base, i))
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[rnnoise-train] step {i}: loss {float(loss):.4f}", flush=True)
    return params


if __name__ == "__main__":
    import argparse
    import jax as _jax

    ap = argparse.ArgumentParser(description="Distill RNNoise shipped weights")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        _jax.config.update("jax_platforms", "cpu")
    print("devices:", _jax.devices(), flush=True)
    params = train_device(steps=a.steps, batch=a.batch)
    from ...utils.weights import save_params  # pragma: no cover
    save_params(params, pretrained_path())
    print(f"saved {pretrained_path()}")
