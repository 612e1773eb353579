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
    from .model import WINDOW, _band_matrix, _vorbis_window
    win = jnp.asarray(_vorbis_window())
    bm = jnp.asarray(_band_matrix())
    n = a.shape[-1] // FRAME - 1

    def spec_bands(x):
        fr = jnp.stack([x[..., i * FRAME:(i * FRAME + WINDOW)] for i in range(n)],
                       axis=-2) * win
        s = jnp.fft.rfft(fr, axis=-1)
        return jnp.log10((jnp.abs(s) ** 2) @ bm + 1e-6)

    return jnp.mean(jnp.square(spec_bands(a) - spec_bands(b)))


def loss_fn(params: Dict, noisy: jnp.ndarray, clean: jnp.ndarray,
            vad_t: jnp.ndarray) -> jnp.ndarray:
    out, vad = jax.vmap(lambda x: denoise_channel(params, x))(noisy)
    # the OLA pipeline has RNNoise's inherent one-frame (10 ms)
    # lookahead delay: out[n] reconstructs input sample n - FRAME.
    # Align before comparing (and drop the half-windowed first frame).
    out_a = out[:, 2 * FRAME:]
    clean_a = clean[:, FRAME:-FRAME]
    l_spec = _band_mse(out_a, clean_a)
    l_wave = 10.0 * jnp.mean(jnp.square(out_a - clean_a))
    eps = 1e-6
    vad_a = vad[:, 1:]
    vad_ta = vad_t[:, :-1]
    l_vad = -jnp.mean(vad_ta * jnp.log(vad_a + eps)
                      + (1 - vad_ta) * jnp.log(1 - vad_a + eps))
    return l_spec + l_wave + 0.2 * l_vad


def train(steps: int = 300, batch: int = 8, frames: int = 50, lr: float = 3e-3,
          seed: int = 0, log_every: int = 50) -> Dict:
    params = init_params(seed)
    tx = optax.adam(lr)
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


def pretrained_path() -> Path:
    return Path(__file__).resolve().parent / "pretrained.npz"


def load_pretrained() -> Dict | None:
    """Shipped synthetic-distilled weights, if present."""
    p = pretrained_path()
    if not p.exists():
        return None
    from ...utils.weights import load_params
    return load_params(p)


if __name__ == "__main__":
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
    params = train()
    from ...utils.weights import save_params  # pragma: no cover
    save_params(params, pretrained_path())
    print(f"saved {pretrained_path()}")
