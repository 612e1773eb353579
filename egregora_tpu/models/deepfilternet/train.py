"""Synthetic distillation for the DeepFilterNet-class denoiser.

Same approach as models/rnnoise/train.py: the ERB-gain + deep-filter
pipeline is differentiable end-to-end, so in a zero-egress environment
(no upstream DFN checkpoints) we train it on synthetic speech-proxy +
noise mixtures and ship the weights.  Unlike the RNNoise OLA pipeline,
the DFN STFT/iSTFT pair reconstructs in place — no frame delay to
align for.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..rnnoise.train import synth_batch, synth_batch_device
from .model import DFNConfig, enhance_mono, init_params


def _band_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    from .model import HOP, N_FFT, erb_filterbank
    from ...ops.stft import stft_conv
    fb = jnp.asarray(erb_filterbank())
    ra, ia = stft_conv(a, N_FFT, HOP)
    rb, ib = stft_conv(b, N_FFT, HOP)
    ea = jnp.log10((ra * ra + ia * ia) @ fb + 1e-8)
    eb = jnp.log10((rb * rb + ib * ib) @ fb + 1e-8)
    return jnp.mean(jnp.square(ea - eb))


def loss_fn(params: Dict, noisy: jnp.ndarray, clean: jnp.ndarray) -> jnp.ndarray:
    """Oracle ERB-gain regression (gamma=0.5, the formulation that fixed
    the RNNoise distillation: well-conditioned, phase-free) plus the
    end-to-end spectral/waveform terms that keep the deep filter and
    WOLA stages honest."""
    from .model import enhance_mono_full, erb_band_energies

    out, gains, en = jax.vmap(
        lambda x: enhance_mono_full(params, x))(noisy)
    ec = jax.vmap(erb_band_energies)(clean)
    g_star = jnp.clip(jnp.sqrt(ec / (en + 1e-10)), 0.0, 1.0)
    active = (en > 1e-7).astype(jnp.float32)
    l_gain = jnp.sum(active * jnp.square(gains ** 0.5 - g_star ** 0.5)
                     ) / (jnp.sum(active) + 1.0)
    return (10.0 * l_gain + 0.3 * _band_mse(out, clean)
            + 10.0 * jnp.mean(jnp.square(out - clean)))



def train_device(steps: int = 1500, batch: int = 4, frames: int = 50,
                 lr: float = 1e-3, seed: int = 0, log_every: int = 100,
                 cfg: DFNConfig = DFNConfig()) -> Dict:
    """Distill on the default backend (TPU) with on-device data synth."""
    params = init_params(seed, cfg)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05)))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        noisy, clean, _ = synth_batch_device(key, batch, frames)
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    base = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.fold_in(base, i))
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[dfn-train] step {i}: loss {float(loss):.4f}", flush=True)
    return params


def train(steps: int = 1500, batch: int = 4, frames: int = 50, lr: float = 1e-3,
          seed: int = 0, log_every: int = 250) -> Dict:
    params = init_params(seed)
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, 0.05))
    opt = tx.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt, noisy, clean):
        loss, grads = jax.value_and_grad(loss_fn)(params, noisy, clean)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for i in range(steps):
        noisy, clean, _ = synth_batch(rng, batch, frames)
        params, opt, loss = step(params, opt, jnp.asarray(noisy),
                                 jnp.asarray(clean))
        if log_every and (i % log_every == 0 or i == steps - 1):
            print(f"[dfn-train] step {i}: loss {float(loss):.4f}", flush=True)
    return params


def pretrained_path(variant: str = "DeepFilterNet2") -> Path:
    name = ("pretrained.npz" if str(variant) == "DeepFilterNet2"
            else "pretrained_dfn3.npz")
    return Path(__file__).resolve().parent / name


def load_pretrained(variant: str = "DeepFilterNet2") -> Dict | None:
    """Per-VARIANT shipped weights: DFN2 and DFN3 are topologically
    different models here (grouped vs squeezed GRU), each with its own
    distilled weight set — like the reference's ``init_df(model_name)``
    dispatch (extras :509-517)."""
    p = pretrained_path(variant)
    if not p.exists():
        return None
    from ...utils.weights import load_params
    return load_params(p)


if __name__ == "__main__":
    import argparse
    import jax as _jax

    ap = argparse.ArgumentParser(description="Distill DFN shipped weights")
    ap.add_argument("--variant", default="DeepFilterNet2",
                    choices=["DeepFilterNet2", "DeepFilterNet3"])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        _jax.config.update("jax_platforms", "cpu")
    print("devices:", _jax.devices(), flush=True)
    cfg = DFNConfig.for_variant(a.variant)
    params = train_device(steps=a.steps, batch=a.batch, cfg=cfg)
    from ...utils.weights import save_params
    save_params(params, pretrained_path(a.variant))
    print(f"saved {pretrained_path(a.variant)}")
