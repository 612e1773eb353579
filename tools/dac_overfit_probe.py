"""DAC AE overfit probes: can the autoencoder memorize ONE fixed batch?

Decides what binds the +5 dB AE plateau.  Round-4 baseline run (this
geometry, combined loss, bf16): stalls at +9 dB after 3000 steps — a
capacity/optimization bound, not a schedule bound.  The variants below
ablate the loss mix, width, LR, and compute dtype one at a time.
PYTHONPATH=/root/repo:/root/.axon_site python tools/dac_overfit_probe.py [variant ...]
"""
import dataclasses as dc
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from egregora_tpu.models.dac.model import DACConfig, DACModel
from egregora_tpu.models.dac.train import ae_loss_fn, distilled_config
from egregora_tpu.models.flashsr.distill import synth_pair_batch

BASE = dict(encoder_dim=32, codebook_dim=32, decoder_dim=512,
            strides=(2, 4, 4, 2))


def pure_l2_loss(model, params, wav):
    z = model.encoder.apply(params["encoder"], wav[..., None])
    rec = model.decoder.apply(params["decoder"], z)[:, : wav.shape[-1]]
    rms = jnp.sqrt(jnp.mean(jnp.square(z)) + 1e-9)
    return 40.0 * jnp.mean(jnp.square(rec - wav)) + 0.5 * jnp.square(rms - 1.0)


VARIANTS = {
    # name: (config overrides, loss fn, lr)
    "baseline": ({}, ae_loss_fn, 3e-4),
    "pure-l2": ({}, pure_l2_loss, 3e-4),
    "wide": (dict(encoder_dim=64, decoder_dim=1024), ae_loss_fn, 3e-4),
    "lr1e-3": ({}, ae_loss_fn, 1e-3),
    "f32": (dict(dtype=jnp.float32), ae_loss_fn, 3e-4),
}


def run(name, steps=3000):
    over, loss, lr = VARIANTS[name]
    cfg = dc.replace(distilled_config("44khz"), **{**BASE, **over})
    model = DACModel(cfg)
    params = model.init_params(0)
    _, wav = synth_pair_batch(jax.random.PRNGKey(42), 4, 32768, sr=44100)
    wav = jax.device_put(wav)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt = tx.init(params)

    @jax.jit
    def scan_steps(p, o, w):
        def one(carry, _):
            p, o = carry
            lv, g = jax.value_and_grad(lambda q: loss(model, q, w))(p)
            up, o = tx.update(g, o, p)
            p = optax.apply_updates(p, up)
            return (p, o), lv
        (p, o), ls = jax.lax.scan(one, (p, o), jnp.arange(50))
        return p, o, ls[-1]

    @jax.jit
    def snr(p, w):
        z = model.encoder.apply(p["encoder"], w[..., None])
        rec = model.decoder.apply(p["decoder"], z)[:, : w.shape[-1]]
        err = jnp.mean(jnp.square(rec - w))
        return 10 * jnp.log10(jnp.mean(jnp.square(w)) / (err + 1e-12))

    print(f"=== variant {name} ({over}, lr={lr}) ===", flush=True)
    for i in range(steps // 50):
        params, opt, lv = scan_steps(params, opt, wav)
        if i % 10 == 9:
            print(f"[{name}] step {(i + 1) * 50}: loss {float(lv):.4f} "
                  f"overfit-SNR {float(snr(params, wav)):+.2f} dB", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["pure-l2", "f32", "wide", "lr1e-3"]
    print("devices:", jax.devices(), flush=True)
    for n in names:
        run(n)
