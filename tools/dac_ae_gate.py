"""Where is the DAC LSD bound — autoencoder or quantizer?

Evaluates the SHIPPED codecs on the official four-draw gate twice:
(a) full VQ roundtrip (the shipped number), (b) AE-only (encoder ->
decoder, RVQ bypassed).  If (b)'s LSD is already near the quality bar,
more quantizer work is pointless and the lever is AE capacity/recipe;
if (b) is far better, the RVQ is the binding stage.

Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dac_ae_gate.py [model_type ...]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from egregora_tpu.eval.metrics import lsd_sisdr_report
from egregora_tpu.models.dac.model import DACModel
from egregora_tpu.models.dac.train import GATE_KEYS, load_pretrained
from egregora_tpu.models.flashsr.distill import synth_pair_batch


def gate(model, params, quantize: bool):
    cfg = model.cfg
    sr = cfg.sample_rate
    pad = (-sr) % cfg.hop

    @jax.jit
    def ev(params):
        snrs, lsds = [], []
        for k in GATE_KEYS:
            _, hr = synth_pair_batch(jax.random.PRNGKey(k), 3, sr, sr=sr)
            x = jnp.pad(hr, ((0, 0), (0, pad)))
            z = model.encoder.apply(params["encoder"], x[..., None])
            if quantize:
                z, _ = model.rvq.apply(params["rvq"], z)
            rec = model.decoder.apply(params["decoder"], z)[:, :sr]
            err = jnp.mean(jnp.square(rec - hr))
            sig = jnp.mean(jnp.square(hr)) + 1e-12
            snrs.append(10.0 * jnp.log10(sig / (err + 1e-12)))
            lsds.append(jnp.mean(jnp.stack(
                [lsd_sisdr_report(hr[i], rec[i])["lsd_mean_db"]
                 for i in range(hr.shape[0])])))
        return jnp.stack(snrs), jnp.stack(lsds)

    snrs, lsds = (np.asarray(a) for a in ev(params))
    return {"mean_snr": round(float(snrs.mean()), 2),
            "worst_snr": round(float(snrs.min()), 2),
            "mean_lsd": round(float(lsds.mean()), 2)}


def main():
    types = sys.argv[1:] or ["44khz", "24khz", "16khz"]
    for t in types:
        cfg, params = load_pretrained(t)
        model = DACModel(cfg)
        vq = gate(model, params, quantize=True)
        ae = gate(model, params, quantize=False)
        print(f"[{t}] VQ  {vq}", flush=True)
        print(f"[{t}] AE  {ae}", flush=True)


if __name__ == "__main__":
    main()
