"""Shipped distilled DAC weights: quality gates + build_dac wiring.

Mirrors the RNNoise/DFN/FlashSR shipped-weight gates: the in-repo
compact codec must beat a meaningful roundtrip-SNR bar on held-out
synthetic music (the reference's DAC nodes are a lossy codec roundtrip,
``egregora_audio_enhance_extras.py:750-857`` — useless at random init).
Round-3 bar: >= 8 dB roundtrip SNR (44 kHz measures +10.2; EMA
codebooks + rvq projection warmup + dim-16 books), LSD <= 10 dB.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egregora_tpu.models.dac.train import (PRETRAINED, load_pretrained,
                                           roundtrip_snr_db)

MODEL_TYPES = ["44khz", "24khz", "16khz"]


# One synthetic-music draw is NOT representative: roundtrip SNR swings
# ~+2..+10 dB with content (sparse tonal draws compress far better than
# dense/noisy ones at 9 books x dim 16).  The original single-key gate
# (PRNGKey 1234, ">= 8 dB") sat on the easiest draw of the four below;
# the gate now averages over four content draws and also bounds the
# WORST draw, so a codec can't pass on one lucky clip.
GATE_KEYS = (1234, 99, 7, 42)


def _held_out(sr, key=1234, n=3):
    from egregora_tpu.models.flashsr.distill import synth_pair_batch
    _, hr = synth_pair_batch(jax.random.PRNGKey(key), n, sr, sr=sr)
    return np.asarray(hr)


def _needs(model_type):
    if not PRETRAINED[model_type].exists():
        pytest.skip(f"shipped DAC {model_type} weights not present")


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_shipped_dac_roundtrip_snr(model_type):
    from egregora_tpu.models.dac.model import DACModel
    _needs(model_type)
    cfg, params = load_pretrained(model_type)
    model = DACModel(cfg)
    snrs = [roundtrip_snr_db(model, params, _held_out(cfg.sample_rate, k))
            for k in GATE_KEYS]
    mean, worst = float(np.mean(snrs)), float(min(snrs))
    # random-init ~-19 dB, spectral-average degenerate ~-1 dB, round-2
    # weights +2.5-3.5 mean, round-3 +5.1..+6.0 mean / +2.0..+2.9 worst,
    # round-4 +7.45..+8.71 mean.  Round-5 (hop-32 retrains for 24k/16k +
    # guarded 44k finetunes) ships mean +8.01 (44k) / +11.23 (24k) /
    # +13.12 (16k), worst +4.41/+8.18/+10.66 — gates at the r3 target
    # bar (VERDICT r4 #2: mean > 8 / worst > 4 on ALL rates)
    assert mean > 8.0, f"{model_type} mean SNR {mean:.2f} dB < 8.0 dB gate"
    assert worst > 4.0, f"{model_type} worst-draw SNR {worst:.2f} dB < 4.0 dB"


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_shipped_dac_roundtrip_lsd(model_type):
    from egregora_tpu.eval.metrics import lsd_sisdr_report
    from egregora_tpu.models.dac.model import DACModel
    _needs(model_type)
    cfg, params = load_pretrained(model_type)
    model = DACModel(cfg)
    lsds = []
    for k in GATE_KEYS:
        wav = _held_out(cfg.sample_rate, k)
        z_q, _ = model.encode(params, jnp.asarray(wav))
        rec = np.asarray(model.decode(params, z_q))[:, : wav.shape[-1]]
        lsds.append(np.mean([float(
            lsd_sisdr_report(jnp.asarray(wav[i]),
                             jnp.asarray(rec[i]))["lsd_mean_db"])
            for i in range(wav.shape[0])]))
    # unlike SNR, roundtrip LSD is stable across draws; round-5 shipped
    # codecs measure 7.49 (44k) / 6.39 (24k) / 6.20 (16k) on the gate
    # draws — gate at the r3 target bar (VERDICT r4 #2: LSD <= 7.5)
    lsd = float(np.mean(lsds))
    assert lsd < 7.5, f"{model_type} mean roundtrip LSD {lsd:.2f} dB >= 7.5 dB"


def test_build_dac_uses_shipped_weights(tmp_path, monkeypatch):
    """With no converted checkpoint in the store, build_dac returns the
    shipped compact codec (not random init)."""
    from egregora_tpu.models.dac import model as dacm
    _needs("44khz")
    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    dacm._CACHE.clear()
    model, params, sr = dacm.build_dac("44khz")
    assert sr == 44100
    assert model.cfg == load_pretrained("44khz")[0]  # shipped geometry
    snr = roundtrip_snr_db(model, params, _held_out(44100))
    assert snr > 8.0
    dacm._CACHE.clear()


def test_guarded_finetune_ship_criterion():
    """should_ship: improvement in the combined gate score ships, any
    near-gate regression (worst-draw sinking, LSD creeping toward its
    bar) does not — the guard that keeps background fine-tune runs from
    silently degrading shipped weights."""
    from egregora_tpu.models.dac.train import should_ship
    base = {"mean_snr": 5.3, "worst_snr": 2.1, "mean_lsd": 8.0}

    def after(**kw):
        return {**base, **kw}

    assert should_ship(base, after(mean_snr=6.0, worst_snr=2.5))
    # combined score must improve
    assert not should_ship(base, after(mean_snr=5.2, worst_snr=2.0))
    # a big mean win cannot buy a worst-draw collapse
    assert not should_ship(base, after(mean_snr=9.0, worst_snr=1.7))
    # LSD near its 9.5 bar blocks shipping even with SNR wins
    assert not should_ship(base, after(mean_snr=6.0, worst_snr=2.5,
                                       mean_lsd=9.2))
    # gate-eval and test-gate agree on metric names
    assert set(base) <= {"mean_snr", "worst_snr", "mean_lsd", "snrs"}


def test_stft_w_end_ramp_schedule():
    """_stft_w_schedule: constant until the final ramp_frac of the
    phase, then linear to stft_w_end — the end-phase LSD polish that
    replaced separate high-stft-w finetune runs (one compiled program,
    traced weight)."""
    from egregora_tpu.models.dac.train import _stft_w_schedule
    at = _stft_w_schedule(1000, 0.08, 0.30)
    assert at(0) == at(500) == at(800) == 0.08
    assert abs(at(900) - 0.19) < 1e-9          # halfway up the ramp
    assert abs(at(1000) - 0.30) < 1e-9
    assert at(5000) == 0.30                    # clamped past the end
    # disabled forms: end unset or equal to start
    assert _stft_w_schedule(1000, 0.08, 0.0)(999) == 0.08
    assert _stft_w_schedule(1000, 0.08, 0.08)(999) == 0.08


def test_dac_codes_contract():
    """codes [C, n_q, T/hop] int; decode(z_q) reconstructs finite audio
    at the same length contract the nodes rely on."""
    from egregora_tpu.models.dac.model import DACModel
    _needs("44khz")
    cfg, params = load_pretrained("44khz")
    model = DACModel(cfg)
    wav = _held_out(cfg.hop * 20 + 13, n=1)
    z_q, codes = model.encode(params, wav)
    assert codes.shape[1] == cfg.n_codebooks
    assert codes.dtype in (np.int32, np.int64) or "int" in str(codes.dtype)
    rec = np.asarray(model.decode(params, z_q))
    assert np.isfinite(rec).all()
    assert rec.shape[-1] >= wav.shape[-1]
