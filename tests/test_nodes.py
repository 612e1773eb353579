"""Node-layer API tests: registry parity + smoke of each node class.

The reference's 19 node keys (SURVEY.md §2) must all exist with the
same INPUT_TYPES surface; engines run on tiny inputs.
"""
import numpy as np
import pytest

import egregora_tpu
from egregora_tpu.nodes.base import comfy_audio

REFERENCE_NODE_KEYS = {
    # __init__.py:33-48 of the reference
    "EgregoraAudioUpscaler",
    "EgregoraFatLlamaGPU",
    "EgregoraFatLlamaCPU",
    "Egregora_RNNoise_Denoise",
    "Egregora_WPE_Dereverb",
    "Egregora_DeepFilterNet_Denoise",
    "Egregora_DAC_Encode",
    "Egregora_DAC_Decode",
    "ABX Prepare",
    "ABX Judge",
    "Loudness Meter (BS1770)",
    "Audio Gain Match (1770)",
    "Metrics (LSD + SI-SDR)",
    "Resample Audio (HQ)",
    "Audio Align (XCorr)",
    "Audio Gain Match",
    "Audio Null Test",
    "Audio Plotter",
    "Null Test (Full)",
}


def _tone(sr=48000, secs=0.5, f=440.0, ch=1):
    t = np.arange(int(sr * secs)) / sr
    x = 0.3 * np.sin(2 * np.pi * f * t).astype(np.float32)
    return comfy_audio(sr, np.tile(x, (ch, 1)))


def test_registry_has_all_reference_nodes():
    missing = REFERENCE_NODE_KEYS - set(egregora_tpu.NODE_CLASS_MAPPINGS)
    assert not missing, f"missing node keys: {missing}"
    assert REFERENCE_NODE_KEYS - set(egregora_tpu.NODE_DISPLAY_NAME_MAPPINGS) == set()


def test_all_nodes_have_comfy_contract():
    for key, cls in egregora_tpu.NODE_CLASS_MAPPINGS.items():
        assert hasattr(cls, "INPUT_TYPES") and callable(cls.INPUT_TYPES), key
        assert hasattr(cls, "RETURN_TYPES"), key
        assert hasattr(cls, "FUNCTION"), key
        assert hasattr(cls, "CATEGORY"), key
        schema = cls.INPUT_TYPES()
        assert "required" in schema, key
        fn = getattr(cls, cls.FUNCTION)
        assert callable(fn), key


def test_loudness_meter_node():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Loudness Meter (BS1770)"]()
    (metrics,) = node.execute(_tone())
    assert set(metrics) >= {"lufs_integrated", "lufs_momentary",
                            "lufs_short_term", "lra", "true_peak_dbfs"}
    assert np.isfinite(metrics["lufs_integrated"])


def test_gain_match_nodes():
    ref = _tone()
    quiet = _tone()
    quiet["waveform"] = quiet["waveform"] * 0.5
    for key in ("Audio Gain Match (1770)", "Audio Gain Match"):
        node = egregora_tpu.NODE_CLASS_MAPPINGS[key]()
        out, gain_db, ref_lvl, in_lvl = node.execute(ref, quiet)
        assert abs(gain_db - 6.02) < 0.1, key
        assert out["sample_rate"] == 48000


def test_metrics_node():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Metrics (LSD + SI-SDR)"]()
    a = _tone()
    (m,) = node.execute(a, a)
    assert m["si_sdr_db"] > 60
    assert m["lsd_mean_db"] < 0.1


def test_resample_node():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Resample Audio (HQ)"]()
    (out,) = node.execute(_tone(sr=16000), target_sr=48000)
    assert out["sample_rate"] == 48000
    assert out["samples"].shape[1] == 3 * 8000


def test_abx_nodes():
    prep = egregora_tpu.NODE_CLASS_MAPPINGS["ABX Prepare"]()
    judge = egregora_tpu.NODE_CLASS_MAPPINGS["ABX Judge"]()
    a, b = _tone(), _tone(f=880.0)
    a_c, b_c, x_c, meta = prep.execute(a, b, clip_seconds=0.2, random_seed=7)
    assert meta["x_is"] in ("A", "B")
    (res,) = judge.execute(meta, meta["x_is"])
    assert res["correct"] is True
    (res2,) = judge.execute(meta, "A" if meta["x_is"] == "B" else "B")
    assert res2["correct"] is False
    # same seed => same assignment (reference uses random.Random(seed))
    *_, meta2 = prep.execute(a, b, clip_seconds=0.2, random_seed=7)
    assert meta2["x_is"] == meta["x_is"]


def test_null_suite_nodes_identical_inputs():
    full = egregora_tpu.NODE_CLASS_MAPPINGS["Null Test (Full)"]()
    a = _tone(secs=0.6)
    (matched, null, delay_ms, gain_db, metrics, img_w, img_s, img_d) = full.execute(
        a, a, draw_waveforms=False, draw_spectrograms=False, draw_diffspec=False,
        compute_null_lufs=False)
    assert abs(delay_ms) < 1.0
    assert abs(gain_db) < 0.2
    # the reference xcorr's 1-sample center bias means even identical
    # inputs get a ~1-sample "alignment" shift, bounding the null depth
    assert metrics["null_rms_dbfs"] < -30.0
    assert null["samples"].shape == a["samples"].shape


def test_fat_llama_nodes():
    tpu_node = egregora_tpu.NODE_CLASS_MAPPINGS["EgregoraFatLlamaGPU"]()
    x = _tone(sr=16000, secs=0.25)
    (out,) = tpu_node.run("wav", 5, 0.6, 1411, True, True, AUDIO=x)
    assert out["sample_rate"] == 96000  # 16k * factor 6
    assert np.all(np.isfinite(out["samples"]))

    cpu_node = egregora_tpu.NODE_CLASS_MAPPINGS["EgregoraFatLlamaCPU"]()
    (out2,) = cpu_node.run("wav", 5, 0.6, 1411, AUDIO=x)
    assert out2["sample_rate"] == 96000


def test_fat_llama_path_input(tmp_path):
    from egregora_tpu.utils.wavio import write_audio
    sr = 16000
    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(sr // 4) / sr).astype(np.float32)
    p = tmp_path / "in.wav"
    write_audio(p, x[None], sr)
    node = egregora_tpu.NODE_CLASS_MAPPINGS["EgregoraFatLlamaCPU"]()
    (out,) = node.run("wav", 3, 0.6, 1411, audio_path=str(p))
    assert out["sample_rate"] == 96000


def test_wpe_node():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_WPE_Dereverb"]()
    (out,) = node.execute(_tone(secs=0.3), taps=4, delay=2, iterations=1,
                          n_fft=512, hop=128)
    assert out["samples"].shape == (1, 14400)
    assert out["meta"]["wpe"]["taps"] == 4
    assert np.all(np.isfinite(out["samples"]))


def test_rnnoise_node():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_RNNoise_Denoise"]()
    (out,) = node.execute(_tone(secs=0.2), strength=0.5, adaptive_mode="off")
    assert out["sample_rate"] == 48000
    assert out["samples"].shape == (1, 9600)
    assert out["meta"]["rnnoise"]["strength"] == 0.5


def test_dac_roundtrip_nodes():
    enc = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_DAC_Encode"]()
    dec = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_DAC_Decode"]()
    a = _tone(sr=44100, secs=0.2)
    codes, log = enc.execute(a, model_type="44khz")
    assert codes["model_type"] == "44khz"
    assert codes["sample_rate"] == 44100
    assert "encode ok" in log
    out, log2 = dec.execute(codes)
    assert out["sample_rate"] == 44100
    assert np.all(np.isfinite(out["samples"]))


def test_dfn_node_runs():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_DeepFilterNet_Denoise"]()
    (out,) = node.execute(_tone(secs=0.2), adaptive_vad_source="rms")
    assert out["sample_rate"] == 48000
    assert out["samples"].shape == (1, 9600)
    assert np.all(np.isfinite(out["samples"]))


def test_align_node_fixed_method_deeper_null():
    """'gcc-phat-fixed' recovers integer delays exactly (reference-exact
    'gcc-phat' keeps the upstream 1-sample bias)."""
    align = egregora_tpu.NODE_CLASS_MAPPINGS["Audio Align (XCorr)"]()
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(48000)).astype(np.float32)
    b = np.zeros_like(x)
    b[100:] = x[:-100]
    a_d = comfy_audio(48000, x[None])
    b_d = comfy_audio(48000, b[None])
    _, d_ref, *_ = align.execute(a_d, b_d, align_method="gcc-phat",
                                 fractional=False)
    _, d_fix, *_ = align.execute(a_d, b_d, align_method="gcc-phat-fixed",
                                 fractional=False)
    assert abs(d_ref - 99.0) < 0.5   # reference bias
    assert abs(d_fix - 100.0) < 0.5  # corrected


# ---------------- B>1 cross-channel semantics (VERDICT r2 #4) ----------------

def _batch2_audio(sr=48000, secs=0.2, ch=2, seed=0):
    """A true [B=2, C, T] AUDIO dict of two DISTINCT stereo items."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs)) / sr
    item0 = np.stack([0.3 * np.sin(2 * np.pi * 440 * t),
                      0.3 * np.sin(2 * np.pi * 660 * t)])[:ch]
    item1 = (0.1 * rng.standard_normal((ch, t.size))).astype(np.float32)
    wf = np.stack([item0, item1]).astype(np.float32)       # [2, C, T]
    return {"waveform": wf, "sample_rate": sr}, wf


def _item_audio(wf, i, sr=48000):
    return comfy_audio(sr, wf[i])


def test_rnnoise_downmix_batch_matches_per_item():
    """downmix_mono with B=2 must average each item's OWN channels —
    not across batch items (the reference iterates items,
    extras :289-328)."""
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_RNNoise_Denoise"]()
    batch, wf = _batch2_audio()
    kw = dict(stereo_mode="downmix_mono", strength=0.5, adaptive_mode="off")
    (out,) = node.execute(batch, **kw)
    got = np.asarray(out["waveform"])
    assert got.shape[0] == 2 and got.shape[1] == 1      # [B, 1, T]
    for i in range(2):
        (ref,) = node.execute(_item_audio(wf, i), **kw)
        np.testing.assert_allclose(got[i], ref["samples"], atol=1e-4,
                                   err_msg=f"item {i}")


def test_dfn_downmix_batch_matches_per_item():
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_DeepFilterNet_Denoise"]()
    batch, wf = _batch2_audio()
    kw = dict(stereo_mode="downmix_mono", adaptive_vad_source="rms")
    (out,) = node.execute(batch, **kw)
    got = np.asarray(out["waveform"])
    assert got.shape[0] == 2 and got.shape[1] == 1
    for i in range(2):
        (ref,) = node.execute(_item_audio(wf, i), **kw)
        np.testing.assert_allclose(got[i], ref["samples"], atol=1e-4,
                                   err_msg=f"item {i}")


def test_wpe_batch_matches_per_item():
    """WPE's mic array is each item's C channels: B=2 through the node
    must equal per-item WPE (not a fused 2C-channel array)."""
    node = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_WPE_Dereverb"]()
    batch, wf = _batch2_audio(secs=0.3)
    kw = dict(taps=4, delay=2, iterations=1, n_fft=512, hop=128)
    (out,) = node.execute(batch, **kw)
    got = np.asarray(out["waveform"])
    assert got.shape == wf.shape
    for i in range(2):
        (ref,) = node.execute(_item_audio(wf, i), **kw)
        np.testing.assert_allclose(got[i], ref["samples"], atol=1e-4,
                                   err_msg=f"item {i}")


# ---------------- fail-loud random-init serve paths (VERDICT r2 #10) --------

def test_dfn3_variant_warns_without_weights(capsys, monkeypatch):
    """DeepFilterNet3 with its shipped weights REMOVED must (a) warn
    loudly and (b) still build the genuinely different squeezed-GRU
    topology (the weight-less fallback path stays fail-loud forever,
    not just until weights shipped)."""
    import egregora_tpu.models.deepfilternet.train as dfnt
    cls = egregora_tpu.NODE_CLASS_MAPPINGS["Egregora_DeepFilterNet_Denoise"]
    monkeypatch.setattr(dfnt, "load_pretrained", lambda variant=None: None)
    cls._PARAMS.pop("DeepFilterNet3", None)
    params = cls._params("DeepFilterNet3")
    assert "WARNING" in capsys.readouterr().out
    assert "gru_squeezed" in params
    cls._PARAMS.pop("DeepFilterNet3", None)


def test_dac_warns_on_random_init(tmp_path, monkeypatch, capsys):
    """build_dac with neither converted checkpoint nor shipped weights
    prints a loud warning (ADVICE r2) — shipped sets are masked out so
    the fallback path stays covered."""
    from egregora_tpu.models.dac import model as dacm
    from egregora_tpu.models.dac import train as dact
    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    monkeypatch.setattr(dact, "PRETRAINED",
                        {k: tmp_path / f"absent_{k}.npz"
                         for k in dact.PRETRAINED})
    dacm._CACHE.clear()
    dacm.build_dac("24khz")
    assert "WARNING" in capsys.readouterr().out
    dacm._CACHE.clear()
