"""CLI subcommand tests (loudness / enhance / eval / nulltest)."""
import json

import numpy as np
import pytest

from egregora_tpu.cli import build_parser, main
from egregora_tpu.utils.wavio import read_audio, write_audio


@pytest.fixture
def wav(tmp_path):
    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "in.wav"
    write_audio(p, x[None], sr)
    return str(p)


def test_parser_covers_reference_flags():
    ap = build_parser()
    # the reference CLI's flags (flashsr_min.py:7-12) must parse
    args = ap.parse_args(["flashsr", "--ckpt-dir", "/tmp/x", "--in", "a.wav",
                          "--out", "b.wav", "--target-sr", "96000",
                          "--device", "tpu"])
    assert args.target_sr == 96000 and args.ckpt_dir == "/tmp/x"


def test_loudness_cmd(wav, capsys):
    assert main(["loudness", "--in", wav]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert -20 < rep["lufs_integrated"] < -5


def test_enhance_cmd(wav, tmp_path, capsys):
    out = str(tmp_path / "enh.wav")
    assert main(["enhance", "--in", wav, "--out", out, "--iterations", "4"]) == 0
    y, sr = read_audio(out)
    assert sr == 96000  # 16k mono 16-bit -> factor 6


def test_eval_cmd(wav, capsys):
    assert main(["eval", "--ref", wav, "--proc", wav]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["si_sdr_db"] > 60


def test_nulltest_cmd(wav, capsys):
    assert main(["nulltest", "--ref", wav, "--proc", wav]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["null_rms_dbfs"] < -25  # 1-sample xcorr bias bounds the null
    assert "delay_ms" in rep and "gain_db" in rep


def test_codec_cmd(wav, tmp_path, capsys, monkeypatch):
    from egregora_tpu.models.dac import model as dacm
    monkeypatch.setenv("EGREGORA_TPU_WEIGHTS", str(tmp_path))
    dacm._CACHE.clear()
    out = str(tmp_path / "rt.wav")
    assert main(["codec", "--in", wav, "--out", out,
                 "--model-type", "44khz"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["sample_rate"] == 44100
    n_q, frames = rep["codes_shape"][1], rep["codes_shape"][2]
    assert n_q >= 4 and frames > 0
    y, sr = read_audio(out)
    assert sr == 44100 and np.isfinite(y).all()
    dacm._CACHE.clear()
