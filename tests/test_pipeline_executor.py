"""Workflow executor tests: graph execution, refs, timing, errors."""
import json

import numpy as np
import pytest

from egregora_tpu.pipeline.executor import WorkflowExecutor
from egregora_tpu.utils.profiling import NodeTimer
from egregora_tpu.utils.wavio import read_audio, write_audio


@pytest.fixture
def wav(tmp_path):
    sr = 16000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr)).astype(np.float32)
    p = tmp_path / "in.wav"
    write_audio(p, x[None], sr)
    return str(p)


def test_linear_graph(wav, tmp_path):
    out_path = str(tmp_path / "out.wav")
    wf = {"nodes": [
        {"id": 1, "type": "LoadAudio", "inputs": {"path": wav}},
        {"id": 2, "type": "Resample Audio (HQ)",
         "inputs": {"audio": ["1", 0], "target_sr": 48000}},
        {"id": 3, "type": "SaveAudio",
         "inputs": {"audio": ["2", 0], "path": out_path}},
        {"id": 4, "type": "PreviewAudio", "inputs": {"audio": ["2", 0]}},
    ]}
    ex = WorkflowExecutor(timer=NodeTimer())
    results = ex.run(wf)
    assert results["3"][0] == out_path
    y, sr = read_audio(out_path)
    assert sr == 48000 and y.shape[1] == 24000
    assert results["4"][0]["sample_rate"] == 48000
    summary = ex.timing_summary()
    assert summary["Resample Audio (HQ)"]["calls"] == 1
    assert summary["LoadAudio"]["calls"] == 1  # memoized despite two consumers


def test_enhance_graph(wav):
    wf = {"nodes": [
        {"id": "a", "type": "LoadAudio", "inputs": {"path": wav}},
        {"id": "b", "type": "EgregoraFatLlamaCPU",
         "inputs": {"AUDIO": ["a", 0], "target_format": "wav",
                    "max_iterations": 4, "threshold_value": 0.6,
                    "target_bitrate_kbps": 1411}},
        {"id": "c", "type": "PreviewAudio", "inputs": {"audio": ["b", 0]}},
    ]}
    results = WorkflowExecutor(timer=NodeTimer()).run(wf)
    assert results["c"][0]["sample_rate"] == 96000


def test_overrides(wav, tmp_path):
    wf = {"nodes": [
        {"id": 1, "type": "LoadAudio", "inputs": {"path": "MISSING.wav"}},
        {"id": 2, "type": "PreviewAudio", "inputs": {"audio": ["1", 0]}},
    ]}
    ex = WorkflowExecutor(timer=NodeTimer())
    with pytest.raises(Exception):
        ex.run(json.loads(json.dumps(wf)))
    results = ex.run(wf, overrides={"1": {"path": wav}})
    assert results["2"][0]["channels"] == 1


def test_unknown_node_type(wav):
    wf = {"nodes": [{"id": 1, "type": "NopeNode", "inputs": {}}]}
    with pytest.raises(KeyError, match="NopeNode"):
        WorkflowExecutor(timer=NodeTimer()).run(wf)


def test_cycle_detection():
    wf = {"nodes": [
        {"id": 1, "type": "PreviewAudio", "inputs": {"audio": ["2", 0]}},
        {"id": 2, "type": "PreviewAudio", "inputs": {"audio": ["1", 0]}},
    ]}
    with pytest.raises(ValueError, match="cycle"):
        WorkflowExecutor(timer=NodeTimer()).run(wf)


def test_example_workflow_shape():
    """The shipped example graph parses and references known node types."""
    import egregora_tpu
    from egregora_tpu.pipeline.executor import BUILTIN_NODES
    from pathlib import Path
    wf = json.loads((Path(__file__).parents[1] /
                     "examples/audio_super_resolution_workflow.json").read_text())
    known = set(BUILTIN_NODES) | set(egregora_tpu.NODE_CLASS_MAPPINGS)
    for node in wf["nodes"]:
        assert node["type"] in known, node["type"]
