"""Device validation + profiling subsystem tests."""
import time

import pytest

from egregora_tpu.utils.device import available_platforms, ensure_accelerator
from egregora_tpu.utils.profiling import NodeTimer


def test_available_platforms_cpu():
    assert "cpu" in available_platforms()


def test_ensure_accelerator_cpu_ok():
    d = ensure_accelerator("cpu")
    assert d.platform == "cpu"


def test_ensure_accelerator_missing_kind_actionable():
    with pytest.raises(RuntimeError, match="CPU node"):
        ensure_accelerator("tpu")  # tests force the cpu backend


def test_node_timer():
    t = NodeTimer()
    with t.measure("a"):
        time.sleep(0.01)
    with t.measure("a"):
        pass
    with t.measure("b"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert s["a"]["max_s"] >= s["a"]["mean_s"]
    t.reset()
    assert t.summary() == {}
