"""Run the example workflow graph through the framework's executor.

Usage: python examples/run_workflow.py input.wav output.wav
"""
import sys
from pathlib import Path

from egregora_tpu.pipeline.executor import WorkflowExecutor


def main(in_path: str, out_path: str) -> None:
    wf_path = Path(__file__).parent / "audio_super_resolution_workflow.json"
    ex = WorkflowExecutor()
    results = ex.run(wf_path, overrides={"1": {"path": in_path}})
    # node 4 is the Fat Llama enhance stage; save its output
    enhanced = results["4"][0]
    from egregora_tpu.utils.wavio import write_audio
    write_audio(out_path, enhanced["samples"], enhanced["sample_rate"])
    print(f"wrote {out_path} @ {enhanced['sample_rate']} Hz")
    for node, stats in ex.timing_summary().items():
        print(f"  {node}: {stats['total_s']:.2f}s over {int(stats['calls'])} call(s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
