"""Miniature head-to-head vs the actual torch reference at
/root/reference (the full 8-seed study lives in PARITY_RESULTS.md, run
by experiments/parity_check.py).

This runs the `gaussian` workload — GaussianModel posterior recovery
with VerletSGLDReject (exact M-H) — through BOTH frameworks with 2
seeds each and checks that (a) each side's pooled posterior moments are
near the analytic N(mean, std^2) values and (b) the sides agree within
a loose Monte-Carlo band. Skips cleanly if the reference checkout is
unavailable.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "experiments"))

pytestmark = pytest.mark.skipif(
    not Path("/root/reference/bnn_priors").exists(),
    reason="reference checkout not available")


def test_gaussian_posterior_parity_miniature():
    import parity_check as pc

    # shrink the workload: 20 cycles instead of 60
    orig = dict(pc.GAUSS)
    pc.GAUSS.update(cycles=20)
    try:
        ref_rows = [pc.ref_gaussian(2000 + s) for s in range(2)]
        tpu_rows = [pc.tpu_gaussian(2000 + s) for s in range(2)]
    finally:
        pc.GAUSS.update(orig)

    ref_mean = np.mean([r["post_mean"] for r in ref_rows])
    tpu_mean = np.mean([r["post_mean"] for r in tpu_rows])
    ref_std = np.mean([r["post_std"] for r in ref_rows])
    tpu_std = np.mean([r["post_std"] for r in tpu_rows])

    # pooled over 2 seeds x 20 samples x 400 dims: moments must sit near
    # the analytic posterior on BOTH sides (loose MC band)
    assert abs(ref_mean - pc.GAUSS["mean"]) < 0.05, ref_rows
    assert abs(tpu_mean - pc.GAUSS["mean"]) < 0.05, tpu_rows
    assert abs(ref_std - pc.GAUSS["std"]) < 0.05, ref_rows
    assert abs(tpu_std - pc.GAUSS["std"]) < 0.05, tpu_rows
    # and near each other
    assert abs(ref_mean - tpu_mean) < 0.05
    assert abs(ref_std - tpu_std) < 0.05
    # exact-M-H acceptance healthy on both sides (reference test floor 0.6)
    assert np.mean([r["accept_rate"] for r in ref_rows]) > 0.6
    assert np.mean([r["accept_rate"] for r in tpu_rows]) > 0.6
