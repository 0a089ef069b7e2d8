"""Scaled-down version of the BASELINE RMSE acceptance gate.

tools/run_rmse_gate.py certifies the <=1e-3 bias bar at 256x256 with
thousands of samples (minutes of oracle time — run out-of-band, recorded
in RMSE.json). This marked-slow test runs the same noise-cancelled bias
estimator at a size CI can afford and asserts the bias is below the
resolution the sample count supports (see the tool's docstring for why
raw RMSE between independent MC renders can never reach 1e-3).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.slow
def test_debiased_rmse_small():
    from run_rmse_gate import gate
    r = gate(dim=64, spp=256, oracle_spp=256)
    # the estimator must resolve bias at or below its own 2-sigma noise
    # resolution — a real estimator mismatch (e.g. a broken NEE weight)
    # shows up orders of magnitude above it
    tol = max(2.5e-3, 2.0 * r["bias_resolution_2sigma"])
    assert r["cornell_rmse_vs_oracle"] <= tol, r
    # raw RMSE must be explained by noise: within 2x of the engine's own
    # self-noise (which the split renders measure directly)
    assert r["cornell_rmse_raw"] <= 2.0 * max(r["engine_self_noise_rmse"],
                                              1e-3), r


def test_recorded_gate_is_fresh_and_passing():
    """When RMSE.json exists (written by the full-scale tool run), it must
    record a passing gate — keeps a stale/failing record from shipping."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RMSE.json")
    if not os.path.exists(path):
        pytest.skip("RMSE.json not generated yet (run tools/run_rmse_gate.py)")
    import json
    with open(path) as f:
        r = json.load(f)
    assert r["cornell_rmse_vs_oracle"] <= 1e-3
    assert r["dim"] >= 256 and r["spp_per_half"] >= 1024
