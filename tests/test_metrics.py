"""Metric suite consistency: host (numpy, reference formulas) vs the
fused on-device variants, plus extra-metric sanity."""

import numpy as np
import pytest

from hsi_dmgasr_tpu.evalhsi import (
    color_correction,
    quality_assessment,
    quality_assessment_jax,
)
from hsi_dmgasr_tpu.evalhsi.jax_metrics import color_correction_jax
from hsi_dmgasr_tpu.evalhsi.metrics import (
    compare_appsa,
    compare_mare,
    compare_qave,
    compare_sid,
)


@pytest.fixture(scope="module")
def cubes():
    rng = np.random.RandomState(7)
    gt = rng.rand(48, 48, 31).astype(np.float32)
    # correlated prediction (realistic SR-ish errors)
    pred = np.clip(gt + 0.05 * rng.randn(48, 48, 31), 0, 1).astype(np.float32)
    return gt, pred


def test_host_device_agreement(cubes):
    gt, pred = cubes
    host = quality_assessment(gt, pred, data_range=1.0, ratio=4)
    dev = {k: float(v) for k, v in
           quality_assessment_jax(gt, pred, 1.0, 4).items()}
    for k in host:
        assert abs(float(host[k]) - dev[k]) < 1e-4, (k, host[k], dev[k])


def test_color_correction_host_device(cubes):
    gt, pred = cubes
    host = color_correction(gt, pred, num_channels=31)
    dev = np.asarray(color_correction_jax(gt, pred))
    np.testing.assert_allclose(host, dev, atol=1e-5)


def test_extra_metrics_sane(cubes):
    gt, pred = cubes
    assert compare_sid(gt, gt) == 0.0
    assert compare_mare(gt, gt) == 0.0
    assert compare_appsa(gt, gt) < 0.15  # eps-limited near-zero angle
    assert 0.9 < compare_qave(gt, gt) <= 1.0
    assert compare_sid(gt, pred) > 0
    assert compare_mare(gt, pred) > 0


def test_near_identity_is_near_perfect(cubes):
    """The host SAM clips the arccos domain (the reference's unclipped
    formula nan-poisons on near-identical spectra), so near-identity
    must yield near-zero angle."""
    gt, _ = cubes
    rng = np.random.RandomState(0)
    pred = np.clip(gt + 1e-3 * rng.rand(*gt.shape), 0, 1).astype(np.float32)
    m = quality_assessment(gt, pred, data_range=1.0, ratio=4)
    assert m["MSSIM"] == pytest.approx(1.0, abs=1e-3)
    assert m["RMSE"] == pytest.approx(0.0, abs=1e-2)
    assert m["CrossCorrelation"] == pytest.approx(1.0, abs=1e-3)
    assert m["SAM"] == pytest.approx(0.0, abs=0.5)