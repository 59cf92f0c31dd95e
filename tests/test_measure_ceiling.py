"""tools/measure_ceiling.py: the ceiling/affine measurement every
round-3 recipe config documents must be reproducible by the tool.

Uses the smallest shipped checkpoint (GAE_4_Cav, 31 bands) on a tiny
synthetic scene; skips if the reference checkpoints are unavailable.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CKPT = os.path.join(
    os.environ.get("GAE_PRETRAINED_DIR", "/root/reference/GAE_pretrained"),
    "GAE_4_Cav.pth",
)


def test_measure_ceiling_cav(tmp_path):
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoints unavailable")
    import measure_ceiling

    rng = np.random.RandomState(0)
    # two smooth-ish scenes so reconstruction is meaningful, not noise
    for i in range(2):
        small = rng.rand(8, 8, 31).astype(np.float32)
        scene = np.kron(small, np.ones((4, 4, 1), np.float32))
        np.save(tmp_path / f"s{i}.npy", scene)

    paths = sorted(str(p) for p in tmp_path.glob("*.npy"))
    per_scene, summary = measure_ceiling.measure(CKPT, paths, crop=32)

    assert len(per_scene) == 2
    assert all(np.isfinite(s["MPSNR"]) and s["MPSNR"] > 10
               for s in per_scene)
    assert summary["n_colors"] == 31
    assert summary["ceiling_mpsnr"] == pytest.approx(
        np.mean([s["MPSNR"] for s in per_scene])
    )
    # the affine must map the measured latent mass inside +-0.95:
    # applying it to p0.05/p99.95 of the latents is exactly its
    # definition, so just sanity-check the scale is positive/finite
    assert 0 < summary["latent_scale"] < 100
    assert np.isfinite(summary["latent_shift"])
    assert 0.0 <= summary["frac_clipped"] <= 1.0
