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
    # the cc ceiling (the metric stage-2 checkpoint selection uses) is
    # reported alongside plain; cc is mean/std matching so it usually
    # but not provably raises MPSNR — assert it is finite and close
    assert all(np.isfinite(s["MPSNR_cc"]) for s in per_scene)
    assert summary["ceiling_mpsnr_cc"] == pytest.approx(
        np.mean([s["MPSNR_cc"] for s in per_scene])
    )
    assert abs(summary["ceiling_mpsnr_cc"] - summary["ceiling_mpsnr"]) < 5.0

    # the property the recipe configs depend on: applying the returned
    # affine to a re-encode of the same scenes must land p0.05/p99.95
    # within ~+-0.95 (the diffusion clamps latents at +-1)
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae
    from hsi_dmgasr_tpu.models.gae import GAE

    variables, cfg = load_torch_gae(CKPT)
    gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
              n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])
    zs = []
    for p in paths:
        cube = np.load(p)[:32, :32, :31]
        z = gae.apply(variables, jnp.asarray(cube[None]),
                      method=GAE.encode)
        zs.append(np.asarray(z).ravel())
    z = np.concatenate(zs)
    mapped = (z - summary["latent_shift"]) * summary["latent_scale"]
    lo, hi = np.percentile(mapped, [0.05, 99.95])
    assert -0.96 <= lo and hi <= 0.96, (lo, hi)
    assert max(abs(lo), abs(hi)) == pytest.approx(0.95, abs=0.02)
    assert 0.0 <= summary["frac_clipped"] <= 1.0


def test_measure_ceiling_band_mismatch(tmp_path):
    if not os.path.exists(CKPT):
        pytest.skip("reference checkpoints unavailable")
    import measure_ceiling

    # fewer bands than the checkpoint -> clear error, not an opaque
    # shape failure inside GAE.apply
    np.save(tmp_path / "thin.npy", np.random.rand(32, 32, 7).astype(np.float32))
    with pytest.raises(ValueError, match="7 bands"):
        measure_ceiling.measure(CKPT, [str(tmp_path / "thin.npy")], crop=32)
