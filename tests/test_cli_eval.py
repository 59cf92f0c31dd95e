"""CLI smokes: eval PNG walker and compare utility."""

import numpy as np


def test_eval_png_walker(tmp_path, capsys):
    import cv2

    from hsi_dmgasr_tpu.cli.eval import main

    rng = np.random.RandomState(0)
    hr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    sr = np.clip(hr.astype(int) + rng.randint(-10, 10, hr.shape), 0, 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "0_hr.png"), hr)
    cv2.imwrite(str(tmp_path / "0_sr.png"), sr)
    main(["-p", str(tmp_path)])
    out = capsys.readouterr().out
    assert "PSNR" in out and "SSIM" in out


def test_compare_cli(tmp_path, capsys):
    from hsi_dmgasr_tpu.cli.compare import main

    rng = np.random.RandomState(0)
    gt = rng.rand(16, 16, 8).astype(np.float32)
    pred = np.clip(gt + 0.01 * rng.randn(16, 16, 8), 0, 1).astype(np.float32)
    np.save(tmp_path / "pred.npy", pred)
    np.save(tmp_path / "gt.npy", gt)
    res = main(["compare", "--pred", str(tmp_path / "pred.npy"),
                "--gt", str(tmp_path / "gt.npy")])
    assert res["MPSNR"] > 30

    main(["spectra", "--cube", str(tmp_path / "gt.npy"),
          "--pixels", "0,0", "2,3", "--out", str(tmp_path / "s.csv")])
    lines = open(tmp_path / "s.csv").read().strip().split("\n")
    assert len(lines) == 2 and lines[0].startswith("0_0,")

def test_ae_cli_smoke(synth_data, tmp_path):
    """Stage-1 CLI end-to-end on scene data: f16 device-prefetch loop,
    two steps, checkpoint written and loadable."""
    from hsi_dmgasr_tpu.cli import ae
    from hsi_dmgasr_tpu.train.stage1_gae import GAETrainer

    out = str(tmp_path / "gae_ckpt")
    ae.main([
        "--data", f"{synth_data}/mat_scenes", "--datatype", "hsi_mat",
        "--epochs", "1", "--batch_size", "2", "--max_steps", "2",
        "--n_subs", "8", "--n_ovls", "2", "--n_colors", "31",
        "--n_feats", "8", "--scale", "2", "--out", out,
        "--platform", "cpu",
    ])
    variables = GAETrainer.load_gae_variables(out)
    assert variables is not None
