"""PNG-pair PSNR/SSIM walker (reference eval.py:6-41).

Scans a results dir for *_hr.png / *_sr.png pairs and averages
PSNR/SSIM over them.
"""

from __future__ import annotations

import argparse
import glob

import numpy as np

from ..evalhsi.metrics import psnr, ssim


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-p", "--path", type=str, required=True)
    args = p.parse_args(argv)

    import cv2

    real_names = sorted(glob.glob(f"{args.path}/*_hr.png"))
    fake_names = sorted(glob.glob(f"{args.path}/*_sr.png"))
    avg_psnr, avg_ssim, n = 0.0, 0.0, 0
    for rname, fname in zip(real_names, fake_names):
        hr = cv2.imread(rname)
        sr = cv2.imread(fname)
        ps = psnr(hr, sr, data_range=255)
        ss = np.mean(
            [ssim(hr[..., c], sr[..., c], data_range=255) for c in range(hr.shape[2])]
        )
        avg_psnr += ps
        avg_ssim += ss
        n += 1
        print(f"{rname.split('/')[-1]}: PSNR={ps:.4f} SSIM={ss:.4f}")
    if n:
        print(f"# Validation # PSNR: {avg_psnr / n:.4e}")
        print(f"# Validation # SSIM: {avg_ssim / n:.4e}")


if __name__ == "__main__":
    main()
