"""Band-regroup + HSI metric evaluation (reference eval_hsi.py:319-405).

Reassembles full cubes from per-group 3-channel predictions saved as a
.npy list — interleaved band order: all group-channel-0 planes, then the
1s, then the 2s, optionally padding trailing bands — then runs the
quality suite against ground-truth cubes (optionally color-corrected).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..evalhsi import color_correction, quality_assessment, sum_dict


def regroup_predictions(pred_list, test_num, groups_per_cube, pad_last=0):
    """(test_num*groups) x (H, W, 3) -> test_num cubes (H, W, C).

    Band order matches eval_hsi.py:333-348: channel-0 planes of every
    group, then channel-1, then channel-2, plus `pad_last` copies of the
    final plane (the reference pads Chikusei's 128 = 42*3 + 2).
    """
    cubes = []
    for j in range(test_num):
        idx = [j + i * test_num for i in range(groups_per_cube)]
        planes = []
        for ch in range(3):
            for i in idx:
                planes.append(pred_list[i][:, :, ch][:, :, None])
        for _ in range(pad_last):
            planes.append(pred_list[idx[-1]][:, :, 2][:, :, None])
        cubes.append(np.concatenate(planes, axis=-1))
    return cubes


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help=".npy list of (H,W,3) preds")
    p.add_argument("--gt", required=True,
                   help=".npy list of (H,W,C) ground-truth cubes")
    p.add_argument("--test_num", type=int, required=True)
    p.add_argument("--groups", type=int, required=True)
    p.add_argument("--pad_last", type=int, default=0)
    p.add_argument("--ratio", type=int, default=4)
    p.add_argument("--color_correction", action="store_true")
    args = p.parse_args(argv)

    pred_list = np.load(args.pred)
    gt_list = np.load(args.gt)
    cubes = regroup_predictions(
        pred_list, args.test_num, args.groups, args.pad_last
    )

    indices = None
    for idx in range(args.test_num):
        y = cubes[idx]
        gt = gt_list[idx]
        if gt.shape[0] == y.shape[-1]:  # CHW -> HWC
            gt = gt.transpose(1, 2, 0)
        if args.color_correction:
            y = color_correction(gt, y, num_channels=gt.shape[-1])
        qa = quality_assessment(gt, y, data_range=1.0, ratio=args.ratio)
        indices = qa if indices is None else sum_dict(indices, qa)
        print(indices)
    indices = {k: v / args.test_num for k, v in indices.items()}
    print(f"final averaged metrics: {indices}")
    return indices


if __name__ == "__main__":
    main()
