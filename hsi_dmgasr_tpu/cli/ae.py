"""Stage-1 GAE training entry point (reference AE.py:516-637 __main__).

Usage:
  python -m hsi_dmgasr_tpu.cli.ae --data /path/to/pairs --epochs 5 \
      --n_subs 16 --n_ovls 4 --n_colors 102 --out ./weight/gae_pav
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data import DataLoader, HSTrainingData, TrainsetFromFolder
from ..train.stage1_gae import GAETrainer

logger = logging.getLogger("base")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help=".mat pair dir or scene dir")
    p.add_argument("--datatype", choices=["mat_pairs", "hsi_mat"],
                   default="mat_pairs")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n_subs", type=int, default=16)
    p.add_argument("--n_ovls", type=int, default=4)
    p.add_argument("--n_colors", type=int, default=102)
    p.add_argument("--n_feats", type=int, default=64)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--out", default="./weight/gae")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    # AEddp masked-reconstruction recipe (GAE/AEddp.py:196-247):
    # --mask_p 0.6 --loss l1 reproduces the distributed stage-1 trainer
    p.add_argument("--mask_p", type=float, default=0.0)
    p.add_argument("--loss", choices=["hloss", "l1"], default="hloss")
    p.add_argument("--transfer_dtype", choices=["float16", "float32"],
                   default="float16",
                   help="host->device upload dtype (float16 halves the "
                        "~25 MB/s tunnel transfer; float32 keeps full "
                        "precision for local runs)")
    p.add_argument("--device_resident", action="store_true",
                   help="hsi_mat only: upload the scene stack to device "
                        "memory once and sample crop+augment batches on "
                        "device (data/device_cache.py) — no per-step "
                        "host transfer at all")
    args = p.parse_args(argv)

    from .common import force_platform
    force_platform(args.platform)

    logging.basicConfig(level=logging.INFO)
    if args.datatype == "mat_pairs":
        ds = TrainsetFromFolder(args.data, scale=args.scale)
    else:
        ds = HSTrainingData(args.data, n_scale=args.scale, augment=True, hr_only=True)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed)

    trainer = GAETrainer(
        n_subs=args.n_subs, n_ovls=args.n_ovls, n_colors=args.n_colors,
        n_feats=args.n_feats, lr=args.lr, seed=args.seed,
        mask_p=args.mask_p, loss=args.loss,
    )
    transfer_dtype = np.dtype(args.transfer_dtype)

    def device_batches():
        """--transfer_dtype upload (f16 default for the tunnel) + one-batch
        async prefetch (the transfer otherwise serializes with compute,
        see stage2_driver)."""
        import jax

        prev = None
        for batch in loader:
            hr = batch["HR"] if isinstance(batch, dict) else batch[1]
            d = jax.device_put(np.asarray(hr, transfer_dtype))
            if prev is not None:
                yield prev
            prev = d
        if prev is not None:
            yield prev

    if args.device_resident:
        if args.datatype != "hsi_mat":
            p.error("--device_resident requires --datatype hsi_mat")
        import jax

        from ..data.device_cache import DeviceSceneCache

        cache = DeviceSceneCache.from_dataset(
            ds, gt_size=32 * args.scale)
        base_key = jax.random.PRNGKey(np.uint32(args.seed) ^ 0x5CE9E5)
        steps_per_epoch = max(1, len(ds) // args.batch_size)
        logger.info("device-resident: %d scenes in HBM", cache.n_scenes)

        def device_batches(start):
            for j in range(steps_per_epoch):
                key = jax.random.fold_in(base_key, start + 1 + j)
                yield cache.sample(key, args.batch_size)
    else:
        _host_batches = device_batches

        def device_batches(start):
            return _host_batches()

    step = 0
    for epoch in range(args.epochs):
        for hr in device_batches(step):
            loss = trainer.train_step(hr)
            step += 1
            if step % 10 == 0:
                logger.info("epoch %d step %d loss %.5f", epoch, step, float(loss))
            if args.max_steps and step >= args.max_steps:
                break
        trainer.save(args.out)
        logger.info("saved %s after epoch %d", args.out, epoch)
        if args.max_steps and step >= args.max_steps:
            break


if __name__ == "__main__":
    main()
