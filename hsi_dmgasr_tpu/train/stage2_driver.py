"""Stage-2 DMGASR train/val driver (reference sr_gae.py:127-583).

Differences by design:
  * The GAE is loaded ONCE (the reference torch.load()s it from disk
    every batch, sr_gae.py:228).
  * Per-batch training folds the G groups into one optimizer step
    (`per_group` restores reference dynamics; sr_gae.py:245-250).
  * Validation runs all G groups as one batched reverse diffusion
    (sr_gae.py:458-465 runs them sequentially) and computes the metric
    suite on device.

Config schema additions over the reference (which hard-codes its data
paths in code): ``datasets.{train,val}.dataroot`` + ``datatype`` in
{'hsi_mat', 'hsi_npy', 'mat_pairs_train', 'mat_pairs_test'}, and a
``gae`` section {checkpoint, n_subs, n_ovls, n_colors, n_feats}.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from ..config import setup_logger
from ..data import (
    DataLoader,
    HSTestData,
    HSTrainingData,
    TestsetFromFolder,
    TrainsetFromFolder,
)
from ..evalhsi import color_correction, quality_assessment, sum_dict
from ..evalhsi.image_io import save_error_map, save_img3, tensor2img
from ..pipeline import DMGASRPipeline
from ..train.ddpm_model import DDPMModel

logger = logging.getLogger("base")


def load_gae(opt):
    """(variables, config) from the config's gae section."""
    gae_opt = opt.get("gae") or {}
    ckpt = gae_opt.get("checkpoint")
    if ckpt and ckpt.endswith(".pth"):
        from ..io.convert_torch import load_torch_gae

        return load_torch_gae(ckpt)
    if ckpt:
        from .stage1_gae import GAETrainer

        return GAETrainer.load_gae_variables(ckpt)
    raise ValueError("config['gae']['checkpoint'] is required")


def build_dataset(ds_opt, phase, n_scale=4):
    datatype = ds_opt.get("datatype", "hsi_mat")
    root = ds_opt["dataroot"]
    if datatype == "hsi_mat":
        if phase == "train":
            return HSTrainingData(
                root, n_scale=ds_opt.get("n_scale") or n_scale,
                augment=bool(ds_opt.get("augment", True)),
                base_size=ds_opt.get("l_resolution") or 32,
                hr_only=bool(ds_opt.get("on_device_degradation")),
            )
        return HSTestData(
            root, n_scale=ds_opt.get("n_scale") or n_scale,
            gt_size=ds_opt.get("r_resolution") or 64,
        )
    if datatype == "hsi_npy":
        return HSTestData(
            root, n_scale=ds_opt.get("n_scale") or n_scale,
            gt_size=ds_opt.get("r_resolution") or 64,
        )
    if datatype == "mat_pairs_train":
        return TrainsetFromFolder(root, scale=ds_opt.get("n_scale") or n_scale)
    if datatype == "mat_pairs_test":
        return TestsetFromFolder(
            root, scale=ds_opt.get("n_scale") or n_scale,
            lr_size=ds_opt.get("l_resolution") or 32,
            hr_size=ds_opt.get("r_resolution") or 128,
        )
    raise NotImplementedError(f"datatype [{datatype}]")


def _limit(ds, data_len):
    if data_len and data_len > 0:
        class _Limited:
            def __init__(self, inner, n):
                self.inner, self.n = inner, min(n, len(inner))

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return self.inner[i]

        return _Limited(ds, data_len)
    return ds


def build_pipeline(opt, seed=0):
    gae_vars, gae_cfg = load_gae(opt)
    ddpm = DDPMModel(opt, seed=seed)
    return DMGASRPipeline(opt, gae_vars, gae_cfg, ddpm=ddpm, seed=seed)


def validate(pipeline, val_loader, opt, result_path=None, step=0,
             save_outputs=True, ratio=4, n_chains=None):
    """One validation sweep (sr_gae.py:275-411): metrics raw + color-
    corrected, per-cube timing, result dumps.

    Beyond the reference (which draws ONE stochastic reverse chain per
    scene, sr_gae.py:458-465): each scene is super-resolved ``n_chains``
    times with independent PRNG keys and the metric suite is averaged
    over chains — the single-chain metric has measured ±1.5 dB
    run-to-run noise (BENCHMARKS.md), which silently corrupts best-val
    selection. ``train.val_chains`` in the config sets the count
    (default 3); the chain-to-chain std of the scene-averaged MPSNR is
    reported alongside the means."""
    import jax

    if n_chains is None:
        n_chains = int((opt.get("train") or {}).get("val_chains") or 3)
    n_chains = max(1, n_chains)
    # deterministic per-(scene, chain) keys: stable across restarts so
    # best-val comparisons at different iters use the same noise draws
    base_key = jax.random.PRNGKey(
        (int(opt.get("manual_seed") or 0) + 0x9173) & 0xFFFFFFFF
    )
    indices = indices_cc = None
    total_time, idx = 0.0, 0
    # per-chain scene-averaged MPSNR accumulators for the std estimate
    chain_psnr = np.zeros(n_chains)
    chain_psnr_cc = np.zeros(n_chains)
    if result_path:
        os.makedirs(result_path, exist_ok=True)
    for val_data in val_loader:
        idx += 1
        sr_cube = val_data["SR"]
        hr_cube = val_data["HR"]
        gt = np.asarray(hr_cube)[0]
        scene_qa = scene_qa_cc = None
        for chain in range(n_chains):
            key = jax.random.fold_in(
                jax.random.fold_in(base_key, idx), chain
            )
            t0 = time.time()
            pred = np.asarray(pipeline.super_resolve(sr_cube, key=key))
            total_time += time.time() - t0

            y = pred[0]
            qa = quality_assessment(gt, y, data_range=1.0, ratio=ratio)
            scene_qa = qa if scene_qa is None else sum_dict(scene_qa, qa)
            y_cc = color_correction(gt, y, num_channels=gt.shape[-1])
            qa_cc = quality_assessment(gt, y_cc, data_range=1.0,
                                       ratio=ratio)
            scene_qa_cc = (qa_cc if scene_qa_cc is None
                           else sum_dict(scene_qa_cc, qa_cc))
            chain_psnr[chain] += qa["MPSNR"]
            chain_psnr_cc[chain] += qa_cc["MPSNR"]

            if chain == 0 and result_path and save_outputs:
                np.save(f"{result_path}/{step}_{idx}_hr.npy", gt)
                np.save(f"{result_path}/{step}_{idx}_sr.npy", y_cc)
                save_img3(tensor2img(y), f"{result_path}/{step}_{idx}_sr.png")
                save_img3(tensor2img(gt), f"{result_path}/{step}_{idx}_hr.png")
                save_img3(
                    tensor2img(np.asarray(sr_cube)[0]),
                    f"{result_path}/{step}_{idx}_inf.png",
                )
                save_error_map(
                    np.abs(y - gt), f"{result_path}/{step}_{idx}_err.png"
                )
        scene_qa = {k: v / n_chains for k, v in scene_qa.items()}
        scene_qa_cc = {k: v / n_chains for k, v in scene_qa_cc.items()}
        indices = scene_qa if indices is None else sum_dict(indices, scene_qa)
        indices_cc = (scene_qa_cc if indices_cc is None
                      else sum_dict(indices_cc, scene_qa_cc))

    indices = {k: v / idx for k, v in indices.items()}
    indices_cc = {k: v / idx for k, v in indices_cc.items()}
    chain_psnr /= idx
    chain_psnr_cc /= idx
    return {
        "indices": indices,
        "indices_cc": indices_cc,
        "mpsnr_std": float(np.std(chain_psnr)),
        "mpsnr_cc_std": float(np.std(chain_psnr_cc)),
        "n_chains": n_chains,
        "total_time": total_time,
        "ave_time": total_time / (idx * n_chains),
        "n": idx,
    }


def _read_best(ckpt_dir):
    """Read checkpoint/best.json ({'name', 'iter', 'epoch', 'metric'})."""
    import json

    path = os.path.join(ckpt_dir, "best.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_best_checkpoint(pipeline, ckpt_dir, epoch, step, metric_value,
                         export_dir=None):
    """Keep a rolling best-val snapshot ``best_I{it}_E{ep}`` next to the
    periodic checkpoints, tracked by ``best.json``. The reference has no
    best-model selection at all (sr_gae.py saves only on a fixed
    frequency, sr_gae.py:413-415) — round-2's 18k-step run ended on a
    model 3.3 dB worse than its 11.5k-step peak because of exactly this.

    ``export_dir`` (config ``train.export_best``) additionally writes a
    compact ``best_params.npz`` (+ ``best.json`` copy) there — the
    durability layer for ephemeral experiment dirs; point it inside the
    git tree and commit (loadable via ``path.resume_state``).
    """
    import json
    import shutil

    prev = _read_best(ckpt_dir)
    name = f"best_I{step}_E{epoch}"
    pipeline.ddpm.save_checkpoint(ckpt_dir, epoch, step, name=name)
    meta = {"name": name, "iter": step, "epoch": epoch,
            "metric": "MPSNR_cc", "value": metric_value}
    with open(os.path.join(ckpt_dir, "best.json"), "w") as f:
        json.dump(meta, f)
    if prev and prev.get("name") and prev["name"] != name:
        shutil.rmtree(os.path.join(ckpt_dir, prev["name"]),
                      ignore_errors=True)
    if export_dir:
        pipeline.ddpm.export_params_npz(
            os.path.join(export_dir, "best_params.npz")
        )
        with open(os.path.join(export_dir, "best.json"), "w") as f:
            json.dump(meta, f)
    return name


def prune_periodic_checkpoints(ckpt_dir, keep):
    """Retention for the periodic ``I{it}_E{ep}`` saves: keep the
    newest ``keep`` (by iteration), never touching ``best_*`` /
    ``best.json``. The reference keeps every save (model/model.py:
    125-145) — at ~1.4 GB per optimizer-bearing checkpoint a 14k-step
    run leaks ~40 GB of disk for snapshots resume will never use.
    ``keep <= 0`` disables pruning (reference behavior)."""
    if keep is None or keep <= 0:
        return
    import re
    import shutil

    pat = re.compile(r"^I(\d+)_E\d+$")
    found = []
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            found.append((int(m.group(1)), name))
    for _, name in sorted(found)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def train(opt, seed=0, max_steps=None):
    """The sr_gae train loop (sr_gae.py:210-424)."""
    setup_logger("base", opt["path"]["log"], "train", screen=True)
    val_logger = setup_logger("val", opt["path"]["log"], "val")
    from ..utils.loggers import TBLogger, WandbLogger

    tb = TBLogger(opt["path"].get("tb_logger") or opt["path"]["log"])
    wandb_logger = WandbLogger(opt) if opt.get("enable_wandb") else None

    pipeline = build_pipeline(opt, seed=seed)
    train_opt = opt["datasets"]["train"]
    val_opt = opt["datasets"]["val"]
    scale = opt.get("scale") or 4
    train_set = _limit(
        build_dataset(train_opt, "train", scale), train_opt.get("data_len")
    )
    val_set = _limit(build_dataset(val_opt, "val", scale), val_opt.get("data_len"))
    train_loader = DataLoader(
        train_set, batch_size=train_opt["batch_size"],
        shuffle=bool(train_opt.get("use_shuffle", True)), seed=seed,
    )
    val_loader = DataLoader(val_set, batch_size=1)

    n_iter = opt["train"]["n_iter"]
    if max_steps is not None:
        n_iter = min(n_iter, max_steps)
    print_freq = opt["train"]["print_freq"]
    val_freq = opt["train"]["val_freq"]
    save_freq = opt["train"]["save_checkpoint_freq"]
    per_group = bool(opt["train"].get("per_group_steps"))

    on_device_degr = bool(train_opt.get("on_device_degradation"))
    transfer_dtype = train_opt.get("transfer_dtype")  # e.g. "float16"

    # datasets.train.device_resident: upload the normalized scene stack
    # to HBM once and sample crop+augment batches on device — only a
    # PRNG key crosses the tunnel per step (data/device_cache.py).
    # Implies on-device degradation (the sampler yields HR crops only).
    device_resident = bool(train_opt.get("device_resident"))
    scene_cache = sample_key = None
    if device_resident:
        import jax

        from ..data.device_cache import DeviceSceneCache

        base_ds = getattr(train_set, "inner", train_set)
        scene_cache = DeviceSceneCache.from_dataset(
            base_ds,
            gt_size=(train_opt.get("l_resolution") or 32) * scale,
        )
        on_device_degr = True
        sample_key = jax.random.PRNGKey(np.uint32(seed) ^ 0x5CE9E5)
        logger.info(
            "device-resident sampling: %d scenes in HBM, gt_size %d",
            scene_cache.n_scenes, scene_cache.gt_size,
        )

    def _sampled_batches(start_step, n):
        """n on-device batches keyed by absolute step index (stable
        across supervised restarts)."""
        import jax

        for j in range(n):
            key = jax.random.fold_in(sample_key, start_step + 1 + j)
            yield {"HR": scene_cache.sample(
                key, train_opt["batch_size"])}

    def _device_batches(loader):
        """One-batch device prefetch: issue the (async) host->device
        upload of batch i+1 while batch i's step runs — the tunnel
        transfer (~1 s for a 27 MB f32 batch) otherwise serializes
        with compute. ``transfer_dtype: float16`` halves it again
        (widened back to f32 on device, pipeline._to_f32)."""
        import jax

        prev = None
        for batch in loader:
            d = {}
            for k, v in batch.items():
                if isinstance(v, np.ndarray):
                    if transfer_dtype and v.dtype == np.float32:
                        v = v.astype(transfer_dtype)
                    v = jax.device_put(v)
                d[k] = v
            if prev is not None:
                yield prev
            prev = d
        if prev is not None:
            yield prev

    current_step = getattr(pipeline.ddpm, "begin_step", 0)
    current_epoch = getattr(pipeline.ddpm, "begin_epoch", 0)
    if current_step:
        logger.info("resuming at iter %d (epoch %d)",
                    current_step, current_epoch)
    ckpt_dir = opt["path"]["checkpoint"]
    prev_best = _read_best(ckpt_dir)
    best_val = prev_best["value"] if prev_best else -float("inf")
    results = {}
    steps_per_epoch = max(1, len(train_set) // train_opt["batch_size"])
    while current_step < n_iter:
        current_epoch += 1
        batches = (
            _sampled_batches(current_step, steps_per_epoch)
            if device_resident else _device_batches(train_loader)
        )
        for batch in batches:
            current_step += 1
            if current_step > n_iter:
                break
            if on_device_degr:
                loss = pipeline.train_step_from_hr(
                    batch["HR"], scale=scale, per_group=per_group
                )
            else:
                loss = pipeline.train_step(
                    {"HR": batch["HR"], "SR": batch["SR"]},
                    per_group=per_group,
                )
            if current_step % print_freq == 0:
                logger.info(
                    "<epoch:%3d, iter:%8d> l_pix: %.4e",
                    current_epoch, current_step, float(loss),
                )
                tb.add_scalar("l_pix", float(loss), current_step)
                if wandb_logger:
                    wandb_logger.log_metrics({"l_pix": float(loss)})
            if current_step % save_freq == 0:
                # periodic save BEFORE the val at the same step: the val
                # streams minutes of buffer fetches through the tunnel and
                # is where backend drops cluster (measured: T200 attempts
                # 0/2/4 all died within ~2 min of their first val, leaving
                # an empty checkpoint dir) — saved-first, a drop during
                # val costs the val, not the training progress
                pipeline.ddpm.save_checkpoint(
                    ckpt_dir, current_epoch, current_step
                )
                prune_periodic_checkpoints(
                    ckpt_dir,
                    int(opt["train"].get("keep_checkpoints") or 3),
                )
            if current_step % val_freq == 0:
                result_path = os.path.join(
                    opt["path"]["results"], str(current_epoch)
                )
                results = validate(
                    pipeline, val_loader, opt, result_path, current_step,
                    ratio=scale,
                )
                val_logger.info(
                    "<epoch:%3d, iter:%8d> indices: %s indices_cc: %s "
                    "chains: %d mpsnr_cc_std: %.3f "
                    "total_time: %.3f ave_time: %.3f",
                    current_epoch, current_step, results["indices"],
                    results["indices_cc"], results["n_chains"],
                    results["mpsnr_cc_std"], results["total_time"],
                    results["ave_time"],
                )
                for k, v in results["indices"].items():
                    tb.add_scalar(f"val/{k}", v, current_step)
                if wandb_logger:
                    wandb_logger.log_metrics(
                        {f"validation/{k}": v
                         for k, v in results["indices"].items()}
                    )
                val_psnr = results["indices_cc"]["MPSNR"]
                if val_psnr > best_val:
                    best_val = val_psnr
                    name = save_best_checkpoint(
                        pipeline, ckpt_dir, current_epoch, current_step,
                        val_psnr,
                        export_dir=opt["train"].get("export_best"),
                    )
                    val_logger.info(
                        "new best MPSNR_cc %.3f -> saved %s", val_psnr, name
                    )
    return pipeline, results


def run_val_phase(opt, seed=0):
    """The `-p val` full evaluation (sr_gae.py:428-583).

    When no resume_state is given, defaults to the best-val snapshot
    tracked by checkpoint/best.json (falls back to uninitialized weights
    with a warning, matching the reference's behavior of evaluating
    whatever resume_state says)."""
    setup_logger("base", opt["path"]["log"], "val", screen=True)
    if not opt["path"].get("resume_state"):
        best = _read_best(opt["path"]["checkpoint"])
        if best:
            opt["path"]["resume_state"] = os.path.join(
                opt["path"]["checkpoint"], best["name"]
            )
            logging.getLogger("base").info(
                "no resume_state given; using best-val checkpoint %s "
                "(MPSNR_cc %.3f at iter %d)",
                best["name"], best.get("value", float("nan")),
                best.get("iter", -1),
            )
    pipeline = build_pipeline(opt, seed=seed)
    scale = opt.get("scale") or 4
    val_opt = opt["datasets"]["val"]
    val_set = _limit(build_dataset(val_opt, "val", scale), val_opt.get("data_len"))
    val_loader = DataLoader(val_set, batch_size=1)
    results = validate(
        pipeline, val_loader, opt,
        os.path.join(opt["path"]["results"], "val"), 0, ratio=scale,
    )
    logger.info("validation results: %s", results)
    return results
