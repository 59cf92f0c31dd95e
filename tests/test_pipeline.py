"""End-to-end DMGASR pipeline tests (tiny config, 8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from hsi_dmgasr_tpu.models import GAE
from hsi_dmgasr_tpu.parallel import data_parallel_mesh
from hsi_dmgasr_tpu.parallel.mesh import dmgasr_mesh
from hsi_dmgasr_tpu.pipeline import DMGASRPipeline
from hsi_dmgasr_tpu.train import DDPMModel

TINY_OPT = {
    "name": "tiny",
    "gpu_ids": [0],
    "model": {
        "which_model_G": "sr3",
        "finetune_norm": False,
        "unet": {
            "in_channel": 6, "out_channel": 3, "inner_channel": 8,
            "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [8],
            "res_blocks": 1, "dropout": 0.0,
        },
        "beta_schedule": {
            "train": {"schedule": "cosine", "n_timestep": 4,
                      "linear_start": 1e-6, "linear_end": 1e-2},
            "val": {"schedule": "cosine", "n_timestep": 4,
                    "linear_start": 1e-6, "linear_end": 1e-2},
        },
        "diffusion": {"image_size": 16, "channels": 3, "conditional": True},
    },
    "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
    "path": {},
}


@pytest.fixture(scope="module")
def tiny_pipeline():
    gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=16)
    x = np.zeros((1, 16, 16, 31), np.float32)
    gae_vars = gae.init(jax.random.PRNGKey(0), x)
    cfg = {"n_subs": 8, "n_ovls": 2, "n_colors": 31, "n_feats": 16, "G": 5}
    ddpm = DDPMModel(TINY_OPT, seed=0)
    return DMGASRPipeline(TINY_OPT, gae_vars, cfg, ddpm=ddpm)


def test_train_step_fused(tiny_pipeline):
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(2, 16, 16, 31).astype(np.float32),
        "SR": rng.rand(2, 16, 16, 31).astype(np.float32),
    }
    l1 = tiny_pipeline.train_step(batch, key=jax.random.PRNGKey(1))
    l2 = tiny_pipeline.train_step(batch, key=jax.random.PRNGKey(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert int(tiny_pipeline.ddpm.state.step) == 2


def test_train_step_per_group_matches_reference_dynamics(tiny_pipeline):
    rng = np.random.RandomState(1)
    batch = {
        "HR": rng.rand(1, 16, 16, 31).astype(np.float32),
        "SR": rng.rand(1, 16, 16, 31).astype(np.float32),
    }
    step0 = int(tiny_pipeline.ddpm.state.step)
    tiny_pipeline.train_step(batch, key=jax.random.PRNGKey(3), per_group=True)
    # one optimizer step per band group (G=5), as in sr_gae.py:245-250
    assert int(tiny_pipeline.ddpm.state.step) == step0 + 5


def test_super_resolve_end_to_end(tiny_pipeline):
    rng = np.random.RandomState(2)
    sr_cube = rng.rand(1, 16, 16, 31).astype(np.float32)
    out = tiny_pipeline.super_resolve(sr_cube, key=jax.random.PRNGKey(4))
    assert out.shape == (1, 16, 16, 31)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_super_resolve_tiled(tiny_pipeline):
    rng = np.random.RandomState(5)
    big = rng.rand(40, 40, 31).astype(np.float32)
    out = tiny_pipeline.super_resolve_tiled(big, tile=16, overlap=8,
                                            key=jax.random.PRNGKey(9))
    assert out.shape == (40, 40, 31)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("shape", [(40, 12, 31), (12, 40, 31)])
def test_super_resolve_tiled_rectangular(tiny_pipeline, shape):
    """One dim <= tile < other (Pavia-like) must not leave weight-0 NaN."""
    rng = np.random.RandomState(6)
    big = rng.rand(*shape).astype(np.float32)
    out = tiny_pipeline.super_resolve_tiled(big, tile=16, overlap=8,
                                            key=jax.random.PRNGKey(10))
    assert out.shape == shape
    assert np.isfinite(np.asarray(out)).all()


def test_top_level_api_exports():
    import hsi_dmgasr_tpu as pkg

    assert pkg.DMGASRPipeline is not None
    assert pkg.GAE is not None
    assert pkg.GAETrainer is not None


def test_evaluate_metrics(tiny_pipeline):
    rng = np.random.RandomState(3)
    sr = rng.rand(1, 16, 16, 31).astype(np.float32)
    hr = rng.rand(1, 16, 16, 31).astype(np.float32)
    metrics, preds, dt = tiny_pipeline.evaluate(sr, hr, ratio=4)
    for k in ["MPSNR", "MSSIM", "ERGAS", "SAM", "CrossCorrelation", "RMSE"]:
        assert k in metrics and np.isfinite(metrics[k])
    assert preds.shape == (1, 16, 16, 31)


def test_data_parallel_mesh_training():
    """Train step over all 8 virtual devices; params stay replicated."""
    mesh = data_parallel_mesh()
    assert mesh.shape["data"] == 8
    ddpm = DDPMModel(TINY_OPT, mesh=mesh, seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(8, 16, 16, 3).astype(np.float32),
        "SR": rng.rand(8, 16, 16, 3).astype(np.float32),
    }
    loss = ddpm.train_step(batch, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # loss is replicated; params identical across devices
    p = jax.tree.leaves(ddpm.state.params)[0]
    assert len(p.sharding.device_set) == 8


def test_mesh_inference_pad_exceeds_batch():
    """batch of 2 on an 8-device mesh: wrap-padding must reach n_dev."""
    mesh = data_parallel_mesh()
    ddpm = DDPMModel(TINY_OPT, mesh=mesh, seed=0)
    rng = np.random.RandomState(1)
    cond = rng.rand(2, 16, 16, 3).astype(np.float32)
    out = ddpm.super_resolution(cond, key=jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_finetune_norm_is_documented_noop():
    """finetune_norm masks on 'transformer', which no UNet param path
    contains — a faithful reference bug (model/model.py:26-35). Assert
    the no-op and the warning so nobody trips on it silently."""
    import copy
    import logging

    opt = copy.deepcopy(TINY_OPT)
    opt["model"]["finetune_norm"] = True
    logger = logging.getLogger("hsi_dmgasr_tpu")
    records = []
    h = logging.Handler()
    h.emit = records.append
    logger.addHandler(h)
    try:
        ddpm = DDPMModel(opt, seed=0)
    finally:
        logger.removeHandler(h)
    assert any("finetune_norm" in r.getMessage() for r in records)
    before = jax.tree.map(np.asarray, ddpm.state.params)
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(2, 16, 16, 3).astype(np.float32),
        "SR": rng.rand(2, 16, 16, 3).astype(np.float32),
    }
    ddpm.train_step(batch, key=jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, ddpm.state.params)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_ema_at_eval_switch():
    """use_ema_for_eval samples from EMA params (which trail the live
    params after updates), changing eval output; default uses live."""
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["train"]["ema_scheduler"] = {
        "ema_decay": 0.5, "use_ema_for_eval": True,
    }
    ddpm = DDPMModel(opt, seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(2, 16, 16, 3).astype(np.float32),
        "SR": rng.rand(2, 16, 16, 3).astype(np.float32),
    }
    for i in range(3):
        ddpm.train_step(batch, key=jax.random.PRNGKey(i))
    # EMA trails the live params now
    p0 = jax.tree.leaves(ddpm.state.params)[0]
    e0 = jax.tree.leaves(ddpm.state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))

    cond = rng.rand(1, 16, 16, 3).astype(np.float32)
    out_ema = ddpm.super_resolution(cond, key=jax.random.PRNGKey(7))
    ddpm.use_ema_for_eval = False
    out_live = ddpm.super_resolution(cond, key=jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(out_ema), np.asarray(out_live))


def test_mesh_inference_equals_single_device():
    """PARITY.md's claim pinned as a test: 8-device sharded reverse
    diffusion == 1-device output (same key), flagship-like group count
    padded 9 -> 16 (nn.DataParallel equivalence, model/networks.py:113)."""
    rng = np.random.RandomState(3)
    cond = rng.rand(9, 16, 16, 3).astype(np.float32)
    key = jax.random.PRNGKey(11)

    one = DDPMModel(TINY_OPT, mesh=data_parallel_mesh(1), seed=0)
    out1 = np.asarray(one.super_resolution(cond, key=key))

    eight = DDPMModel(TINY_OPT, mesh=data_parallel_mesh(8), seed=0)
    out8 = np.asarray(eight.super_resolution(cond, key=key))
    assert out8.shape == out1.shape
    # f32 reduction order differs across device partitions
    np.testing.assert_allclose(out8, out1, atol=1e-4, rtol=1e-4)


def test_spatial_sharded_inference_equals_single(tiny_pipeline):
    """2x4 ('data','space') mesh, UNFUSED GSPMD path (round-2 behavior):
    groups over data, H over space — XLA inserts conv halo exchanges and
    GroupNorm all-reduces; output must match the 1-device pipeline."""
    rng = np.random.RandomState(7)
    sr = rng.rand(1, 16, 16, 31).astype(np.float32)
    key = jax.random.PRNGKey(21)
    want = np.asarray(tiny_pipeline.super_resolve(sr, key=key))
    mesh = dmgasr_mesh(2, 4)
    got = np.asarray(
        tiny_pipeline.super_resolve_spatial(sr, mesh, key=key, fused=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_spatial_sharded_FUSED_inference_equals_single():
    """VERDICT r2 item 2 done-criterion: spatial-sharded FUSED inference
    (shard_map + halo exchange feeding the Pallas kernels, interpret
    mode) == single-device fused to 1e-4 on the 8-vdev CPU mesh."""
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["model"]["unet"]["fuse"] = True
    gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=16)
    x = np.zeros((1, 16, 16, 31), np.float32)
    gae_vars = gae.init(jax.random.PRNGKey(0), x)
    cfg = {"n_subs": 8, "n_ovls": 2, "n_colors": 31, "n_feats": 16, "G": 5}
    pipe = DMGASRPipeline(opt, gae_vars, cfg, ddpm=DDPMModel(opt, seed=0))
    assert pipe.ddpm.unet.fuse_blocks

    rng = np.random.RandomState(8)
    sr = rng.rand(1, 16, 16, 31).astype(np.float32)
    key = jax.random.PRNGKey(22)
    want = np.asarray(pipe.super_resolve(sr, key=key))
    mesh = dmgasr_mesh(2, 4)
    got = np.asarray(pipe.super_resolve_spatial(
        sr, mesh, key=key, fused=True, replay_noise=True
    ))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_latent_chunked_sampler():
    """model.diffusion.latent_chunk splits the (B*G) latent batch into
    lax.map chunks so sampler temporaries scale with the chunk (the
    batch-4 flagship OOM'ed single-chip HBM without it). Chunked output
    is a valid deterministic sample of the same shape."""
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["model"]["diffusion"]["latent_chunk"] = 2
    ddpm = DDPMModel(opt, seed=0)
    assert ddpm.mesh.shape["data"] == 1
    rng = np.random.RandomState(3)
    cond = rng.rand(4, 16, 16, 3).astype(np.float32)
    key = jax.random.PRNGKey(5)
    out = np.asarray(ddpm.super_resolution(cond, key=key))
    assert out.shape == (4, 16, 16, 3)
    assert np.isfinite(out).all()
    # deterministic under the same key
    out2 = np.asarray(ddpm.super_resolution(cond, key=key))
    np.testing.assert_array_equal(out, out2)
    # batch not divisible by the chunk falls back to the unchunked path
    out3 = np.asarray(
        ddpm.super_resolution(cond[:3], key=key)
    )
    assert out3.shape == (3, 16, 16, 3)


def test_checkpoint_roundtrip(tmp_path):
    ddpm = DDPMModel(TINY_OPT, seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(2, 16, 16, 3).astype(np.float32),
        "SR": rng.rand(2, 16, 16, 3).astype(np.float32),
    }
    ddpm.train_step(batch, key=jax.random.PRNGKey(0))
    path = ddpm.save_checkpoint(str(tmp_path), epoch=1, iter_step=1)

    ddpm2 = DDPMModel(TINY_OPT, seed=1)
    before = jax.tree.leaves(ddpm2.state.params)[0]
    ddpm2.load_checkpoint(path)
    after = jax.tree.leaves(ddpm2.state.params)[0]
    ref = jax.tree.leaves(ddpm.state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(after), np.asarray(ref))
    assert int(ddpm2.state.step) == 1


def test_checkpoint_resave_overwrites(tmp_path):
    """A supervised restart resumes from the last periodic save and
    re-crosses val iters already best-snapshotted; re-saving the same
    name must overwrite, not crash (observed crash loop on PavT200_r4:
    orbax 'Destination ... best_I2500_E157 already exists')."""
    ddpm = DDPMModel(TINY_OPT, seed=0)
    batch = {
        "HR": np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32),
        "SR": np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32),
    }
    path = ddpm.save_checkpoint(str(tmp_path), epoch=1, iter_step=5,
                                name="best_I5_E1")
    ddpm.train_step(batch, key=jax.random.PRNGKey(0))
    path2 = ddpm.save_checkpoint(str(tmp_path), epoch=1, iter_step=5,
                                 name="best_I5_E1")
    assert path == path2
    ddpm2 = DDPMModel(TINY_OPT, seed=1)
    ddpm2.load_checkpoint(path2)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ddpm2.state.params)[0]),
        np.asarray(jax.tree.leaves(ddpm.state.params)[0]),
    )


def test_params_npz_export_roundtrip(tmp_path):
    """The git-committable durability layer: export eval weights (EMA)
    to one f16 npz, load into a fresh model via the load_resume
    dispatch, and get the same eval weights back to f16 precision.
    (Every optimizer-bearing round-3/4 checkpoint died with a container
    restart — experiments/ is ephemeral; these exports are not.)"""
    opt = dict(TINY_OPT)
    opt["train"] = {
        "optimizer": {"type": "adam", "lr": 1e-3},
        "ema_scheduler": {"step_start_ema": 0, "update_ema_every": 1,
                          "ema_decay": 0.9, "use_ema_for_eval": True},
    }
    ddpm = DDPMModel(opt, seed=0)
    rng = np.random.RandomState(0)
    batch = {
        "HR": rng.rand(2, 16, 16, 3).astype(np.float32),
        "SR": rng.rand(2, 16, 16, 3).astype(np.float32),
    }
    for i in range(3):  # let EMA diverge from raw params
        ddpm.train_step(batch, key=jax.random.PRNGKey(i))
    path = ddpm.export_params_npz(str(tmp_path / "art" / "best_params.npz"))

    ddpm2 = DDPMModel(opt, seed=1)
    ddpm2.load_resume(path)
    ref = jax.tree.leaves(jax.device_get(ddpm.eval_params))
    got = jax.tree.leaves(jax.device_get(ddpm2.eval_params))
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)
    # raw params were seeded too, so a later EMA update starts from the
    # export rather than the fresh init
    p0 = jax.tree.leaves(jax.device_get(ddpm2.state.params))[0]
    np.testing.assert_allclose(
        np.asarray(p0),
        np.asarray(jax.tree.leaves(jax.device_get(ddpm.eval_params))[0]),
        rtol=2e-3, atol=2e-3,
    )


def test_save_best_checkpoint_exports(tmp_path, tiny_pipeline):
    """train.export_best writes best_params.npz + best.json beside the
    orbax best snapshot."""
    import json
    import os

    from hsi_dmgasr_tpu.train.stage2_driver import save_best_checkpoint

    ckpt = tmp_path / "ckpt"
    export = tmp_path / "export"
    ckpt.mkdir()
    name = save_best_checkpoint(
        tiny_pipeline, str(ckpt), epoch=2, step=10, metric_value=21.5,
        export_dir=str(export),
    )
    assert name == "best_I10_E2"
    assert os.path.exists(export / "best_params.npz")
    meta = json.load(open(export / "best.json"))
    assert meta["iter"] == 10 and meta["value"] == 21.5


def test_train_step_half_precision_transfer(tiny_pipeline):
    """float16 host->device transfer (stage2_driver transfer_dtype) is
    widened on device and trains like the f32 path."""
    rng = np.random.RandomState(7)
    hr = rng.rand(2, 16, 16, 31).astype(np.float32)
    l32 = tiny_pipeline.train_step_from_hr(hr, scale=2,
                                           key=jax.random.PRNGKey(11))
    l16 = tiny_pipeline.train_step_from_hr(hr.astype(np.float16), scale=2,
                                           key=jax.random.PRNGKey(11))
    assert np.isfinite(float(l16))
    # same key, near-identical data -> near-identical loss
    assert abs(float(l16) - float(l32)) < 5e-2 * max(1.0, abs(float(l32)))
    batch16 = {"HR": hr.astype(np.float16), "SR": hr.astype(np.float16)}
    assert np.isfinite(float(
        tiny_pipeline.train_step(batch16, key=jax.random.PRNGKey(12))
    ))


def test_driver_device_prefetch_generator(synth_data, tmp_path):
    """_device_batches preserves order/content and respects
    transfer_dtype (uploads ride one batch ahead)."""
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.data import DataLoader
    from hsi_dmgasr_tpu.data.hs_datasets import HSTrainingData

    ds = HSTrainingData(f"{synth_data}/mat_scenes", n_scale=2,
                        base_size=8, augment=False, hr_only=True)
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    # crops are per-visit random: materialize one pass and reuse it
    loader = [{k: v.copy() for k, v in b.items()} for b in loader]
    host = [b["HR"].copy() for b in loader]

    # mirror stage2_driver._device_batches inline (it is a closure)
    def device_batches(loader, transfer_dtype):
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

    dev = list(device_batches(loader, "float16"))
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        assert db["HR"].dtype == jnp.float16
        np.testing.assert_allclose(np.asarray(db["HR"], np.float32), hb,
                                   atol=1e-3)


def test_latent_affine_roundtrip_and_application():
    """gae.latent_shift/latent_scale recenter the diffusion's working
    space: encode applies (z-shift)*scale, decode inverts it exactly, so
    reconstruct() is unchanged while the diffusion sees normalized
    latents (round-3 fix for the clip-vs-latent-range mismatch)."""
    import copy

    gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=16)
    x = np.random.RandomState(0).rand(1, 16, 16, 31).astype(np.float32)
    gae_vars = gae.init(jax.random.PRNGKey(0), x)
    cfg = {"n_subs": 8, "n_ovls": 2, "n_colors": 31, "n_feats": 16, "G": 5}

    opt_id = copy.deepcopy(TINY_OPT)
    opt_aff = copy.deepcopy(TINY_OPT)
    opt_aff["gae"] = {"latent_shift": -0.55, "latent_scale": 1.65}

    p_id = DMGASRPipeline(opt_id, gae_vars, cfg,
                          ddpm=DDPMModel(opt_id, seed=0))
    p_aff = DMGASRPipeline(opt_aff, gae_vars, cfg,
                           ddpm=DDPMModel(opt_aff, seed=0))

    z_id = np.asarray(p_id.encode(x))
    z_aff = np.asarray(p_aff.encode(x))
    np.testing.assert_allclose(z_aff, (z_id + 0.55) * 1.65, rtol=1e-5,
                               atol=1e-5)
    # decode inverts the affine: round-trip identical to the identity one
    np.testing.assert_allclose(
        np.asarray(p_aff.reconstruct(x)), np.asarray(p_id.reconstruct(x)),
        atol=1e-5,
    )
    # training + inference run through the affine space
    loss = p_aff.train_step({"HR": x, "SR": x}, key=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = p_aff.super_resolve(x, key=jax.random.PRNGKey(2))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_continous_process_stack_conditional(tiny_pipeline):
    """continous=True returns the reference's reverse-process stack:
    [cond, strided states..., final] along the batch axis
    (sr3_modules/diffusion.py:177-201)."""
    ddpm = tiny_pipeline.ddpm
    cond = np.random.RandomState(7).rand(2, 16, 16, 3).astype(np.float32)
    stack = ddpm.super_resolution(cond, key=jax.random.PRNGKey(5),
                                  continous=True)
    T = 4
    n_kept = sum(1 for t in range(T - 1, -1, -1) if t % (1 | (T // 10)) == 0)
    assert stack.shape == ((1 + n_kept) * 2, 16, 16, 3)
    np.testing.assert_allclose(stack[:2], cond, atol=1e-6)
    # the final frames equal the non-continous sample with the same key
    final = np.asarray(ddpm.super_resolution(cond, key=jax.random.PRNGKey(5)))
    np.testing.assert_allclose(stack[-2:], final, atol=1e-5)


def test_continous_process_stack_unconditional():
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["model"]["diffusion"]["conditional"] = False
    opt["model"]["unet"]["in_channel"] = 3
    ddpm = DDPMModel(opt, seed=0)
    stack = ddpm.sample(batch_size=1, key=jax.random.PRNGKey(6),
                        continous=True)
    T = 4
    n_kept = sum(1 for t in range(T - 1, -1, -1) if t % (1 | (T // 10)) == 0)
    assert stack.shape == (1 + n_kept, 16, 16, 3)
    final = np.asarray(ddpm.sample(batch_size=1, key=jax.random.PRNGKey(6)))
    np.testing.assert_allclose(stack[-1:], final, atol=1e-5)


def test_lr_schedule_step_decay():
    """train.optimizer.lr_schedule 'step' decays the Adam LR at the
    milestone (checked through the actual update magnitude)."""
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["train"] = {"optimizer": {
        "type": "adam", "lr": 1e-4,
        "lr_schedule": {"type": "step", "milestones": [2], "gamma": 0.1},
    }}
    ddpm = DDPMModel(opt, seed=0)
    rng = np.random.RandomState(0)
    batch = {"HR": rng.rand(1, 16, 16, 3).astype(np.float32),
             "SR": rng.rand(1, 16, 16, 3).astype(np.float32)}

    def delta():
        before = jax.device_get(ddpm.state.params)
        ddpm.train_step(batch, key=jax.random.PRNGKey(int(ddpm.state.step)))
        after = jax.device_get(ddpm.state.params)
        return max(np.max(np.abs(a - b)) for a, b in zip(
            jax.tree.leaves(after), jax.tree.leaves(before)))

    d1 = delta()   # step 1, lr 1e-4 (adam step bounded ~lr)
    d2 = delta()   # step 2, lr 1e-4
    d3 = delta()   # step 3, lr 1e-5 after milestone
    assert d1 > 5e-5 and d2 > 5e-5
    assert d3 < 0.5 * d2, (d1, d2, d3)


def test_pipeline_t_start_plumbs_through():
    """model.diffusion.t_start reaches super_resolve: the truncated
    cond-initialized chain (the production quality setting,
    configs/pavia_x4_r3.json) equals a manual init_from_cond + truncated
    sample_loop with the same key, and differs from the full chain."""
    import copy

    opt = copy.deepcopy(TINY_OPT)
    opt["model"]["diffusion"]["t_start"] = 2
    gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=16)
    x0 = np.zeros((1, 16, 16, 31), np.float32)
    gae_vars = gae.init(jax.random.PRNGKey(0), x0)
    cfg = {"n_subs": 8, "n_ovls": 2, "n_colors": 31, "n_feats": 16, "G": 5}
    p = DMGASRPipeline(opt, gae_vars, cfg, ddpm=DDPMModel(opt, seed=0))

    rng = np.random.RandomState(7)
    sr_cube = rng.rand(1, 16, 16, 31).astype(np.float32)
    key = jax.random.PRNGKey(11)
    out, z = p.super_resolve(sr_cube, key=key, return_latents=True)
    assert out.shape == (1, 16, 16, 31)

    # manual truncated chain from the same cond/key
    diffusion = p.ddpm.val_diffusion
    cond = p._fold(p.encode(sr_cube))

    def denoise_fn(xt, t):
        return p.ddpm.unet.apply(
            {"params": p.ddpm.eval_params}, xt, t, train=False)

    z_manual = diffusion.sample_loop(denoise_fn, key, cond=cond, t_start=2)
    np.testing.assert_allclose(
        np.asarray(z).reshape(z_manual.shape), np.asarray(z_manual),
        atol=1e-5)

    # and the full chain (no t_start) from the same key differs
    p_full = DMGASRPipeline(TINY_OPT, gae_vars, cfg,
                            ddpm=DDPMModel(TINY_OPT, seed=0))
    out_full = p_full.super_resolve(sr_cube, key=key)
    assert np.abs(np.asarray(out) - np.asarray(out_full)).max() > 1e-7


def test_validate_multi_chain_averaging(tiny_pipeline):
    """validate() averages >=1 stochastic chains per scene with
    deterministic per-(scene, chain) keys: results are reproducible
    across calls, carry a chain-std estimate, and the 2-chain mean
    differs from a 1-chain run (different noise draws are averaged)."""
    from hsi_dmgasr_tpu.train.stage2_driver import validate

    rng = np.random.RandomState(3)
    loader = [
        {
            "SR": rng.rand(1, 16, 16, 31).astype(np.float32),
            "HR": rng.rand(1, 16, 16, 31).astype(np.float32),
        }
        for _ in range(2)
    ]
    r2 = validate(tiny_pipeline, loader, TINY_OPT, save_outputs=False,
                  ratio=4, n_chains=2)
    assert r2["n_chains"] == 2 and r2["n"] == 2
    assert np.isfinite(r2["mpsnr_cc_std"]) and r2["mpsnr_cc_std"] >= 0
    # deterministic: same keys -> identical metrics on a second sweep
    r2b = validate(tiny_pipeline, loader, TINY_OPT, save_outputs=False,
                   ratio=4, n_chains=2)
    assert r2["indices_cc"]["MPSNR"] == pytest.approx(
        r2b["indices_cc"]["MPSNR"], abs=1e-9)
    # single chain (chain 0 keys are shared) gives a different mean
    r1 = validate(tiny_pipeline, loader, TINY_OPT, save_outputs=False,
                  ratio=4, n_chains=1)
    assert r1["mpsnr_cc_std"] == 0.0
    assert r1["indices_cc"]["MPSNR"] != pytest.approx(
        r2["indices_cc"]["MPSNR"], abs=1e-12)
