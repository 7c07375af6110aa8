"""Training-stack tests: a short synthetic training run must reduce the BCE
loss and improve mask quality; checkpoint save/resume round-trips; the
target-model cache hits on the second epoch."""
import tempfile
from dataclasses import replace
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frtm_tpu.config import eval_config
from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
from frtm_tpu.runtime.trainer import (
    Trainer, TrainerModel, TModelCache, iou_accuracy, make_optimizer,
)
from frtm_tpu.data.training_datasets import SyntheticTrainingDataset, SampleSpec


def test_iou_accuracy_conventions():
    a = jnp.ones((1, 8, 8))
    b = jnp.ones((1, 8, 8))
    assert float(iou_accuracy(a, b)[0]) == 1.0
    z = jnp.zeros((1, 8, 8))
    assert float(iou_accuracy(z, z)[0]) == 1.0   # 0/0 -> 1
    assert float(iou_accuracy(a, z)[0]) == 0.0


def _tiny_setup(tmp, cache_enabled=True):
    arch = "resnet18"
    cfg = eval_config(arch, fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(
        cfg.disc, c_channels=16, init_iters=(3, 5), update_iters=(3,),
        memory_size=8, filter_reg=(1e-5, 1e-4), precond=(1e-5, 1e-4),
        cg_forgetting_rate=75, pixel_weighting_method="none"))
    backbone = init_resnet(jax.random.PRNGKey(1), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items() if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch, use_bn=True)
    cache = TModelCache(Path(tmp) / "tmcache", enable=cache_enabled)
    model = TrainerModel(cfg, backbone, refiner, cache)
    return cfg, model


@pytest.mark.slow
def test_training_reduces_loss():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, model = _tiny_setup(tmp)
        dset = lambda: SyntheticTrainingDataset(n_samples=8, size=(96, 128),
                                                sample_size=3, seed=0)
        trainer = Trainer("t1", model, [dset], Path(tmp) / "ckpt", Path(tmp) / "log",
                          max_epochs=3, batch_size=4, lr=1e-3, load_latest=False)
        import io, contextlib, json
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            trainer.train()
        stats = [json.loads(l) for l in open(Path(tmp) / "log" / "t1" / "stats.jsonl")]
        losses = [s["stats/loss"] for s in stats]
        # 6 steps only: the signal that training works is a falling BCE (mask
        # accuracy needs far more steps — the object is ~6% of pixels, so the
        # early optimum is all-background)
        assert losses[-1] < losses[0] * 0.9, losses
        # second epoch: every disc init cached (8 samples x same frame0)
        assert stats[1]["stats/fcache_hits"] == 4.0  # avg per 4-sample batch
        # checkpoint exists and resumes
        ckpts = sorted((Path(tmp) / "ckpt" / "t1").glob("t1_ep*.npz"))
        assert len(ckpts) == 3
        cfg2, model2 = _tiny_setup(tmp)
        tr2 = Trainer("t1", model2, [dset], Path(tmp) / "ckpt", Path(tmp) / "log",
                      max_epochs=3, batch_size=4, load_latest=True)
        assert tr2.epoch == 3
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(tr2.model.refiner)[0]),
            np.asarray(jax.tree.leaves(trainer.model.refiner)[0]))


def test_steplr_schedule():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, model = _tiny_setup(tmp, cache_enabled=False)
        dset = lambda: SyntheticTrainingDataset(n_samples=2, size=(64, 96), sample_size=2)
        tr = Trainer("t2", model, [dset], Path(tmp) / "c", Path(tmp) / "l",
                     max_epochs=1, batch_size=2, lr=1e-3, lr_step=127,
                     lr_gamma=0.1, load_latest=False)
        tr.epoch = 1
        assert abs(tr._lr() - 1e-3) < 1e-12
        tr.epoch = 127
        assert abs(tr._lr() - 1e-3) < 1e-12   # StepLR steps AFTER epoch 127
        tr.epoch = 128
        assert abs(tr._lr() - 1e-4) < 1e-12


@pytest.mark.slow
def test_trainer_data_parallel_over_mesh():
    """Trainer(mesh=...) runs the same loop data-parallel over 8 virtual
    devices and still reduces the loss."""
    from frtm_tpu.parallel import make_mesh
    with tempfile.TemporaryDirectory() as tmp:
        cfg, model = _tiny_setup(tmp)
        dset = lambda: SyntheticTrainingDataset(n_samples=8, size=(96, 128),
                                                sample_size=2, seed=0)
        tr = Trainer("dp1", model, [dset], Path(tmp) / "ckpt", Path(tmp) / "log",
                     max_epochs=2, batch_size=8, lr=1e-3, load_latest=False,
                     mesh=make_mesh(8))
        import io, contextlib, json
        with contextlib.redirect_stdout(io.StringIO()):
            tr.train()
        stats = [json.loads(l) for l in open(Path(tmp) / "log" / "dp1" / "stats.jsonl")]
        losses = [s["stats/loss"] for s in stats]
        assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_bn_affine_trains_and_running_stats_move():
    """Regression (round-2 review): BatchNorm scale/bias are ordinary trained
    parameters in the reference (torch Adam updates them); apply_bn_updates
    used to overwrite them with pre-step values every step, pinning them at
    (1, 0) forever. Running stats must also move away from their (0, 1)
    init — and they momentum-chain across BOTH train frames per step."""
    with tempfile.TemporaryDirectory() as tmp:
        cfg, model = _tiny_setup(tmp)
        dset = lambda: SyntheticTrainingDataset(n_samples=4, size=(96, 128),
                                                sample_size=3, seed=0)
        trainer = Trainer("tbn", model, [dset], Path(tmp) / "ckpt",
                          Path(tmp) / "log", max_epochs=2, batch_size=4,
                          lr=1e-2, load_latest=False)
        import io, contextlib
        with contextlib.redirect_stdout(io.StringIO()):
            trainer.train()
        bn = trainer.model.refiner["rrb1"][cfg.refnet_layers[0]]["bn"]
        assert not np.allclose(np.asarray(bn["scale"]), 1.0), \
            "BN scale never left its init — affine params are not training"
        assert not np.allclose(np.asarray(bn["bias"]), 0.0), \
            "BN bias never left its init — affine params are not training"
        assert not np.allclose(np.asarray(bn["mean"]), 0.0)
        assert not np.allclose(np.asarray(bn["var"]), 1.0)
