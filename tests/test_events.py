"""Event broker: aggregation, metadata keeping, best tracking, state resume."""
import numpy as np
import pytest

from mdir_tpu.tools.events import EventBroker, MetadataKeeper, initialize_processor


def _feed_epoch(events, epoch, losses, score=None):
    for i, loss in enumerate(losses):
        events.register_data(epoch, i, len(losses), "train/learning/loss",
                             {"total": loss}, "scalar/loss")
        events.register_data(epoch, i, len(losses), "train/learning/iteration",
                             {"step": 0.1}, "scalar/time")
    if score is not None:
        events.register_data(epoch, None, 1, "val/learning/score",
                             {"total": score}, "scalar/score")
    events.close_epoch()


def test_metadata_aggregation():
    events = initialize_processor({}, dataroot=None)
    _feed_epoch(events, 0, [2.0, 4.0], score=0.5)
    _feed_epoch(events, 1, [1.0, 3.0], score=0.7)

    md = events.metadata.metadata()
    np.testing.assert_allclose(md["train/learning/loss:total_avg.4"], [3.0, 2.0])
    assert md["val/learning/score:total"] == [0.5, 0.7]


def test_is_last_best_and_best_epoch():
    events = initialize_processor({}, dataroot=None)
    _feed_epoch(events, 0, [2.0], score=0.5)
    assert events.metadata.is_last_best("val/learning/score:total")
    _feed_epoch(events, 1, [1.0], score=0.3)
    assert not events.metadata.is_last_best("val/learning/score:total")
    # loss: lower is better
    assert events.metadata.is_last_best("train/learning/loss:total_avg.4"
                                        .replace("_avg.4", ""))
    best = events.metadata.best_epoch("val/learning/score:total")
    assert best["index"] == 0
    assert events.metadata.is_last_best("epoch")


def test_state_roundtrip():
    events = initialize_processor({}, dataroot=None)
    _feed_epoch(events, 0, [2.0])
    state = events.state_dict()

    resumed = initialize_processor({}, dataroot=None, state=state)
    _feed_epoch(resumed, 1, [1.0])
    md = resumed.metadata.metadata()
    np.testing.assert_allclose(md["train/learning/loss:total_avg.4"], [2.0, 1.0])


def test_errors_coverage():
    events = initialize_processor({}, dataroot=None)
    _feed_epoch(events, 0, [2.0], score=0.5)
    _feed_epoch(events, 1, [1.0])  # score missing in epoch 1
    errors = events.metadata.errors()
    messages = [e["message"] for e in errors]
    assert any("epoch coverage" in m for m in messages)


def test_weight_histograms_and_blobs(tmp_path, rng):
    events = initialize_processor({}, dataroot=str(tmp_path))
    events.register_data(0, 0, 1, "net/params",
                         {"w": rng.randn(100)}, "weight/param")
    events.register_data(0, 0, 1, "data/input",
                         {"img.rgb": {"dtype": "image:rgb",
                                      "data": rng.rand(8, 8, 3)}}, "blob")
    events.close_epoch()
    blobs = list(tmp_path.glob("blobs/*.png"))
    assert len(blobs) == 1
    # histogram stored as (centers, counts)
    item = events.data[0]["net/params"]
    centers, counts = item["data"]["w"][0]
    assert len(centers) == 200 and sum(counts) == 100


def test_htmlreport_renders(tmp_path, rng):
    pytest.importorskip("matplotlib")
    events = initialize_processor({"htmlreport": True}, dataroot=str(tmp_path))
    _feed_epoch(events, 0, [2.0, 1.5], score=0.4)
    report = tmp_path / "report.html"
    assert report.exists()
    content = report.read_text()
    assert "train/learning/loss" in content


def test_htmlreport_renders_iteration_blobs(tmp_path, rng):
    """Per-iteration sample blobs (lists of {dtype, path}) render as the
    latest thumbnail instead of crashing the report."""
    pytest.importorskip("matplotlib")
    events = initialize_processor({"htmlreport": True}, dataroot=str(tmp_path))
    for i in range(2):
        events.register_data(0, i, 2, "train/learning/loss",
                             {"total": 1.0 - i * 0.1}, "scalar/loss")
        events.register_data(0, i, 2, "train_data/input",
                             {"img.rgb": {"dtype": "image:rgb",
                                          "data": rng.rand(8, 8, 3)}}, "blob")
    events.close_epoch()
    report = (tmp_path / "report.html").read_text()
    assert "train_data/input" in report
    assert "missing blob" not in report


def test_tensorboard_streamer_with_fake_writer(tmp_path, monkeypatch):
    """tensorboardX is absent in this environment; exercise the Tensorboard
    streamer/sink (tools/events.py) against a faked SummaryWriter so the
    class actually runs: live scalar rows and per-epoch summaries."""
    import sys
    import types

    calls = []

    class FakeWriter:
        def __init__(self, path):
            calls.append(("init", path))

        def add_scalar(self, tag, value, step):
            calls.append(("scalar", tag, float(value), int(step)))

    mod = types.ModuleType("tensorboardX")
    mod.SummaryWriter = FakeWriter
    monkeypatch.setitem(sys.modules, "tensorboardX", mod)

    events = initialize_processor({"tensorboard": True},
                                  dataroot=str(tmp_path))
    _feed_epoch(events, 0, [2.0, 1.5], score=0.4)

    assert calls[0] == ("init", str(tmp_path))
    live = [c for c in calls if c[0] == "scalar"
            and c[1].startswith("train/learning/loss")]
    # 2 live iterations streamed at their global step
    assert [(c[2], c[3]) for c in live[:2]] == [(2.0, 0), (1.5, 1)]
    # close_epoch feeds the sink: per-epoch aggregates under epoch/
    epoch_rows = {c[1]: c[2] for c in calls
                  if c[0] == "scalar" and c[1].startswith("epoch/")}
    assert epoch_rows["epoch/train/learning/loss/total"] == pytest.approx(1.75)
    assert epoch_rows["epoch/val/learning/score/total"] == pytest.approx(0.4)


def test_tensorboard_without_tensorboardx_warns(tmp_path, monkeypatch):
    import builtins
    import sys

    monkeypatch.setitem(sys.modules, "tensorboardX", None)
    real_import = builtins.__import__

    def block(name, *args, **kwargs):
        if name == "tensorboardX":
            raise ImportError(name)
        return real_import(name, *args, **kwargs)

    monkeypatch.setattr(builtins, "__import__", block)
    with pytest.warns(UserWarning, match="tensorboardX not available"):
        events = initialize_processor({"tensorboard": True},
                                      dataroot=str(tmp_path))
    _feed_epoch(events, 0, [1.0], score=0.1)  # disabled writer is a no-op


def test_metadata_metric_accessor():
    """MetadataKeeper.metric returns one series' raw values by key pair."""
    events = initialize_processor({}, dataroot=None)
    events.register_data(0, None, None, "train/learning/loss",
                         {"total": 0.5}, "scalar/loss")
    events.close_epoch()
    series = events.metadata.metric("train/learning/loss", "total")
    assert series == [0.5]


def test_tools_utils_micro():
    """indent / expect (the daan.ml assert-with-pdb helper) behavior."""
    from mdir_tpu.tools.utils import expect, indent

    assert indent("a\nb", level=2) == "a\n        b"
    assert expect(True) is True
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="boom"):
        expect(False, "boom")


def test_imgtools_makegrid(tmp_path, rng):
    """makegrid builds the [input, gnd, output] comparison grid image."""
    from mdir_tpu.tools.imgtools import makegrid

    mean_std = [[0.5] * 3, [0.5] * 3]
    imgs = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(3)]
    grid = makegrid(imgs, 64, mean_std, "")
    arr = np.asarray(grid)
    assert arr.ndim == 3 and arr.shape[-1] == 3 and arr.size > 0


def test_plots_render(tmp_path, rng):
    """plot_distribution / plot_histogram render onto a matplotlib axis."""
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mdir_tpu.tools.plots import plot_distribution, plot_histogram

    centers = np.linspace(0, 1, 16)
    hists = [(float(i), centers, rng.rand(16)) for i in range(4)]
    fig, ax = plt.subplots()
    plot_distribution(hists, ax)
    plt.close(fig)

    fig, ax = plt.subplots()
    plot_histogram([("h%d" % i, centers, rng.rand(16)) for i in range(3)], ax)
    plt.close(fig)


def test_component_reprs_do_not_crash():
    """__repr__ across networks / validations / criteria / wrappers /
    schedulers feeds checkpoint printouts and reports — none may raise."""
    from mdir_tpu.learning.network import CirNetwork
    from mdir_tpu.learning.validation import initialize_validation
    from mdir_tpu.learning.wrappers import initialize_wrappers
    from mdir_tpu.models import initialize_model
    from mdir_tpu.optim.criteria import initialize_criterion

    model = initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})
    network = CirNetwork(model, CirNetwork.NetworkParams(
        model={}, runtime={"wrappers": {
            "train": None,
            "eval": {"0_cirmultiscale": {"scales": True}}}}))
    assert "CirNetwork" in repr(network)
    assert repr(initialize_wrappers("reflectpad_divisible:32"))
    for loss in ("contrastive", "triplet"):
        crit = initialize_criterion({"loss": loss, "margin": 0.7,
                                     "eps": 1e-6} if loss == "contrastive"
                                    else {"loss": loss, "margin": 0.1})
        assert loss in repr(crit).lower() or repr(crit)
    validation = initialize_validation(
        False, data=(), params_data={}, default_criterion=None,
        net_defaults={})
    assert repr(validation)  # NoValidation
