"""Self-contained HTML training report (an EventSink).

Capability parity with the reference's HtmlReport + presentation layer
(``tools/eventprocessor.py:429-600``, ``daan/presentation``): one standalone
``report.html`` under the dataroot with per-metric loss/score curves, timing
distributions, weight histograms (ridgelines over epochs), and sample
input/output image thumbnails — figures embedded as base64 PNGs so the file
is portable. Rendered on every ``close_epoch`` so it tracks a running train.
"""
import base64
import html
import io
from pathlib import Path

import numpy as np

from .events import EventSink
from . import plots


def _fig_to_b64(fig):
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", dpi=80)
    import matplotlib.pyplot as plt

    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _img_tag(b64, width=360):
    return '<img src="data:image/png;base64,%s" style="max-width:%dpx">' % (
        b64, width)


def _thumb_tag(path, width=200):
    try:
        with open(path, "rb") as handle:
            b64 = base64.b64encode(handle.read()).decode("ascii")
        return _img_tag(b64, width)
    except OSError:
        return "<em>missing blob %s</em>" % html.escape(str(path))


class HtmlReport(EventSink):

    def __init__(self, enabled=True, dataroot=None):
        self.enabled = bool(enabled) and dataroot is not None
        self.dataroot = Path(dataroot) if dataroot is not None else None
        self.epochs = []  # list of aggregated epoch data
        self.consts = {}

    def load_epochs_data(self, epochs, consts):
        self.epochs = list(epochs)
        self.consts = consts
        return self

    def register_epoch_data(self, epoch, data, consts):
        self.epochs.append(data)
        self.consts = consts
        if self.enabled:
            self.render(epoch)

    # --- rendering ----------------------------------------------------------

    def _series(self, dtype_prefix):
        """{key: {subkey: [(epoch, aggregated value or histogram)]}}"""
        acc = {}
        for epoch, data in enumerate(self.epochs):
            for key, item in data.items():
                if not item["dtype"].startswith(dtype_prefix):
                    continue
                for subkey, values in item["data"].items():
                    acc.setdefault(key, {}).setdefault(subkey, []).append(
                        (epoch, values))
        return acc

    def _render_scalar_curves(self, out):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for key, subkeys in sorted(self._series("scalar/").items()):
            for subkey, series in sorted(subkeys.items()):
                points = []
                for epoch, values in series:
                    arr = np.asarray(values, dtype=np.float64).ravel()
                    arr = arr[~np.isnan(arr)]
                    if arr.size:
                        points.append((epoch, float(arr.mean())))
                if not points:
                    continue
                fig, ax = plt.subplots(figsize=(4, 2.2))
                plots.plot_curve(points, ax)
                ax.set_title("%s:%s" % (key, subkey), fontsize=8)
                out.append("<div style='display:inline-block'><small>%s:%s"
                           "</small><br>%s</div>"
                           % (html.escape(key), html.escape(subkey),
                              _img_tag(_fig_to_b64(fig))))

    def _render_weight_hists(self, out):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for key, subkeys in sorted(self._series("weight/").items()):
            for subkey, series in sorted(subkeys.items()):
                hists = []
                for epoch, values in series:
                    # aggregated values: list of (centers, counts) per row
                    if isinstance(values, list) and values \
                            and isinstance(values[0], (tuple, list)):
                        centers, counts = values[-1]
                    else:
                        centers, counts = values
                    hists.append((epoch, np.asarray(centers),
                                  np.asarray(counts)))
                if not hists:
                    continue
                fig, ax = plt.subplots(figsize=(4, 2.2))
                plots.plot_histogram(hists, ax)
                ax.set_title("%s:%s" % (key, subkey), fontsize=8)
                out.append("<div style='display:inline-block'><small>%s:%s"
                           "</small><br>%s</div>"
                           % (html.escape(key), html.escape(subkey),
                              _img_tag(_fig_to_b64(fig))))

    def _render_blobs(self, out):
        latest = self.epochs[-1] if self.epochs else {}
        sources = list(latest.items()) + list(self.consts.items())
        for key, item in sources:
            if item["dtype"] != "blob":
                continue
            out.append("<h3>%s</h3>" % html.escape(key))
            for subkey, value in item["data"].items():
                if isinstance(value, list):  # per-iteration blobs: show latest
                    value = value[-1]
                path = value.get("path")
                if path:
                    out.append("<div><small>%s</small><br>%s</div>"
                               % (html.escape(subkey), _thumb_tag(path)))

    def render(self, epoch):
        out = ["<!DOCTYPE html><html><head><meta charset='utf-8'>"
               "<title>mdir-tpu training report</title>"
               "<style>body{font-family:sans-serif;margin:20px} "
               "img{margin:4px;border:1px solid #ddd}</style></head><body>"]
        out.append("<h1>Training report — epoch %s</h1>" % epoch)

        out.append("<h2>Metrics</h2>")
        try:
            self._render_scalar_curves(out)
        except Exception as exc:  # matplotlib absent or headless issues
            out.append("<em>curves unavailable: %s</em>" % html.escape(str(exc)))

        out.append("<h2>Weights</h2>")
        try:
            self._render_weight_hists(out)
        except Exception as exc:
            out.append("<em>histograms unavailable: %s</em>"
                       % html.escape(str(exc)))

        out.append("<h2>Samples</h2>")
        self._render_blobs(out)

        out.append("</body></html>")
        self.dataroot.mkdir(parents=True, exist_ok=True)
        with open(self.dataroot / "report.html", "w") as handle:
            handle.write("\n".join(out))
