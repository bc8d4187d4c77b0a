"""Typed event pipeline: streamers (live) + per-epoch sinks.

Parity with ``mdir/tools/eventprocessor.py``: EventBroker fans typed events
(``scalar/loss|score|time``, ``weight/param|grad``, ``blob``) out to
streamers and accumulates rows per epoch; ``close_epoch`` aggregates and
feeds sinks (MetadataKeeper with avg/sum metric series, best-epoch logic and
coverage ``errors()``; Tensorboard when available; HtmlReport). Blobs are
written under ``<dataroot>/blobs``. The full event history is part of the
training checkpoint state so reports survive resume.
"""
import abc
import pickle
import time
import warnings
from pathlib import Path

import numpy as np

# Valid dtypes:
# - scalar/loss, scalar/score (curve + hist aggregation: avg)
# - scalar/time (distribution, aggregation: sum)
# - weight/param, weight/grad (histogram only)
# - blob (image:rgb/rgba/gray, response, vector)


class EventSink(abc.ABC):
    @abc.abstractmethod
    def load_epochs_data(self, epochs, consts):
        pass

    @abc.abstractmethod
    def register_epoch_data(self, epoch, data, consts):
        pass


class EventStreamer(abc.ABC):
    @abc.abstractmethod
    def add_row(self, epoch, timestamp, relative_iteration, epoch_size, key,
                data, dtype):
        pass


class MetadataKeeper(EventSink):
    """Per-epoch metric series with avg/sum aggregation and best tracking."""

    aggregations = {"avg": "_avg.4", "sum": "_sum.1", None: ""}

    def __init__(self, dataroot=None):
        self.epochs = []
        self.data = {}
        self.keys = {}

    def load_epochs_data(self, epochs, consts):
        assert not self.data
        for i, data in enumerate(epochs):
            self.register_epoch_data(i, data, consts)
        return self

    def register_epoch_data(self, epoch, data, consts):
        assert epoch >= 0
        self.epochs.append(epoch)
        for key, item in data.items():
            if key in self.keys:
                assert self.keys[key] == item["data"].keys()
                continue
            self.keys[key] = item["data"].keys()
            if item["dtype"].startswith("scalar/"):
                for subkey, subitem in item["data"].items():
                    if not isinstance(subitem, (list, np.ndarray)):
                        aggr = None
                    else:
                        aggr = "avg" if item["dtype"] in {"scalar/loss", "scalar/score"} else "sum"
                    new_key = key + ":" + subkey + self.aggregations[aggr]
                    self.data[key, subkey] = {
                        "iteration_density": [],
                        "dtype": item["dtype"],
                        "aggr": aggr,
                        "key": new_key,
                        "epochs": [],
                        "data": [],
                    }

        for key, item in self.data.items():
            if key[0] not in data:
                continue
            value = np.array(data[key[0]]["data"][key[1]])
            iteration_density = None
            if item["aggr"] is not None:
                value = value[~np.isnan(value)]
                value = {"avg": np.mean, "sum": np.sum}[item["aggr"]](value)
                if data[key[0]]["relative_iteration"] is not None:
                    iteration_density = (len(data[key[0]]["relative_iteration"])
                                         / data[key[0]]["epoch_size"])
            item["iteration_density"].append(iteration_density)
            item["epochs"].append(epoch)
            item["data"].append(value)

    def metric(self, data_key, item_key):
        return self.data[data_key, item_key]["data"]

    def metadata(self):
        return {y["key"]: y["data"] for y in self.data.values()
                if y["dtype"] in {"scalar/loss", "scalar/score"}}

    def is_last_best(self, key):
        if isinstance(key, str):
            key = tuple(key.split(":"))
        assert isinstance(key, tuple), key
        if key == ("epoch",):
            return True
        if key not in self.data or self.data[key]["epochs"][-1] != self.epochs[-1]:
            return False
        if self.data[key]["dtype"] == "scalar/score":
            return max(self.data[key]["data"]) == self.data[key]["data"][-1]
        return min(self.data[key]["data"]) == self.data[key]["data"][-1]

    def best_epoch(self, key):
        if isinstance(key, str):
            key = tuple(key.split(":"))
        assert isinstance(key, tuple)
        if key == ("epoch",):
            return {"index": self.epochs[-1], "metric_avg.3": self.epochs[-1],
                    "key": "epoch"}
        if key not in self.data:
            return None
        if self.data[key]["dtype"] == "scalar/score":
            index = int(np.argmax(self.data[key]["data"]))
        else:
            index = int(np.argmin(self.data[key]["data"]))
        return {"index": self.data[key]["epochs"][index],
                "metric_avg.3": self.data[key]["data"][index],
                "key": self.data[key]["key"]}

    def errors(self):
        errors = []
        if self.epochs != list(range(len(self.epochs))):
            errors.append({"message": "Non-standard epoch sequence used",
                           "data": self.epochs})
        density = {"%s@epoch_%s" % (x["key"], z): y
                   for x in self.data.values()
                   for y, z in zip(x["iteration_density"], x["epochs"])
                   if y != 1 and y is not None}
        if density:
            errors.append({"message": "Some keys have incomplete iteration coverage",
                           "data": density})
        coverage = {x["key"]: x["epochs"] for x in self.data.values()
                    if x["epochs"] != self.epochs}
        if coverage:
            errors.append({"message": "Some keys have incomplete epoch coverage",
                           "data": coverage})
        return errors


class EpochEventAccumulator(EventStreamer):
    """Accumulate one epoch's rows; blobs to files, weights to histograms."""

    folder_name = "blobs"
    histogram_bins = 200
    dtypes = {"scalar/loss", "scalar/score", "scalar/time", "weight/param",
              "weight/grad", "blob"}
    suffixes = {"image:rgb": "png", "image:rgba": "png", "image:gray": "png",
                "response": "tiff", "vector": "pkl"}

    def __init__(self, dataroot):
        self.datapath = (Path(dataroot) / self.folder_name) \
            if dataroot is not None else None
        self.epoch = None
        self.accumulator = []
        self.datapath_created = False

    @staticmethod
    def _store_single_blob(img, path, suffix):
        img = np.asarray(img)
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        with path.open("wb") as handle:
            if suffix == "png":
                from PIL import Image

                if img.dtype in (np.float32, np.float64):
                    img = img * 255
                if img.dtype != np.uint8:
                    img = np.clip(img, 0, 255).astype(np.uint8)
                assert img.ndim in {2, 3}, img.shape
                Image.fromarray(img).save(handle, format="PNG")
            elif suffix == "tiff":
                from PIL import Image

                assert img.ndim == 2, img.shape
                Image.fromarray(img).save(handle, format="TIFF")
            else:
                pickle.dump(img, handle)
        return str(path)

    def _store_blob(self, fname_piece, key, data):
        if self.datapath is None:
            for value in data.values():
                value.pop("data", None)
                value["path"] = None
            return data
        if not self.datapath_created:
            self.datapath.mkdir(parents=True, exist_ok=True)
            self.datapath_created = True
        for subkey, value in data.items():
            suffix = self.suffixes[value["dtype"]]
            fname = "%s:%s:%s.%s" % (key.replace("/", "_"),
                                     subkey.replace("/", "_"), fname_piece, suffix)
            value["path"] = self._store_single_blob(
                value.pop("data"), self.datapath / fname, suffix)
        return data

    def _generate_hist(self, data):
        for key, value in data.items():
            value = np.asarray(value)
            hist = np.histogram(value, bins=self.histogram_bins, density=False)
            data[key] = ((hist[1][:-1] + hist[1][1:]) / 2, hist[0])
        return data

    def add_row(self, epoch, timestamp, relative_iteration, epoch_size, key,
                data, dtype):
        assert epoch >= 0
        assert isinstance(data, dict), type(data)
        assert dtype in self.dtypes, dtype

        if dtype == "blob":
            rel = "null" if relative_iteration is None else relative_iteration
            data = self._store_blob("%s:%s" % (epoch, rel), key, data)
        elif dtype.startswith("weight/"):
            data = self._generate_hist(data)

        if self.epoch is None:
            self.epoch = epoch
        elif self.epoch != "error" and self.epoch != epoch:
            warnings.warn("inconsistent epoch (%s != %s)" % (epoch, self.epoch))
            self.epoch = "error"

        self.accumulator.append({
            "timestamp": timestamp, "relative_iteration": relative_iteration,
            "epoch_size": epoch_size, "key": key, "data": data, "dtype": dtype})

    def aggregate(self):
        aggregated = {}
        for row in self.accumulator:
            if row["relative_iteration"] is None:
                assert row["key"] not in aggregated
                aggregated[row["key"]] = row
            elif row["key"] not in aggregated:
                data = {x: [y] for x, y in row["data"].items()}
                aggregated[row["key"]] = {
                    "dtype": row["dtype"], "epoch_size": row["epoch_size"],
                    "data": data,
                    "relative_iteration": [row["relative_iteration"]],
                    "timestamp": [row["timestamp"]]}
            else:
                agg = aggregated[row["key"]]
                assert agg["dtype"] == row["dtype"]
                assert agg["epoch_size"] == row["epoch_size"]
                assert agg["data"].keys() == row["data"].keys()
                for key, value in row["data"].items():
                    agg["data"][key].append(value)
                agg["relative_iteration"].append(row["relative_iteration"])
                agg["timestamp"].append(row["timestamp"])

        for item in aggregated.values():
            if item["relative_iteration"] is None:
                continue
            if item["dtype"].startswith("scalar/"):
                for subkey, subitem in item["data"].items():
                    item["data"][subkey] = np.array(subitem)
            item["relative_iteration"] = np.array(item["relative_iteration"])
            item["timestamp"] = np.array(item["timestamp"])
        return aggregated


class ConstEventAccumulator(EpochEventAccumulator):
    """Epoch-independent constants (network graph blob etc.), deduplicated."""

    def __init__(self, dataroot, consts):
        super().__init__(dataroot=dataroot)
        self.consts = consts

    def add_const(self, key, data, dtype):
        assert dtype in self.dtypes, dtype
        if dtype == "blob":
            if key in self.consts:
                assert self.consts[key]["dtype"] == dtype
                return
            data = self._store_blob("const", key, data)
        elif dtype.startswith("weight/"):
            data = self._generate_hist(data)
        const = {"dtype": dtype, "data": data}
        if key in self.consts:
            return
        self.consts[key] = const


class DebugPrinter(EventStreamer):
    """Stderr progress lines with s/batch and min/epoch deltas."""

    def __init__(self, print_each=1, print_each_val=None,
                 key_suffix="learning/loss:total", dataroot=None):
        self.print_each = print_each
        self.print_each_val = print_each_val if print_each_val is not None else print_each
        self.key, _, self.subkey = key_suffix.partition(":")
        self.last_time = {}
        self.epoch_start = {}

    def add_row(self, epoch, timestamp, relative_iteration, epoch_size, key,
                data, dtype):
        import sys

        if not key.endswith(self.key) or relative_iteration is None:
            return
        is_val = key.startswith("val") or "/validation/" in key
        each = self.print_each_val if is_val else self.print_each
        if (relative_iteration + 1) % each and relative_iteration + 1 != epoch_size:
            return
        value = data.get(self.subkey) if isinstance(data, dict) else data
        start = self.epoch_start.setdefault((key, epoch), timestamp)
        elapsed = timestamp - start
        per_batch = elapsed / max(relative_iteration + 1, 1)
        sys.stderr.write(
            "\r%s epoch %s %d/%d %s: %s (%.3fs/batch, %.1f min/epoch)\n"
            % (key, epoch, relative_iteration + 1, epoch_size, self.subkey,
               ("%.4f" % value) if isinstance(value, (int, float)) else value,
               per_batch, per_batch * epoch_size / 60))


class Tensorboard(EventStreamer, EventSink):
    """tensorboardX-backed live + per-epoch summaries (gated import)."""

    def __init__(self, enabled=True, dataroot=None):
        self.writer = None
        if enabled and dataroot is not None:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(str(dataroot))
            except ImportError:
                warnings.warn("tensorboardX not available; Tensorboard disabled")

    def add_row(self, epoch, timestamp, relative_iteration, epoch_size, key,
                data, dtype):
        if self.writer is None or not dtype.startswith("scalar/"):
            return
        if relative_iteration is None:
            return
        step = epoch * epoch_size + relative_iteration
        for subkey, value in data.items():
            if isinstance(value, (int, float)):
                self.writer.add_scalar("%s/%s" % (key, subkey), value, step)

    def register_epoch_data(self, epoch, data, consts):
        if self.writer is None:
            return
        for key, item in data.items():
            if not item["dtype"].startswith("scalar/"):
                continue
            for subkey, values in item["data"].items():
                arr = np.asarray(values, dtype=np.float64)
                if arr.ndim == 0:
                    self.writer.add_scalar("epoch/%s/%s" % (key, subkey),
                                           float(arr), epoch)
                elif arr.size:
                    self.writer.add_scalar("epoch/%s/%s" % (key, subkey),
                                           float(np.nanmean(arr)), epoch)

    def load_epochs_data(self, epochs, consts):
        for i, data in enumerate(epochs):
            self.register_epoch_data(i, data, consts)
        return self


EVENTPROCESSORS = {
    "progress": DebugPrinter,
    "tensorboard": Tensorboard,
}


def _register_html_report():
    """HtmlReport pulls matplotlib; register lazily to keep imports light."""
    from .htmlreport import HtmlReport

    EVENTPROCESSORS["htmlreport"] = HtmlReport


class EventBroker:

    def __init__(self, processors, dataroot, consts, data):
        self.params = {"processors": processors, "dataroot": dataroot}
        self.data = data

        self.epoch_accumulator = EpochEventAccumulator(dataroot=dataroot)
        self.const_accumulator = ConstEventAccumulator(dataroot=dataroot,
                                                       consts=consts)
        self.metadata = MetadataKeeper(dataroot=dataroot).load_epochs_data(
            data, consts)
        self.streamers = []
        self.sinks = []
        if "htmlreport" in processors:
            _register_html_report()
        for processor in processors:
            proc_cls = EVENTPROCESSORS[processor]
            if isinstance(processors[processor], dict):
                proc = proc_cls(**processors[processor], dataroot=dataroot)
            else:
                proc = proc_cls(processors[processor], dataroot=dataroot)
            if isinstance(proc, EventStreamer):
                self.streamers.append(proc)
            if isinstance(proc, EventSink):
                self.sinks.append(proc.load_epochs_data(data, consts))
            if not isinstance(proc, (EventSink, EventStreamer)):
                raise ValueError("Unsupported processor type '%s'" % type(proc))

    @classmethod
    def initialize(cls, processors, dataroot):
        return cls(processors, dataroot, {}, [])

    def register_data(self, epoch, relative_iteration, epoch_size, key, data,
                      dtype):
        params = {"epoch": epoch, "timestamp": time.time(),
                  "relative_iteration": relative_iteration,
                  "epoch_size": epoch_size, "key": key, "data": data,
                  "dtype": dtype}
        for streamer in self.streamers:
            streamer.add_row(**params)
        if epoch is None:
            self.const_accumulator.add_const(key=key, data=data, dtype=dtype)
        else:
            self.epoch_accumulator.add_row(**params)

    def close_epoch(self):
        epoch = self.epoch_accumulator.epoch
        assert len(self.data) == epoch, "%s != %s" % (len(self.data), epoch)
        epoch_data = self.epoch_accumulator.aggregate()

        self.metadata.register_epoch_data(epoch, epoch_data,
                                          self.const_accumulator.consts)
        for sink in self.sinks:
            sink.register_epoch_data(epoch, epoch_data,
                                     self.const_accumulator.consts)
        self.data.append(epoch_data)
        self.epoch_accumulator = EpochEventAccumulator(
            dataroot=self.params["dataroot"])

    def state_dict(self):
        return {
            "name": self.__class__.__name__,
            "params": self.params,
            "consts": self.const_accumulator.consts,
            "data": self.data,
        }

    @classmethod
    def initialize_from_state(cls, state_dict, params):
        assert state_dict["name"] == cls.__name__
        if params is not None:
            assert params["processors"] == state_dict["params"]["processors"]
            state_dict["params"]["dataroot"] = params["dataroot"]
        return cls(**state_dict["params"], consts=state_dict["consts"],
                   data=state_dict["data"])


EVENTBROKERS = {
    "EventBroker": EventBroker,
}


def initialize_processor(params, dataroot, state=None):
    proc = EVENTBROKERS[params.pop("type", "EventBroker")]
    if state is None:
        return proc.initialize(processors=params, dataroot=dataroot)
    return proc.initialize_from_state(
        state, {"processors": params, "dataroot": dataroot})
