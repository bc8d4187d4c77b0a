"""Typed event pipeline: streamers (live) + per-epoch sinks.

Same observable contract as ``mdir/tools/eventprocessor.py`` (event dtypes
``scalar/loss|score|time``, ``weight/param|grad``, ``blob``; metadata keys
``<key>:<subkey>_avg.4`` / ``_sum.1``; aggregate schema; blob file naming;
checkpointable history) but an independent structure: metric curves are
``_Series`` objects that own their reduction and best-epoch logic, blob file
IO lives in a ``BlobVault``, and per-epoch aggregation is a columnar
(zip-over-rows) pass in ``EpochLog`` rather than incremental accumulation.
"""
import abc
import pickle
import time
import warnings
from pathlib import Path

import numpy as np

SCALAR_DTYPES = {"scalar/loss", "scalar/score", "scalar/time"}
WEIGHT_DTYPES = {"weight/param", "weight/grad"}
EVENT_DTYPES = SCALAR_DTYPES | WEIGHT_DTYPES | {"blob"}
HISTOGRAM_BINS = 200


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


def _histogram(values):
    """Bucket raw weight values into (bin centers, counts)."""
    counts, edges = np.histogram(np.asarray(values), bins=HISTOGRAM_BINS,
                                 density=False)
    return (edges[:-1] + edges[1:]) / 2, counts


class _Series:
    """One metric curve: the per-epoch reduced values of a key:subkey pair."""

    def __init__(self, label, dtype, mode):
        self.label = label  # public name incl. the aggregation suffix
        self.dtype = dtype
        self.mode = mode  # "avg" | "sum" | None (store raw)
        self.epochs = []
        self.values = []
        self.density = []

    def record(self, epoch, raw, density):
        if self.mode is None:
            value, density = np.array(raw), None
        else:
            arr = np.asarray(raw, dtype=np.float64)
            arr = arr[~np.isnan(arr)]
            value = float(arr.mean() if self.mode == "avg" else arr.sum())
        self.epochs.append(epoch)
        self.values.append(value)
        self.density.append(density)

    @property
    def higher_is_better(self):
        return self.dtype == "scalar/score"

    def best_position(self):
        pick = np.argmax if self.higher_is_better else np.argmin
        return int(pick(self.values))

    def last_is_best(self):
        edge = max(self.values) if self.higher_is_better else min(self.values)
        return edge == self.values[-1]


class MetadataKeeper(EventSink):
    """Registry of metric curves with best-epoch and coverage reporting."""

    aggregations = {"avg": "_avg.4", "sum": "_sum.1", None: ""}

    def __init__(self, dataroot=None):
        self.epochs = []
        self._series = {}  # (key, subkey) -> _Series
        self._subkeys = {}  # key -> expected subkey set

    def load_epochs_data(self, epochs, consts):
        assert not self._series
        for i, data in enumerate(epochs):
            self.register_epoch_data(i, data, consts)
        return self

    def _discover(self, key, item):
        if key in self._subkeys:
            assert self._subkeys[key] == item["data"].keys()
            return
        self._subkeys[key] = item["data"].keys()
        if not item["dtype"].startswith("scalar/"):
            return
        for subkey, sample in item["data"].items():
            if isinstance(sample, (list, np.ndarray)):
                mode = "avg" if item["dtype"] != "scalar/time" else "sum"
            else:
                mode = None
            label = key + ":" + subkey + self.aggregations[mode]
            self._series[key, subkey] = _Series(label, item["dtype"], mode)

    def register_epoch_data(self, epoch, data, consts):
        assert epoch >= 0
        self.epochs.append(epoch)
        for key, item in data.items():
            self._discover(key, item)
        for (key, subkey), series in self._series.items():
            if key not in data:
                continue
            row = data[key]
            density = None
            if row["relative_iteration"] is not None:
                density = len(row["relative_iteration"]) / row["epoch_size"]
            series.record(epoch, row["data"][subkey], density)

    def _lookup(self, key):
        if isinstance(key, str):
            key = tuple(key.split(":"))
        assert isinstance(key, tuple), key
        return key, self._series.get(key)

    def metric(self, data_key, item_key):
        return self._series[data_key, item_key].values

    def metadata(self):
        return {s.label: s.values for s in self._series.values()
                if s.dtype in {"scalar/loss", "scalar/score"}}

    def is_last_best(self, key):
        key, series = self._lookup(key)
        if key == ("epoch",):
            return True
        if series is None or series.epochs[-1] != self.epochs[-1]:
            return False
        return series.last_is_best()

    def best_epoch(self, key):
        key, series = self._lookup(key)
        if key == ("epoch",):
            return {"index": self.epochs[-1], "metric_avg.3": self.epochs[-1],
                    "key": "epoch"}
        if series is None:
            return None
        pos = series.best_position()
        return {"index": series.epochs[pos], "metric_avg.3": series.values[pos],
                "key": series.label}

    def errors(self):
        report = []
        if self.epochs != list(range(len(self.epochs))):
            report.append({"message": "Non-standard epoch sequence used",
                           "data": self.epochs})
        partial = {}
        for series in self._series.values():
            for epoch, density in zip(series.epochs, series.density):
                if density is not None and density != 1:
                    partial["%s@epoch_%s" % (series.label, epoch)] = density
        if partial:
            report.append({"message":
                           "Some keys have incomplete iteration coverage",
                           "data": partial})
        gaps = {s.label: s.epochs for s in self._series.values()
                if s.epochs != self.epochs}
        if gaps:
            report.append({"message": "Some keys have incomplete epoch coverage",
                           "data": gaps})
        return report


class BlobVault:
    """File storage for blob payloads under ``<dataroot>/blobs``.

    ``store`` mutates each ``{subkey: {"dtype", "data"}}`` entry in place,
    replacing ``data`` with the written ``path`` (or ``None`` when no
    dataroot is configured).
    """

    folder_name = "blobs"
    suffixes = {"image:rgb": "png", "image:rgba": "png", "image:gray": "png",
                "response": "tiff", "vector": "pkl"}

    def __init__(self, dataroot):
        self.root = Path(dataroot) / self.folder_name if dataroot else None
        self._ready = False

    def store(self, key, payload, tag):
        if self.root is None:
            for entry in payload.values():
                entry.pop("data", None)
                entry["path"] = None
            return payload
        if not self._ready:
            self.root.mkdir(parents=True, exist_ok=True)
            self._ready = True
        for subkey, entry in payload.items():
            suffix = self.suffixes[entry["dtype"]]
            fname = "%s:%s:%s.%s" % (key.replace("/", "_"),
                                     subkey.replace("/", "_"), tag, suffix)
            path = self.root / fname
            self._encode(entry.pop("data"), path, suffix)
            entry["path"] = str(path)
        return payload

    @staticmethod
    def _encode(blob, path, suffix):
        blob = np.asarray(blob)
        if blob.ndim == 3 and blob.shape[-1] == 1:
            blob = blob[..., 0]
        if suffix == "pkl":
            with path.open("wb") as handle:
                pickle.dump(blob, handle)
            return
        from PIL import Image

        if suffix == "png":
            if blob.dtype in (np.float32, np.float64):
                blob = blob * 255
            if blob.dtype != np.uint8:
                blob = np.clip(blob, 0, 255).astype(np.uint8)
            assert blob.ndim in {2, 3}, blob.shape
            Image.fromarray(blob).save(str(path), format="PNG")
        else:
            assert blob.ndim == 2, blob.shape
            Image.fromarray(blob).save(str(path), format="TIFF")


class EpochLog(EventStreamer):
    """Collect one epoch of rows; ``aggregate`` merges them columnarly."""

    def __init__(self, vault):
        self.vault = vault
        self.epoch = None
        self.rows = []

    def add_row(self, epoch, timestamp, relative_iteration, epoch_size, key,
                data, dtype):
        assert epoch >= 0
        assert isinstance(data, dict), type(data)
        assert dtype in EVENT_DTYPES, dtype

        if dtype == "blob":
            tag = "%s:%s" % (epoch, "null" if relative_iteration is None
                             else relative_iteration)
            data = self.vault.store(key, data, tag)
        elif dtype in WEIGHT_DTYPES:
            data = {subkey: _histogram(values)
                    for subkey, values in data.items()}

        if self.epoch is None:
            self.epoch = epoch
        elif self.epoch != "error" and self.epoch != epoch:
            warnings.warn("inconsistent epoch (%s != %s)" % (epoch, self.epoch))
            self.epoch = "error"

        self.rows.append({
            "timestamp": timestamp, "relative_iteration": relative_iteration,
            "epoch_size": epoch_size, "key": key, "data": data, "dtype": dtype})

    def aggregate(self):
        singles, streams = {}, {}
        for row in self.rows:
            if row["relative_iteration"] is None:
                assert row["key"] not in singles
                singles[row["key"]] = row
            else:
                streams.setdefault(row["key"], []).append(row)

        merged = {}
        for key, rows in streams.items():
            head = rows[0]
            subkeys = head["data"].keys()
            for row in rows[1:]:
                assert row["dtype"] == head["dtype"]
                assert row["epoch_size"] == head["epoch_size"]
                assert row["data"].keys() == subkeys
            scalar = head["dtype"].startswith("scalar/")
            columns = {}
            for subkey in subkeys:
                column = [row["data"][subkey] for row in rows]
                columns[subkey] = np.array(column) if scalar else column
            merged[key] = {
                "dtype": head["dtype"],
                "epoch_size": head["epoch_size"],
                "data": columns,
                "relative_iteration":
                    np.array([row["relative_iteration"] for row in rows]),
                "timestamp": np.array([row["timestamp"] for row in rows]),
            }

        overlap = singles.keys() & merged.keys()
        assert not overlap, overlap
        merged.update(singles)
        return merged


class ConstLog:
    """Epoch-independent constants (network graph blob etc.), deduplicated."""

    def __init__(self, vault, consts):
        self.vault = vault
        self.consts = consts

    def add_const(self, key, data, dtype):
        assert dtype in EVENT_DTYPES, dtype
        if key in self.consts:
            assert self.consts[key]["dtype"] == dtype
            # a repeated non-blob const must carry the SAME value (the
            # reference asserts equality): silently keeping the stale one
            # would mask e.g. a changed network graph after a config edit
            if dtype not in WEIGHT_DTYPES and dtype != "blob":
                assert self.consts[key]["data"] == data, key
            return
        if dtype == "blob":
            data = self.vault.store(key, data, "const")
        elif dtype in WEIGHT_DTYPES:
            data = {subkey: _histogram(values)
                    for subkey, values in data.items()}
        self.consts[key] = {"dtype": dtype, "data": data}


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
        if not each:
            return  # print_each 0 disables printing (reference :337)
        # timing accumulates over EVERY matching row (like the reference's
        # per-stage n counter): dividing elapsed-since-first-PRINT by the
        # total iteration count understated s/batch by the print_each
        # factor (and printed 0.000 on the first row)
        track = self.epoch_start.setdefault(
            (key, epoch), {"start": timestamp, "n": 0})
        track["n"] += 1
        if (relative_iteration + 1) % each and relative_iteration + 1 != epoch_size:
            return
        value = data.get(self.subkey) if isinstance(data, dict) else data
        per_batch = (timestamp - track["start"]) / max(track["n"] - 1, 1)
        sys.stderr.write(
            "\r%s epoch %s %d/%d %s: %s (%.3fs/batch, %.1f min/epoch)\n"
            % (key, epoch, relative_iteration + 1, epoch_size, self.subkey,
               ("%.4f" % value) if isinstance(value, (int, float)) else value,
               per_batch, per_batch * epoch_size / 60))


class Tensorboard(EventStreamer, EventSink):
    """tensorboardX-backed live + per-epoch summaries (gated import)."""

    def __init__(self, enabled=True, dataroot=None):
        self.writer = None
        self._steps = {}
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
        # per-key absolute counter (like the reference): epoch*epoch_size
        # + iteration overlaps across epochs when the loader length changes
        # between epochs (tuple re-mining shrinks/grows it)
        step = self._steps[key] = self._steps.get(key, -1) + 1
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

        vault = BlobVault(dataroot)
        self.epoch_log = EpochLog(vault)
        self.const_log = ConstLog(vault, consts)
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
            self.const_log.add_const(key=key, data=data, dtype=dtype)
        else:
            self.epoch_log.add_row(**params)

    def close_epoch(self):
        epoch = self.epoch_log.epoch
        assert len(self.data) == epoch, "%s != %s" % (len(self.data), epoch)
        epoch_data = self.epoch_log.aggregate()

        self.metadata.register_epoch_data(epoch, epoch_data,
                                          self.const_log.consts)
        for sink in self.sinks:
            sink.register_epoch_data(epoch, epoch_data, self.const_log.consts)
        self.data.append(epoch_data)
        self.epoch_log = EpochLog(self.epoch_log.vault)

    def state_dict(self):
        return {
            "name": self.__class__.__name__,
            "params": self.params,
            "consts": self.const_log.consts,
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
