"""Inference data outputs: embedding matrices, RGB image saving, async writes.

Covers the roles of ``mdir/components/data/output.py`` (preprocess/add/
postprocess lifecycle, ``append`` resume mode, NaN descriptor rows for
missing images, write-behind ``async: true`` wrapping) with an independent
structure: descriptor rows are collected sparsely and materialized once at
``postprocess`` time, image-save targets are planned by free helper
functions, and the async wrapper drains a deque of futures.
"""
import abc
import collections
import concurrent.futures as futures
import os

import numpy as np

from ..tools.utils import path_join

THREAD_WORKERS = 6


class DataOutput(abc.ABC):
    @abc.abstractmethod
    def preprocess(self):
        """Open the output; returns the remaining data to process."""

    @abc.abstractmethod
    def add(self, index, input_data, output_data):
        """Add a single result."""

    @abc.abstractmethod
    def postprocess(self):
        """Finalize; returns output data tuple."""


def _flat_name(item):
    """Join an image tuple into one path-safe file name."""
    stems = [piece.rsplit(".", 1)[0] for piece in item[:-1]]
    return "::".join(stems + [item[-1]]).replace("/", "%")


def _plan_targets(items, image_dir, dir_structure):
    """Map each data item to its destination path."""
    if dir_structure == "flat":
        names = [_flat_name(item) for item in items]
    else:
        names = [item[0] for item in items]
    return names, [path_join(image_dir, name) for name in names]


class RgbImageSaver(DataOutput):
    """Save translated images (e.g. U-Net outputs) as RGB files."""

    def __init__(self, data, data_params, *, image_dir, dir_structure=None,
                 append=False, stretch_by=False):
        assert len(data) == 1
        self.items = [x if isinstance(x, (list, tuple)) else [x]
                      for x in data[0]]
        self.unnormalize = {key: data_params[key]
                            for key in ("mean_std", "transforms")}
        self.image_dir = image_dir
        self.dir_structure = dir_structure or (
            "flat" if len(self.items[0]) > 1 else "input")
        self.append, self.stretch_by = append, stretch_by
        self.fnames, self.paths = None, None

    def preprocess(self):
        self.fnames, paths = _plan_targets(self.items, self.image_dir,
                                           self.dir_structure)
        remaining = [item[0] for item in self.items]
        if self.append:
            todo = [i for i, path in enumerate(paths)
                    if not os.path.exists(path)]
            remaining = [remaining[i] for i in todo]
            paths = [paths[i] for i in todo]
        self.paths = paths
        return (remaining,)

    def add(self, index, input_data, output_data):
        from PIL import Image

        from ..tools import imgtools

        out = np.asarray(output_data[0])
        if out.dtype == np.uint8:
            # device-u8 egress (StreamingTranslator's guarded fast path):
            # the denormalize->uint8 conversion already ran on device,
            # bit-identical to get_image's plain branch
            img = out
        else:
            img = imgtools.get_image(
                (np.asarray(input_data[0]), out),
                self.unnormalize["mean_std"], self.unnormalize["transforms"],
                stretch_by=self.stretch_by)
        target = self.paths[index]
        os.makedirs(os.path.dirname(target), exist_ok=True)
        Image.fromarray(img).save(target)

    def postprocess(self):
        return (self.fnames,)


class AsyncOutput(DataOutput):
    """Write-behind thread pool with a bounded in-order buffer."""

    max_pending = THREAD_WORKERS * 2

    def __init__(self, output):
        self.output, self.pool = output, None
        self.pending = collections.deque()

    def preprocess(self):
        self.pool = futures.ThreadPoolExecutor(THREAD_WORKERS)
        return self.output.preprocess()

    def add(self, index, input_data, output_data):
        if input_data is not None:
            input_data = np.asarray(input_data)
        if output_data is not None:
            output_data = np.asarray(output_data)
        while len(self.pending) >= self.max_pending:
            self.pending.popleft().result()
        self.pending.append(
            self.pool.submit(self.output.add, index, input_data, output_data))

    def postprocess(self):
        while self.pending:
            self.pending.popleft().result()
        self.pool.shutdown(wait=True)
        return self.output.postprocess()


class EmbeddingOutput(DataOutput):
    """Accumulate a descriptor matrix; NaN rows mark missing images."""

    def __init__(self, data, _data_params, *, bbxs=False):
        if bbxs:
            self.images, self.bbxs = data
        else:
            assert len(data) == 1, len(data)
            self.images, self.bbxs = data[0], None
        self.rows = {}  # index -> descriptor; None marks a missing image

    def preprocess(self):
        return self.images, self.bbxs

    def add(self, index, input_data, output_data):
        missing = input_data is None and output_data is None
        self.rows[index] = None if missing else np.asarray(
            output_data).reshape(-1)

    def _materialize(self):
        dim = next((row.shape[0] for row in self.rows.values()
                    if row is not None), None)
        if dim is None:
            return []
        vecs = np.zeros((len(self.images), dim))
        for index, row in self.rows.items():
            vecs[index, :] = np.nan if row is None else row
        return vecs

    def postprocess(self):
        return self.images, self._materialize()


OUTPUT_LABELS = {"embedding": EmbeddingOutput, "rgb": RgbImageSaver}


def initialize_output(output, data_params, data):
    wrap_async = output.pop("async", False)
    built = OUTPUT_LABELS[output.pop("name")](data, data_params, **output)
    return AsyncOutput(built) if wrap_async else built
