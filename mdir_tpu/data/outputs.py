"""Inference data outputs: embedding matrices, RGB image saving, async writes.

Parity with ``mdir/components/data/output.py``: preprocess/add/postprocess
lifecycle, ``append`` mode skipping already-written images (resumable bulk
inference), NaN descriptor rows for missing images, and a bounded write-behind
thread pool (``async: true``).
"""
import abc
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


class RgbImageSaver(DataOutput):
    """Save translated images (e.g. U-Net outputs) as RGB files."""

    def __init__(self, data, data_params, *, image_dir, dir_structure=None,
                 append=False, stretch_by=False):
        assert len(data) == 1
        data = data[0]
        self.data = [x if isinstance(x, (list, tuple)) else [x] for x in data]
        self.dataset = {
            "mean_std": data_params["mean_std"],
            "transforms": data_params["transforms"],
        }
        self.image_dir = image_dir
        if dir_structure is None:
            dir_structure = "flat" if len(self.data[0]) > 1 else "input"
        self.dir_structure = dir_structure
        self.append = append
        self.stretch_by = stretch_by
        self.fnames = None
        self.paths = None

    def preprocess(self):
        if self.dir_structure == "flat":
            fnames = []
            for item in self.data:
                pieces = [x.rsplit(".", 1)[0] for x in item[:-1]] + [item[-1]]
                fnames.append("::".join(pieces).replace("/", "%"))
        else:
            fnames = [x[0] for x in self.data]

        paths = [path_join(self.image_dir, x) for x in fnames]
        data = [x[0] for x in self.data]
        if self.append:
            idxs = [i for i, p in enumerate(paths) if not os.path.exists(p)]
            data = [data[i] for i in idxs]
            paths = [paths[i] for i in idxs]

        self.fnames = fnames
        self.paths = paths
        return (data,)

    def add(self, index, input_data, output_data):
        from PIL import Image

        from ..tools import imgtools

        img = imgtools.get_image(
            (np.asarray(input_data[0]), np.asarray(output_data[0])),
            self.dataset["mean_std"], self.dataset["transforms"],
            stretch_by=self.stretch_by)
        os.makedirs(os.path.dirname(self.paths[index]), exist_ok=True)
        Image.fromarray(img).save(self.paths[index])

    def postprocess(self):
        return (self.fnames,)


class AsyncOutput(DataOutput):
    """Write-behind thread pool with a bounded in-order buffer."""

    def __init__(self, output):
        self.output = output
        self.pool = None
        self.buf = None

    def preprocess(self):
        self.pool = futures.ThreadPoolExecutor(max_workers=THREAD_WORKERS)
        self.buf = []
        return self.output.preprocess()

    def add(self, index, input_data, output_data):
        input_data = np.asarray(input_data) if input_data is not None else None
        output_data = np.asarray(output_data) if output_data is not None else None
        result = self.pool.submit(self.output.add, index, input_data, output_data)
        if len(self.buf) >= THREAD_WORKERS * 2:
            self.buf.pop(0).result()
        self.buf.append(result)

    def postprocess(self):
        for item in self.buf:
            item.result()
        self.pool.shutdown(wait=True)
        return self.output.postprocess()


class EmbeddingOutput(DataOutput):
    """Accumulate a descriptor matrix; NaN rows mark missing images."""

    def __init__(self, data, _data_params, *, bbxs=False):
        if not bbxs:
            assert len(data) == 1, len(data)
        self.images, self.bbxs = data if bbxs else (data[0], None)
        self.vecs = None

    def preprocess(self):
        return self.images, self.bbxs

    def add(self, index, input_data, output_data):
        if input_data is None and output_data is None:
            if self.vecs is not None:
                self.vecs[index, :] = np.nan
            else:
                self._pending_nan = getattr(self, "_pending_nan", []) + [index]
            return
        vec = np.asarray(output_data).reshape(-1)
        if self.vecs is None:
            self.vecs = np.zeros((len(self.images), vec.shape[0]))
            for i in getattr(self, "_pending_nan", []):
                self.vecs[i, :] = np.nan
        self.vecs[index, :] = vec

    def postprocess(self):
        return self.images, self.vecs if self.vecs is not None else []


OUTPUT_LABELS = {
    "embedding": EmbeddingOutput,
    "rgb": RgbImageSaver,
}


def initialize_output(output, data_params, data):
    async_param = output.pop("async", False)
    out = OUTPUT_LABELS[output.pop("name")](data, data_params, **output)
    if async_param:
        out = AsyncOutput(out)
    return out
