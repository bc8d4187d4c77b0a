"""Uniform file readers: tsv/csv (+gz/xz), pkl, h5, lst.

Capability parity with the reference's reader layer
(``daan/data/file_readers.py``): context-managed readers selected by suffix,
column selection via ``keys``, slice/partitions/limit row selection, json
cell decoding, and retry-with-cubic-backoff on open.

Usage::

    with initialize_file_reader(path, keys=["identifier"]) as reader:
        data = reader.get()   # OrderedDict of columns
"""
import gzip
import json
import lzma
import pickle
import re
import time
from collections import OrderedDict

import numpy as np


class Selector:
    def __init__(self, *, slice=0, partitions=1, limit=None, keys=None):
        assert slice < partitions
        self.slice = slice
        self.partitions = partitions
        self.limit = limit
        self.keys = keys

    @property
    def slicing(self):
        return slice(self.slice, self.limit, self.partitions)


def _decode_cell(value):
    """Decode json-looking cells into collections; empty string -> None."""
    if isinstance(value, str) and not value:
        return None
    if isinstance(value, str) and value[0] in "[{" and value[-1] in "]}":
        try:
            return json.loads(value)
        except json.JSONDecodeError:
            return value
    return value


class BaseReader:
    RETRIES = 3

    def __init__(self, path, selector):
        self.path = path
        self.selector = selector
        self.handle = None

    def open(self):
        for attempt in range(self.RETRIES + 1):
            try:
                return self._open()
            except (FileNotFoundError, OSError, EOFError):
                if attempt == self.RETRIES:
                    raise ValueError(
                        "Error with path '%s' (try %s)" % (self.path, attempt + 1))
                time.sleep((attempt + 1) ** 3)

    def _open(self):
        if self.path.endswith(".xz"):
            self.handle = lzma.open(self.path, "rb")
        elif self.path.endswith(".gz"):
            self.handle = gzip.open(self.path, "rb")
        else:
            self.handle = open(self.path, "rb")

    def close(self):
        if self.handle is not None:
            self.handle.close()

    def __enter__(self):
        self.open()
        return self

    def __exit__(self, *exc):
        self.close()

    def _iter_selected_lines(self, handle):
        index = 0
        for line in handle:
            if index % self.selector.partitions == self.selector.slice:
                yield line.decode("utf8").rstrip("\n")
            index += 1
            if self.selector.limit and index >= self.selector.limit:
                break


class TsvReader(BaseReader):
    SUFFIXES = (".tsv", ".tsv.gz", ".tsv.xz", ".csv", ".csv.gz", ".csv.xz")

    def __init__(self, path, selector):
        super().__init__(path, selector)
        assert path.endswith(self.SUFFIXES), path
        self.separator = "\t" if "tsv" in path.rsplit(".", 2) else ","
        self.header = None

    def open(self):
        super().open()
        self.header = next(self.handle).decode("utf8").strip().split(self.separator)

    def get(self):
        cols = self.selector.keys or self.header
        indexes = [self.header.index(c) for c in cols]
        acc = [[] for _ in indexes]
        for line in self._iter_selected_lines(self.handle):
            cells = line.split(self.separator)
            for i, j in enumerate(indexes):
                acc[i].append(_decode_cell(cells[j]))
        return OrderedDict(zip(cols, acc))


class PklReader(BaseReader):
    def get(self):
        data = pickle.load(self.handle)
        keys = self.selector.keys or data.keys()
        return OrderedDict((k, data[k][self.selector.slicing]) for k in keys)


class Hdf5Reader(BaseReader):
    def _open(self):
        import h5py

        self.handle = h5py.File(self.path, "r")

    def _column(self, key):
        data = self.handle[key][self.selector.slicing]
        if data.dtype == object:
            return [x.decode("utf8") if isinstance(x, bytes) else x
                    for x in data.tolist()]
        return data

    def get(self):
        keys = self.selector.keys
        if keys is None:
            keys = list(self.handle.attrs["header"])
        return OrderedDict((k, self._column(k)) for k in keys)


class LstReader(BaseReader):
    """Plain list files; ``path/to/[a|b].lst`` expands to one column each."""

    def __init__(self, path, selector):
        super().__init__(path, selector)
        hit = re.search(r"\[([a-zA-Z0-9_|]+)\]", path)
        if not hit:
            self.paths = OrderedDict([("item", path)])
        else:
            names = hit.group(1)
            self.paths = OrderedDict(
                (x, path.replace("[%s]" % names, x)) for x in names.split("|"))

    def _open(self):
        self.handle = {k: open(v, "rb") for k, v in self.paths.items()}

    def close(self):
        if self.handle:
            for h in self.handle.values():
                h.close()

    def _column(self, key):
        return [_decode_cell(line)
                for line in self._iter_selected_lines(self.handle[key])]

    def get(self):
        keys = self.selector.keys or list(self.paths.keys())
        return OrderedDict((k, self._column(k)) for k in keys)


READERS = {
    "tsv": TsvReader,
    "csv": TsvReader,
    "pkl": PklReader,
    "h5": Hdf5Reader,
    "lst": LstReader,
}


def initialize_file_reader(path, **kwargs):
    """Pick a reader by suffix; kwargs become the selector."""
    base, suffix = path.rsplit(".", 1)
    if suffix in ("gz", "xz"):
        suffix = base.rsplit(".", 1)[1]
    if suffix not in READERS:
        raise ValueError("Suffix '%s' is not supported ('%s')" % (suffix, path))
    return READERS[suffix](path, Selector(**kwargs))
