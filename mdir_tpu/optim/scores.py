"""Retrieval evaluation scores.

``CirDatasetAp`` — parity with ``mdir/components/optim/score/cirscore.py``:
configures from the official gnd pkl (roxford5k/rparis6k/247tokyo1k/...) or
tsv db/query files, extracts database and query descriptors through the
network (the TPU-batched path), ranks with one on-device matmul, and scores
with the junk-aware mAP protocol. Logs per-query AP and averages through the
event logger like the reference.
"""
import os

import numpy as np

from ..data.readers import initialize_file_reader
from ..data.testdata import configdataset
from ..data.transforms import initialize_transforms
from ..ops.ranking import compute_map_and_print, rank_database
from ..parallel.extract import extract_vectors_network
from ..tools.stats import StopWatch
from ..tools.utils import get_data_root, path_join


class CirDatasetAp:

    def __init__(self, params):
        self.image_size = params.pop("image_size")
        self.dataset = params.pop("dataset")
        self.transforms = initialize_transforms(params.pop("transforms"),
                                                params.pop("mean_std"))
        # multi-chip eval (yaml: ``criterion: {parallel: {data: N}}``, the
        # validate-side mirror of training's epoch_iteration.parallel):
        # extraction batch-shards each chunk across an N-device mesh and
        # ranking shards the database matrix (SURVEY §2.12)
        self.parallel = params.pop("parallel", None)
        if self.parallel is not None:
            assert set(self.parallel) == {"data"}, self.parallel

        if isinstance(self.dataset, dict):
            # tsv dataset files
            assert self.dataset.keys() == {"name", "queries", "db", "imgdir"}
            imgdir = self.dataset["imgdir"]
            with initialize_file_reader(self.dataset["db"],
                                        keys=["identifier"]) as reader:
                data = reader.get()
                self.images = [path_join(imgdir, x) for x in data["identifier"]]
                mapping = {x: i for i, x in enumerate(data["identifier"])}
            with initialize_file_reader(
                    self.dataset["queries"],
                    keys=["query", "bbx", "ok", "junk"]) as reader:
                data = reader.get()
                self.qimages = [path_join(imgdir, x) for x in data["query"]]
                self.bbxs = [tuple(x) if x else None for x in data["bbx"]]
                self.gnd = [{"ok": [mapping[x] for x in ok],
                             "junk": [mapping[x] for x in junk]}
                            for ok, junk in zip(data["ok"], data["junk"])]
            self.dataset = self.dataset["name"]
        else:
            # official cirtorch gnd files
            cfg = configdataset(self.dataset, os.path.join(get_data_root(), "test"))
            self.images = [cfg["im_fname"](cfg, i) for i in range(cfg["n"])]
            self.qimages = [cfg["qim_fname"](cfg, i) for i in range(cfg["nq"])]
            self.bbxs = [tuple(cfg["gnd"][i]["bbx"]) if cfg["gnd"][i]["bbx"]
                         else None for i in range(cfg["nq"])]
            self.gnd = cfg["gnd"]

        assert not params, params.keys()
        # validation re-extracts the SAME db/query images every epoch — the
        # ideal device-cache population (MDIR_TPU_DEVICE_CACHE_MB; each
        # consumer owns an independent budget). First validation fills it
        # over the wire; later epochs hit HBM (bit-identical, pinned)
        from ..parallel.device_cache import DeviceImageCache

        self._device_cache = DeviceImageCache.from_env()

    def __call__(self, network, device=None, logger=None):
        stopwatch = StopWatch()

        mesh = None
        if self.parallel is not None:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(self.parallel["data"])

        print(">> {}: database images...".format(self.dataset))
        vecs = extract_vectors_network(network, self.images, self.image_size,
                                       self.transforms, mesh=mesh,
                                       cache=self._device_cache)
        print(">> {}: query images...".format(self.dataset))
        if self.images == self.qimages and set(self.bbxs) == {None}:
            # alias, don't copy: the db matrix can be ~GB on the 1-core
            # host and neither side is mutated downstream
            qvecs = np.asarray(vecs)
        else:
            qvecs = extract_vectors_network(network, self.qimages,
                                            self.image_size, self.transforms,
                                            bbxs=self.bbxs, mesh=mesh,
                                            cache=self._device_cache)
        stopwatch.lap("extract_descriptors")

        print(">> {}: Evaluating...".format(self.dataset))
        if mesh is not None:
            from ..ops.ranking import rank_database_sharded

            ranks = np.asarray(rank_database_sharded(
                np.asarray(vecs, np.float32), np.asarray(qvecs, np.float32),
                mesh))
        else:
            ranks = np.asarray(rank_database(
                np.asarray(vecs, np.float32), np.asarray(qvecs, np.float32)))
        averages, scores = compute_map_and_print(self.dataset, ranks, self.gnd)
        stopwatch.lap("compute_score")

        if logger is not None:
            first_score = scores[list(scores.keys())[0]]
            logger(None, len(first_score), "dataset", stopwatch.reset(),
                   "scalar/time")
            logger(None, len(first_score), "score_avg", averages, "scalar/score")
            assert len({len(x) for x in scores.values()}) == 1
            for i, _ in enumerate(first_score):
                logger(i, len(first_score), "score",
                       {x: scores[x][i] for x in scores}, "scalar/score")
        return averages


SCORES = {
    "cirdatasetap": CirDatasetAp,
}


def initialize_score(params):
    params = dict(params)
    return SCORES[params.pop("type")](params)
