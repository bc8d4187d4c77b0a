"""Datasets: image lists, image tuples, and the hard-negative-mining tuples.

Capability parity with ``cirtorch/datasets`` + ``mdir/components/data/dataset``:
ImagesFromList (bbx crop + max-side thumbnail resize + transform, with the
``{}`` missing-image sentinel), RandomImageTupleDataset /
PregeneratedImageTupleDataset (day/night pairs from file readers), and
TuplesDataset — per-epoch hard-negative re-mining where descriptor extraction
runs through the network's *batched* TPU path and ranking is one on-device
matmul + sort (reference loops images at batch_size=1;
``traindataset.py:178-271``).
"""
import os
import pickle
import sys
import random as pyrandom

import numpy as np

from ..tools.utils import get_data_root, path_join, validate_hash
from .loaders import DataLoader, collate_tuples
from .readers import initialize_file_reader


def pil_loader(path):
    """PIL load tolerant to truncated files; returns the exception on failure."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    try:
        with open(path, "rb") as f:
            img = Image.open(f)
            return img.convert("RGB")
    except OSError as exc:
        return exc


def imresize(img, imsize):
    """Max-side thumbnail resize (antialiased), reference datahelpers.py:48."""
    from PIL import Image

    img.thumbnail((imsize, imsize), Image.LANCZOS)
    return img


def cid2filename(cid, prefix):
    """3-level hashed directory layout of retrieval-SfM images."""
    if cid[0] == "/":
        return cid
    return os.path.join(prefix, cid[-2:], cid[-4:-2], cid[-6:-4], cid)


class ImagesFromList:
    """Image list -> loaded/cropped/resized/transformed images."""

    def __init__(self, root, images, imsize=None, bbxs=None, transform=None,
                 loader=pil_loader, ignore_errors=False):
        if len(images) == 0:
            raise RuntimeError("Dataset contains 0 images!")
        self.root = root
        self.images = images
        self.images_fn = [os.path.join(root, im) for im in images]
        self.imsize = imsize
        self.bbxs = bbxs
        self.transform = transform
        self.loader = loader
        self.ignore_errors = ignore_errors
        self.loader_params = {}

    def __len__(self):
        return len(self.images_fn)

    def __getitem__(self, index):
        path = self.images_fn[index]
        img = self.loader(path)
        if isinstance(img, Exception):
            sys.stderr.write("Warning: Image '%s' was not found\n" % path)
            if self.ignore_errors:
                return {}
            raise img
        if self.bbxs is not None and self.bbxs[index]:
            img = img.crop(self.bbxs[index])
        if self.imsize is not None:
            img = imresize(img, self.imsize)
        if self.transform is not None:
            img = self.transform(img)
        return img


class ImagesFromArrays:
    """Dataset over in-memory arrays (cirtorch ImagesFromDataList parity)."""

    loader_params = {}

    def __init__(self, images, transform=None):
        if len(images) == 0:
            raise RuntimeError("Dataset contains 0 images!")
        self.images = images
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        img = self.images[index]
        if self.transform is not None:
            img = self.transform(img)
        return img


def imread_rgb(path):
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    with open(path, "rb") as f:
        return Image.open(f).convert("RGB")


class RandomImageTupleDataset:
    """Image tuples (e.g. day/night pairs) with per-epoch random picks.

    ``idx`` spec per reference ``tuple_datasets.py:22-53``: underscore-joined
    items, each 'any' | 'different' | int.
    """

    loader_params = {}

    def __init__(self, data, transform, dataset, data_key, image_dir, idx):
        assert not data
        with initialize_file_reader(dataset, keys=[data_key]) as reader:
            image_list = reader.get()[data_key]
        self.image_list = [[path_join(image_dir, y) for y in x] for x in image_list]
        self.transform = transform
        if isinstance(idx, str):
            idx = [x if x in {"any", "different"} else int(x)
                   for x in idx.split("_")]
        self.idx = idx
        self.epoch_images = None

    @staticmethod
    def get_idx(idx, length, previous_idxs, rand):
        if idx == "any":
            return rand(length)
        if idx == "different":
            idxs = [x for x in range(length) if x not in previous_idxs]
            return idxs[rand(len(idxs))]
        if isinstance(idx, (list, tuple)):
            return rand(idx[0] or 0, idx[1] or length)
        if idx < 0:
            idx = length + idx
        assert 0 <= idx < length
        return idx

    def _generate_epoch_images(self, rand):
        self.epoch_images = []
        for possible in self.image_list:
            idxs = []
            for i in self.idx:
                idxs.append(self.get_idx(i, len(possible), idxs, rand))
            self.epoch_images.append([possible[i] for i in idxs])

    def prepare_epoch(self, network, device=None):
        self._generate_epoch_images(np.random.randint)
        return None

    def __len__(self):
        return len(self.image_list)

    def __getitem__(self, idx):
        images = [imread_rgb(x) for x in self.epoch_images[idx]]
        if self.transform:
            images = self.transform(*images)
        return images


class PregeneratedImageTupleDataset(RandomImageTupleDataset):
    """Tuples fixed at init with seed 0 — deterministic across resume."""

    def __init__(self, data, transform, dataset, data_key, image_dir, idx):
        super().__init__(data, transform, dataset, data_key, image_dir, idx)
        self._generate_epoch_images(pyrandom.Random(0).randrange)

    def prepare_epoch(self, network, device=None):
        return None


class TuplesDataset:
    """(q, p, n1..nN) training tuples over retrieval-SfM-120k with per-epoch
    hard-negative re-mining against the current network."""

    item_transform = None  # optional __getitem__-only transform override

    def __init__(self, name, mode, imsize=None, nnum=5, qsize=2000,
                 poolsize=20000, transform=None, loader=pil_loader,
                 dataset_pkl=None, ims_root=None):
        if mode not in ("train", "val"):
            raise RuntimeError("MODE should be either train or val, passed as string")
        if not name.startswith("retrieval-SfM"):
            raise RuntimeError("Unknown dataset name!")

        data_root = get_data_root()
        db_root = os.path.join(data_root, "train", name)
        ims_root = ims_root or os.path.join(db_root, "ims")
        db_fn = dataset_pkl or os.path.join(db_root, "%s.pkl" % name)

        if str(db_fn).startswith(("http://", "https://")):
            from urllib.request import urlopen

            with urlopen(db_fn) as handle:
                content = handle.read()
        else:
            with open(db_fn, "rb") as handle:
                content = handle.read()
        validate_hash(content, str(db_fn))
        db = pickle.loads(content)[mode]

        self.images = [cid2filename(cid, ims_root) for cid in db["cids"]]
        self.name = name
        self.mode = mode
        self.imsize = imsize
        self.clusters = db["cluster"]
        self.qpool = db["qidxs"]
        self.ppool = db["pidxs"]

        self.nnum = nnum
        self.qsize = min(qsize, len(self.qpool))
        self.poolsize = min(poolsize, len(self.images))
        self.qidxs = None
        self.pidxs = None
        self.nidxs = None

        self.transform = transform
        self.loader = loader
        self.loader_params = {"drop_last": True, "collate_fn": collate_tuples}
        # device-resident uint8 cache across epochs: the qpool/ppool are
        # fixed and negatives resample from a fixed superset, so mining
        # re-ships the same pixels every epoch over a 20-60 MB/s link
        # (MDIR_TPU_DEVICE_CACHE_MB sizes it; unset/0 disables)
        from ..parallel.device_cache import DeviceImageCache

        self.device_cache = DeviceImageCache.from_env()

    def __len__(self):
        return self.qsize

    def __getitem__(self, index):
        if self.qidxs is None:
            raise RuntimeError(
                "Run dataset.prepare_epoch(network) to create the epoch subset")
        # mining->train handoff: with the device cache on and the host
        # chain lowered to device (item_transform = raw uint8 mode, no host
        # randomness), a tuple image mining just shipped is referenced by
        # key instead of decoded — assemble_train_batch stacks it from HBM
        # (same "path@size" keys as _feed_uint8, same imresize both sides)
        use_cache = self.device_cache is not None \
            and self.item_transform is not None

        def load(idx):
            if use_cache:
                from ..parallel.device_cache import CachedImageRef

                key = "%s@%s" % (self.images[idx], self.imsize)
                got = self.device_cache.get(key)
                if got is not None:
                    return CachedImageRef(key, got[1])
            return self.loader(self.images[idx])

        output = [load(self.qidxs[index]), load(self.pidxs[index])]
        output += [load(n) for n in self.nidxs[index]]

        def prepare(img):
            if not hasattr(img, "thumbnail"):  # CachedImageRef passthrough
                return img
            if self.imsize is not None:
                img = imresize(img, self.imsize)
            # item_transform overrides the host chain for training items
            # only (the device-preprocess path ships raw uint8; mining
            # extraction keeps self.transform so chain detection sees the
            # real chain)
            transform = self.item_transform or self.transform
            return transform(img) if transform is not None else img

        output = [prepare(img) for img in output]
        target = np.array([-1, 1] + [0] * len(self.nidxs[index]), np.float32)
        return output, target

    def prepare_epoch(self, network, device=None):
        return self.create_epoch_tuples(network, device)

    def create_epoch_tuples(self, network, device=None):
        """Re-mine hard negatives with the current network.

        TPU-native path: descriptors for the qsize queries and the poolsize
        negative pool are extracted with the network's batched extractor
        (shape-bucketed, large matmuls on the MXU), ranking is one on-device
        matmul + argsort; the <=1-per-3D-cluster greedy walk stays on host.
        """
        print(">> Creating tuples for an epoch of %s-%s..." % (self.name, self.mode))
        idxs2qpool = np.random.permutation(len(self.qpool))[:self.qsize]
        self.qidxs = [self.qpool[i] for i in idxs2qpool]
        self.pidxs = [self.ppool[i] for i in idxs2qpool]

        if self.nnum == 0:
            self.nidxs = [[] for _ in range(len(self.qidxs))]
            return 0

        idxs2images = np.random.permutation(len(self.images))[:self.poolsize]

        from ..parallel.extract import extract_vectors_network

        print(">> Extracting descriptors for query images...")
        qvecs = extract_vectors_network(
            network, [self.images[i] for i in self.qidxs], self.imsize,
            self.transform, cache=self.device_cache)  # (D, Q)
        print(">> Extracting descriptors for negative pool...")
        poolvecs = extract_vectors_network(
            network, [self.images[i] for i in idxs2images], self.imsize,
            self.transform, cache=self.device_cache)  # (D, P)
        if self.device_cache is not None:
            print(">>>> Device image cache: %s" % self.device_cache.stats())

        print(">> Searching for hard negatives...")
        from ..ops.ranking import rank_database

        # one jitted program (un-jitted ops dispatch individually and cost
        # seconds each on the remote backend)
        ranks = np.asarray(rank_database(np.asarray(poolvecs, np.float32),
                                         np.asarray(qvecs, np.float32)))
        qvecs = np.asarray(qvecs)
        poolvecs = np.asarray(poolvecs)

        ndist_acc = []
        self.nidxs = []
        for q in range(len(self.qidxs)):
            qcluster = self.clusters[self.qidxs[q]]
            clusters = [qcluster]
            nidxs = []
            r = 0
            while len(nidxs) < self.nnum:
                if r >= ranks.shape[0]:
                    # the pool ran out of distinct-cluster negatives (small
                    # pool_size or cluster-concentrated sample) — fail with
                    # the cause instead of an opaque IndexError (the
                    # reference's unbounded walk crashes the same way,
                    # cirtorch traindataset.py:178-271)
                    raise ValueError(
                        "hard-negative mining exhausted the pool: query %d "
                        "found %d/%d distinct-cluster negatives in a pool "
                        "of %d — raise pool_size or lower neg_num"
                        % (q, len(nidxs), self.nnum, ranks.shape[0]))
                potential = idxs2images[ranks[r, q]]
                if self.clusters[potential] not in clusters:
                    nidxs.append(int(potential))
                    clusters.append(self.clusters[potential])
                    diff = qvecs[:, q] - poolvecs[:, ranks[r, q]] + 1e-6
                    ndist_acc.append(float(np.sqrt(np.sum(diff ** 2))))
                r += 1
            self.nidxs.append(nidxs)
        print(">>>> Average negative l2-distance: %.2f"
              % (np.mean(ndist_acc) if ndist_acc else 0.0))
        return {"average_negative_distance": ndist_acc}


# --- mdir dataset adapters (components/data/dataset) ------------------------

def cir_tuples_dataset(data, transform, **params):
    assert not data
    dataset = TuplesDataset(
        name=params.pop("dataset"),
        mode=params.pop("split"),
        imsize=params.pop("image_size"),
        nnum=params.pop("neg_num"),
        transform=transform,
        dataset_pkl=params.pop("dataset_pkl"),
        ims_root=params.pop("image_dir"),
        qsize=params.pop("query_size"),
        poolsize=params.pop("pool_size"),
    )
    assert not params, params.keys()
    return dataset


def cir_image_list_dataset(data, transform, **params):
    images, bbxs = (data[0], None) if len(data) == 1 else data
    image_dir = params.pop("image_dir")
    return ImagesFromList(
        root="",
        images=[path_join(image_dir, x) for x in images],
        imsize=params.pop("image_size"),
        bbxs=bbxs,
        transform=transform,
        **params)


DATASET_LABELS = {
    "RandomImageTuple": RandomImageTupleDataset,
    "PregeneratedImageTuple": PregeneratedImageTupleDataset,
    "CirTuples": cir_tuples_dataset,
    "CirImageList": cir_image_list_dataset,
}

LOADER_DEFAULT_PARAMS = {
    "shuffle": False,
    "num_workers": 6,
    "pin_memory": True,
}


def initialize_dataset(data, stage, transform, params):
    if stage in ("train", "val"):
        if data:
            col_start, col_end = params.pop("data_cols").split(":")
            data = data[int(col_start):(int(col_end) if col_end else None)]
    elif stage != "test":
        raise RuntimeError("Unsupported stage '%s'" % stage)
    return DATASET_LABELS[params.pop("name")](data, transform=transform, **params)


def initialize_dataset_loader(data, stage, params, loader_default_params=None):
    from .transforms import initialize_transforms

    transform = initialize_transforms(params.pop("transforms"),
                                      mean_std=params.pop("mean_std"))
    dataset = initialize_dataset(data, stage, transform, params.pop("dataset"))
    loader_params = {**LOADER_DEFAULT_PARAMS, **(loader_default_params or {}),
                     **getattr(dataset, "loader_params", {}),
                     **params.pop("loader", {})}
    assert "batch_size" in loader_params
    assert not params, params.keys()
    return DataLoader(dataset, **loader_params)
