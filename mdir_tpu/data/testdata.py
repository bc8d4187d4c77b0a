"""Test dataset configuration and downloading.

Parity with ``cirtorch/datasets/testdataset.py`` (gnd pkl with
imlist/qimlist/gnd) and ``cirtorch/utils/download.py`` (image archives +
ground-truth pkls into DATA_ROOT/test/<dataset>/, roxford/rparis symlinked to
oxford/paris jpgs, Tokyo 24/7 from the daynight server). Downloads use
urllib + tarfile/zipfile instead of shelling out to wget.
"""
import os
import pickle
import shutil
import sys
import tarfile
import zipfile
from urllib.request import urlretrieve

from ..tools.utils import staged_artifact


def _fetch(url, dst):
    """urlretrieve with MDIR_TPU_ARTIFACTS staging taking precedence."""
    staged = staged_artifact(url)
    if staged is not None:
        shutil.copyfile(staged, dst)
        return dst
    return urlretrieve(url, dst)

DATASETS = ["oxford5k", "paris6k", "roxford5k", "rparis6k", "247tokyo1k"]

_IMAGE_SOURCES = {
    "oxford5k": ("http://www.robots.ox.ac.uk/~vgg/data/oxbuildings",
                 ["oxbuild_images.tgz"]),
    "paris6k": ("http://www.robots.ox.ac.uk/~vgg/data/parisbuildings",
                ["paris_1.tgz", "paris_2.tgz"]),
    "247tokyo1k": ("http://www.ok.ctrl.titech.ac.jp/~torii/project/247/download",
                   ["247query_v3.zip"]),
}


def configdataset(dataset, dir_main):
    """Load gnd_<dataset>.pkl config with filename closures."""
    dataset = dataset.lower()
    if dataset not in DATASETS:
        raise ValueError("Unknown dataset: %s!" % dataset)

    gnd_fname = os.path.join(dir_main, dataset, "gnd_%s.pkl" % dataset)
    with open(gnd_fname, "rb") as f:
        cfg = pickle.load(f)
    cfg["gnd_fname"] = gnd_fname
    cfg["ext"] = ".jpg"
    cfg["qext"] = ".jpg"
    cfg["dir_data"] = os.path.join(dir_main, dataset)
    cfg["dir_images"] = os.path.join(cfg["dir_data"], "jpg")
    cfg["n"] = len(cfg["imlist"])
    cfg["nq"] = len(cfg["qimlist"])
    cfg["im_fname"] = config_imname
    cfg["qim_fname"] = config_qimname
    cfg["dataset"] = dataset
    return cfg


def config_imname(cfg, i):
    return os.path.join(cfg["dir_images"], cfg["imlist"][i] + cfg["ext"])


def config_qimname(cfg, i):
    return os.path.join(cfg["dir_images"], cfg["qimlist"][i] + cfg["qext"])


def _extract_flat(archive_path, dst_dir):
    """Extract an archive, flattening any subdirectories into dst_dir."""
    tmp = os.path.join(dst_dir, "tmp")
    os.makedirs(tmp, exist_ok=True)
    if archive_path.endswith(".zip"):
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(tmp)
    else:
        with tarfile.open(archive_path, "r:*") as tf:
            tf.extractall(tmp)
    for root, _dirs, files in os.walk(tmp):
        for fname in files:
            target = os.path.join(dst_dir, fname)
            if not os.path.exists(target):
                shutil.move(os.path.join(root, fname), target)
    shutil.rmtree(tmp)


def download_test(data_dir, datasets=DATASETS):
    """Ensure test image sets + gnd pkls exist under data_dir/test."""
    datasets_dir = os.path.join(data_dir, "test")
    os.makedirs(datasets_dir, exist_ok=True)

    for dataset in datasets:
        try:
            _download_one(datasets_dir, dataset)
        except Exception as exc:  # offline environments: report and continue
            sys.stderr.write(">> Could not prepare dataset %s (%s)\n"
                             % (dataset, exc))


def _download_one(datasets_dir, dataset):
    dst_dir = os.path.join(datasets_dir, dataset, "jpg")
    if not os.path.isdir(dst_dir):
        if dataset in _IMAGE_SOURCES:
            src_dir, dl_files = _IMAGE_SOURCES[dataset]
            print(">> Dataset %s directory does not exist. Creating: %s"
                  % (dataset, dst_dir))
            os.makedirs(dst_dir, exist_ok=True)
            for dl_file in dl_files:
                src = "%s/%s" % (src_dir, dl_file)
                dst = os.path.join(dst_dir, dl_file)
                print(">> Downloading dataset %s archive %s..." % (dataset, dl_file))
                _fetch(src, dst)
                print(">> Extracting dataset %s archive %s..." % (dataset, dl_file))
                _extract_flat(dst, dst_dir)
                os.remove(dst)
        elif dataset in ("roxford5k", "rparis6k"):
            old_dir = os.path.join(datasets_dir, dataset[1:], "jpg")
            os.makedirs(os.path.join(datasets_dir, dataset), exist_ok=True)
            if os.path.lexists(dst_dir) and not os.path.exists(dst_dir):
                os.remove(dst_dir)
            if not os.path.exists(dst_dir):
                os.symlink(old_dir, dst_dir)
                print(">> Created symbolic link from %s jpg to %s jpg"
                      % (dataset[1:], dataset))

    if dataset == "247tokyo1k":
        gnd_src = "http://cmp.felk.cvut.cz/daynightretrieval/download/data"
    else:
        gnd_src = "http://cmp.felk.cvut.cz/cnnimageretrieval/data/test/" + dataset
    gnd_dst = os.path.join(datasets_dir, dataset, "gnd_%s.pkl" % dataset)
    os.makedirs(os.path.dirname(gnd_dst), exist_ok=True)
    if not os.path.exists(gnd_dst):
        print(">> Downloading dataset %s ground truth file..." % dataset)
        try:
            _fetch("%s/gnd_%s.pkl" % (gnd_src, dataset), gnd_dst)
        except Exception as exc:  # offline environments
            sys.stderr.write(
                ">> Could not download gnd for %s (%s); place it at %s\n"
                % (dataset, exc, gnd_dst))


def download_train(data_dir):
    """Ensure retrieval-SfM-120k train images + dbs exist under data_dir/train."""
    src_root = "http://cmp.felk.cvut.cz/cnnimageretrieval/data/train/ims"
    dst_dir = os.path.join(data_dir, "train", "retrieval-SfM-120k", "ims")
    if not os.path.isdir(dst_dir):
        os.makedirs(dst_dir, exist_ok=True)
        for dl_file in ["ims.tar.gz"]:
            dst = os.path.join(dst_dir, dl_file)
            print(">> Downloading training images archive %s..." % dl_file)
            _fetch("%s/%s" % (src_root, dl_file), dst)
            with tarfile.open(dst, "r:*") as tf:
                tf.extractall(dst_dir)
            os.remove(dst)

    dbs_dir = os.path.join(data_dir, "train", "retrieval-SfM-120k")
    os.makedirs(dbs_dir, exist_ok=True)
    for db in ["retrieval-SfM-120k.pkl", "retrieval-SfM-120k-whiten.pkl"]:
        dst = os.path.join(dbs_dir, db)
        if not os.path.exists(dst):
            print(">> Downloading db file %s..." % db)
            try:
                _fetch(
                    "http://cmp.felk.cvut.cz/cnnimageretrieval/data/train/dbs/" + db,
                    dst)
            except Exception as exc:
                sys.stderr.write(">> Could not download %s (%s)\n" % (db, exc))
