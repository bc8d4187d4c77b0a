"""File readers: column selection, slicing, json cells, formats."""
import gzip
import json
import pickle

import numpy as np
import pytest

from mdir_tpu.data.readers import initialize_file_reader


def test_tsv_reader(tmp_path):
    path = tmp_path / "data.tsv"
    path.write_text("id\tvalue\tmeta\n"
                    "a\t1\t[1, 2]\n"
                    "b\t2\t{}\n"
                    "c\t3\t\n")
    with initialize_file_reader(str(path), keys=["id", "meta"]) as reader:
        data = reader.get()
    assert data["id"] == ["a", "b", "c"]
    assert data["meta"] == [[1, 2], {}, None]


def test_tsv_gz_and_slicing(tmp_path):
    path = tmp_path / "data.tsv.gz"
    with gzip.open(path, "wt") as handle:
        handle.write("id\n" + "\n".join(str(i) for i in range(10)) + "\n")
    with initialize_file_reader(str(path), slice=1, partitions=3) as reader:
        data = reader.get()
    assert data["id"] == ["1", "4", "7"]


def test_csv_separator(tmp_path):
    path = tmp_path / "data.csv"
    path.write_text("a,b\n1,2\n")
    with initialize_file_reader(str(path)) as reader:
        data = reader.get()
    assert data["a"] == ["1"] and data["b"] == ["2"]


def test_pkl_reader(tmp_path):
    path = tmp_path / "data.pkl"
    with open(path, "wb") as handle:
        pickle.dump({"x": np.arange(10), "y": np.arange(10) * 2}, handle)
    with initialize_file_reader(str(path), keys=["y"], limit=4) as reader:
        data = reader.get()
    np.testing.assert_array_equal(data["y"], [0, 2, 4, 6])


def test_h5_reader(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = tmp_path / "data.h5"
    with h5py.File(path, "w") as handle:
        handle["col"] = np.arange(6)
        handle.attrs["header"] = ["col"]
    with initialize_file_reader(str(path), slice=0, partitions=2) as reader:
        data = reader.get()
    np.testing.assert_array_equal(data["col"], [0, 2, 4])


def test_lst_reader_multi(tmp_path):
    (tmp_path / "a.lst").write_text("x\ny\n")
    (tmp_path / "b.lst").write_text("u\nv\n")
    with initialize_file_reader(str(tmp_path / "[a|b].lst")) as reader:
        data = reader.get()
    assert data["a"] == ["x", "y"]
    assert data["b"] == ["u", "v"]


def test_unknown_suffix():
    with pytest.raises(ValueError):
        initialize_file_reader("foo.xyz")


def test_staged_artifact_hook(tmp_path, monkeypatch):
    """MDIR_TPU_ARTIFACTS staging: load_url prefers the staged copy and still
    hash-validates it."""
    import hashlib
    import io

    from mdir_tpu.tools.utils import load_url, staged_artifact

    content = b"model bytes"
    digest = hashlib.sha256(content).hexdigest()[:8]
    name = "net-%s.pth" % digest
    (tmp_path / name).write_bytes(content)
    monkeypatch.setenv("MDIR_TPU_ARTIFACTS", str(tmp_path))

    url = "http://example.invalid/models/" + name
    assert staged_artifact(url) == str(tmp_path / name)
    loaded = load_url(url)
    assert isinstance(loaded, io.BytesIO) and loaded.getvalue() == content
    # cache-dir mode returns the staged path directly
    assert load_url(url, cache_dir=str(tmp_path / "cache")) == str(tmp_path / name)

    # corrupted staged content fails the filename hash check
    bad = "net2-%s.pth" % digest
    (tmp_path / bad).write_bytes(b"other bytes")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_url("http://example.invalid/models/" + bad)


def _tuple_fixture(tmp_path, n_rows=4, tuple_len=3):
    from PIL import Image

    img_dir = tmp_path / "ims"
    img_dir.mkdir()
    rng = np.random.RandomState(2)
    rows = []
    for i in range(n_rows):
        row = []
        for j in range(tuple_len):
            name = "t%d_%d.jpg" % (i, j)
            Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
                img_dir / name)
            row.append(name)
        rows.append(row)
    tsv = tmp_path / "tuples.tsv"
    with open(tsv, "w") as handle:
        handle.write("pair\n")
        for row in rows:
            handle.write(json.dumps(row) + "\n")
    return str(tsv), str(img_dir)


def test_random_image_tuple_idx_dsl(tmp_path):
    """RandomImageTupleDataset idx DSL (reference tuple_datasets.py:22-53):
    ints are fixed positions (negative wraps), 'any' draws uniformly,
    'different' excludes previously drawn indices within the tuple."""
    from mdir_tpu.data.datasets import RandomImageTupleDataset

    tsv, img_dir = _tuple_fixture(tmp_path)
    ds = RandomImageTupleDataset(
        {}, None, dataset=tsv, data_key="pair", image_dir=img_dir,
        idx="0_-1_different")
    assert ds.idx == [0, -1, "different"]
    assert len(ds) == 4

    ds.prepare_epoch(None)
    for row, picks in zip(ds.image_list, ds.epoch_images):
        assert picks[0] == row[0]          # fixed first
        assert picks[1] == row[-1]         # negative wraps to last
        assert picks[2] == row[1]          # 'different' must pick the middle
    imgs = ds[0]
    assert len(imgs) == 3 and all(im.size == (8, 8) for im in imgs)

    # 'any' stays in range over many epochs
    ds_any = RandomImageTupleDataset(
        {}, None, dataset=tsv, data_key="pair", image_dir=img_dir, idx="any")
    seen = set()
    np.random.seed(0)
    for _ in range(20):
        ds_any.prepare_epoch(None)
        seen.update(p[0] for p in ds_any.epoch_images)
    assert seen <= {p for row in ds_any.image_list for p in row}
    assert len(seen) > 4  # actually random across epochs

    # get_idx semantics directly
    assert RandomImageTupleDataset.get_idx(-2, 3, [], None) == 1
    assert RandomImageTupleDataset.get_idx(
        "different", 3, [0, 2], lambda n: n - 1) == 1


def test_pregenerated_tuples_seed0_deterministic(tmp_path):
    """PregeneratedImageTupleDataset freezes picks with seed 0 at init —
    two instances agree (resume determinism, reference :79-89)."""
    from mdir_tpu.data.datasets import PregeneratedImageTupleDataset

    tsv, img_dir = _tuple_fixture(tmp_path)
    a = PregeneratedImageTupleDataset(
        {}, None, dataset=tsv, data_key="pair", image_dir=img_dir,
        idx="any_different")
    b = PregeneratedImageTupleDataset(
        {}, None, dataset=tsv, data_key="pair", image_dir=img_dir,
        idx="any_different")
    assert a.epoch_images == b.epoch_images
    a.prepare_epoch(None)  # no-op: picks stay frozen
    assert a.epoch_images == b.epoch_images


def test_extract_flat_tar_and_zip(tmp_path):
    """_extract_flat flattens nested archive layouts into dst (the public
    dataset tarballs nest jpgs under subdirectories)."""
    import tarfile
    import zipfile

    from mdir_tpu.data.testdata import _extract_flat

    src = tmp_path / "payload" / "deep" / "dir"
    src.mkdir(parents=True)
    (src / "a.jpg").write_bytes(b"aa")
    (tmp_path / "payload" / "b.jpg").write_bytes(b"bb")

    tar_path = tmp_path / "arch.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(tmp_path / "payload", arcname="payload")
    out_tar = tmp_path / "out_tar"
    out_tar.mkdir()
    _extract_flat(str(tar_path), str(out_tar))
    assert sorted(p.name for p in out_tar.iterdir()) == ["a.jpg", "b.jpg"]

    zip_path = tmp_path / "arch.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(src / "a.jpg", "nested/a.jpg")
    out_zip = tmp_path / "out_zip"
    out_zip.mkdir()
    _extract_flat(str(zip_path), str(out_zip))
    assert [p.name for p in out_zip.iterdir()] == ["a.jpg"]


def test_download_one_revisited_symlink(tmp_path):
    """roxford5k/rparis6k reuse the classic sets' jpgs via a symlink
    (reference download.py revisited handling); with the gnd pkl already
    staged no network is touched."""
    from mdir_tpu.data.testdata import _download_one

    datasets_dir = tmp_path / "test"
    old_jpgs = datasets_dir / "oxford5k" / "jpg"
    old_jpgs.mkdir(parents=True)
    (old_jpgs / "img.jpg").write_bytes(b"x")
    gnd = datasets_dir / "roxford5k" / "gnd_roxford5k.pkl"
    gnd.parent.mkdir(parents=True)
    gnd.write_bytes(b"pkl")

    _download_one(str(datasets_dir), "roxford5k")
    link = datasets_dir / "roxford5k" / "jpg"
    assert link.is_symlink() and (link / "img.jpg").exists()
    # idempotent on a second call
    _download_one(str(datasets_dir), "roxford5k")
    assert link.is_symlink()


def test_images_from_arrays_dataset():
    """ImagesFromArrays (cirtorch ImagesFromDataList parity): in-memory
    arrays with an optional transform; empty input refuses."""
    from mdir_tpu.data.datasets import ImagesFromArrays

    arrays = [np.full((4, 4, 3), i, np.float32) for i in range(3)]
    ds = ImagesFromArrays(arrays, transform=lambda img: img + 1)
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[1], arrays[1] + 1)

    with pytest.raises(RuntimeError):
        ImagesFromArrays([])


def test_collate_mixed_sentinel_batch_raises():
    """A batch mixing the {} missing-image sentinel with real images must
    fail loudly — silently collating to {} would drop the valid images."""
    from mdir_tpu.data.loaders import default_collate

    with pytest.raises(TypeError, match="batch_size 1"):
        default_collate([{}, np.zeros((4, 4, 3), np.float32)])
    # all-sentinel batches still collate to the sentinel (torch parity)
    assert default_collate([{}, {}]) == {}
