"""Device-resident uint8 image cache (parallel/device_cache.py).

Mining re-ships the same pixels every epoch; the cache keeps padded uint8
bucket entries in device memory so hits skip decode AND the wire. These
tests pin: LRU byte-budget eviction, the bit-identity of cached extraction
(cold == warm == uncached), mixed hit/miss chunks, and the bucket-multiple
guard.
"""
import numpy as np
import pytest

from mdir_tpu.models import initialize_model
from mdir_tpu.parallel.device_cache import DeviceImageCache


@pytest.fixture()
def rng():
    return np.random.RandomState(9)


@pytest.fixture(scope="module")
def alexnet_model():
    return initialize_model({
        "architecture": "cirnet", "cir_architecture": "alexnet",
        "local_whitening": False, "pooling": "gem", "regional": False,
        "whitening": False, "pretrained": False})


def test_lru_eviction_by_bytes(rng):
    cache = DeviceImageCache(budget_mb=0.1)  # 100 kB
    entry = np.zeros((64, 64, 3), np.uint8)  # 12.3 kB each
    for i in range(12):
        cache.put("k%d" % i, entry, (60, 60))
    stats = cache.stats()
    assert stats["bytes"] <= 0.1e6
    assert stats["evictions"] == 12 - stats["entries"]
    assert not cache.contains("k0")          # oldest evicted
    assert cache.contains("k11")

    # get() refreshes LRU position
    cache.get("k%d" % (12 - stats["entries"]))
    cache.put("fresh", entry, (60, 60))
    assert cache.contains("k%d" % (12 - stats["entries"]))


def test_matches_checks_bucketing(rng):
    cache = DeviceImageCache(budget_mb=10)
    padded = np.zeros((128, 128, 3), np.uint8)
    cache.put("a", padded, (100, 120))
    assert cache.matches("a", 64)        # 100,120 -> 128,128 at multiple 64
    assert not cache.matches("a", 256)   # would need a 256x256 pad
    assert not cache.matches("missing", 64)


def _save_images(tmp_path, rng, n=6, base=70):
    from PIL import Image

    paths = []
    for i in range(n):
        arr = (rng.rand(base + 10 * (i % 3), 90, 3) * 255).astype(np.uint8)
        p = tmp_path / ("img%d.jpg" % i)
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


def _network(model):
    from mdir_tpu.learning.network import CirNetwork

    return CirNetwork(
        model, CirNetwork.NetworkParams(
            model={}, runtime={"wrappers": {
                "train": None,
                "eval": {"0_cirmultiscale": {"scales": True}}}}),
        frozen=True)


def test_cached_extraction_bit_identical(rng, alexnet_model, tmp_path):
    """cold (filling) == warm (all hits) == uncached, element-identical."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel.extract import extract_vectors_network

    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = _save_images(tmp_path, rng)
    network = _network(model)

    base = extract_vectors_network(network, paths, 96, transform)

    cache = DeviceImageCache(budget_mb=100)
    cold = extract_vectors_network(network, paths, 96, transform,
                                   cache=cache)
    stats = cache.stats()
    assert stats["entries"] == len(paths)
    assert stats["hits"] == 0

    warm = extract_vectors_network(network, paths, 96, transform,
                                   cache=cache)
    stats = cache.stats()
    assert stats["hits"] == len(paths)

    np.testing.assert_array_equal(cold, base)
    np.testing.assert_array_equal(warm, base)


def test_cached_extraction_mixed_hits(rng, alexnet_model, tmp_path):
    """A second pass over a superset: hit + miss rows mix inside chunks."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel.extract import extract_vectors_network

    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = _save_images(tmp_path, rng, n=8)
    network = _network(model)

    cache = DeviceImageCache(budget_mb=100)
    extract_vectors_network(network, paths[:4], 96, transform, cache=cache)
    mixed = extract_vectors_network(network, paths, 96, transform,
                                    cache=cache)
    base = extract_vectors_network(network, paths, 96, transform)
    np.testing.assert_array_equal(mixed, base)
    stats = cache.stats()
    assert stats["hits"] == 4
    assert stats["entries"] == 8


def test_cache_skips_decode_on_hits(rng, alexnet_model, tmp_path,
                                    monkeypatch):
    """Warm extraction never opens an image file."""
    from mdir_tpu.data.transforms import initialize_transforms
    from mdir_tpu.parallel import extract as extract_mod

    model = alexnet_model
    mean_std = [model.meta["mean"], model.meta["std"]]
    transform = initialize_transforms("pil2np | totensor | normalize",
                                      mean_std)
    paths = _save_images(tmp_path, rng, n=4)
    network = _network(model)
    cache = DeviceImageCache(budget_mb=100)
    extract_mod.extract_vectors_network(network, paths, 96, transform,
                                        cache=cache)

    def boom(*a, **k):
        raise AssertionError("host decode ran on a warm cache")

    monkeypatch.setattr(extract_mod, "_stream_images_uint8", boom)
    warm = extract_mod.extract_vectors_network(network, paths, 96,
                                               transform, cache=cache)
    assert np.isfinite(warm).all()


def test_mining_uses_cache_from_env(rng, tmp_path, monkeypatch):
    """MDIR_TPU_DEVICE_CACHE_MB reaches TuplesDataset.device_cache."""
    monkeypatch.setenv("MDIR_TPU_DEVICE_CACHE_MB", "64")
    from mdir_tpu.parallel.device_cache import DeviceImageCache as DIC

    cache = DIC.from_env()
    assert cache is not None and cache.budget_bytes == 64_000_000
    monkeypatch.setenv("MDIR_TPU_DEVICE_CACHE_MB", "0")
    assert DIC.from_env() is None


def test_assemble_train_batch_equals_prepare_batch(rng):
    """The mining->train handoff's device assembly is bit-identical to the
    host-padded tuple bucket (mixed hits/misses, varied shapes, entries
    padded for mining's 64-bucketing, train bucket at 32)."""
    from mdir_tpu.learning.train_step import pad_image_batch
    from mdir_tpu.parallel.device_cache import CachedImageRef

    cache = DeviceImageCache(64)
    shapes = [(48, 64), (64, 48), (37, 61), (64, 64), (20, 33)]
    images = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for h, w in shapes]

    def up64(v):
        return -(-v // 64) * 64

    flat = []
    for i, img in enumerate(images):
        if i % 2 == 0:  # cache hit: entry padded at mining's bucketing
            h, w = img.shape[:2]
            padded = np.zeros((up64(h), up64(w), 3), np.uint8)
            padded[:h, :w] = img
            cache.put("im%d@64" % i, padded, (h, w))
            flat.append(CachedImageRef("im%d@64" % i, (h, w)))
        else:
            flat.append(img)

    dev_batch, valid, miss_bytes = cache.assemble_train_batch(flat)
    ref_batch, ref_valid = pad_image_batch(images, 32)
    assert dev_batch.shape == ref_batch.shape
    np.testing.assert_array_equal(np.asarray(dev_batch), ref_batch)
    np.testing.assert_array_equal(valid, ref_valid)
    assert miss_bytes == sum(
        ref_batch[0].nbytes for i in range(len(images)) if i % 2 == 1)
    assert cache.stats()["hits"] == 0  # assembly peeks, no stat pollution
