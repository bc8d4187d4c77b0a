"""Device-resident uint8 image cache (mining/training wire-traffic killer).

Hard-negative mining re-embeds ~24k images per epoch with the current
network (reference ``cirtorch/datasets/traindataset.py:178-271``): the
descriptors must be recomputed every epoch, but the *pixels* never change —
the qpool/ppool are fixed across epochs and negatives resample from a fixed
superset, so on this 20-60 MB/s tunnel the same uint8 buckets re-ship every
epoch (mining budget: put path 25.4 s of a 29.4 s pass, BENCH_r04). This
module keeps an id-keyed LRU of padded uint8 bucket entries in HBM so a
re-drawn image costs one device-side stack instead of a wire transfer.

Entries are the exact host payloads the streaming extractor would ship
(bucket-padded uint8, any channel count — plain RGB or a photometric
chain's host planes), so a cache hit is bit-identical to a fresh transfer.
Budgeted in bytes (``MDIR_TPU_DEVICE_CACHE_MB``; 0/unset = disabled);
eviction is strict LRU. Thread-safe: the extractor touches the cache from
its uplink thread while mining's host loop runs ahead.
"""
import collections
import os
import threading

import numpy as np

import jax
import jax.numpy as jnp


class CachedImageRef:
    """``__getitem__`` stand-in for a cache-resident image (the mining→train
    handoff): carries the cache key + valid extent instead of pixels, so the
    training loader skips PIL decode AND the wire for images mining just
    shipped. Consumed by ``DeviceImageCache.assemble_train_batch``."""

    __slots__ = ("key", "hw")

    def __init__(self, key, hw):
        self.key = key
        self.hw = tuple(hw)


class DeviceImageCache:
    """LRU of device-resident padded uint8 images, keyed by caller id."""

    def __init__(self, budget_mb, bucket_multiple=64):
        self.budget_bytes = int(budget_mb * 1e6)
        self.bucket_multiple = bucket_multiple
        self._entries = collections.OrderedDict()  # key -> (dev, hw, nbytes)
        self._bytes = 0
        self._lock = threading.Lock()
        self._fit_fns = {}
        self._stack_fns = {}
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    @classmethod
    def from_env(cls, default_mb=0):
        """Cache sized by MDIR_TPU_DEVICE_CACHE_MB; None when disabled."""
        mb = float(os.environ.get("MDIR_TPU_DEVICE_CACHE_MB", default_mb))
        return cls(mb) if mb > 0 else None

    def contains(self, key):
        with self._lock:
            return key in self._entries

    def shape(self, key):
        """(ih, iw) valid extent of a cached entry."""
        with self._lock:
            return self._entries[key][1]

    def matches(self, key, bucket_multiple):
        """True when the entry exists AND was padded for this bucketing."""
        with self._lock:
            entry = self._entries.get(key)
        if entry is None:
            return False
        dev, (ih, iw), _ = entry

        def up(v):
            return -(-v // bucket_multiple) * bucket_multiple

        return dev.shape[0] == up(ih) and dev.shape[1] == up(iw)

    def peek(self, key):
        """Entry device array without touching LRU order or hit stats."""
        with self._lock:
            return self._entries[key][0]

    def get(self, key):
        """(device_array, (ih, iw)) or None; refreshes LRU position."""
        with self._lock:
            entry = self._entries.get(key)
            if entry is None:
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return entry[0], entry[1]

    def put(self, key, padded, valid_hw):
        """Insert a bucket-padded uint8 host array; returns its device copy.

        The put is async on this transport — the returned array is usable
        immediately as a program operand.
        """
        assert padded.dtype == np.uint8, padded.dtype
        dev = jnp.asarray(padded)
        with self._lock:
            if key in self._entries:
                self._bytes -= self._entries.pop(key)[2]
            self._entries[key] = (dev, tuple(valid_hw), padded.nbytes)
            self._bytes += padded.nbytes
            while self._bytes > self.budget_bytes and len(self._entries) > 1:
                _, (_, _, nbytes) = self._entries.popitem(last=False)
                self._bytes -= nbytes
                self.evictions += 1
        return dev

    def _fit(self, in_shape, out_hw):
        """jit: slice/zero-pad one entry to the train bucket shape.

        Exact by construction: entry pixels beyond the image's valid extent
        are zeros (the entry IS the zero-padded host payload), and the train
        bucket covers every image's extent, so slice-then-pad reproduces the
        host-padded row bit-for-bit."""
        fkey = (in_shape, tuple(out_hw))
        if fkey not in self._fit_fns:
            mh = min(in_shape[0], out_hw[0])
            mw = min(in_shape[1], out_hw[1])
            pad = ((0, out_hw[0] - mh), (0, out_hw[1] - mw), (0, 0))
            self._fit_fns[fkey] = jax.jit(
                lambda e: jnp.pad(e[:mh, :mw], pad))
        return self._fit_fns[fkey]

    def _stack(self, n, shape):
        skey = (n, shape)
        if skey not in self._stack_fns:
            self._stack_fns[skey] = jax.jit(lambda *xs: jnp.stack(xs))
        return self._stack_fns[skey]

    def assemble_train_batch(self, flat_items, bucket_multiple=32):
        """Flattened tuple images (arrays | CachedImageRef) -> device batch.

        Returns ``(dev_batch (N, BH, BW, C) uint8, valid (N, 2) int32,
        miss_bytes)``, bit-identical to ``prepare_batch``'s host-padded
        bucket (pinned by tests): hits are fitted from HBM entries
        (slice/pad programs keyed by shape pair), misses pad on host and
        ride the wire as today. Read-only — train-time misses do NOT enter
        the cache, so entries keep mining's bucket padding (its
        ``matches()`` contract)."""
        def up(v):
            return -(-int(v) // bucket_multiple) * bucket_multiple

        extents = [it.hw if isinstance(it, CachedImageRef) else it.shape[:2]
                   for it in flat_items]
        bh = up(max(h for h, _ in extents))
        bw = up(max(w for _, w in extents))
        channels = next((it.shape[-1] for it in flat_items
                         if not isinstance(it, CachedImageRef)), None)
        devs, miss_bytes = [], 0
        for it in flat_items:
            if isinstance(it, CachedImageRef):
                try:
                    entry = self.peek(it.key)
                except KeyError:
                    raise RuntimeError(
                        "device cache entry %r evicted between tuple load "
                        "and batch assembly — raise MDIR_TPU_DEVICE_CACHE_MB"
                        % (it.key,)) from None
                if channels is None:
                    channels = entry.shape[-1]
                assert entry.shape[-1] == channels, \
                    (entry.shape, channels)  # chain changed between phases?
                devs.append(self._fit(entry.shape, (bh, bw))(entry))
            else:
                padded = np.zeros((bh, bw, it.shape[-1]), np.uint8)
                padded[:it.shape[0], :it.shape[1]] = it
                miss_bytes += padded.nbytes
                devs.append(jnp.asarray(padded))
        batch = self._stack(len(devs), (bh, bw, channels))(*devs)
        return batch, np.asarray(extents, np.int32), miss_bytes

    def stats(self):
        with self._lock:
            return {"entries": len(self._entries),
                    "bytes": self._bytes,
                    "hits": self.hits, "misses": self.misses,
                    "evictions": self.evictions}

    def clear(self):
        with self._lock:
            self._entries.clear()
            self._bytes = 0
