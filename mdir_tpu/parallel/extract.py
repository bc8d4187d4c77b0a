"""Batched multi-scale descriptor extraction — the TPU hot path.

The reference extracts descriptors one image at a time at native resolution
(``extract_vectors``, imageretrievalnet.py:277-312). Here images are grouped
into static shape buckets, padded (exactly masked through the trunk — see
models/trunks.py), and processed as large batches so the MXU sees big
convolutions; the multi-scale loop, p-power aggregation, and learned
whitening run fused on device. Numerically equivalent to the per-image
wrapper path (tested), including torch's ``F.interpolate(align_corners=False)``
resize, reproduced exactly per image via host-computed gather grids so one
compiled program serves all native sizes in a bucket.
"""
import collections
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import ImagesFromList
from ..ops.resize import torch_resize_grid
from ..data.loaders import DataLoader
from ..learning.wrappers import (CirMultiscaleAggregation, CirtorchWhiten,
                                 Compose, FakeBatch)

import os as _os

BUCKET_MULTIPLE = int(_os.environ.get("MDIR_TPU_BUCKET_MULTIPLE", "64"))
MAX_BATCH = int(_os.environ.get("MDIR_TPU_MAX_BATCH", "16"))


def _round_up(v, m):
    return -(-v // m) * m


def _resize_one(img, y0, y1, wy, x0, x1, wx):
    """Separable bilinear gather resize of one (H, W, C) image."""
    rows0 = jnp.take(img, y0, axis=0)
    rows1 = jnp.take(img, y1, axis=0)
    rows = rows0 * (1.0 - wy)[:, None, None] + rows1 * wy[:, None, None]
    cols0 = jnp.take(rows, x0, axis=1)
    cols1 = jnp.take(rows, x1, axis=1)
    return cols0 * (1.0 - wx)[None, :, None] + cols1 * wx[None, :, None]


@jax.jit
def batched_resize(batch, y0, y1, wy, x0, x1, wx):
    """vmap'd exact per-image resize; indices are per image (N, OH)/(N, OW)."""
    return jax.vmap(_resize_one)(batch, y0, y1, wy, x0, x1, wx)


class _Uplink:
    """Bounded transfer/dispatch pipeline thread(s).

    Host batch assembly (producer), host->device transfer + program launch
    (these threads), and device compute overlap; the tunnel stays busy as
    long as one chunk is always in flight. MDIR_TPU_UPLINK_THREAD=0 runs
    inline. MDIR_TPU_UPLINK_STREAMS=N (default 1) runs N concurrent
    transfer threads — pays off only if the transport multiplexes
    concurrent puts (probe first; chunk completion order is irrelevant,
    results are keyed by image index). ``barrier_first`` launches the very
    first payload synchronously before any thread starts, so launch-side
    one-shot state (the first-chunk dtype guard) resolves before
    concurrency begins.
    """

    def __init__(self, launch, depth=2, barrier_first=False, budget=None):
        self.launch = launch
        self.streams = max(1, int(_os.environ.get("MDIR_TPU_UPLINK_STREAMS",
                                                  "1")))
        self.depth = max(depth, self.streams + 1)
        self.threads = []
        self.queue = None
        self.errors = []
        self._barrier_first = barrier_first
        # optional per-pass time budget (MDIR_TPU_UPLINK_STATS): worker
        # queue-wait (producer starvation) accumulates here so a pass's
        # wall time decomposes into wait + put + launch + drain
        self.budget = budget

    def submit(self, payload):
        if _os.environ.get("MDIR_TPU_UPLINK_THREAD", "1") == "0":
            self.launch(*payload)
            return
        if self._barrier_first:
            self._barrier_first = False
            self.launch(*payload)
            return
        if not self.threads:
            import queue
            import threading

            self.queue = queue.Queue(maxsize=self.depth)
            budget_lock = threading.Lock()

            def _run():
                # queue-wait accumulates thread-locally and folds into the
                # shared budget ONCE at exit (under a lock): a bare
                # read-modify-write spanning a blocking get() would lose
                # updates between concurrent workers (UPLINK_STREAMS > 1)
                wait_s = 0.0
                try:
                    while True:
                        t0 = time.time() if self.budget is not None else 0.0
                        item = self.queue.get()
                        if self.budget is not None:
                            wait_s += time.time() - t0
                        if item is None:
                            return
                        try:
                            self.launch(*item)
                        except BaseException as exc:  # surfaced in drain()
                            self.errors.append(exc)
                            # keep consuming (and discarding) so a producer
                            # blocked on a full queue never deadlocks against
                            # a dead worker; the next submit()/drain() raises
                            while True:
                                item = self.queue.get()
                                if item is None:
                                    return
                finally:
                    if self.budget is not None:
                        with budget_lock:
                            self.budget["queue_wait_s"] = \
                                self.budget.get("queue_wait_s", 0.0) + wait_s

            self.threads = [
                threading.Thread(target=_run, daemon=True,
                                 name="mdir-tpu-uplink-%d" % i)
                for i in range(self.streams)]
            for thread in self.threads:
                thread.start()
        if self.errors:
            raise self.errors[0]
        if self.budget is not None:
            t0 = time.time()
            self.queue.put(payload)
            # producer blocked on a full queue: the uplink (transfers +
            # launches) is the limiter for this stretch of the pass
            self.budget["submit_block_s"] = \
                self.budget.get("submit_block_s", 0.0) + (time.time() - t0)
        else:
            self.queue.put(payload)

    def drain(self):
        if self.threads:
            for _ in self.threads:
                self.queue.put(None)
            for thread in self.threads:
                thread.join()
            self.threads = []
        if self.errors:
            raise self.errors[0]


def _analyze_wrappers(network):
    """Check the network's eval wrappers are the fusable pattern
    [cirwhiten?] [cirmultiscale?] [fakebatch?] and return (scales, whiten)."""
    compose = network.wrappers["eval"]
    scales = [1]
    whiten = None
    for wrapper in compose.wrappers:
        if isinstance(wrapper, CirtorchWhiten):
            whiten = wrapper
        elif isinstance(wrapper, CirMultiscaleAggregation):
            scales = wrapper.scales
        elif isinstance(wrapper, FakeBatch):
            pass
        else:
            return None
    return scales, whiten


def _load_images(images, image_size, transform, bbxs=None, workers=6):
    """Decode + crop + thumbnail + transform on host threads -> HWC arrays."""
    dataset = ImagesFromList(root="", images=images, imsize=image_size,
                             bbxs=bbxs, transform=transform)
    loader = DataLoader(dataset, batch_size=1, num_workers=workers,
                        collate_fn=lambda items: items[0])
    return list(loader)


def _resolve_pallas(requested):
    """Pallas pooling selection: the env var is forced (either way) when
    set, else the network runtime section's ``pallas`` key (yaml-reachable:
    ``network: runtime: pallas: true``), else off."""
    env = _os.environ.get("MDIR_TPU_PALLAS")
    if env is not None:
        return env == "1"
    return bool(requested)


def _fused_extract_fn(module, scales, has_whiten, device_normalize,
                      compute_dtype, chain=None, pallas=False):
    """One jitted program per (module, scales, whiten?, preprocess, dtype)
    doing: [uint8 -> /255 -> preprocess chain (CLAHE/colorspace) ->
    (x-mean)/std ->] per-scale exact resize -> masked trunk+pool -> p-power
    aggregation -> L2 -> optional whitening. A single launch per image chunk
    keeps remote-device dispatch latency off the critical path;
    ``device_normalize`` lets the host ship raw uint8 pixels (4x less HBM
    ingress) with normalization fused on device; ``chain`` (a DeviceChain)
    additionally runs the photometric transform chain — CLAHE included, with
    cv2-exact per-image tile geometry on the padded bucket — on device;
    ``compute_dtype='bfloat16'`` runs the trunk on the MXU's native dtype
    (opt-in — descriptors come back in f32 either way).

    Normalize-then-resize equals the reference's resize-then-normalize
    exactly: bilinear resampling commutes with a per-channel affine map.
    (With a CLAHE chain the whole nonlinear chain runs before any resize,
    matching the reference order: transforms at native size, then the
    multiscale wrapper's resizes.)
    """
    chain_fn = None
    chain_grid = None
    if chain is not None:
        from ..ops.preprocess import make_bucketed_chain

        chain_fn = make_bucketed_chain(chain)
        if chain.clahe_params is not None:
            chain_grid = chain.clahe_params[1]
    if pallas and getattr(module, "pooling", None) == "gem" \
            and hasattr(module, "pallas_pool"):
        module = module.clone(pallas_pool=True)

    # batched RMAC/Rpool: host-computed per-image region grids ride along
    needs_boxes = getattr(module, "pooling", None) == "rmac" \
        or getattr(module, "regional", False)

    def fn(variables, batch, valid_hw, grids, clahe_aux, boxes, msp, P, m,
           mean, std):
        from ..models.trunks import apply_valid_mask

        if chain_fn is not None:
            if clahe_aux is not None:
                # aux ships as 2 packed arrays (the link charges per
                # transfer); unpack in-graph with static bucket shapes
                from ..ops.clahe import unpack_clahe_aux

                clahe_aux = unpack_clahe_aux(
                    *clahe_aux, batch.shape[1:3], chain_grid)
            batch = chain_fn(batch, clahe_aux)
            batch = apply_valid_mask(batch, valid_hw)
        elif device_normalize:
            batch = batch.astype(jnp.float32) / 255.0
            batch = (batch - mean) / std
            # padded cells must be zero in normalized space
            batch = apply_valid_mask(batch, valid_hw)

        acc = None
        for s_idx, scale in enumerate(scales):
            if scale == 1:
                x, v = batch, valid_hw
            else:
                # grids ship packed as two f32 arrays per scale (fewer
                # host->device transfers; the tunnel charges per round trip)
                ypack, xpack, v = grids[s_idx]
                y0 = ypack[..., 0].astype(jnp.int32)
                y1 = ypack[..., 1].astype(jnp.int32)
                wy = ypack[..., 2]
                x0 = xpack[..., 0].astype(jnp.int32)
                x1 = xpack[..., 1].astype(jnp.int32)
                wx = xpack[..., 2]
                x = apply_valid_mask(
                    jax.vmap(_resize_one)(batch, y0, y1, wy, x0, x1, wx), v)
            # cast at the conv boundary, AFTER the f32-exact resize: the
            # f32 interp weights would otherwise silently promote a
            # pre-cast batch back to f32 (JAX type promotion), running the
            # non-unit scales' convs full-precision despite the bf16 trees
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            if needs_boxes:
                vecs = module.apply(variables, x, valid_hw=v,
                                    region_boxes=boxes[s_idx])  # (B, D)
            else:
                vecs = module.apply(variables, x, valid_hw=v)  # (B, D)
            vecs = vecs.astype(jnp.float32)
            powed = vecs ** msp
            acc = powed if acc is None else acc + powed
        v = (acc / len(scales)) ** (1.0 / msp)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        if has_whiten:
            X = jnp.dot(P, v.T - m.reshape(-1, 1),
                        precision=jax.lax.Precision.HIGHEST)
            X = X / (jnp.linalg.norm(X, ord=2, axis=0, keepdims=True) + 1e-6)
            return X.T
        return v

    return fn


def _pack_host_aux(valid, grids, clahe_aux):
    """All per-chunk aux arrays as ONE flat int32 buffer.

    The tunnel charges a ~30 ms fixed latency per transfer; a chunk used to
    ship up to 9 aux arrays (valid + 3 per scale + 2 CLAHE) costing ~0.3 s
    of pure round trips. Everything is a 4-byte dtype, so one concatenated
    int32 view (f32 payloads bitcast back in-graph, bit-exact) collapses
    them into a single put. Layout mirrors ``_unpack_device_aux``.
    """
    parts = [np.ascontiguousarray(valid).view(np.int32).ravel()]
    for g in grids:
        if g is None:
            continue
        ypack, xpack, out_valid = g
        parts += [ypack.view(np.int32).ravel(), xpack.view(np.int32).ravel(),
                  np.ascontiguousarray(out_valid).view(np.int32).ravel()]
    if clahe_aux is not None:
        ints, scalars = clahe_aux
        parts += [np.ascontiguousarray(ints).view(np.int32).ravel(),
                  np.ascontiguousarray(scalars).view(np.int32).ravel()]
    return np.concatenate(parts)


def _unpack_device_aux(blob, batch_shape, scales, bucket_multiple,
                       chain_grid):
    """In-graph inverse of ``_pack_host_aux``: every slice size derives from
    the (static) batch shape + the scale/grid constants, so the whole unpack
    lowers to free reshapes/bitcasts."""
    bsz, bh, bw = batch_shape[0], batch_shape[1], batch_shape[2]
    state = {"off": 0}

    def take(n):
        part = jax.lax.slice(blob, (state["off"],), (state["off"] + n,))
        state["off"] += n
        return part

    def take_f32(n):
        return jax.lax.bitcast_convert_type(take(n), jnp.float32)

    valid = take(bsz * 2).reshape(bsz, 2)
    grids = []
    for scale in scales:
        if scale == 1:
            grids.append(None)
            continue
        oh_b = _round_up(max(int(math.floor(bh * scale)), 1), bucket_multiple)
        ow_b = _round_up(max(int(math.floor(bw * scale)), 1), bucket_multiple)
        ypack = take_f32(bsz * oh_b * 3).reshape(bsz, oh_b, 3)
        xpack = take_f32(bsz * ow_b * 3).reshape(bsz, ow_b, 3)
        out_valid = take(bsz * 2).reshape(bsz, 2)
        grids.append((ypack, xpack, out_valid))
    clahe_aux = None
    if chain_grid is not None:
        gh, gw = chain_grid
        rows = (bh + gh) + (bw + gw)
        ints = take(bsz * rows * 2).reshape(bsz, rows, 2)
        scalars = take_f32(bsz * 4).reshape(bsz, 4)
        clahe_aux = (ints, scalars)
    return valid, tuple(grids), clahe_aux


_FUSED_CACHE = {}


def _get_fused(module, scales, has_whiten, device_normalize=False,
               compute_dtype=None, chain=None, packed=False,
               bucket_multiple=BUCKET_MULTIPLE, pallas=None):
    use_pallas = _resolve_pallas(pallas)
    key = (id(module), tuple(scales), has_whiten, device_normalize,
           str(compute_dtype), chain.key if chain is not None else None,
           use_pallas, packed, bucket_multiple)
    if key not in _FUSED_CACHE:
        fn = _fused_extract_fn(
            module, tuple(scales), has_whiten, device_normalize, compute_dtype,
            chain=chain, pallas=use_pallas)
        if packed:
            chain_grid = chain.clahe_params[1] if chain is not None \
                and chain.clahe_params is not None else None
            scales_t = tuple(scales)

            def packed_fn(variables, batch, blob, boxes, msp, P, m, mean,
                          std):
                valid, grids, aux = _unpack_device_aux(
                    blob, batch.shape, scales_t, bucket_multiple, chain_grid)
                return fn(variables, batch, valid, grids, aux, boxes, msp,
                          P, m, mean, std)

            _FUSED_CACHE[key] = jax.jit(packed_fn)
        else:
            _FUSED_CACHE[key] = jax.jit(fn)
    return _FUSED_CACHE[key]


class StreamingExtractor:
    """Streaming bucketed multi-scale extraction.

    Images are ``add()``-ed one at a time (from a prefetching host loader) and
    buffered per shape bucket; full chunks dispatch immediately as one fused
    async device program, so host decode/preprocess overlaps device compute
    and peak host memory is bounded by max_batch images per bucket — the
    reference loads one image at a time too (batch_size=1 loaders), never the
    whole dataset.
    """

    def __init__(self, model, scales=(1,), msp=1.0, whiten=None,
                 normalize_mean_std=None, compute_dtype=None,
                 bucket_multiple=BUCKET_MULTIPLE, max_batch=MAX_BATCH,
                 mesh=None, device_chain=None, dtype_guard=False,
                 pallas=None, cache=None):
        from ..ops import dtypes as dtype_policy

        self.model = model
        self._pallas = pallas
        self.scales = list(scales)
        self.msp = msp
        self.bucket_multiple = bucket_multiple
        self.mesh = mesh

        # runtime dtype guard: the first chunk runs in BOTH dtypes and bf16
        # must stay within a cosine tolerance of f32, else this (and every
        # later) run for the module falls back to f32
        self._guard_pending = False
        if compute_dtype is not None and dtype_guard:
            decision = dtype_policy.guard_decision(model.module)
            if decision is False:
                compute_dtype = None
            elif decision is None:
                self._guard_pending = True

        has_whiten = whiten is not None
        if has_whiten:
            self.P = jnp.asarray(whiten.P[:whiten.dimensions, :])
            self.m = jnp.asarray(whiten.m)
        else:
            self.P = self.m = jnp.zeros((0,), jnp.float32)

        self.device_chain = device_chain
        self.device_normalize = normalize_mean_std is not None
        if self.device_normalize:
            self.mean = jnp.asarray(normalize_mean_std[0], jnp.float32)
            self.std = jnp.asarray(normalize_mean_std[1], jnp.float32)
            self.host_dtype = np.uint8
        elif device_chain is not None:
            # full photometric chain on device: raw uint8 RGB ingress
            self.mean = self.std = jnp.zeros((0,), jnp.float32)
            self.host_dtype = np.uint8
        else:
            self.mean = self.std = jnp.zeros((0,), jnp.float32)
            self.host_dtype = np.float32

        self.region_pooling = \
            getattr(model.module, "pooling", None) == "rmac" \
            or getattr(model.module, "regional", False)
        self._has_whiten = has_whiten
        self._compute_dtype = compute_dtype
        # single-device runs collapse all per-chunk aux into one transfer
        # (the tunnel charges a fixed latency per put); the mesh path keeps
        # per-array puts so each can carry its batch sharding
        self._packed = mesh is None
        self.fused = _get_fused(model.module, self.scales, has_whiten,
                                self.device_normalize, compute_dtype,
                                chain=device_chain, packed=self._packed,
                                bucket_multiple=bucket_multiple,
                                pallas=pallas)

        self._f32_variables = model.variables
        variables = model.variables
        if compute_dtype is not None:
            # cast params once here (not per launch inside the program)
            variables = dtype_policy.cast_f32_tree(variables, compute_dtype)

        if mesh is not None:
            from .mesh import batch_sharding, replicated

            self.shard = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
            self.n_dev = mesh.devices.size
            self.max_batch = _round_up(max_batch, self.n_dev)
        else:
            self.shard = None
            self.variables = variables
            self.n_dev = 1
            self.max_batch = max_batch

        # device-resident uint8 image cache (mining re-ships the same
        # pixels every epoch): single-device uint8-ingress paths only —
        # cached entries are the exact padded host payloads, so a hit is
        # bit-identical to a fresh transfer (see parallel/device_cache.py)
        self.cache = cache if (cache is not None and mesh is None
                               and self.host_dtype == np.uint8) else None
        self._stack_fns = {}    # (n, shape) -> jitted stack
        self._zero_entries = {}  # (bucket, channels) -> device zeros
        self._last_channels = None  # set per cache chunk (uplink thread)

        self.buffers = collections.defaultdict(list)  # bucket -> [(idx, arr, key)]
        self.saw_full = set()  # buckets that compiled a full-size program
        self.results = []  # (indices, device array), synced in finish()
        self._uplink = None  # transfer/dispatch pipeline (_Uplink)
        # opt-in per-chunk uplink timing (saturation diagnosis):
        # [{batch_put_s, aux_pack_s, aux_put_s, launch_s, bytes, t_done}]
        # per dispatched chunk, plus a pass-level ``budget`` dict
        # (assembly_s, queue_wait_s, drain/sync timestamps) so a caller can
        # decompose a pass's wall time to ~100%
        self.stats = [] \
            if _os.environ.get("MDIR_TPU_UPLINK_STATS") else None
        self.budget = {} if self.stats is not None else None

    def _bucket(self, arr):
        return (_round_up(arr.shape[0], self.bucket_multiple),
                _round_up(arr.shape[1], self.bucket_multiple))

    def add(self, index, arr, key=None):
        arr = np.asarray(arr)
        bucket = self._bucket(arr)
        self.buffers[bucket].append(
            (index, arr, key if self.cache is not None else None))
        if len(self.buffers[bucket]) == self.max_batch:
            self._submit(bucket)

    def add_cached(self, index, key):
        """Enqueue a cache-resident image by id — no host pixels, no wire."""
        ih, iw = self.cache.shape(key)
        bucket = (_round_up(ih, self.bucket_multiple),
                  _round_up(iw, self.bucket_multiple))
        self.buffers[bucket].append((index, None, key))
        if len(self.buffers[bucket]) == self.max_batch:
            self._submit(bucket)

    def _submit(self, bucket):
        t0 = time.time() if self.budget is not None else 0.0
        if self.budget is not None and "t_first_submit" not in self.budget:
            self.budget["t_first_submit"] = t0
        items = self.buffers.pop(bucket)
        # pad to the full batch once a bucket has compiled at full size (or
        # will: more items may still come) to keep one program per bucket
        if bucket in self.saw_full or len(items) == self.max_batch:
            bsz = self.max_batch
            self.saw_full.add(bucket)
        else:
            bsz = _round_up(len(items), self.n_dev)
        in_bucket = bucket

        def item_hw(item):
            return item[1].shape[:2] if item[1] is not None \
                else self.cache.shape(item[2])

        shapes = [item_hw(it) for it in items]
        channels = items[0][1].shape[-1] if items[0][1] is not None \
            else self._cache_channels(items[0][2])

        valid = np.ones((bsz, 2), np.int32)
        for bi, hw in enumerate(shapes):
            valid[bi] = hw
        if self.cache is None:
            batch = np.zeros((bsz,) + in_bucket + (channels,),
                             self.host_dtype)
            for bi, (_, arr, _key) in enumerate(items):
                batch[bi, :arr.shape[0], :arr.shape[1]] = arr
        else:
            # per-image entries: misses ship individually (and enter the
            # cache), hits reference HBM; the batch is stacked ON DEVICE
            batch = []
            for (_, arr, key), hw in zip(items, shapes):
                if arr is None:
                    batch.append((None, key, hw))
                else:
                    padded = np.zeros(in_bucket + (channels,), np.uint8)
                    padded[:arr.shape[0], :arr.shape[1]] = arr
                    batch.append((padded, key, hw))
            while len(batch) < bsz:  # zero filler rows
                batch.append((None, None, in_bucket))

        grids = []
        for scale in self.scales:
            if scale == 1:
                grids.append(None)
                continue
            oh_b = _round_up(max(int(math.floor(in_bucket[0] * scale)), 1),
                             self.bucket_multiple)
            ow_b = _round_up(max(int(math.floor(in_bucket[1] * scale)), 1),
                             self.bucket_multiple)
            # packed (B, O, 3) f32 [idx0, idx1, weight] per axis: 2 transfers
            # per scale instead of 6 (indices < 2^24 are exact in f32)
            ypack = np.zeros((bsz, oh_b, 3), np.float32)
            xpack = np.zeros((bsz, ow_b, 3), np.float32)
            out_valid = np.zeros((bsz, 2), np.int32)
            for bi, (ih, iw) in enumerate(shapes):
                oh = int(math.floor(ih * scale))
                ow = int(math.floor(iw * scale))
                gy0, gy1, gwy = torch_resize_grid(ih, oh, scale)
                gx0, gx1, gwx = torch_resize_grid(iw, ow, scale)
                ypack[bi, :oh, 0], ypack[bi, :oh, 1], ypack[bi, :oh, 2] = \
                    gy0, gy1, gwy
                xpack[bi, :ow, 0], xpack[bi, :ow, 1], xpack[bi, :ow, 2] = \
                    gx0, gx1, gwx
                out_valid[bi] = (oh, ow)
            grids.append((ypack, xpack, out_valid))

        boxes = None
        if self.region_pooling:
            boxes = self._region_boxes(shapes, bsz, in_bucket)

        clahe_aux = None
        if self.device_chain is not None \
                and self.device_chain.clahe_params is not None:
            from ..ops.clahe import clahe_bucket_aux, pack_clahe_aux

            clip, grid = self.device_chain.clahe_params
            clahe_aux = pack_clahe_aux(clahe_bucket_aux(
                list(shapes) + [in_bucket] * (bsz - len(items)),
                in_bucket, clip_limit=clip, grid=grid))

        indices = [item[0] for item in items]
        if self.budget is not None:
            self.budget["assembly_s"] = \
                self.budget.get("assembly_s", 0.0) + (time.time() - t0)
        self._dispatch((indices, batch, valid, grids, clahe_aux, boxes))

    def _cache_channels(self, key):
        return self.cache.peek(key).shape[-1]

    def _zero_entry(self, bucket, channels):
        zkey = (bucket, channels)
        if zkey not in self._zero_entries:
            self._zero_entries[zkey] = jnp.asarray(
                np.zeros(bucket + (channels,), np.uint8))
        return self._zero_entries[zkey]

    def _stack(self, n, shape):
        skey = (n, shape)
        if skey not in self._stack_fns:
            self._stack_fns[skey] = jax.jit(lambda *xs: jnp.stack(xs))
        return self._stack_fns[skey]

    def _assemble_cached(self, batch):
        """Per-image device entries -> one stacked device batch.

        Misses were padded on host in _submit; each enters the cache (one
        small async put apiece — the wire only carries misses), hits and
        zero fillers reference HBM. Returns (device_batch, miss_bytes)."""
        devs = []
        miss_bytes = 0
        for arr, key, hw in batch:
            if arr is not None:
                miss_bytes += arr.nbytes
                dev = self.cache.put(key, arr, hw) if key is not None \
                    else jnp.asarray(arr)
            elif key is not None:
                dev, _ = self.cache.get(key)
            else:
                dev = self._zero_entry(tuple(hw), self._last_channels)
            devs.append(dev)
        return self._stack(len(devs), devs[0].shape)(*devs), miss_bytes

    def _transfer_and_launch(self, indices, batch, valid, grids, clahe_aux,
                             boxes):
        """Host->device transfers + one async program launch for a chunk."""
        if isinstance(batch, list):  # cache-assembled chunk
            real = next(b for b in batch if b[0] is not None or b[1])
            self._last_channels = real[0].shape[-1] if real[0] is not None \
                else self._cache_channels(real[1])
            entry = {} if self.stats is not None else None
            t0 = time.time() if entry is not None else 0.0
            dev_batch, miss_bytes = self._assemble_cached(batch)
            if entry is not None:
                entry["bytes"] = miss_bytes
            batch = dev_batch
        else:
            entry = {"bytes": batch.nbytes} if self.stats is not None else None
            t0 = time.time() if entry is not None else 0.0
        if self._packed:
            dev_batch = jnp.asarray(batch)
            t1 = time.time() if entry is not None else 0.0
            host_aux = _pack_host_aux(valid, grids, clahe_aux)
            t2 = time.time() if entry is not None else 0.0
            blob = jnp.asarray(host_aux)
            dev_boxes = None if boxes is None \
                else tuple(jnp.asarray(b) for b in boxes)
            call = (dev_batch, blob, dev_boxes)
            if entry is not None:
                t3 = time.time()
                # NOTE (probe-verified on axon): jnp.asarray returns after
                # the transport buffers the payload — put_s is dispatch (+
                # transport backpressure once its buffer fills), NOT wire
                # time; the wire drains asynchronously and shows up as the
                # pass's sync tail. aux_pack_s is host CPU packing, timed
                # apart from the put itself.
                entry.update({"batch_put_s": t1 - t0,
                              "aux_pack_s": t2 - t1,
                              "aux_put_s": t3 - t2})
        else:
            put = lambda a: jax.device_put(a, self.shard)
            dev_batch = put(batch)
            dev_valid = put(valid)
            dev_grids = tuple(None if g is None else tuple(put(a) for a in g)
                              for g in grids)
            dev_aux = None if clahe_aux is None \
                else tuple(put(a) for a in clahe_aux)
            dev_boxes = None if boxes is None else tuple(put(b) for b in boxes)
            call = (dev_batch, dev_valid, dev_grids, dev_aux, dev_boxes)
            if entry is not None:
                entry.update({"batch_put_s": time.time() - t0,
                              "aux_pack_s": 0.0, "aux_put_s": 0.0})

        t4 = time.time() if entry is not None else 0.0
        vecs = self.fused(self.variables, *call, jnp.float32(self.msp),
                          self.P, self.m, self.mean, self.std)
        if self._guard_pending:
            vecs = self._run_dtype_guard(vecs, call)
        if entry is not None:
            entry["launch_s"] = time.time() - t4
            entry["t_done"] = time.time()
            self.stats.append(entry)
        self.results.append((indices, vecs))  # async

    def _run_dtype_guard(self, fast_vecs, dev_args):
        """First-chunk f32 cross-check of the fast compute dtype.

        Runs the same chunk through the f32 program; if the fast
        descriptors drift beyond the cosine tolerance, this extractor (and
        every later one for the module, via the per-process decision
        cache) falls back to f32 — returning the f32 chunk so no fast-path
        output ever ships unvalidated.
        """
        from ..ops import dtypes as dtype_policy

        self._guard_pending = False
        f32_fused = _get_fused(self.model.module, self.scales,
                               self._has_whiten, self.device_normalize,
                               None, chain=self.device_chain,
                               packed=self._packed,
                               bucket_multiple=self.bucket_multiple,
                               pallas=self._pallas)
        f32_variables = self._f32_variables
        if self.mesh is not None:
            from .mesh import replicated

            f32_variables = jax.device_put(f32_variables,
                                           replicated(self.mesh))
        exact = f32_fused(f32_variables, *dev_args, jnp.float32(self.msp),
                          self.P, self.m, self.mean, self.std)
        ok = dtype_policy.cosine_rows_ok(np.asarray(fast_vecs),
                                         np.asarray(exact))
        dtype_policy.record_guard_decision(self.model.module, ok)
        if ok:
            return fast_vecs
        # fall back for the rest of this run
        self._compute_dtype = None
        self.fused = f32_fused
        self.variables = f32_variables
        return exact

    def _dispatch(self, payload):
        if self._uplink is None:
            self._uplink = _Uplink(self._transfer_and_launch,
                                   barrier_first=self._guard_pending,
                                   budget=self.budget)
        self._uplink.submit(payload)

    def _drain_uplink(self):
        if self._uplink is not None:
            self._uplink.drain()

    def _region_boxes(self, shapes, bsz, in_bucket):
        """Per-scale (B, R, 4) RMAC/Rpool region grids over each image's
        valid *feature* extent (host replay of the trunk arithmetic). R is
        rounded up to a multiple of 8 to bound the compiled-program count;
        zero-size boxes are padding."""
        from ..models.trunks import trunk_valid_extent
        from ..ops.pooling import rmac_region_boxes

        arch = self.model.module.architecture
        out = []
        for scale in self.scales:
            per_img = []
            for bi in range(bsz):
                ih, iw = shapes[bi] if bi < len(shapes) else in_bucket
                if scale != 1:
                    ih = max(int(math.floor(ih * scale)), 1)
                    iw = max(int(math.floor(iw * scale)), 1)
                fh, fw = trunk_valid_extent(arch, (ih, iw))
                per_img.append(rmac_region_boxes(max(fh, 1), max(fw, 1)))
            r_cap = _round_up(max(len(b) for b in per_img), 8)
            arr = np.zeros((bsz, r_cap, 4), np.int32)
            for bi, blist in enumerate(per_img):
                arr[bi, :len(blist)] = blist
            out.append(arr)
        return out

    def finish(self, n):
        """Flush partial buffers; sync; return the (D, N) descriptor matrix."""
        for bucket in list(self.buffers.keys()):
            self._submit(bucket)
        t0 = time.time() if self.budget is not None else 0.0
        self._drain_uplink()
        if self.budget is not None:
            self.budget["t_drain_start"] = t0
            self.budget["drain_s"] = time.time() - t0
        assert self.results, "no images were added"
        dim = self.results[0][1].shape[1]
        out = np.zeros((n, dim), np.float32)
        t1 = time.time() if self.budget is not None else 0.0
        for indices, vecs in self.results:
            host = np.asarray(vecs)  # the only sync points
            for bi, i in enumerate(indices):
                out[i] = host[bi]
        if self.budget is not None:
            # the sync tail: with async puts (probe-verified) the wire and
            # device compute drain HERE — a transfer-bound pass shows most
            # of its wall time as drain_s + sync_s, not as put time
            self.budget["sync_s"] = time.time() - t1
            self.budget["t_end"] = time.time()
        self.results = []
        return out.T  # (D, N)


def extract_vectors_batched(model, arrays, scales=(1,), msp=1.0, whiten=None,
                            bucket_multiple=BUCKET_MULTIPLE, max_batch=MAX_BATCH,
                            max_side=None, normalize_mean_std=None,
                            compute_dtype=None, mesh=None, dtype_guard=False):
    """Multi-scale descriptors for a list of HWC arrays. Returns (D, N).

    Equivalent to the reference per-image loop: per scale s, each image is
    bilinearly resized (exact torch grid), descriptors are GeM/...-pooled with
    valid-extent masking, aggregated as (mean over scales of v^msp)^(1/msp),
    L2-normalized, then optionally whitened (P(x-m), L2). All scales fuse
    into one compiled program per shape bucket; chunks dispatch
    asynchronously with a single host sync at the end.
    """
    extractor = StreamingExtractor(
        model, scales=scales, msp=msp, whiten=whiten,
        normalize_mean_std=normalize_mean_std, compute_dtype=compute_dtype,
        bucket_multiple=bucket_multiple, max_batch=max_batch, mesh=mesh,
        dtype_guard=dtype_guard)
    for i, arr in enumerate(arrays):
        extractor.add(i, arr)
    return extractor.finish(len(arrays))


def _plain_normalize_chain(transform):
    """Detect a pil2np|totensor|normalize-only chain: the host output is then
    uint8-quantized pixels normalized per channel, so pixels can ship as raw
    uint8 with the normalize fused on device (bit-equal, 4x less transfer)."""
    ts = getattr(transform, "transforms", None)
    if ts is None:
        return None
    from ..data import transforms as T

    allowed = (T.Pil2Numpy, T.ToTensor)
    if not ts or not isinstance(ts[-1], T.Normalize):
        return None
    if not all(isinstance(t, allowed) for t in ts[:-1]):
        return None
    norm = ts[-1]
    if not norm.params["strict_shape"]:
        return None
    return norm.params["mean"], norm.params["std"]


def _stream_images(images, image_size, transform, bbxs=None, workers=6):
    """Iterator of transformed HWC arrays (threaded decode, bounded window)."""
    dataset = ImagesFromList(root="", images=images, imsize=image_size,
                             bbxs=bbxs, transform=transform)
    return iter(DataLoader(dataset, batch_size=1, num_workers=workers,
                           collate_fn=lambda items: items[0]))


def _stream_images_uint8(images, image_size, bbxs=None, workers=6, chain=None):
    """Iterator of raw uint8 HWC pixels (decode + crop + thumbnail only;
    plus the host L plane when a device chain ships it)."""

    class _U8(ImagesFromList):
        def __getitem__(self, index):
            img = ImagesFromList.__getitem__(self, index)
            raw = np.asarray(img.convert("RGB"), dtype=np.uint8)
            return raw if chain is None else chain.host_input(raw)

    dataset = _U8(root="", images=images, imsize=image_size, bbxs=bbxs,
                  transform=None)
    return iter(DataLoader(dataset, batch_size=1, num_workers=workers,
                           collate_fn=lambda items: items[0]))


def _feed_uint8(extractor, images, image_size, bbxs=None, chain=None,
                cache=None):
    """Stream uint8 payloads into the extractor, consulting the device
    cache BEFORE host decode: hits skip PIL entirely (their pixels already
    sit in HBM), misses stream through the threaded loader and enter the
    cache keyed by path@size."""
    if cache is None or bbxs is not None:
        for i, arr in enumerate(_stream_images_uint8(images, image_size,
                                                     bbxs, chain=chain)):
            extractor.add(i, arr)
        return
    keys = ["%s@%s" % (path, image_size) for path in images]
    miss = []
    for i, key in enumerate(keys):
        if cache.matches(key, extractor.bucket_multiple):
            extractor.add_cached(i, key)
        else:
            miss.append(i)
    loader = _stream_images_uint8([images[i] for i in miss], image_size,
                                  chain=chain) if miss else ()
    for i, arr in zip(miss, loader):
        extractor.add(i, arr, key=keys[i])


def extract_vectors_network(network, images, image_size, transform, bbxs=None,
                            batch_size=MAX_BATCH, mesh=None, cache=None):
    """Extract (D, N) descriptors for image paths through ``network``.

    Uses the fused bucketed TPU path when the network's eval wrappers are the
    standard whiten/multiscale pattern; otherwise falls back to the exact
    per-image wrapper loop. Plain pil2np|totensor|normalize chains ship raw
    uint8 pixels and normalize on device. MDIR_TPU_COMPUTE_DTYPE=bfloat16
    opts extraction into bf16 trunk compute. ``mesh`` batch-shards each
    chunk across a device mesh (DP extraction, SURVEY §2.12) — reachable
    from the validate-stage yaml via the score's ``parallel: {data: N}``;
    honored on the single-net fused path AND the 2-net composed path (the
    per-image wrapper fallback runs single-device).
    """
    import os

    network.eval()

    analyzed = _analyze_wrappers(network) if hasattr(network, "wrappers") else None

    # 2-net compositions (translator -> embedder): fused bucketed path
    if analyzed is not None and _composable_sequential(network):
        return extract_vectors_composed(network, images, image_size,
                                        transform, bbxs=bbxs,
                                        max_batch=batch_size, mesh=mesh)

    model = network.model
    if analyzed is not None and getattr(model, "is_descriptor_model", False) \
            and not _is_sequential(network) \
            and model.meta["pooling"] in ("gem", "mac", "spoc", "rmac"):
        scales, whiten = analyzed
        msp = 1.0
        if len(scales) > 1 and model.meta["pooling"] == "gem" \
                and not model.meta["regional"] and not model.meta["whitening"]:
            msp = float(model.pool_p)
        # bf16 trunk compute is the accelerator default, validated by a
        # first-chunk f32 cross-check; yaml reaches it via the network
        # runtime section (runtime: compute_dtype: ...)
        from ..ops.dtypes import resolve_compute_dtype

        runtime_params = getattr(network, "network_params", None)
        runtime = runtime_params.runtime if runtime_params is not None else {}
        compute_dtype, dtype_guard = resolve_compute_dtype(runtime)
        # Pallas pooling is yaml-reachable too (runtime: pallas: true);
        # MDIR_TPU_PALLAS, when set, is forced either way
        pallas = runtime.get("pallas")

        mean_std = _plain_normalize_chain(transform)
        chain = None
        if mean_std is None \
                and os.environ.get("MDIR_TPU_DEVICE_PREPROCESS", "1") != "0":
            from ..ops.preprocess import chain_from_transform

            chain = chain_from_transform(transform)
        if mean_std is not None and len(mean_std[0]) == 3:
            extractor = StreamingExtractor(
                model, scales=scales, msp=msp, whiten=whiten,
                max_batch=batch_size, normalize_mean_std=mean_std,
                compute_dtype=compute_dtype, dtype_guard=dtype_guard,
                pallas=pallas, mesh=mesh, cache=cache)
            _feed_uint8(extractor, images, image_size, bbxs,
                        cache=extractor.cache)
        elif chain is not None:
            # photometric chain (CLAHE etc.) fused on device, uint8 ingress
            extractor = StreamingExtractor(
                model, scales=scales, msp=msp, whiten=whiten,
                max_batch=batch_size, compute_dtype=compute_dtype,
                device_chain=chain, dtype_guard=dtype_guard, pallas=pallas,
                mesh=mesh, cache=cache)
            _feed_uint8(extractor, images, image_size, bbxs, chain=chain,
                        cache=extractor.cache)
        else:
            extractor = StreamingExtractor(
                model, scales=scales, msp=msp, whiten=whiten,
                max_batch=batch_size, compute_dtype=compute_dtype,
                dtype_guard=dtype_guard, pallas=pallas, mesh=mesh)
            # stream: host decode threads run ahead of async device chunks
            for i, arr in enumerate(
                    _stream_images(images, image_size, transform, bbxs)):
                extractor.add(i, arr)
        return extractor.finish(len(images))
    arrays = _load_images(images, image_size, transform, bbxs)

    # exact fallback: per-image wrapper path
    dim = network.meta["out_channels"]
    vecs = np.zeros((dim, len(arrays)))
    for i, arr in enumerate(arrays):
        out = network(arr)
        vecs[:, i] = np.asarray(out).reshape(-1)
    return vecs


def _is_sequential(network):
    from ..learning.network import SequentialNetwork

    return isinstance(network, SequentialNetwork)


# ---------------------------------------------------------------------------
# Composed (translator -> embedder) extraction
# ---------------------------------------------------------------------------

def _identity_grid(n):
    idx = np.arange(n, dtype=np.int32)
    return idx, idx, np.zeros(n, np.float32)


def _composed_fused_fn(translator, embedder, device_normalize,
                       compute_dtype=None, pallas=False):
    """One program per (raw-bucket, per-scale padded-shapes): the raw batch
    normalizes ONCE on device, then EVERY scale runs inside the same program
    — exact scale-resize + replicate-pad (one composed gather), batched
    translator forward, un-pad shift, masked embedder — returning stacked
    (S, B, D) per-scale descriptors**msp. Replicates the reference
    composition exactly: multiscale resize of the raw input, the
    translator's reflectpad-to-divisible wrapper (replicate + centered
    crop), then the embedder at the native scaled size (zero conv padding
    == masked bucket). Fusing the scales means the link carries the raw
    uint8 batch once instead of once per scale (3x fewer bytes on the
    link-bound e2e path) and one dispatch per chunk instead of S.

    ``compute_dtype='bfloat16'`` runs translator + embedder on the MXU's
    native dtype (pre-cast variable trees, bf16 activations; descriptors
    promote back to f32 at the msp power) — guarded by the same first-chunk
    f32 cross-check as the single-net path.
    """
    from ..models import _accepts_train
    from ..models.trunks import apply_valid_mask

    t_module = translator.module
    e_module = embedder.module
    if pallas and getattr(e_module, "pooling", None) == "gem" \
            and hasattr(e_module, "pallas_pool"):
        e_module = e_module.clone(pallas_pool=True)
    t_takes_train = _accepts_train(t_module)

    def one_scale(t_vars, e_vars, batch, valid_scaled, ypack, xpack, msp,
                  crop_hw=None):
        # packed (B, P, 4) f32 per axis: [idx0, idx1, weight, unpad-shift]
        y0 = ypack[..., 0].astype(jnp.int32)
        y1 = ypack[..., 1].astype(jnp.int32)
        wy = ypack[..., 2]
        x0 = xpack[..., 0].astype(jnp.int32)
        x1 = xpack[..., 1].astype(jnp.int32)
        wx = xpack[..., 2]
        # scaled + replicate-padded translator input, one gather
        xpad = jax.vmap(_resize_one)(batch, y0, y1, wy, x0, x1, wx)
        # cast AFTER the f32-exact resize: the f32 interp weights would
        # promote a pre-cast batch back to f32, and the U-Net's raw
        # lax.conv_transpose then hard-errors on f32 input x bf16 kernel
        # (observed on chip; flax convs only silently de-optimize)
        if compute_dtype is not None:
            xpad = xpad.astype(compute_dtype)
        if t_takes_train:
            t_out = t_module.apply(t_vars, xpad, train=False)
        else:
            t_out = t_module.apply(t_vars, xpad)
        # un-pad: shift the translated crop to the origin. The embedder only
        # needs the bucket's max scaled extent (64-aligned), not the
        # translator's 256-aligned pad — its valid-extent masking makes any
        # covering shape exact (the bucketing invariant), so the unpad
        # gather emits the smaller static crop and the VGG/trunk tail skips
        # the dead pad rows (~10% of composed flops at the 0.707 scale,
        # docs/MFU.md §5)
        ys = ypack[..., 3].astype(jnp.int32)
        xs = xpack[..., 3].astype(jnp.int32)
        if crop_hw is not None:
            ys = ys[:, :crop_hw[0]]
            xs = xs[:, :crop_hw[1]]
        # zero weights (a pure gather) in t_out's dtype so a bf16 translator
        # output stays bf16 into the embedder
        zero_y = jnp.zeros(ys.shape, t_out.dtype)
        zero_x = jnp.zeros(xs.shape, t_out.dtype)
        t0 = jax.vmap(_resize_one)(t_out, ys, ys, zero_y, xs, xs, zero_x)
        t0 = apply_valid_mask(t0, valid_scaled)
        if compute_dtype is not None:
            t0 = t0.astype(compute_dtype)
        vecs = e_module.apply(e_vars, t0, valid_hw=valid_scaled)  # (B, D)
        return vecs.astype(jnp.float32) ** msp

    def fn(t_vars, e_vars, batch, packs, mean, std, msp, crop_hws=None):
        if device_normalize:
            batch = batch.astype(jnp.float32) / 255.0
            batch = (batch - mean) / std
        # packs: per-scale (valid_scaled, ypack, xpack) — static shapes
        # differ per scale, so this is a python loop over S branches of one
        # compiled program, not a lax.scan. crop_hws (static) carries each
        # scale's 64-aligned embedder crop, None for no cropping.
        crops = crop_hws or (None,) * len(packs)
        return jnp.stack([
            one_scale(t_vars, e_vars, batch, valid_scaled, ypack, xpack,
                      msp, crop_hw)
            for (valid_scaled, ypack, xpack), crop_hw
            in zip(packs, crops)])  # (S, B, D)

    return jax.jit(fn, static_argnums=(7,))


def composed_pack_grids(rh, rw, scale, divisor, ph, pw):
    """One image's packed resize+pad transfer rows for the composed program.

    Returns ``(ypack_row (ph, 4) f32, xpack_row (pw, 4) f32, (sh, sw))``:
    per axis ``[idx0, idx1, weight, unpad-shift]`` — the exact scale-resize
    grid (torch floor arithmetic) composed with the reference
    ReflectPadMakeDivisible centered pad (floor top/left). The SINGLE source
    of the composed transfer geometry: production ``submit()`` and bench.py's
    resident composed pass both consume it, so the bench can never drift
    from the program production runs."""
    sh = int(math.floor(rh * scale)) if scale != 1 else rh
    sw = int(math.floor(rw * scale)) if scale != 1 else rw
    top = int(np.floor(((-(-sh // divisor) * divisor) - sh) / 2.0))
    left = int(np.floor(((-(-sw // divisor) * divisor) - sw) / 2.0))

    if scale == 1:
        gy0, gy1, gwy = _identity_grid(sh)
        gx0, gx1, gwx = _identity_grid(sw)
    else:
        gy0, gy1, gwy = torch_resize_grid(rh, sh, scale)
        gx0, gx1, gwx = torch_resize_grid(rw, sw, scale)

    ypack = np.zeros((ph, 4), np.float32)
    xpack = np.zeros((pw, 4), np.float32)
    sy = np.clip(np.arange(ph) - top, 0, sh - 1)
    sx = np.clip(np.arange(pw) - left, 0, sw - 1)
    ypack[:, 0], ypack[:, 1], ypack[:, 2] = gy0[sy], gy1[sy], gwy[sy]
    xpack[:, 0], xpack[:, 1], xpack[:, 2] = gx0[sx], gx1[sx], gwx[sx]
    ypack[:, 3] = np.clip(np.arange(ph) + top, 0, ph - 1)
    xpack[:, 3] = np.clip(np.arange(pw) + left, 0, pw - 1)
    return ypack, xpack, (sh, sw)


def composed_crop_hws(raw_bucket, pads, scales, granularity=64):
    """Static embedder crops for one composed chunk key.

    Per scale: the chunk's max scaled extent (from the raw bucket shape,
    the grouping key's upper bound on every image's raw extent) rounded up
    to ``granularity`` and clipped to the translator pad. 64 keeps the
    number of distinct embedder program shapes small (each new shape costs
    an axon compile) while recovering most of the 256-pad waste; the
    masked embedder makes any covering crop exact. Returns a hashable
    tuple — it rides ``_composed_fused_fn``'s static argnum.
    """
    rb_h, rb_w = raw_bucket
    out = []
    for scale, (ph, pw) in zip(scales, pads):
        sh = int(math.floor(rb_h * scale)) if scale != 1 else rb_h
        sw = int(math.floor(rb_w * scale)) if scale != 1 else rb_w
        ch = min(ph, _round_up(max(sh, 1), granularity))
        cw = min(pw, _round_up(max(sw, 1), granularity))
        out.append((ch, cw))
    return tuple(out)


#: compiled composed programs keyed by the module ids; entries evict when
#: either module is garbage-collected (weakref.finalize) so a recycled
#: object address can never inherit a program closing over the WRONG module
#: structure — the same recycled-id hazard fixed for _GUARD_DECISIONS
_COMPOSED_CACHE = {}


def _get_composed(translator, embedder, device_normalize, compute_dtype=None,
                  pallas=None):
    import weakref

    use_pallas = _resolve_pallas(pallas)
    key = (id(translator.module), id(embedder.module), device_normalize,
           str(compute_dtype), use_pallas)
    if key not in _COMPOSED_CACHE:
        _COMPOSED_CACHE[key] = _composed_fused_fn(
            translator, embedder, device_normalize,
            compute_dtype=compute_dtype, pallas=use_pallas)
        for module in (translator.module, embedder.module):
            try:
                weakref.finalize(module, _COMPOSED_CACHE.pop, key, None)
            except TypeError:
                pass  # un-weakref-able module type: entry persists
    return _COMPOSED_CACHE[key]


def extract_vectors_composed(network, images, image_size, transform, bbxs=None,
                             max_batch=MAX_BATCH,
                             bucket_multiple=BUCKET_MULTIPLE,
                             instrument=None, mesh=None):
    """Bucketed exact extraction for a 2-net SequentialNetwork composition.

    ``images`` is a list of paths, or (for callers that already hold decoded
    pixels, e.g. bench.py's composed e2e pass) raw uint8 HWC arrays — the
    array form requires the device-normalize chain (plain
    pil2np|totensor|normalize), the same contract as StreamingExtractor.
    ``instrument``, when a dict, receives the same per-chunk ``stats`` and
    pass-level ``budget`` fields StreamingExtractor collects under
    MDIR_TPU_UPLINK_STATS, so a caller can decompose a composed pass's wall
    time exactly like the single-net passes.
    ``mesh`` batch-shards every chunk across a device mesh (DP extraction
    over both nets, params replicated), the same scale-out scheme as the
    single-net path — reachable from the validate-stage yaml's
    ``parallel: {data: N}`` through extract_vectors_network.
    """
    from ..learning.wrappers import ReflectPadMakeDivisible

    stats = [] if instrument is not None else None
    budget = {} if instrument is not None else None
    if instrument is not None:
        instrument["stats"] = stats
        instrument["budget"] = budget

    first_name, last_name = network.sequence
    first = network.networks[first_name]
    last = network.networks[last_name]

    # translator pad-divisor from its own eval wrappers
    twraps = first.wrappers["eval"].wrappers
    divisor = 1
    if len(twraps) == 1 and isinstance(twraps[0], ReflectPadMakeDivisible):
        divisor = twraps[0].divisible_by

    scales, whiten = _analyze_wrappers(network)
    model = last.model
    msp = 1.0
    if len(scales) > 1 and model.meta["pooling"] == "gem" \
            and not model.meta["regional"] and not model.meta["whitening"]:
        msp = float(model.pool_p)

    mean_std = _plain_normalize_chain(transform)
    device_normalize = mean_std is not None and len(mean_std[0]) == 3
    preloaded = len(images) > 0 and isinstance(images[0], np.ndarray)
    if device_normalize:
        loader = iter(images) if preloaded \
            else _stream_images_uint8(images, image_size, bbxs)
        mean = jnp.asarray(mean_std[0], jnp.float32)
        std = jnp.asarray(mean_std[1], jnp.float32)
        host_dtype = np.uint8
    else:
        if preloaded:
            raise ValueError("array inputs require a plain "
                             "pil2np|totensor|normalize transform chain")
        loader = _stream_images(images, image_size, transform, bbxs)
        mean = std = jnp.zeros((0,), jnp.float32)
        host_dtype = np.float32

    # bf16 compute for the composition rides the tail's runtime policy
    # (yaml: the embedder subnet's runtime compute_dtype, or auto on
    # accelerators) with the same first-chunk f32 cross-check and fallback
    # as the single-net path; the verdict caches per embedder module under
    # its own kind so it never aliases the single-path decision
    from ..ops import dtypes as dtype_policy

    runtime = last.network_params.runtime \
        if getattr(last, "network_params", None) is not None else {}
    compute_dtype, dtype_guard = dtype_policy.resolve_compute_dtype(runtime)
    pallas = runtime.get("pallas")
    guard_pending = False
    if compute_dtype is not None and dtype_guard:
        decision = dtype_policy.guard_decision(model.module, kind="composed")
        if decision is False:
            compute_dtype = None
        elif decision is None:
            guard_pending = True

    t_vars_f32 = first.model.variables
    e_vars_f32 = last.model.variables

    def _cast_tree(tree):
        return dtype_policy.cast_f32_tree(tree, compute_dtype)

    state = {
        "fused": _get_composed(first.model, last.model, device_normalize,
                               compute_dtype, pallas=pallas),
        "t_vars": _cast_tree(t_vars_f32) if compute_dtype else t_vars_f32,
        "e_vars": _cast_tree(e_vars_f32) if compute_dtype else e_vars_f32,
        "guard_pending": guard_pending,
    }

    if mesh is not None:
        from .mesh import batch_sharding, replicated

        shard = batch_sharding(mesh)
        n_dev = mesh.devices.size
        max_batch = _round_up(max_batch, n_dev)
        state["t_vars"] = jax.device_put(state["t_vars"], replicated(mesh))
        state["e_vars"] = jax.device_put(state["e_vars"], replicated(mesh))
        t_vars_f32 = jax.device_put(t_vars_f32, replicated(mesh))
        e_vars_f32 = jax.device_put(e_vars_f32, replicated(mesh))
    else:
        shard = None
        n_dev = 1

    def padded_shape(sh, sw):
        ph = -(-sh // divisor) * divisor
        pw = -(-sw // divisor) * divisor
        return ph, pw

    n = len(images)
    dim = model.meta["out_channels"]
    acc = np.zeros((n, dim), np.float64)
    buffers = collections.defaultdict(list)
    results = []

    def launch(indices, batch, packs, crop_hws):
        put = jnp.asarray if shard is None \
            else (lambda a: jax.device_put(a, shard))
        entry = {"bytes": batch.nbytes} if stats is not None else None
        t0 = time.time() if entry is not None else 0.0
        dev_batch = put(batch)
        t1 = time.time() if entry is not None else 0.0
        dev_packs = tuple((put(valid), put(ypack), put(xpack))
                          for valid, ypack, xpack in packs)
        args = (dev_batch, dev_packs, mean, std, jnp.float32(msp),
                crop_hws)
        if entry is not None:
            # same async-put semantics as StreamingExtractor: put_s is
            # dispatch time, the wire drains in the pass's sync tail
            entry.update({"batch_put_s": t1 - t0, "aux_pack_s": 0.0,
                          "aux_put_s": time.time() - t1})
        t4 = time.time() if entry is not None else 0.0
        vecs = state["fused"](state["t_vars"], state["e_vars"], *args)
        if state["guard_pending"]:
            # first-chunk f32 cross-check (the uplink launches the first
            # payload synchronously via barrier_first, so every later
            # chunk — on any stream — sees the verdict)
            state["guard_pending"] = False
            f32_fused = _get_composed(first.model, last.model,
                                      device_normalize, None, pallas=pallas)
            exact = f32_fused(t_vars_f32, e_vars_f32, *args)
            # cosine_rows_ok reduces along the last axis, so the stacked
            # (S, B, D) outputs compare directly
            ok = dtype_policy.cosine_rows_ok(np.asarray(vecs),
                                             np.asarray(exact))
            dtype_policy.record_guard_decision(model.module, ok,
                                               kind="composed")
            if not ok:
                state["fused"], state["t_vars"], state["e_vars"] = \
                    f32_fused, t_vars_f32, e_vars_f32
                vecs = exact
        if entry is not None:
            entry["launch_s"] = time.time() - t4
            entry["t_done"] = time.time()
            stats.append(entry)
        results.append((indices, vecs))

    uplink = _Uplink(launch, barrier_first=guard_pending, budget=budget)

    def submit(key, items):
        t_sub = time.time() if budget is not None else 0.0
        if budget is not None and "t_first_submit" not in budget:
            budget["t_first_submit"] = t_sub
        (rh_b, rw_b), pads = key
        # pad to the device count so every chunk batch-shards evenly;
        # padding rows carry (1, 1) valid extents and are never read back
        bsz = _round_up(len(items), n_dev)
        channels = items[0][1].shape[-1]
        batch = np.zeros((bsz, rh_b, rw_b, channels), host_dtype)
        packs = []
        for scale, (ph, pw) in zip(scales, pads):
            valid = np.ones((bsz, 2), np.int32)
            # packed per-axis transfer: [idx0, idx1, weight, unpad-shift]
            ypack = np.zeros((bsz, ph, 4), np.float32)
            xpack = np.zeros((bsz, pw, 4), np.float32)
            for bi, (idx, arr) in enumerate(items):
                ypack[bi], xpack[bi], valid[bi] = composed_pack_grids(
                    arr.shape[0], arr.shape[1], scale, divisor, ph, pw)
            packs.append((valid, ypack, xpack))
        for bi, (idx, arr) in enumerate(items):
            batch[bi, :arr.shape[0], :arr.shape[1]] = arr

        if budget is not None:
            budget["assembly_s"] = \
                budget.get("assembly_s", 0.0) + (time.time() - t_sub)
        crop_hws = composed_crop_hws((rh_b, rw_b), pads, scales)
        uplink.submit(([i for i, _ in items], batch, tuple(packs),
                       crop_hws))

    # chunks group by (raw bucket, EVERY scale's padded shape): the raw
    # batch ships once and all scales run in one program — with the coarse
    # (divisor-multiple) pads, images in the same raw bucket almost always
    # share all padded shapes, so the grouping rarely splits a bucket
    for i, arr in enumerate(loader):
        arr = np.asarray(arr)
        rh, rw = arr.shape[:2]
        rb = (_round_up(rh, bucket_multiple), _round_up(rw, bucket_multiple))
        pads = tuple(
            padded_shape(int(math.floor(rh * s)) if s != 1 else rh,
                         int(math.floor(rw * s)) if s != 1 else rw)
            for s in scales)
        key = (rb, pads)
        buffers[key].append((i, arr))
        if len(buffers[key]) == max_batch:
            submit(key, buffers.pop(key))
    for key in list(buffers.keys()):
        submit(key, buffers.pop(key))
    t_drain = time.time() if budget is not None else 0.0
    uplink.drain()
    if budget is not None:
        budget["t_drain_start"] = t_drain
        budget["drain_s"] = time.time() - t_drain

    t_sync = time.time() if budget is not None else 0.0
    for indices, vecs in results:
        host = np.asarray(vecs, np.float64)  # (S, B, D)
        for bi, i in enumerate(indices):
            acc[i] += host[:, bi].sum(axis=0)
    if budget is not None:
        budget["sync_s"] = time.time() - t_sync
        budget["t_end"] = time.time()

    acc = (acc / len(scales)) ** (1.0 / msp)
    acc = acc / np.linalg.norm(acc, axis=1, keepdims=True)
    vecs_out = acc.T
    if whiten is not None:
        vecs_out = np.asarray(whiten.postprocess(
            jnp.asarray(vecs_out, jnp.float32), None, None))
    return vecs_out


def _composable_sequential(network):
    """True when the SequentialNetwork fits the fused composed path."""
    from ..learning.network import SequentialNetwork, SingleNetwork
    from ..learning.wrappers import ReflectPadMakeDivisible

    if not isinstance(network, SequentialNetwork) or len(network.sequence) != 2:
        return False
    first = network.networks[network.sequence[0]]
    last = network.networks[network.sequence[1]]
    if not isinstance(first, SingleNetwork):
        return False
    twraps = first.wrappers["eval"].wrappers
    if twraps and not (len(twraps) == 1
                       and isinstance(twraps[0], ReflectPadMakeDivisible)):
        return False
    model = last.model
    return getattr(model, "is_descriptor_model", False) \
        and model.meta["pooling"] in ("gem", "mac", "spoc") \
        and not model.meta["regional"]


def extract_regional_vectors(network, images, image_size, transform, bbxs=None):
    """Per-image regional descriptors (cirtorch extract_regional_vectors /
    extract_ssr): roipool region vectors, L2-normalized + regionally whitened,
    not aggregated. Returns a list of (R, D) arrays."""
    from ..ops import pooling as pool_ops

    network.eval()
    model = network.model
    variables = model.variables
    module = model.module

    acc = []
    for arr in _stream_images(images, image_size, transform, bbxs):
        x = jnp.asarray(np.asarray(arr))[None]
        feats, _ = _apply_features(module, variables, x)
        p = float(model.pool_p) if model.meta["pooling"] == "gem" else None
        if p is not None:
            region_fn = lambda r: pool_ops.gem(r, p=p)
        elif model.meta["pooling"] == "mac":
            region_fn = pool_ops.mac
        else:
            region_fn = pool_ops.spoc
        vecs = pool_ops.roipool(feats, region_fn)[0]  # (R, D)
        vecs = pool_ops.l2n(vecs)
        acc.append(np.asarray(vecs))
    return acc


def extract_local_vectors(network, images, image_size, transform, bbxs=None):
    """Per-image local (spatial) descriptors (cirtorch extract_local_vectors /
    extract_ssl): channel-L2-normalized feature cells, (D, H*W) per image."""
    from ..ops import pooling as pool_ops

    network.eval()
    model = network.model
    module = model.module
    variables = model.variables

    acc = []
    for arr in _stream_images(images, image_size, transform, bbxs):
        x = jnp.asarray(np.asarray(arr))[None]
        feats, _ = _apply_features(module, variables, x)  # (1, H, W, D)
        normed = pool_ops.l2n(feats, axis=-1)[0]
        acc.append(np.asarray(normed.reshape(-1, normed.shape[-1]).T))
    return acc


def _apply_features(module, variables, x):
    """Run just the trunk of an ImageRetrievalNet module."""
    from ..models.trunks import make_trunk

    trunk = make_trunk(module.architecture, module.frozen_bn)
    trunk_vars = {"params": variables["params"]["features"]}
    if "batch_stats" in variables and "features" in variables.get(
            "batch_stats", {}):
        trunk_vars["batch_stats"] = variables["batch_stats"]["features"]
    return trunk.apply(trunk_vars, x)
