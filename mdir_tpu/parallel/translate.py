"""Streaming batched image->image inference (bulk dataset translation).

The reference's infer stage runs the translation workload one image per
program call (``mdir/stages/infer.py:46-53`` over a batch_size=1 loader) —
on this backend a dispatch costs seconds and the host->device link is
20-60 MB/s, so that shape is pathological. This module is the TPU-first
redesign of that hot loop:

* images are padded per image EXACTLY as ``ReflectPadMakeDivisible`` would
  (centered edge pad to the network divisor) and grouped by padded shape;
* each full shape group runs as ONE jitted batched program — eval-mode convs
  have no cross-batch coupling, so per-image results are element-identical
  to the bs=1 wrapper path;
* for plain ``pil2np|totensor|normalize`` chains the host ships raw uint8
  (4x less wire traffic) and normalization runs fused on device, with the
  identical op order as the host transform (/255, -mean, /std);
* device work is depth-2 pipelined: batch k is launched (puts are async on
  this transport) while batch k-1's results are read back, keeping wire,
  device, and the host PNG encoder busy simultaneously.

Results are delivered to an index-keyed sink (``output.add``), so the
DataOutput lifecycle (append resume, async write-behind) is untouched.
"""
import collections

import numpy as np

import jax
import jax.numpy as jnp

from ..learning.wrappers import ReflectPadMakeDivisible


def host_u8_image(out_f32, mean_np, std_np):
    """The host denormalize->uint8 conversion (imgtools._tensor_to_image's
    plain branch), op for op — the reference both sides of the device-u8
    guard must match bit-for-bit."""
    out = out_f32 * std_np + mean_np
    return np.clip(out * 255, 0, 255).astype(np.uint8)


def _translator_divisor(network):
    """Divisor when the eval wrappers are batchable, else None.

    Batchable = no wrappers, or exactly one ReflectPadMakeDivisible (its
    pre/post is per-image shape bookkeeping that this module replicates;
    two stacked pads are NOT one pad to the product, so more than one falls
    back); anything else falls back to the exact per-image path.
    """
    compose = getattr(network, "wrappers", None)
    if compose is None or not hasattr(network, "_jitted_apply"):
        return None
    wrappers = compose["eval"].wrappers
    if not wrappers:
        return 1
    if len(wrappers) == 1 and isinstance(wrappers[0], ReflectPadMakeDivisible):
        return wrappers[0].divisible_by
    return None


def _centered_pad(hw, divisor):
    """ReflectPadMakeDivisible's geometry: (left, right, top, bottom)."""
    size = np.array(hw)
    padh, padw = (np.ceil(size / divisor) * divisor - size) / 2
    return (int(np.floor(padw)), int(np.ceil(padw)),
            int(np.floor(padh)), int(np.ceil(padh)))


class StreamingTranslator:
    """Batch same-padded-shape images through one jitted program per shape.

    ``add(index, array)`` takes HWC inputs — float32 when ``mean_std`` is
    None (already transformed on host), uint8 otherwise (normalize fuses on
    device). Results flow to ``sink(index, input_1hwc, output_1hwc)`` in
    completion order; call ``finish()`` to flush.
    """

    def __init__(self, network, sink, mean_std=None, max_batch=4, depth=2,
                 device_u8=False):
        self.divisor = _translator_divisor(network)
        assert self.divisor is not None, "network wrappers are not batchable"
        self.apply = network._jitted_apply()
        self.variables = network.model.variables
        self.sink = sink
        self.mean_std = mean_std
        if mean_std is not None:
            self._mean = jnp.asarray(mean_std[0], jnp.float32)
            self._std = jnp.asarray(mean_std[1], jnp.float32)
            self._mean_np = np.asarray(mean_std[0], np.float32)
            self._std_np = np.asarray(mean_std[1], np.float32)
        self.max_batch = max_batch
        self.depth = depth
        self.groups = {}   # padded shape -> [(index, raw, padding)]
        self.inflight = collections.deque()
        # device-u8 egress: the translated image downloads as uint8 (4x
        # fewer bytes on a link that the duplex probe showed serializes up
        # and down traffic). The denormalize->u8 math runs on device with
        # an optimization_barrier after every op so XLA cannot FMA-fuse
        # across the host's separately-rounded numpy ops; the FIRST drained
        # batch still downloads f32 and cross-checks the device u8 against
        # host_u8_image bit-for-bit — any mismatch falls the run back to
        # f32 downloads (sink output dtype is the contract: uint8 means
        # already-converted, float means convert on host as before).
        assert not (device_u8 and mean_std is None), \
            "device_u8 needs the device-normalize (mean_std) path"
        self.device_u8 = bool(device_u8)
        self._u8_ok = None  # None = guard pending
        if self.device_u8:
            apply = self.apply
            mean, std = self._mean, self._std

            def fused(variables, dev_u8):
                x = dev_u8.astype(jnp.float32) / 255.0
                x = (x - mean) / std
                out = apply(variables, x)
                y = jax.lax.optimization_barrier(out * std)
                y = jax.lax.optimization_barrier(y + mean)
                y = jax.lax.optimization_barrier(y * 255.0)
                y = jnp.clip(y, 0, 255)
                return out, y.astype(jnp.uint8)

            self._fused_u8 = jax.jit(fused)

    def add(self, index, array):
        array = np.asarray(array)
        if array.ndim == 4:
            array = array[0]
        padding = _centered_pad(array.shape[:2], self.divisor)
        padded_shape = (array.shape[0] + padding[2] + padding[3],
                        array.shape[1] + padding[0] + padding[1])
        group = self.groups.setdefault(padded_shape, [])
        group.append((index, array, padding))
        if len(group) >= self.max_batch:
            self._launch(self.groups.pop(padded_shape))

    def _launch(self, group):
        batch = np.stack([
            np.pad(arr, ((pad[2], pad[3]), (pad[0], pad[1]), (0, 0)),
                   mode="edge")
            for _, arr, pad in group])
        dev = jnp.asarray(batch)  # async put on this transport
        if self.device_u8:
            pair = self._fused_u8(self.variables, dev)
            self.inflight.append((pair, group))
        else:
            if self.mean_std is not None:
                # identical op order as the host Normalize (bit-equality)
                dev = dev.astype(jnp.float32) / 255.0
                dev = (dev - self._mean) / self._std
            out = self.apply(self.variables, dev)
            self.inflight.append((out, group))
        while len(self.inflight) > self.depth:
            self._drain_one()

    def _drain_one(self):
        out, group = self.inflight.popleft()
        host_u8 = None
        if self.device_u8:
            out_f32, out_u8 = out
            if self._u8_ok is None:
                # first-batch guard: f32 downloads once, host conversion
                # must equal the device u8 exactly
                host_f32 = np.asarray(out_f32)
                host_u8 = np.asarray(out_u8)
                self._u8_ok = bool(np.array_equal(
                    host_u8, host_u8_image(host_f32, self._mean_np,
                                           self._std_np)))
                if not self._u8_ok:
                    host = host_f32
                    host_u8 = None
                else:
                    host = host_u8
            elif self._u8_ok:
                host = host_u8 = np.asarray(out_u8)
            else:
                host = np.asarray(out_f32)
        else:
            host = np.asarray(out)  # the only real sync on this transport
        for row, (index, arr, pad) in zip(host, group):
            cropped = row[pad[2]:row.shape[0] - pad[3],
                          pad[0]:row.shape[1] - pad[1]]
            if self.mean_std is not None and host_u8 is None:
                arr = (arr.astype(np.float32) / 255.0
                       - self._mean_np) / self._std_np
            self.sink(index, arr[None], cropped[None])

    def finish(self):
        for shape in list(self.groups):
            self._launch(self.groups.pop(shape))
        while self.inflight:
            self._drain_one()
