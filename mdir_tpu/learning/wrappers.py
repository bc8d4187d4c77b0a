"""Network input/output wrappers (inference patterns).

Parity with ``mdir/components/data/wrapper.py``: Compose applies wrapper
preprocess in order, runs inference (the host->device boundary), and applies
postprocess in reverse. Wrappers: reflectpad_divisible, cirmultiscale,
fakebatch, cirfaketuplebatch, cirwhiten. The string DSL
(``"cirmultiscale:True,fakebatch"``) and N_-prefixed ordered dicts are
preserved.

Tensors here are single images (1, H, W, C) or descriptor vectors (D,); the
multiscale/whiten math matches extract_ms / whitenapply exactly. The batched
TPU fast path (``parallel/extract.py``) reproduces these wrappers' semantics
in one fused program — equality is covered by tests.
"""
import numpy as np

import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..tools.utils import load_path


class Compose:
    """Apply wrappers' preprocess forward, inference, postprocess backward."""

    def __init__(self, wrappers, device=None):
        self.wrappers = wrappers
        self.device = device

    def __call__(self, tensor, inference, model=None):
        if not self.wrappers:
            return inference(tensor)
        if model is None:
            model = inference

        metadata = []
        for wrapper in self.wrappers:
            tensor, meta = wrapper.preprocess(tensor, model)
            metadata.append(meta)

        if isinstance(tensor, list):
            tensor = [inference(x) for x in tensor]
        else:
            tensor = inference(tensor)

        for wrapper, meta in reversed(list(zip(self.wrappers, metadata))):
            tensor = wrapper.postprocess(tensor, model, meta)
        return tensor

    def __repr__(self):
        inner = "".join("    %s\n" % x for x in self.wrappers)
        return "%s([%s])" % (self.__class__.__name__,
                             "\n" + inner if inner else "")


class Wrapper:
    def __init__(self, device=None):
        pass

    def preprocess(self, tensor, _model):
        return tensor, None

    def postprocess(self, tensor, _model, _metadata):
        return tensor


class ReflectPadMakeDivisible(Wrapper):
    """Pad H,W (replicate) to a multiple of N, crop back after inference."""

    def __init__(self, divisible_by, device=None):
        super().__init__(device)
        self.divisible_by = int(divisible_by)

    def preprocess(self, tensor, _model):
        size = np.array(tensor.shape[-3:-1])
        padh, padw = (np.ceil(size / self.divisible_by) * self.divisible_by - size) / 2
        padding = (int(np.floor(padw)), int(np.ceil(padw)),
                   int(np.floor(padh)), int(np.ceil(padh)))
        pad_spec = [(0, 0)] * (tensor.ndim - 3) + [
            (padding[2], padding[3]), (padding[0], padding[1]), (0, 0)]
        return jnp.pad(jnp.asarray(tensor), pad_spec, mode="edge"), padding

    def postprocess(self, tensor, _model, padding):
        return tensor[..., padding[2]:-padding[3] or None,
                      padding[0]:-padding[1] or None, :]

    def __repr__(self):
        return "%s (divisible_by=%s)" % (self.__class__.__name__, self.divisible_by)


class CirMultiscaleAggregation(Wrapper):
    """Multi-scale descriptor extraction with p-power mean aggregation.

    scales True -> [1, 1/sqrt(2), 1/2]; aggregation uses msp = GeM p when the
    model is GeM/non-regional/non-whitened, else 1 (wrapper.py:109-133).
    """

    def __init__(self, scales, device=None):
        super().__init__(device)
        if isinstance(scales, str):
            scales = {"True": True, "False": False}[scales]
        if isinstance(scales, bool):
            scales = [1, 1.0 / np.sqrt(2), 1.0 / 2] if scales else [1]
        self.scales = scales

    def preprocess(self, tensor, _model):
        if len(self.scales) == 1:
            return (tensor if isinstance(tensor, list) else [tensor],
                    isinstance(tensor, list))

        def scaled(single):
            return [single if s == 1 else resize_bilinear(jnp.asarray(single), scale=s)
                    for s in self.scales]

        if isinstance(tensor, list):
            acc = []
            for single in tensor:
                acc.extend(scaled(single))
            return acc, True
        return scaled(tensor), False

    @staticmethod
    def aggregate_tensor(tensors, nscales, outputdim, msp):
        assert len(tensors) == nscales, "%s != %s" % (len(tensors), nscales)
        v = jnp.zeros((outputdim,), dtype=jnp.asarray(tensors[0]).dtype)
        for sub in tensors:
            v = v + jnp.asarray(sub).reshape(-1) ** msp
        v = (v / nscales) ** (1.0 / msp)
        return v / jnp.linalg.norm(v)

    def postprocess(self, tensor, model, waslist):
        msp = 1.0
        if len(self.scales) > 1 and model.meta["pooling"] == "gem" \
                and not model.meta["regional"] and not model.meta["whitening"]:
            msp = float(model.pool_p)

        if not waslist:
            return self.aggregate_tensor(tensor, len(self.scales),
                                         model.meta["out_channels"], msp)

        assert len(tensor) % len(self.scales) == 0
        acc = []
        for i in range(0, len(tensor), len(self.scales)):
            acc.append(self.aggregate_tensor(
                tensor[i:i + len(self.scales)], len(self.scales),
                model.meta["out_channels"], msp))
        return acc

    def __repr__(self):
        return "%s(scales=%s)" % (self.__class__.__name__, self.scales)


class FakeBatch(Wrapper):
    """List of per-image descriptor vectors -> (D, N) matrix."""

    def postprocess(self, tensor, model, _meta):
        if not isinstance(tensor, list):
            return tensor
        cols = [jnp.asarray(v).reshape(-1) for v in tensor]
        return jnp.stack(cols, axis=1)

    def __repr__(self):
        return "%s()" % self.__class__.__name__


class CirFakeTupleBatch(FakeBatch):
    """Flatten a 2-level tuple list into a flat image list (loss layout)."""

    def preprocess(self, tensor, _model):
        if not isinstance(tensor, list) or not isinstance(tensor[0], list):
            return tensor, False
        acc = []
        meta = len(tensor[0])
        for tpl in tensor:
            assert meta == len(tpl)
            acc += tpl
        return acc, meta


class CirtorchWhiten(Wrapper):
    """Learned-whitening projection P[:dims](x - m) + L2, params from pkl."""

    def __init__(self, whitening, dimensions=None, device=None):
        super().__init__(device)
        whit = load_path(whitening)
        self.P = jnp.asarray(np.asarray(whit["P"], np.float32))
        self.m = jnp.asarray(np.asarray(whit["m"], np.float32))
        # the string DSL ("cirwhiten:whiten.pkl") can only deliver the
        # path (commas separate WRAPPERS), so dimensions defaults to full;
        # when it does arrive (dict form, or a future multi-arg DSL) a
        # string value must int-cast like ReflectPadMakeDivisible's arg
        # does, or the P[:dims] slice raises TypeError
        self.dimensions = int(dimensions) if dimensions \
            else self.P.shape[0]

    def postprocess(self, tensor, model, _meta):
        x = jnp.asarray(tensor)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        proj = jnp.dot(self.P[:self.dimensions, :], x - self.m.reshape(-1, 1),
                       precision=jax.lax.Precision.HIGHEST)
        proj = proj / (jnp.linalg.norm(proj, ord=2, axis=0, keepdims=True) + 1e-6)
        return proj[:, 0] if squeeze else proj


WRAPPERS_LABELS = {
    "reflectpad_divisible": ReflectPadMakeDivisible,
    "cirmultiscale": CirMultiscaleAggregation,
    "fakebatch": FakeBatch,
    "cirfaketuplebatch": CirFakeTupleBatch,
    "cirwhiten": CirtorchWhiten,
}


def initialize_wrappers(net_wrappers, device=None):
    """String DSL or N_-prefixed dict -> Compose (wrapper.py:209-220)."""
    if net_wrappers is None:
        wraps = []
    elif isinstance(net_wrappers, str):
        wraps = []
        for wrap in [x for x in net_wrappers.split(",") if x]:
            wname, *args = wrap.split(":", 1)
            args = args[0].split(",") if args else []
            wraps.append(WRAPPERS_LABELS[wname](*args, device=device))
    else:
        wraps = [WRAPPERS_LABELS[x.split("_", 1)[1]](**net_wrappers[x], device=device)
                 for x in sorted(net_wrappers)]
    return Compose(wraps, device)
