"""Host image transform chain with the reference's pipe-string DSL.

Label and semantics parity with ``mdir/components/data/transform`` —
``initialize_transforms("pil2np | apply_clahe | totensor | normalize", mean_std)``
returns a Compose whose transforms are multi-image:
``__call__(*pics) -> [pics]`` so tuple datasets apply one transform to
query/positive/negatives consistently.

Layout difference from the reference: tensors are HWC float32 numpy arrays
(TPU-native NHWC), never CHW torch tensors; ``totensor`` produces HWC.
Colorspace conversions call cv2 (the same C++ kernels the reference calls);
CLAHE uses our bit-exact replication (``ops/clahe.py``). Pure-JAX versions of
the hot transforms live in ``ops/`` for the in-graph preprocessing path.
"""
import random

import numpy as np

from ..ops import clahe as clahe_ops
from ..ops import histogram as hist_ops
from ..tools.utils import parse_tuple


def _import_cv2():
    """cv2 with its internal thread pool disabled (reference
    augmentation_transforms.py:6 pins ``cv2.setNumThreads(0)`` inside
    loader workers): on the 1-core host cv2's pool oversubscribes against
    the uplink/prefetch threads on host-chain fallback paths."""
    import cv2

    cv2.setNumThreads(0)
    return cv2


def rgb2normspace_np(img, colorspace):
    """cv2-backed colorspace normalization (reference functional.py:24-36)."""
    cv2 = _import_cv2()

    colorspace = colorspace.lower()
    if colorspace == "lab":
        return (cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
                + np.array([0, 128, 128], np.float32)) / np.array(
                    [100.0, 255.0, 255.0], np.float32)
    if colorspace == "luv":
        return (cv2.cvtColor(img, cv2.COLOR_RGB2LUV)
                + np.array([0, 134, 140], np.float32)) / np.array(
                    [100.0, 354.0, 262.0], np.float32)
    if colorspace == "lsh":
        hls = cv2.cvtColor(img, cv2.COLOR_RGB2HLS) / np.array(
            [360.0, 1.0, 1.0], np.float32)
        return np.stack((hls[:, :, 1], hls[:, :, 2], hls[:, :, 0]), axis=2)
    if colorspace == "gray":
        return np.expand_dims(
            cv2.cvtColor(img, cv2.COLOR_RGB2GRAY), axis=2).astype(np.float32)
    raise NotImplementedError("Colorspace %s is not supported" % colorspace)


def normspace2rgb_np(img, colorspace):
    cv2 = _import_cv2()

    colorspace = colorspace.lower()
    if colorspace == "lab":
        return cv2.cvtColor(
            (img * np.array([100.0, 255.0, 255.0], np.float32))
            - np.array([0, 128, 128], np.float32), cv2.COLOR_LAB2RGB)
    if colorspace == "luv":
        return cv2.cvtColor(
            (img * np.array([100.0, 354.0, 262.0], np.float32))
            - np.array([0, 134, 140], np.float32), cv2.COLOR_LUV2RGB)
    if colorspace == "lsh":
        hls = np.stack((img[:, :, 2], img[:, :, 0], img[:, :, 1]), axis=2) \
            * np.array([360.0, 1.0, 1.0], np.float32)
        return cv2.cvtColor(hls, cv2.COLOR_HLS2RGB)
    raise NotImplementedError("Colorspace %s is not supported" % colorspace)


class GenericTransform:
    def __init__(self, params=None):
        self.params = params or {}

    def __repr__(self):
        return self.__class__.__name__ + "(%s)" % ", ".join(
            "%s=%s" % (k, v) for k, v in self.params.items())


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, *pics):
        for t in self.transforms:
            pics = t(*pics)
        if len(pics) == 1:
            return pics[0]
        return pics

    def __repr__(self):
        return "Compose([%s])" % ", ".join(repr(t) for t in self.transforms)


#
# Core
#

class ToTensor(GenericTransform):
    """PIL -> HWC float32 [0,1]; float numpy passes through (HWC kept)."""

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            if isinstance(pic, np.ndarray):
                acc.append(np.ascontiguousarray(pic, dtype=np.float32))
            else:  # PIL image
                arr = np.asarray(pic, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                acc.append(arr)
        return acc


class Normalize(GenericTransform):
    """(x - mean) / std over the channel (last) axis; strict or loose count."""

    def __init__(self, mean, std, strict_shape=True):
        if isinstance(strict_shape, str):
            strict_shape = strict_shape.lower() != "false"
        super().__init__({"mean": mean, "std": std, "strict_shape": bool(strict_shape)})
        assert len(mean) == len(std)

    def __call__(self, *pics):
        mean = np.asarray(self.params["mean"], np.float32)
        std = np.asarray(self.params["std"], np.float32)
        acc = []
        for pic in pics:
            c = pic.shape[-1]
            if self.params["strict_shape"]:
                assert c == len(mean), (c, len(mean))
                acc.append((pic - mean) / std)
            else:
                assert c <= len(mean), (c, len(mean))
                acc.append((pic - mean[:c]) / std[:c])
        return acc


class Pil2Numpy(GenericTransform):
    """PIL -> RGB HWC float32 in [0,1]."""

    def __call__(self, *pics):
        return [np.array(x.convert("RGB"), dtype=np.float32) / 255.0 for x in pics]


class StackBatch(GenericTransform):
    """Concatenate images along channels (reference stacks along axis 0 in
    CHW; channels-last here)."""

    def __call__(self, *pics):
        return [np.concatenate(pics, axis=-1)]


class NanCheck(GenericTransform):
    def __call__(self, *pics):
        for pic in pics:
            if np.isnan(pic).any():
                raise ValueError("Nan value occured in input")
        return pics


#
# Augmentations
#

class RandomCrop(GenericTransform):
    def __init__(self, size):
        super().__init__({"size": parse_tuple(size, int)})

    def __call__(self, *pics):
        th, tw = self.params["size"] if len(self.params["size"]) == 2 \
            else self.params["size"] * 2
        h, w = pics[0].shape[:2]
        i = random.randint(0, h - th)
        j = random.randint(0, w - tw)
        return [x[i:i + th, j:j + tw] for x in pics]


class RandomHorizontalFlip(GenericTransform):
    def __init__(self, p=0.5):
        super().__init__({"p": float(p)})

    def __call__(self, *pics):
        if random.random() < self.params["p"]:
            return [np.flip(x, axis=1) for x in pics]
        return pics


class CenterCrop(GenericTransform):
    def __init__(self, size):
        super().__init__({"size": np.array(parse_tuple(size, int))[::-1]})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            pad = (np.array(pic.shape[:2]) - self.params["size"]) / 2
            y0, y1 = int(np.floor(pad[0])), -int(np.ceil(pad[0])) or None
            x0, x1 = int(np.floor(pad[1])), -int(np.ceil(pad[1])) or None
            acc.append(pic[y0:y1, x0:x1])
        return acc


class Downscale(GenericTransform):
    """Max-side downscale keeping aspect (PIL resize, reference semantics)."""

    def __init__(self, size):
        super().__init__({"size": int(size)})

    def __call__(self, *pics):
        from PIL import Image

        size = self.params["size"]
        acc = []
        for pic in pics:
            if max(pic.shape) > size:
                img = Image.fromarray((pic * 255).astype(np.uint8))
                h, w = pic.shape[:2]
                # torchvision F.resize(int) semantics: smaller edge -> size
                if w < h:
                    new = (size, int(size * h / w))
                else:
                    new = (int(size * w / h), size)
                pic = np.array(img.resize(new, Image.BILINEAR),
                               dtype=np.float32) / 255.0
            acc.append(pic)
        return acc


class RandomScaleCrop(GenericTransform):
    """Random scale (bounds) + random crop, implemented crop-then-resize."""

    def __init__(self, size, scale=(0.5, 0.8)):
        super().__init__({"size": np.array(parse_tuple(size, int)),
                          "scale": parse_tuple(scale, float)})

    def __call__(self, *pics):
        cv2 = _import_cv2()

        if len(pics) == 1 or pics[0].shape[:2] == pics[1].shape[:2]:
            if (pics[0].shape[:2] == self.params["size"][::-1]).all():
                return pics

        lo, hi = self.params["scale"]
        scale = random.random() * (hi - lo) + lo
        cropped_size = np.ceil(self.params["size"][::-1] / scale).astype(int)
        assert (np.array(pics[0].shape[:2]) >= cropped_size).all()
        offs = [random.randint(0, x)
                for x in (np.array(pics[0].shape[:2]) - cropped_size)]
        ys, ye = offs[0], offs[0] + cropped_size[0]
        xs, xe = offs[1], offs[1] + cropped_size[1]

        acc = []
        for pic in pics:
            pic = cv2.resize(pic[ys:ye, xs:xe], tuple(self.params["size"]))
            acc.append(pic)
        return acc


class AdditiveGaussianNoise(GenericTransform):
    """Gaussian noise on the first image only, clipped to [0,1]."""

    def __init__(self, sigma):
        super().__init__({"sigma": float(sigma)})

    def __call__(self, *pics):
        pics = list(pics)
        noise = np.random.normal(0, self.params["sigma"], pics[0].shape)
        pics[0] = np.clip(pics[0] + noise, 0, 1).astype(np.float32)
        return pics


#
# Channel transforms
#

class AddConstantChannel(GenericTransform):
    def __init__(self, value):
        super().__init__({"value": float(value)})

    def __call__(self, *pics):
        return [np.concatenate(
            (x, np.full(x.shape[:-1] + (1,), self.params["value"], np.float32)),
            axis=2) for x in pics]


class NpInvertChannel(GenericTransform):
    def __init__(self, channel):
        super().__init__({"channel": int(channel)})

    def __call__(self, *pics):
        for pic in pics:
            c = self.params["channel"]
            pic[:, :, c] = 1 - pic[:, :, c]
        return pics


class NpChanSelector(GenericTransform):
    def __init__(self, start, end="unset"):
        if end != "unset":
            end = int(end) if end and end != "null" else None
        super().__init__({"start": int(start), "end": end})

    def __call__(self, *pics):
        s, e = self.params["start"], self.params["end"]
        if e == "unset":
            return [x[:, :, s:s + 1] for x in pics]
        return [x[:, :, s:e] for x in pics]


class NpCloneChannels(GenericTransform):
    def __init__(self, start, end="unset"):
        if end != "unset":
            end = int(end) if end and end != "null" else None
        super().__init__({"start": int(start), "end": end})

    def __call__(self, *pics):
        s, e = self.params["start"], self.params["end"]
        if e == "unset":
            return [np.concatenate((x, x[:, :, s:s + 1]), axis=2) for x in pics]
        return [np.concatenate((x, x[:, :, s:e]), axis=2) for x in pics]


class AddIntensityFromRgb(GenericTransform):
    def __init__(self, colorspace="lab"):
        super().__init__({"colorspace": colorspace})

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            spc = rgb2normspace_np(pic[:, :, :3], self.params["colorspace"])
            acc.append(np.concatenate((pic, spc[:, :, :1]), axis=2))
        return acc


class ToColorspace(GenericTransform):
    def __init__(self, colorspace):
        super().__init__({"colorspace": colorspace})

    def __call__(self, *pics):
        return [rgb2normspace_np(pic[:, :, :3], self.params["colorspace"])
                for pic in pics]


class AddEdgesDollarFromRgb(GenericTransform):
    """Structured-edge channel (requires cv2.ximgproc + a local model file;
    site-local in the reference too — functional.py:136)."""

    def __init__(self, model, resize=None, prefilter=None, postfilter=None):
        super().__init__({"model": model, "resize": resize or None,
                          "prefilter": prefilter or None,
                          "postfilter": postfilter or None})
        assert not self.params["resize"]
        assert self.params["prefilter"] in {None, "clahe"}
        assert self.params["postfilter"] in {None, "edgefilter"}
        cv2 = _import_cv2()

        model_path = model
        if "." not in model_path.rsplit("/", 1)[-1]:
            model_path += ".yml.gz"
        self.detector = cv2.ximgproc.createStructuredEdgeDetection(model_path)
        self.prefilter_clahe = self.params["prefilter"] == "clahe"

    @staticmethod
    def cirsketch_edgefilter(edgemap):
        return np.divide(np.power(edgemap, 0.5), 1 + np.exp(50 - 500 * edgemap))

    def __call__(self, *pics):
        acc = []
        for pic in pics:
            inp = pic[:, :, :3]
            if self.prefilter_clahe:
                inp = apply_image_clahe(inp, 4, 8, "lab")
            edges = np.clip(self.detector.detectEdges(inp), 0, 1)
            if self.params["postfilter"] == "edgefilter":
                edges = self.cirsketch_edgefilter(edges)
            acc.append(np.concatenate((pic, edges[..., None]), axis=2))
        return acc


#
# Photometric (paper core)
#

def apply_image_clahe(img, clip_limit, grid_size, colorspace):
    """CLAHE on the lightness channel in a colorspace (ImageClahe.apply)."""
    grid = (int(grid_size), int(grid_size)) if not isinstance(grid_size, tuple) \
        else grid_size
    spc = rgb2normspace_np(img, colorspace)
    spc[:, :, 0] = clahe_ops.clahe_channel_np(
        spc[:, :, 0], float(int(clip_limit)), grid)
    return normspace2rgb_np(spc, colorspace)


class AddClaheFromRgb(GenericTransform):
    """Append the image's CLAHE-normalized lightness as a new channel."""

    def __init__(self, clip_limit=4, grid_size=8, colorspace="lab"):
        super().__init__({"clip_limit": int(clip_limit),
                          "grid_size": grid_size, "colorspace": colorspace})

    def __call__(self, *pics):
        grid = (int(self.params["grid_size"]),) * 2
        acc = []
        for pic in pics:
            assert isinstance(pic, np.ndarray)
            spc = rgb2normspace_np(pic[:, :, :3], self.params["colorspace"])
            chan = clahe_ops.clahe_channel_np(
                spc[:, :, 0], float(self.params["clip_limit"]), grid)
            acc.append(np.concatenate((pic, chan[..., None]), axis=2))
        return acc


class ApplyClahe(GenericTransform):
    """CLAHE the lightness channel in-place in a colorspace."""

    def __init__(self, clip_limit=4, colorspace="lab", grid_size=8):
        super().__init__({"clip_limit": clip_limit, "colorspace": colorspace,
                          "grid_size": grid_size})

    def __call__(self, pic):
        return [apply_image_clahe(pic, self.params["clip_limit"],
                                  self.params["grid_size"],
                                  self.params["colorspace"])]


class CreateClahedImage(ApplyClahe):
    """Emit [original, clahe(original)] image pair."""

    def __call__(self, pic):
        return [pic, apply_image_clahe(pic[:, :, :3], self.params["clip_limit"],
                                       self.params["grid_size"],
                                       self.params["colorspace"])]


class MatchHistogram(GenericTransform):
    def __init__(self, histogram, colorspace="lab"):
        super().__init__({"histogram": histogram, "colorspace": colorspace})

    def __call__(self, pic):
        spc = rgb2normspace_np(pic, self.params["colorspace"])
        spc[:, :, 0] = hist_ops.channel_histogram_matching(
            spc[:, :, 0], self.params["histogram"])
        return [normspace2rgb_np(spc, self.params["colorspace"])]


class ReplaceChannelWithHistogram(GenericTransform):
    """Histogram-matched extra channel; train: matched to the gt image's last
    channel, test: matched to a stored reference CDF."""

    def __init__(self, histogram, created_channel):
        super().__init__({"histogram": histogram,
                          "created_channel": created_channel})
        assert created_channel in {"append", "replace"}

    def __call__(self, pic0, pic1=None):
        out0 = pic0[:, :, :-1] if self.params["created_channel"] == "replace" \
            else pic0
        if pic1 is not None:
            chan = hist_ops.channel2channel_histogram_matching(
                pic0[:, :, -1], pic1[:, :, -1])
            return (np.concatenate((out0, chan[..., None]), axis=2),
                    pic1[:, :, :-1])
        chan = hist_ops.channel_histogram_matching(
            pic0[:, :, -1], self.params["histogram"])
        return (np.concatenate((out0, chan[..., None]), axis=2),)


class GammaEqualize(GenericTransform):
    def __init__(self, target, colorspace="lab"):
        target = float(target)
        super().__init__({"target": target, "colorspace": colorspace})
        assert 0 < target < 1, target

    def __call__(self, pic):
        spc = rgb2normspace_np(pic, self.params["colorspace"])
        spc[:, :, 0] = hist_ops.channel_gamma_matching(
            spc[:, :, 0], self.params["target"])
        return [normspace2rgb_np(spc, self.params["colorspace"])]


TRANSFORMS = {
    "totensor": ToTensor,
    "normalize": Normalize,
    "pil2np": Pil2Numpy,
    "stackbatch": StackBatch,
    "nan_check": NanCheck,

    "random_crop": RandomCrop,
    "mirror": RandomHorizontalFlip,
    "center_crop": CenterCrop,
    "downscale": Downscale,
    "scalecrop": RandomScaleCrop,
    "gaussian_noise": AdditiveGaussianNoise,

    "add_const": AddConstantChannel,
    "tospace": ToColorspace,
    "add_intensity_fromrgb": AddIntensityFromRgb,
    "add_edgesdollar_fromrgb": AddEdgesDollarFromRgb,
    "np_invert_chan": NpInvertChannel,
    "np_chanselect": NpChanSelector,
    "np_chanclone": NpCloneChannels,

    "add_clahe_fromrgb": AddClaheFromRgb,
    "apply_clahe": ApplyClahe,
    "create_clahed": CreateClahedImage,
    "match_histogram": MatchHistogram,
    "replace_histogram": ReplaceChannelWithHistogram,
    "gamma_equalize": GammaEqualize,
}


def initialize_transforms(augmentations, mean_std):
    """Parse the pipe DSL; ``name:arg1:arg2`` per item; ``normalize`` gets
    mean_std injected (reference transform/__init__.py:35-44)."""
    trans = []
    for aug in [x.strip() for x in (augmentations or "").split("|") if x.strip()]:
        tname, *args = aug.split(":", 1)
        args = args[0].split(":") if args else []
        if "normalize" in aug:
            trans.append(TRANSFORMS[tname](*(list(mean_std) + args)))
        else:
            trans.append(TRANSFORMS[tname](*args))
    return Compose(trans)
