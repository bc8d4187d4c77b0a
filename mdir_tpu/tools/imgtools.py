"""Tensor -> displayable RGB conversion, inverting normalize/colorspace
transforms, and comparison grids.

Capability parity with ``mdir/tools/imgtools.py`` for HWC (channels-last)
tensors: un-normalize with mean/std, invert tospace:lab/luv/lsh, optional
stretch, and ``makegrid`` side-by-side comparison grids.
"""
import numpy as np


def _transforms_to_colorspace(transforms):
    if "tospace:lab" in transforms or "tolab" in transforms:
        return "lab"
    if "tospace:luv" in transforms or "toluv" in transforms:
        return "luv"
    if "tospace:lsh" in transforms or "tolsh" in transforms:
        return "lsh"
    return None


def _tensor_to_image(img, mean_std, transforms, stretch_by=False):
    """Undo normalization (+ colorspace) of an HWC float tensor -> uint8 RGB."""
    import cv2

    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    colorspace = _transforms_to_colorspace(transforms)
    mean = np.asarray(mean_std[0], np.float32)
    std = np.asarray(mean_std[1], np.float32)

    if not colorspace:
        out = img[..., :3] * std[:3] + mean[:3]
        if stretch_by:
            if stretch_by == "auto":
                out = out - np.min(out)
                out = out / max(np.max(out), 1e-12)
            else:
                out = out / stretch_by + 1 / 2.0 / stretch_by
        return np.clip(out * 255, 0, 255).astype(np.uint8)

    if "chan1" in transforms or img.shape[-1] == 1:
        img = np.concatenate(
            (img, np.zeros_like(img), np.zeros_like(img)), axis=-1)
        mean = np.array([mean[0], 0, 0], np.float32)
        std = np.array([std[0], 1, 1], np.float32)
        single_channel = True
    else:
        single_channel = False

    out = img[..., :3] * std[:3] + mean[:3]
    if colorspace == "lab":
        out[..., 0] = np.clip(out[..., 0], 0, 100)
        out[..., 1:] = np.clip(out[..., 1:], -127, 127)
        code = cv2.COLOR_LAB2RGB
    elif colorspace == "luv":
        out[..., 0] = np.clip(out[..., 0], 0, 100)
        out[..., 1] = np.clip(out[..., 1], -134, 220)
        out[..., 2] = np.clip(out[..., 2], -140, 122)
        code = cv2.COLOR_LUV2RGB
    else:  # lsh -> hls
        tmp = np.copy(out[..., 2])
        out[..., 2] = np.clip(out[..., 1], 0, 1)
        out[..., 1] = np.clip(out[..., 0], 0, 1)
        out[..., 0] = np.clip(tmp, 0, 360)
        code = cv2.COLOR_HLS2RGB

    rgb = cv2.cvtColor(out.astype(np.float32), code)
    if single_channel:
        rgb = np.mean(rgb, axis=2)
    return (rgb * 255).astype(np.uint8)


def get_image(imgs, mean_std, colortransforms, stretch_by=False):
    """[input, output] HWC tensors -> displayable uint8 RGB of the output."""
    imgs = [np.asarray(x) for x in imgs]
    if "chan42" in colortransforms:
        imgs = [imgs[0][..., 0:3],
                np.concatenate((imgs[0][..., 3:], imgs[1]), axis=-1)]
    elif "add_meanstd" in colortransforms:
        imgs = [imgs[0][..., :1], imgs[1][..., :1]]
    return _tensor_to_image(imgs[1], mean_std, colortransforms, stretch_by)


def makegrid(imgs, size, mean_std, colortransforms):
    """Build a comparison grid of [input, gnd, output] thumbnails."""
    from PIL import Image

    imgs = [np.asarray(x) for x in imgs]
    if len(imgs) == 3:
        rows = [[imgs[0][..., 0:3], imgs[1][..., 0:3]],
                [None, imgs[2][..., 0:3]]]
    elif len(imgs) == 2:
        rows = [[imgs[0][..., 0:3], imgs[1][..., 0:3]]]
    else:
        rows = [[imgs[0][..., 0:3]]]

    acc = []
    for row in rows:
        acci = []
        for img in row:
            if img is not None:
                arr = _tensor_to_image(img, mean_std, colortransforms)
            else:
                arr = np.zeros(rows[-1][-1].shape[:2] + (3,), np.uint8)
            pimg = Image.fromarray(arr)
            pimg.thumbnail((size, size))
            acci.append(np.array(pimg))
        acc.append(np.concatenate(acci, axis=1))
    return np.concatenate(acc, axis=0)
