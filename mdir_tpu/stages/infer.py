"""Bulk inference stage: descriptor dumps and dataset translation, TPU-first.

Same public contract as the reference stage (``mdir/stages/infer.py:18-64``):
``infer(params, data) -> (metadata, *output.postprocess())`` with the fast
"skipped" path when an ``append`` output finds nothing left, the missing-image
``{}`` sentinel becoming a NaN descriptor row, and resource stats in the
metadata. The execution model is redesigned for this backend, where per-program
dispatch costs seconds and the host->device link runs 20-60 MB/s — the
reference's batch_size=1 loop is pathological on both axes:

* **embedding outputs** ride the production fused bucketed extractor
  (``parallel/extract.py::extract_vectors_network``: shape buckets, uint8
  ingress with device-side normalization, uplink pipelining, wrapper-pattern
  fusion) — the same compiled path the validate stage uses, pinned equal to
  the per-image wrapper loop by the extraction test suite;
* **rgb translation outputs** batch same-padded-shape images through one
  jitted program per shape with depth-2 transfer/compute overlap
  (``parallel/translate.py``), writing through the async output write-behind;
* anything unroutable (exotic wrappers, non-path datasets, custom outputs)
  falls back to the exact per-item loader loop.
"""
import copy
import os

import numpy as np

from ..data.datasets import initialize_dataset_loader, pil_loader
from ..data.outputs import (AsyncOutput, EmbeddingOutput, RgbImageSaver,
                            initialize_output)
from ..learning import load_network
from ..tools import stats
from ..tools.utils import get_dataset_params, path_join


def infer(params, data):
    np.random.seed(0)

    if not data[0]:
        # append-mode fast path: probe the output before paying network load
        probe = initialize_output(
            copy.deepcopy(params["output"]["inference"]),
            get_dataset_params(params["data"]["test"], {}), data)
        if not probe.preprocess()[0]:
            return ({"status": "skipped"},) + probe.postprocess()

    network = load_network(params["network"], device=None).eval()
    data_params = get_dataset_params(
        params["data"]["test"], network.network_params.runtime.get("data", {}))

    output = initialize_output(copy.deepcopy(params["output"]["inference"]),
                               copy.deepcopy(data_params), data)
    remaining = output.preprocess()
    if not remaining[0]:
        return ({"status": "skipped"},) + output.postprocess()

    meter = stats.AverageMeter("Infer", len(remaining[0]),
                               debug=params["output"].get("debug", False))
    resources = stats.ResourceUsage()

    done = _run_batched(network, output, remaining,
                        copy.deepcopy(data_params), meter)
    if done is None:
        _run_per_item(network, output, remaining,
                      copy.deepcopy(data_params), meter)
    resources.take_current_stats()

    metadata = {"stats": meter.total_stats(),
                "resource_usage": resources.get_resources()}
    return (metadata,) + output.postprocess()


def _unwrapped(output):
    return output.output if isinstance(output, AsyncOutput) else output


def _run_batched(network, output, remaining, data_params, meter):
    """Route onto a streaming batched device path; None = not routable."""
    dataset = dict(data_params.get("dataset", {}))
    if dataset.pop("name", None) != "CirImageList":
        return None
    sink = _unwrapped(output)
    if isinstance(sink, EmbeddingOutput):
        return _run_embedding(network, output, remaining, data_params,
                              dataset, meter)
    if isinstance(sink, RgbImageSaver):
        return _run_translation(network, output, remaining, data_params,
                                dataset, meter)
    return None


def _run_embedding(network, output, remaining, data_params, dataset, meter):
    from ..data.transforms import initialize_transforms
    from ..parallel.extract import (_composable_sequential,
                                    extract_vectors_network)

    # descriptor networks only: an image->image model under an embedding
    # output (flattened-pixels descriptors) keeps the exact per-item path
    model = getattr(network, "model", None)
    if not (_composable_sequential(network)
            or getattr(model, "is_descriptor_model", False)):
        return None

    images, bbxs = (remaining + (None,))[:2]
    image_dir = dataset.pop("image_dir")
    image_size = dataset.pop("image_size", None)
    ignore_errors = dataset.pop("ignore_errors", False)
    if dataset:  # unknown dataset knobs -> exact per-item path
        return None

    paths = [path_join(image_dir, name) for name in images]
    good = list(range(len(paths)))
    if ignore_errors:
        # same decode + failure class as the dataset's `{}` sentinel
        good = [i for i in good
                if not isinstance(pil_loader(paths[i]), Exception)]
        for i in set(range(len(paths))) - set(good):
            output.add(i, None, None)  # NaN descriptor row

    if good:
        transform = initialize_transforms(data_params["transforms"],
                                          mean_std=data_params["mean_std"])
        vecs = extract_vectors_network(
            network, [paths[i] for i in good], image_size, transform,
            bbxs=[bbxs[i] for i in good] if bbxs is not None else None)
        vecs = np.asarray(vecs)  # (D, N) columns
        for col, i in enumerate(good):
            output.add(i, np.empty(0), vecs[:, col])
            meter.update(i, None)
    return len(paths)


def _run_translation(network, output, remaining, data_params, dataset, meter):
    from ..data.transforms import initialize_transforms
    from ..parallel.extract import (_plain_normalize_chain, _stream_images,
                                    _stream_images_uint8)
    from ..parallel.translate import StreamingTranslator, _translator_divisor

    if _translator_divisor(network) is None:
        return None
    image_dir = dataset.pop("image_dir")
    image_size = dataset.pop("image_size", None)
    if dataset.pop("ignore_errors", False) or dataset:
        # rgb outputs cannot absorb the `{}` sentinel; keep exact semantics
        return None

    paths = [path_join(image_dir, name) for name in remaining[0]]
    transform = initialize_transforms(data_params["transforms"],
                                      mean_std=data_params["mean_std"])
    mean_std = _plain_normalize_chain(transform)

    def deliver(index, inp, out):
        output.add(index, inp, out)
        meter.update(index, None)

    # device-u8 egress only where the saver's conversion is the plain
    # denormalize branch (no colorspace / channel transforms, no stretch,
    # 3-channel output) — anything else keeps f32 downloads + get_image
    from ..tools.imgtools import _transforms_to_colorspace

    sink = _unwrapped(output)
    device_u8 = (mean_std is not None and len(mean_std[0]) == 3
                 and not _transforms_to_colorspace(data_params["transforms"])
                 and "chan" not in data_params["transforms"]
                 and "add_meanstd" not in data_params["transforms"]
                 and not getattr(sink, "stretch_by", False)
                 and network.meta.get("out_channels") == 3
                 and os.environ.get("MDIR_TPU_INFER_DEVICE_U8", "1") != "0")
    translator = StreamingTranslator(
        network, deliver, mean_std=mean_std, device_u8=device_u8,
        max_batch=int(os.environ.get("MDIR_TPU_INFER_BATCH", "4")))
    loader = _stream_images_uint8(paths, image_size) if mean_std is not None \
        else _stream_images(paths, image_size, transform)
    for i, arr in enumerate(loader):
        translator.add(i, arr)
    translator.finish()
    return len(paths)


def _run_per_item(network, output, remaining, data_params, meter):
    """Exact fallback: the reference's per-item loader loop."""
    loader = initialize_dataset_loader(remaining, "test", data_params,
                                       {"batch_size": 1})
    for i, indata in enumerate(loader):
        if isinstance(indata, dict) and indata == {}:
            output.add(i, None, None)
        else:
            output.add(i, indata, network(indata))
        meter.update(i, None)
