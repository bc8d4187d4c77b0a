from . import datasets, loaders, outputs, readers, testdata, transforms
from .datasets import initialize_dataset_loader
from .outputs import initialize_output
from .readers import initialize_file_reader
from .transforms import initialize_transforms

__all__ = [
    "datasets", "loaders", "outputs", "readers", "testdata", "transforms",
    "initialize_dataset_loader", "initialize_output", "initialize_file_reader",
    "initialize_transforms",
]
