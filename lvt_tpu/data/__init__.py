from .build import build_test_loader, build_train_loader, get_dataset_dicts
from .catalog import DatasetCatalog, MetadataCatalog
from .mapper import DatasetMapper

from . import datasets  # noqa: F401 — registers builtins

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "DatasetMapper",
    "build_test_loader",
    "build_train_loader",
    "get_dataset_dicts",
]
