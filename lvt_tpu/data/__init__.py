from .build import build_test_loader, build_train_loader, get_dataset_dicts
from .catalog import DatasetCatalog, MetadataCatalog
from .mapper import DatasetMapper
from .preprocess import center_crop_resize, center_crop_square

from . import datasets  # noqa: F401 — registers builtins

__all__ = [
    "DatasetCatalog",
    "MetadataCatalog",
    "DatasetMapper",
    "build_test_loader",
    "build_train_loader",
    "center_crop_resize",
    "center_crop_square",
    "get_dataset_dicts",
]
