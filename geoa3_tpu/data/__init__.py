"""Data providers (TPU-native rebuild of reference Provider/)."""

from geoa3_tpu.data.modelnet import (
    TEN_LABEL_INDEXES,
    TEN_LABEL_NAMES,
    AttackSetDataset,
    DefenseMatDataset,
    PureMatDataset,
    batched,
)
from geoa3_tpu.data.synthetic import (
    SYNTHETIC_CLASS_NAMES,
    make_synthetic_attack_set,
    sample_shape,
)
from geoa3_tpu.data import augment, io

__all__ = [
    "TEN_LABEL_INDEXES",
    "TEN_LABEL_NAMES",
    "AttackSetDataset",
    "DefenseMatDataset",
    "PureMatDataset",
    "batched",
    "SYNTHETIC_CLASS_NAMES",
    "make_synthetic_attack_set",
    "sample_shape",
    "augment",
    "io",
]
