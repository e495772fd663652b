"""Victim classifiers (TPU-native rebuilds of reference Model/)."""

from geoa3_tpu.models.pointnet import PointNet, TransformNet
from geoa3_tpu.models.pointnetpp import (
    PointNet2ClassificationSSG,
    PointNet2ClassificationMSG,
    PointnetSAModule,
    PointnetSAModuleMSG,
    PointnetFPModule,
)
from geoa3_tpu.models.convert import (
    convert_pointnet_state_dict,
    convert_pointnetpp_state_dict,
    load_torch_checkpoint,
)
from geoa3_tpu.models.registry import build_model, make_eval_fn

__all__ = [
    "PointNet",
    "TransformNet",
    "PointNet2ClassificationSSG",
    "PointNet2ClassificationMSG",
    "PointnetSAModule",
    "PointnetSAModuleMSG",
    "PointnetFPModule",
    "convert_pointnet_state_dict",
    "convert_pointnetpp_state_dict",
    "load_torch_checkpoint",
    "build_model",
    "make_eval_fn",
]
