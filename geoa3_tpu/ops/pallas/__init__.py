"""Pallas TPU kernels for the hot point-cloud ops."""

from geoa3_tpu.ops.pallas.knn_kernel import knn_pallas, pallas_available

__all__ = ["knn_pallas", "pallas_available"]
