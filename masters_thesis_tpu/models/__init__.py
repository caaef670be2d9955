from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.encoders import (
    DeepLocallyDense,
    FullyConnectedEncoder,
    PatchDense,
)
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasGRUCell, KerasLSTMCell
from masters_thesis_tpu.models.nic import NIC, CnnRnnNIC, ImgNIC, LcNIC

__all__ = [
    "BahdanauAttention",
    "DeepLocallyDense",
    "FullyConnectedEncoder",
    "PatchDense",
    "LocallyDense",
    "KerasGRUCell",
    "KerasLSTMCell",
    "NIC",
    "CnnRnnNIC",
    "ImgNIC",
    "LcNIC",
]
