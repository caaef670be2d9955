from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.encoders import (
    ConcatLocallyDense,
    DeepLocallyDense,
    FullyConnectedEncoder,
    PatchDense,
)
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasGRUCell, KerasLSTMCell
from masters_thesis_tpu.models.backbones import VGG16
from masters_thesis_tpu.models.efficientnet import efficientnet
from masters_thesis_tpu.models.inception import InceptionV3
from masters_thesis_tpu.models.nic import NIC, CnnRnnNIC, ImgNIC, LcNIC
from masters_thesis_tpu.models.resnet import resnet

__all__ = [
    "BahdanauAttention",
    "ConcatLocallyDense",
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
    "VGG16",
    "InceptionV3",
    "efficientnet",
    "resnet",
]
