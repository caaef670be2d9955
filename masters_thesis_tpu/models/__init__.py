from masters_thesis_tpu.models.attention import BahdanauAttention
from masters_thesis_tpu.models.locally_dense import LocallyDense
from masters_thesis_tpu.models.lstm import KerasLSTMCell
from masters_thesis_tpu.models.nic import LcNIC

__all__ = ["BahdanauAttention", "LocallyDense", "KerasLSTMCell", "LcNIC"]
