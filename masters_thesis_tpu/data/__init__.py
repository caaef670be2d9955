from masters_thesis_tpu.data.tokenizer import Tokenizer, pad_sequences
from masters_thesis_tpu.data.pairs import (
    clean_caption,
    create_pairs,
    encode_pairs,
    shift_target,
)
from masters_thesis_tpu.data.splits import KeySplit, get_nsd_keys
from masters_thesis_tpu.data.store import ArrayStore, FeatureStore
from masters_thesis_tpu.data.pipeline import BatchPipeline, EvalPipeline

__all__ = [
    "Tokenizer",
    "pad_sequences",
    "clean_caption",
    "create_pairs",
    "encode_pairs",
    "shift_target",
    "KeySplit",
    "get_nsd_keys",
    "ArrayStore",
    "FeatureStore",
    "BatchPipeline",
    "EvalPipeline",
]
