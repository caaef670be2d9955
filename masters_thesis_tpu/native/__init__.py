from masters_thesis_tpu.native.bleu_native import bleu_batch_native, native_available

__all__ = ["bleu_batch_native", "native_available"]
