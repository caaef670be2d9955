from masters_thesis_tpu.evalsuite.tokens import ids_to_caption, postprocess_text
from masters_thesis_tpu.evalsuite.bleu import corpus_bleu, sentence_bleu
from masters_thesis_tpu.evalsuite.rouge import rouge_l
from masters_thesis_tpu.evalsuite.cider import CiderScorer
from masters_thesis_tpu.evalsuite.meteor import meteor_lite
from masters_thesis_tpu.evalsuite.metric_suite import evaluate_captions

__all__ = [
    "ids_to_caption",
    "postprocess_text",
    "corpus_bleu",
    "sentence_bleu",
    "rouge_l",
    "CiderScorer",
    "meteor_lite",
    "evaluate_captions",
]
