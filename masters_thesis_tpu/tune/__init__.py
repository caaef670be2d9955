from masters_thesis_tpu.tune.search import (
    Choice,
    GridSearch,
    LogUniform,
    RandomSearch,
    Uniform,
)
from masters_thesis_tpu.tune.asha import ASHAScheduler
from masters_thesis_tpu.tune.runner import TuneResult, run_experiment

__all__ = [
    "Choice",
    "GridSearch",
    "LogUniform",
    "RandomSearch",
    "Uniform",
    "ASHAScheduler",
    "TuneResult",
    "run_experiment",
]
