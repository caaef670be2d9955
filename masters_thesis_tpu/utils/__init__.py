from masters_thesis_tpu.utils.logging import CSVLogger, MetricLogger, setup_run_dir
from masters_thesis_tpu.utils.timing import StepTimer, timeit
from masters_thesis_tpu.utils.tree import param_count, tree_l2_sum

__all__ = [
    "CSVLogger",
    "MetricLogger",
    "setup_run_dir",
    "StepTimer",
    "timeit",
    "param_count",
    "tree_l2_sum",
]
