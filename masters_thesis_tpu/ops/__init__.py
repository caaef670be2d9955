from masters_thesis_tpu.ops.group_layout import GroupLayout

__all__ = ["GroupLayout"]
