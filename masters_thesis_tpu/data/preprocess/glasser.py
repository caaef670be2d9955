"""Glasser-atlas group construction.

Reference (AttemptFour/DataLoaders/load_avg_betas.py:34-94): loads
``lh/rh.HCP_MMP1.mgz`` (163,842 fsaverage vertices each, labels 0..180),
builds per-hemisphere vertex-index groups for labels 1..180 (region 0 =
unlabelled, excluded), concatenates LH groups then RH groups -> 360 groups
over the 327,684-vertex full-cortex vector. The visual-cortex mask keeps the
parcels listed in ``visual_parcels_glasser.csv`` (62,756 vertices).

This module takes plain label VECTORS (np arrays); ``load_atlas_vector``
reads .npy directly and .mgh/.mgz through the pure-numpy reader in
``mgh.py`` (no nibabel dependency).
"""

from __future__ import annotations

import numpy as np


def load_atlas_vector(path: str) -> np.ndarray:
    """Load a per-vertex label vector from .npy or .mgh/.mgz (the pure-numpy
    reader in ``mgh.py`` — load_avg_betas.py:34-50 uses nibabel for the
    same HCP_MMP1.mgz files; no nibabel needed here)."""
    if path.endswith(".npy"):
        return np.load(path).reshape(-1)
    from masters_thesis_tpu.data.preprocess.mgh import read_mgh

    return read_mgh(path).reshape(-1)


def groups_from_atlas(
    lh_labels: np.ndarray, rh_labels: np.ndarray, exclude_zero: bool = True
) -> list[np.ndarray]:
    """Per-hemisphere groups, LH first then RH (load_avg_betas.py:59-82).

    RH indices are offset by len(lh_labels) into the concatenated vector.
    """
    lh_labels = np.asarray(lh_labels).reshape(-1)
    rh_labels = np.asarray(rh_labels).reshape(-1)

    def hemi_groups(labels, offset):
        # fixed label range 1..max (not sorted(set(...))): group index i
        # must always mean label i+1, or index-keyed config like
        # cfg.groups_to_remove silently shifts to the wrong cortical
        # regions whenever a label is absent from a (masked/partial) atlas
        lo = 0 if not exclude_zero else 1
        hi = int(labels.max()) if labels.size else 0
        out = []
        for lab in range(lo, hi + 1):
            out.append(np.nonzero(labels == lab)[0].astype(np.int64) + offset)
        return out

    return hemi_groups(lh_labels, 0) + hemi_groups(rh_labels, len(lh_labels))


def visual_cortex_mask(
    lh_labels: np.ndarray, rh_labels: np.ndarray, visual_parcels
) -> np.ndarray:
    """Indices of vertices whose label is in the visual-parcel list
    (ThinkAndTell/train.py:78-113 semantics on the concatenated vector)."""
    labels = np.concatenate(
        [np.asarray(lh_labels).reshape(-1), np.asarray(rh_labels).reshape(-1)]
    )
    keep = np.isin(labels, np.asarray(list(visual_parcels)))
    return np.nonzero(keep)[0].astype(np.int64)


def select_groups(groups: list[np.ndarray], remove: list[int]) -> list[np.ndarray]:
    """Drop groups by index (load_avg_betas.select_groups :103-114; the
    flagship run removes 15 regions, main.py:115)."""
    rm = set(remove)
    return [g for i, g in enumerate(groups) if i not in rm]
