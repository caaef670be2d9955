"""Offline exporter: pycortex fsaverage flat-surface vertex coords -> npz.

The reference renders attention on pycortex flatmaps
(AttemptFour/Eval/compare_attention.py:68-71, cortex.quickflat). Surface
geometry isn't redistributable with this repo, so `mtt analyze` takes the
coordinates as data: run this where pycortex + the fsaverage subject are
installed, ship the small npz, and pass it via --flat-coords.

Usage:
  python scripts/export_flat_coords.py --subject fsaverage --out flat.npz
  mtt analyze --run <dir> --atlas-lh lh.npy --atlas-rh rh.npy \
      --flat-coords flat.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--subject", default="fsaverage")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import cortex  # requires a pycortex install with the subject database

    (lpts, _), (rpts, _) = cortex.db.get_surf(args.subject, "flat",
                                              nudge=True)
    np.savez_compressed(
        args.out,
        lh=np.asarray(lpts[:, :2], np.float32),
        rh=np.asarray(rpts[:, :2], np.float32),
    )
    print(f"lh {lpts.shape[0]} + rh {rpts.shape[0]} vertices -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
