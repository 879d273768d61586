"""Copy the HIPT cross-validation split CSVs and GDC manifests from a
PATHS reference checkout into this repo's data/ directory.

The split definitions are data assets (from HIPT), not code; they are
imported at setup time rather than vendored so the framework tree stays
original. Usage:

    python tools/import_reference_splits.py --reference /path/to/PATHS \
        [--out data]
"""
from __future__ import annotations

import argparse
import os
import shutil


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", required=True,
                        help="Path to a zzbuzzard/PATHS checkout")
    parser.add_argument("--out", default="data")
    args = parser.parse_args()

    src = os.path.join(args.reference, "data")
    assert os.path.isdir(src), f"{src} not found"

    copied = 0
    for sub in ["splits", "gdc_manifests"]:
        s = os.path.join(src, sub)
        if not os.path.isdir(s):
            print(f"skipping {s} (absent)")
            continue
        d = os.path.join(args.out, sub)
        for root, _, files in os.walk(s):
            rel = os.path.relpath(root, s)
            os.makedirs(os.path.join(d, rel), exist_ok=True)
            for f in files:
                shutil.copy2(os.path.join(root, f), os.path.join(d, rel, f))
                copied += 1
    print(f"Imported {copied} files into {args.out}/")


if __name__ == "__main__":
    main()
