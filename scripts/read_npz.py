#!/usr/bin/env python
"""Checkpoint inspector CLI (reference scripts/read_npz.py parity)."""
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

from mri_raytracer_tpu.io.checkpoint import inspect_npz

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("usage: read_npz.py <checkpoint.npz> [...]")
        sys.exit(1)
    for path in sys.argv[1:]:
        print(f"== {path}")
        for line in inspect_npz(path):
            print("  " + line)
