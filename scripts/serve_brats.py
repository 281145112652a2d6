#!/usr/bin/env python
"""CLI wrapper: HTTP render service for the BraTS volume renderer."""
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
from mri_raytracer_tpu.apps.serve import main

if __name__ == "__main__":
    sys.exit(main())
