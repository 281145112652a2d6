#!/usr/bin/env python
"""CLI wrapper: BraTS multi-modal volume viewer (offline orbit renders)."""
import sys
from mri_raytracer_tpu.apps.brats_app import main

if __name__ == "__main__":
    sys.exit(main())
