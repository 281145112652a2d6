#!/usr/bin/env python
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

from mri_raytracer_tpu.apps.noise_app import main

if __name__ == "__main__":
    sys.exit(main())
