#!/usr/bin/env python
"""CLI wrapper: triangle-mesh ray tracer."""
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
from mri_raytracer_tpu.apps.mesh_app import main

if __name__ == "__main__":
    sys.exit(main())
