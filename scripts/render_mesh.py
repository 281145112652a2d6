#!/usr/bin/env python
"""CLI wrapper: triangle-mesh ray tracer."""
import sys
from mri_raytracer_tpu.apps.mesh_app import main

if __name__ == "__main__":
    sys.exit(main())
