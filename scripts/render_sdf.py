#!/usr/bin/env python
"""CLI wrapper: SDF sphere tracer."""
import sys
from mri_raytracer_tpu.apps.sdf_app import main

if __name__ == "__main__":
    sys.exit(main())
