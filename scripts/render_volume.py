#!/usr/bin/env python
"""CLI wrapper: u8 grid volume renderer."""
import sys
from mri_raytracer_tpu.apps.volume_app import main

if __name__ == "__main__":
    sys.exit(main())
