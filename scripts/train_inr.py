#!/usr/bin/env python
"""CLI training entry point (reference scripts/jax_inr_brats.py parity)."""
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

from mri_raytracer_tpu.config import TrainConfig
from mri_raytracer_tpu.train.engine import train_inr

if __name__ == "__main__":
    cfg = TrainConfig.from_cli()
    state = train_inr(cfg)
    print(f"final loss={state['history'][-1]['loss']:.4f} "
          f"checkpoint={state['checkpoint']}")
    if state["eval"]:
        for k, (mean, std) in sorted(state["eval"].items()):
            print(f"  {k}: {mean:.4f} +/- {std:.4f}")
    sys.exit(0)
