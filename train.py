#!/usr/bin/env python
"""Train entry point: ``python train.py --config configs/<X>.yaml``.

CLI-compatible with the reference (``train.py:437-439``): the base Trainer
runs any registered MODEL with the default CE recipe; method-specific recipes
live in ``Examples/``.
"""

import hawkeye_tpu.models  # noqa: F401  (registry side effects)
from hawkeye_tpu.engine import Trainer


def main():
    trainer = Trainer()
    trainer.train()


if __name__ == "__main__":
    main()
