#!/usr/bin/env python
"""Eval entry point: ``python test.py --config configs/test.yaml``.

Reference: ``test.py:145-147``.
"""

import hawkeye_tpu.models  # noqa: F401  (registry side effects)
from hawkeye_tpu.engine import Tester


def main():
    tester = Tester()
    tester.test()


if __name__ == "__main__":
    main()
