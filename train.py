#!/usr/bin/env python
"""Reference-style entry point: train the motion-estimation CNN.

Thin wrapper over ``python -m dvsg_tpu.cli train``.
"""
import sys

from dvsg_tpu.cli import train_main

if __name__ == "__main__":
    sys.exit(train_main())
