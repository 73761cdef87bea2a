#!/usr/bin/env python
"""Reference-style entry point: evaluate stabilization quality.

Thin wrapper over ``python -m dvsg_tpu.cli eval`` (synthetic-jitter PSNR /
steadiness gates, SURVEY.md §4).
"""
import sys

from dvsg_tpu.cli import eval_main

if __name__ == "__main__":
    sys.exit(eval_main())
