#!/usr/bin/env python
"""Reference-style entry point: stabilize a video file or frame directory.

Thin wrapper over ``python -m dvsg_tpu.cli stabilize`` so users of the
reference repo's ``stabilize.py`` script find the same surface here
(BASELINE.json north_star: "preserve the reference repo's public entry
points").
"""
import sys

from dvsg_tpu.cli import stabilize_main

if __name__ == "__main__":
    sys.exit(stabilize_main())
