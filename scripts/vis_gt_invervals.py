#!/usr/bin/env python
"""Drop-in wrapper for the reference script of the same name; forwards to
lecturemath_tpu.cli.vis_gt_intervals."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lecturemath_tpu.cli.vis_gt_intervals import main

if __name__ == "__main__":
    main()
