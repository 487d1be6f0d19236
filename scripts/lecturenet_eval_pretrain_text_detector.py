#!/usr/bin/env python
"""Drop-in wrapper for the reference script of the same name; forwards to
lecturemath_tpu.cli.eval_text_detector."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lecturemath_tpu.cli.eval_text_detector import main

if __name__ == "__main__":
    main()
