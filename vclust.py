#!/usr/bin/env python3
"""Executable shim mirroring the reference's top-level vclust.py entry."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vclust_tpu.cli import main  # noqa: E402

if __name__ == '__main__':
    main()
