#!/usr/bin/env python
"""Thin spark-submit wrapper around the package entrypoint.

    python -m marshmallow_spark --make-pyfiles /tmp/marshmallow_spark.zip
    spark-submit --py-files /tmp/marshmallow_spark.zip \
        scripts/validate_job.py --input <table> --output <run-dir>

The package zip shipped via --py-files lands on every executor's
PYTHONPATH; this file is the driver program spark-submit executes.
"""

import sys

from marshmallow_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
