#!/usr/bin/env python
"""spark-submit launcher: the package arrives via --py-files, this
thin script only imports it absolutely and dispatches."""

import sys

from mapchete_xarray_spark.plans.job import main

if __name__ == "__main__":
    main(sys.argv[1:])
