#!/usr/bin/env python
"""Driver-contract shim: the benchmark lives in
``pyspark_excel_datasource_spark.benchmark`` (also exposed as the
``pyspark-graft-bench`` console script once the package is installed);
this root-level entry keeps the driver's ``python bench.py`` invocation
working from a bare checkout. Prints ONE JSON line — see the module
docstring for the schema.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_excel_datasource_spark.benchmark import main

if __name__ == "__main__":
    main()
