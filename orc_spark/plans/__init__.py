"""Physical-plan audit helpers (the `.explain` checks, programmatic).

BENCH.md's plan-quality section and the 100 TB design review both rest
on assertions about executed plans — no CartesianProduct, no
SortMergeJoin in the pipeline operators, filters reaching the Parquet
scan, projection pruning in ReadSchema.  This module turns those spot
checks into functions tests and users can call.
"""

from .audit import (executed_plan, operator_counts, pushed_filters,
                    read_schemas, assert_no)

__all__ = ["executed_plan", "operator_counts", "pushed_filters",
           "read_schemas", "assert_no"]
