"""Source connectors. The lakehouse table APIs are re-exported here so
user code can write ``from pyspark_excel_datasource_spark.sources
import read_delta, write_iceberg`` without knowing the module layout.
"""

from .deltalog import (  # noqa: F401
    delete_partitions,
    delete_where,
    history,
    merge_delta,
    optimize,
    read_change_feed,
    read_delta,
    snapshot,
    vacuum,
    write_delta,
)
from .iceberg import (  # noqa: F401
    read_iceberg,
    snapshot_iceberg,
    snapshots,
    write_iceberg,
)

__all__ = [
    "delete_partitions",
    "delete_where",
    "history",
    "merge_delta",
    "optimize",
    "read_change_feed",
    "read_delta",
    "snapshot",
    "vacuum",
    "write_delta",
    "read_iceberg",
    "snapshot_iceberg",
    "snapshots",
    "write_iceberg",
]
