"""Source connectors. The lakehouse table APIs are re-exported here so
user code can write ``from pyspark_excel_datasource_spark.sources
import read_delta, write_iceberg`` without knowing the module layout.

Re-exports are LAZY (PEP 562, r15): the per-query streaming source
runner process imports ``sources.delta_stream`` just to unpickle the
reader, and an eager package __init__ made it pay for the Iceberg
module (and vice versa) on every stream start. ``__getattr__`` resolves
each name on first use instead, so a submodule import only loads what
it actually touches.
"""

_DELTALOG = (
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
)
_ICEBERG = (
    "read_iceberg",
    "snapshot_iceberg",
    "snapshots",
    "write_iceberg",
)

__all__ = list(_DELTALOG + _ICEBERG)


def __getattr__(name: str):
    if name in _DELTALOG:
        from . import deltalog

        return getattr(deltalog, name)
    if name in _ICEBERG:
        from . import iceberg

        return getattr(iceberg, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
