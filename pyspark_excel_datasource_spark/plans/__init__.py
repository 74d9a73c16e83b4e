from .registry import ORACLES, QUERIES, load_all_queries, query  # noqa: F401
