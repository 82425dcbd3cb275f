from .registry import QUERIES, ORACLES, register, query_fns, oracle_map

__all__ = ["QUERIES", "ORACLES", "register", "query_fns", "oracle_map"]
