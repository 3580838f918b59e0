"""Operators — the public surface of SURVEY §2.1 as plain functions.

Each module mirrors one reference operator
(``python-sdk/src/astro/sql/operators/*.py``) re-expressed on Spark.
"""
