"""Relational + pipeline operators beyond Spark's built-in surface.

Reference parity note: every operator the reference can execute
(SURVEY.md §2: scan/project/filter/join/aggregate/sort/limit) is a
Spark built-in and needs no code here. This package holds the
operators Spark itself lacks:

* ``joins`` — as-of joins and range/band joins (composition of
  built-ins: union-trick windows, broadcast range tables).
* ``dedup`` — exact, MinHash-LSH, SimHash, n-gram-Jaccard and
  embedding-cosine near-duplicate detection.
* ``similarity`` — brute-force, LSH-bucketed, and IVF approximate
  nearest-neighbor search over embedding columns.
* ``skew`` — salted joins for hot keys AQE can't split.
"""

from . import dedup, joins, similarity, skew

__all__ = ["dedup", "joins", "similarity", "skew"]
