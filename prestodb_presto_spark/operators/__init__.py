"""Reusable physical-operator helpers that aren't single expressions.

Most of SURVEY §2.1 maps straight onto DataFrame methods (the queries/
catalog demonstrates each); this package holds the operators that need
a composition with real engineering choices in it — currently skew
handling, which Presto 0.206 lacks entirely and Spark solves two ways
(AQE skew-join splitting at runtime, explicit salting when the skew is
known in advance).
"""

from prestodb_presto_spark.operators.skew import salted_join, salted_groupby_count

__all__ = ["salted_join", "salted_groupby_count"]
