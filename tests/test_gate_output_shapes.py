"""Every gate query must emit only scalar (atomic) output columns.

The driver's canonicalizer sorts result columns with pandas, which cannot
hash list/dict cells (round-1 failure: ``TypeError: unhashable type:
'list'`` on 7 array-output queries).  Arrays/maps are serialized with
``queries.util.jarr`` ('|'-joined, DuckDB ``array_to_string`` parity);
this test keeps complex types from sneaking back into the catalog.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from prestodb_presto_spark.queries import load_all

from conftest import SF_TINY


def test_no_complex_output_columns(spark):
    offenders = {}
    for name, spec in load_all().items():
        df = spec.spark_fn(spark, SF_TINY)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert not offenders, f"gate queries with non-scalar outputs: {offenders}"


def test_catalog_docstring_and_oracle_invariants():
    """Catalog hygiene ratchet: every entry ships a DuckDB oracle (the
    driver's weaker rows-only path stays empty by policy), and no
    docstring leaks an uninterpolated {_CONSTANT} placeholder into the
    generated CATALOG (round-8 ADVICE class)."""
    import re

    from prestodb_presto_spark.queries import load_all

    specs = load_all()
    assert len(specs) >= 181  # ratchet: the catalog only grows
    no_oracle = [n for n, s in specs.items() if s.oracle is None]
    assert no_oracle == [], no_oracle
    leaks = [n for n, s in specs.items() if re.search(r"\{_[A-Za-z_]+\}", s.doc or "")]
    assert leaks == [], leaks
