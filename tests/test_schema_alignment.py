"""Schema alignment between Spark results and DuckDB oracle results.

The driver's correctness check compares schema as well as values — an
int32/int64 disagreement fails a query whose values match perfectly.
This walks every oracle pair and asserts column-for-column type
equality (both sides resolve lazily; no data is read)."""

from __future__ import annotations

_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
}


def test_every_oracle_schema_matches_spark(spark, duck):
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    problems = []
    for name in sorted(osql):
        stypes = dict(qs[name](spark, "/root/testdata/sf0.001").dtypes)
        rel = duck.sql(f"SELECT * FROM ({osql[name]}) LIMIT 0")
        dtypes = dict(zip(rel.columns, [str(t) for t in rel.types]))
        if set(stypes) != set(dtypes):
            problems.append(f"{name}: columns {sorted(stypes)} vs {sorted(dtypes)}")
            continue
        for c, st in stypes.items():
            dt = _DUCK_TO_SPARK.get(dtypes[c], dtypes[c])
            if dt != st:
                problems.append(f"{name}.{c}: spark={st} duck={dtypes[c]}")
    assert not problems, "\n".join(problems)
