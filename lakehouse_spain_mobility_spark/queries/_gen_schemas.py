"""Dev tool: regenerate ``_suite_schemas.py`` — the DuckDB-derived result
schemas (column -> portable kind) for every oracle-checked registry query.

Standalone on purpose: it imports the member query modules directly and
NOT ``queries.suites``, so it can bootstrap a schema file for members that
were just added (suites.py needs the schema at import time).

Run after any query schema change:
    python -m lakehouse_spain_mobility_spark.queries._gen_schemas
``tests/test_oracle_parity.py`` pins the generated file in sync with the
live oracles.
"""

from __future__ import annotations

import pathlib

_KIND = {
    "int32": "int", "int64": "int", "bool": "bool", "double": "dbl",
    "float": "dbl", "string": "str", "large_string": "str",
    "date32[day]": "date",
}


def regenerate() -> pathlib.Path:
    import duckdb

    from . import REGISTRY
    from . import (  # noqa: F401 — registration side effects
        advanced, battery, bloom, core, curation, dedup, extra, funnel,
        graphrank, gravity, lm, mlprep, multimodal, nested, pq, relational,
        scd, search, spatialx, similarity, storage, text, timeseries, tpch,
        selection, webcur, increment, streamx, sketches, setjoin,
    )
    from .tables import TABLE_NAMES

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    rows = []
    for spec in REGISTRY.values():
        if spec.oracle is None:
            continue
        sch = con.execute(spec.oracle).arrow().schema
        rows.append((spec.name, [(f.name, _KIND[str(f.type)]) for f in sch]))
    con.close()

    path = pathlib.Path(__file__).with_name("_suite_schemas.py")
    with path.open("w") as f:
        f.write('"""Generated: DuckDB-derived result schemas (column -> kind) for every\n'
                'oracle-checked registry query, used by queries/suites.py to build\n'
                'engine-portable canonical row strings. Regenerate with\n'
                '``python -m lakehouse_spain_mobility_spark.queries.suites`` after any\n'
                'query schema change; ``tests/test_oracle_parity.py`` pins it in sync.\n'
                'Kinds: str | int | dbl | bool | date.\n"""\n\n')
        f.write("SCHEMAS = {\n")
        for name, cols in rows:
            f.write(f"    {name!r}: {cols!r},\n")
        f.write("}\n")
    print(f"wrote {len(rows)} schemas to {path}")
    return path


if __name__ == "__main__":
    regenerate()
