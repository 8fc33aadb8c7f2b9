"""Nested-type surface: struct, map, and JSON round-trip in one battery.

The reference's only semi-structured surface is JSON-ish property strings
(covered by ``json_props_rollup``); a complete engine also needs the
complex-type column operations Spark users reach for daily — struct
packing and field access, map construction/lookup/keys, and the
struct→JSON→field round trip. All outputs are flattened scalars so the
battery is hash-comparable; both engines serialize structs and maps to
the same compact JSON form (``{"k":v}``, field order = construction
order), verified by the oracle.

DuckDB quirk pinned here: ``map[key]`` returns a single-element LIST in
DuckDB (keys are not known unique), so the oracle extracts ``[1]``;
Spark's ``element_at`` returns the scalar directly.

Scale: everything is a narrow codegen map over a broadcast-joined dim
pair — no shuffle at all beyond the dim join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register
from .tables import load


def q_nested_types_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = F.to_json(
        F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk"))
    )
    m = F.map_from_arrays(
        F.array(F.lit("nation"), F.lit("region")),
        F.array(F.col("n_name"), F.col("r_name")),
    )
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            j.alias("j_struct"),
            F.element_at(m, "region").alias("m_region"),
            F.size(m).cast("bigint").alias("m_size"),
            F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
            F.get_json_object(j, "$.name").alias("rt_name"),
        )
    )


_SQL = """
SELECT n.n_nationkey,
       to_json(struct_pack(name := n.n_name, rk := n.n_regionkey)) AS j_struct,
       map(['nation', 'region'], [n.n_name, r.r_name])['region'][1] AS m_region,
       CAST(cardinality(map(['nation', 'region'], [n.n_name, r.r_name])) AS BIGINT) AS m_size,
       array_to_string(map_keys(map(['nation', 'region'], [n.n_name, r.r_name])), ',') AS keys_csv,
       json_extract_string(to_json(struct_pack(name := n.n_name, rk := n.n_regionkey)), '$.name') AS rt_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


register(
    QuerySpec(
        "nested_types_battery",
        q_nested_types_battery,
        _SQL,
        survey="F-nested",
        description="Struct/map/JSON battery: pack, field access, map lookup/keys, JSON round trip",
    )
)
