"""Shared helper: build a relation_members DataFrame for tests."""

from pyspark.sql import types as T

REL_SCHEMA = T.StructType(
    [
        T.StructField("relation_id", T.LongType()),
        T.StructField("member_type", T.StringType()),
        T.StructField("member_id", T.LongType()),
        T.StructField("rel_tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def rels_df(spark, rows):
    return spark.createDataFrame(
        [dict(zip(("relation_id", "member_type", "member_id", "rel_tags"), r)) for r in rows],
        schema=REL_SCHEMA,
    )
