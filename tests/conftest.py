import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmzen_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="osmzen-tests", master="local[4]", shuffle_partitions=4)
    yield s


from pyspark.sql import types as T  # noqa: E402

from osmzen_spark.geom.derive import GEOMETRY_TYPE  # noqa: E402

ELEMENTS_SCHEMA = T.StructType(
    [
        T.StructField("element_id", T.LongType()),
        T.StructField("element_type", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom_type", T.StringType()),
        T.StructField("geometry", GEOMETRY_TYPE),
    ]
)


def make_elements(spark, rows):
    """rows: list of (id, type, tags, geom_type, geometry-dict)."""
    data = [
        {
            "element_id": r[0],
            "element_type": r[1],
            "tags": r[2],
            "geom_type": r[3],
            "geometry": r[4],
        }
        for r in rows
    ]
    return spark.createDataFrame(data, schema=ELEMENTS_SCHEMA)


# the reference's golden parking-garage way (ref:process_test.go:15-30)
PARKING_GARAGE_RING = [
    (-122.2565497, 37.8243324),
    (-122.2557092, 37.8249618),
    (-122.2551399, 37.8244875),
    (-122.25593, 37.8238958),
    (-122.2562084, 37.8241277),
    (-122.2562588, 37.82409),
    (-122.2565497, 37.8243324),
]

PARKING_GARAGE_TAGS = {
    "amenity": "parking",
    "building": "yes",
    "building:levels": "7",
    "name": "Kaiser Permanente Medical Center - Parking Garage",
    "parking": "multi-storey",
}
