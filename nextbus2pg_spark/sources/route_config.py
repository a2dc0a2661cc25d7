"""routeConfig document adapter: one verbose routeConfig XML per route
(``/root/reference/route.py:20-24,54-58,95-99``) → three relations.

The reference fetches the SAME document three times per refresh (once
per extraction — a known inefficiency SURVEY.md §4 O5 says NOT to
copy); here one parse yields all three relations:

- ``body_stops``: stops declared in the document body
  (``route.py:64-71`` — XPath-scoped, NOT direction-nested stops);
- ``directions``: one row per direction = service candidate
  (``route.py:27-34``);
- ``direction_stops``: ordered stop lists per direction
  (``route.py:124-128`` — document order carried as ``position``).

Parsing happens driver-side with ElementTree: routeConfig documents are
dimension data (hundreds of routes × KBs), orders of magnitude below
executor-worthy volume; the fact stream (vehicle locations) is the only
high-volume path and never flows through here.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

BODY_STOP_SCHEMA = StructType(
    [
        StructField("route_tag", StringType(), False),
        StructField("stop_tag", StringType(), True),
        StructField("title", StringType(), True),
        StructField("lon", StringType(), True),
        StructField("lat", StringType(), True),
    ]
)

DIRECTION_SCHEMA = StructType(
    [
        StructField("route_tag", StringType(), False),
        StructField("dir_tag", StringType(), True),
        StructField("title", StringType(), True),
        StructField("name", StringType(), True),
        StructField("use_for_ui", BooleanType(), True),
    ]
)

DIRECTION_STOP_SCHEMA = StructType(
    [
        StructField("route_tag", StringType(), False),
        StructField("dir_tag", StringType(), True),
        StructField("stop_tag", StringType(), True),
        StructField("position", IntegerType(), False),
    ]
)


@dataclass
class RouteConfig:
    """Parsed routeConfig relations for a set of routes."""

    body_stops: list[tuple] = field(default_factory=list)
    directions: list[tuple] = field(default_factory=list)
    direction_stops: list[tuple] = field(default_factory=list)

    def add_document(self, route_tag: str, payload: str) -> None:
        """Parse one routeConfig XML document (all three extractions in
        one pass — fixing O5's triple fetch)."""
        root = ET.fromstring(payload)
        for route in root.iter("route"):
            for stop in route.findall("stop"):  # body-scoped only (P4)
                self.body_stops.append(
                    (
                        route_tag,
                        stop.get("tag"),
                        stop.get("title"),
                        stop.get("lon"),
                        stop.get("lat"),
                    )
                )
            for d in route.findall("direction"):
                self.directions.append(
                    (
                        route_tag,
                        d.get("tag"),
                        d.get("title"),
                        d.get("name"),
                        d.get("useForUI") == "true",  # X5 (route.py:33)
                    )
                )
                for pos, s in enumerate(d.findall("stop"), start=1):
                    self.direction_stops.append(
                        (route_tag, d.get("tag"), s.get("tag"), pos)
                    )

    def to_dataframes(
        self, spark: SparkSession
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        return (
            spark.createDataFrame(self.body_stops, BODY_STOP_SCHEMA),
            spark.createDataFrame(self.directions, DIRECTION_SCHEMA),
            spark.createDataFrame(self.direction_stops, DIRECTION_STOP_SCHEMA),
        )
