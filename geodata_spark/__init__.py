"""geodata_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of
GeodataTools/geodata (gridded-variable extraction, mask/shape zonal
aggregation, wind/solar cutout conversion) as first-class Spark
DataFrame operators over a catalog of interleaved text+media documents

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Architecture is Spark-first: logical plans are declared with the
DataFrame API and optimized by Catalyst; Python appears only in
Arrow-vectorized pandas UDFs (cell-token encoding, point-in-polygon on
boundary cells, per-cell model fits).  See SURVEY.md for the operator
inventory and the mapping to the reference implementation.
"""

from geodata_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
