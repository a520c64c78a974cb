"""i3dm_export_spark — a PySpark-native instanced-tiling + spatial-join engine.

From-scratch reimplementation of the capabilities of Geodan/i3dm.export
(reference snapshot at /root/reference, studied-not-copied) as an idiomatic
Spark DataFrame pipeline over Iceberg/parquet tables of geocoded web pages,
designed for 1000-executor / 100 TB scale and tested on local[32].

Layout:
    functions/   numpy batch kernels (geodesy, cell indexes, text analysis)
    operators/   DataFrame operators (extent, tiling, joins, clustering,
                 dedup, similarity, encoders)
    sources/     table loaders + deterministic fixture synthesis
    plans/       end-to-end pipeline with checkpoint/resume + lineage
    streaming/   structured-streaming ingestion (beyond-reference surface)
"""

__version__ = "0.1.0"
