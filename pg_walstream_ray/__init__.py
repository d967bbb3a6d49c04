"""pg_walstream_ray — a Ray-Data-native CDC / incremental-ingest engine.

Built from scratch with the semantics of isdaniel/pg-walstream (surveyed in
/root/repo/SURVEY.md): pgoutput-shaped change streams decoded into Arrow
change-event batches, hash-partitioned by conversation key, applied
exactly-once into a Parquet lake of multi-turn transcripts.
"""

__version__ = "0.1.0"
