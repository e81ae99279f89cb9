"""spark_clustering_spark — a PySpark-native analytics engine.

A from-scratch DataFrame/Spark-SQL engine providing the query and
data-processing capabilities of the reference repo
``vkmouse/Spark_clustering`` (see SURVEY.md), re-expressed Spark-first:

- relational core (scans, filters, joins, aggregates, windows, set ops,
  scalar functions) — pure Catalyst-optimized DataFrame plans;
- vector / clustering primitives (distance, nearest-centroid assignment,
  centroid update, objective) and full k-means / GKA / PSO fit loops that
  keep the *data* partitioned and broadcast only the small model state —
  the inverse of the reference's broadcast-the-dataset design
  (reference: kmeans.java:94, gka.java:313, pso.java:343);
- structured-streaming window semantics (tumbling/sliding/session,
  watermarks, streaming dedup);
- LLM-data-pipeline operators: exact/MinHash/SimHash dedup, cosine
  similarity search, text statistics, multimodal column plumbing.

Everything is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"
