"""datagouv_tools_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference library
``jferard/datagouv_tools`` (batch ETL of French open-data files into an
RDBMS) as an idiomatic PySpark engine, extended with the analytics surface
a large-scale data pipeline needs (joins/aggregates/windows, dedup,
similarity search, text analysis, multimodal columns, streaming).

Layer map (see SURVEY.md §7):

- ``schema/``    — external schema ("dessin") parsing → StructType, type
                   mapping strategies, fixed-width record formats, DDL
                   generation with comments/indices.
- ``sources/``   — readers: zipped CSV (staged decompress), fixed-width
                   (read.text + substring projection), parquet catalog,
                   JDBC passthrough.
- ``sinks/``     — writers: JDBC sink with dialect registry, PostgreSQL
                   COPY fast path, dry-run (plan-only) mode, post-load DDL
                   ordering (index → analyze → commit).
- ``functions/`` — column-expression helpers: casts (strict boolean token
                   set, lenient dates), name normalization, text analysis,
                   vector math.
- ``operators/`` — DataFrame-level operators: dispatch/demux, dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                   embedding cosine), similarity search, flattening,
                   multimodal column plumbing.
- ``plans/``     — plan introspection: assert predicate pushdown,
                   broadcast joins, whole-stage codegen in explain output.
- ``streaming/`` — Structured Streaming over the events table: watermarks,
                   tumbling/sliding/session windows, stateful dedup.
- ``pipelines/`` — the reference's three entry points (SIRENE, FANTOIR,
                   deces) re-expressed over the layers above.

Everything here is designed for a 1000-executor cluster reading ~100 TB:
declarative DataFrame plans (Catalyst does pushdown/pruning/join
selection), broadcast hints for dimension tables, partial aggregation,
no driver-side collects in any data path, Arrow-batched pandas UDFs only
where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
