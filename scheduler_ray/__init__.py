"""scheduler_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the *semantics* of the Geoconnex
scheduler (reference: internetofwater/scheduler) as one idiomatic Ray Data
program: read a Parquet table of Common-Crawl-style web pages, extract the
embedded JSON-LD with zero-copy Arrow `map_batches`, expand to RDF triples,
entity-link against a broadcast PID registry in an actor pool, canonicalize
owl:sameAs clusters with a union-find combiner, and materialize a sorted,
predicate-partitioned triple table with per-partition lineage manifests.

Nothing here is a port: the reference orchestrates external containers with
Dagster (see SURVEY.md); this package expresses every stage as a Ray
`Dataset` transform.
"""

__version__ = "0.1.0"
