"""hypertrace_ingester_ray — a Ray-Data-native parse → enrich → route → aggregate engine.

A from-scratch reimplementation of the *semantics* of
hypertrace/hypertrace-ingester (a chain of four Kafka Streams jobs:
span-normalizer → raw-spans-grouper → trace-enricher → view-generator →
metrics-generator) re-expressed over ``ray.data.Dataset`` pipelines on
Parquet tables of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Stage map (reference file:line citations live in each module):

- ``sources/``    — Parquet readers + deterministic transcript derivation/synthesis
                    (analog of span-normalizer's Kafka source + Jaeger serde).
- ``stages/normalize.py`` — vectorized grok/regex parse of turn text
                    (analog of JaegerSpanPreProcessor + field generators).
- ``stages/grouping.py``  — hash-partitioned conversation assembly
                    (analog of raw-spans-grouper's session windows).
- ``enrichers/``  — registry + topo-sorted enricher DAG
                    (analog of hypertrace-trace-enricher).
- ``stages/views.py``     — fan-out view row builders + routed sinks
                    (analog of hypertrace-view-generator).
- ``stages/metrics.py``   — windowed count aggregation
                    (analog of hypertrace-metrics-generator).
- ``state/``      — broadcast lookup tables, lineage manifests, resume.
"""

__version__ = "0.1.0"
