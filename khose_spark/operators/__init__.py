"""Operator modules — importing this package registers every SURVEY.md §2
query into khose_spark.registry."""

from khose_spark.operators import (  # noqa: F401
    aggregates,
    curation,
    dataquality,
    eventanalytics,
    filters,
    graph,
    functions,
    joins,
    llm,
    multimodal,
    relext,
    reshape,
    scans,
    similarity,
    simhash,
    skew,
    sorts_sets,
    tpch,
    streaming,
    textquality,
    timeseries,
    udfs,
    windows,
)
