"""LLM-data-pipeline operators (SURVEY §7 phase 6 — beyond the reference).

Each module exposes DataFrame→DataFrame operators designed for 100 TB
partitioning, plus query-registry entries proved against the DuckDB
oracle where SQL can express the semantics (rows-only otherwise).
"""

from __future__ import annotations


def register_all(register) -> None:
    from . import (
        classifier,
        dedup,
        multimodal,
        pipeline,
        sampling,
        similarity,
        temporal,
        text,
    )

    text.register_queries(register)
    classifier.register_queries(register)
    dedup.register_queries(register)
    similarity.register_queries(register)
    multimodal.register_queries(register)
    temporal.register_queries(register)
    sampling.register_queries(register)
    pipeline.register_queries(register)
    multimodal.register_video_queries(register)
    text.register_vocab_coverage(register)
    similarity.register_norm_audit(register)
