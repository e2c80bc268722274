"""Structured Streaming surface.

The reference has NO streaming semantics — its asynchrony is a Celery
task chain with at-least-once, idempotent blob writes (SURVEY.md §2.8),
which the batch pipeline reproduces as chunked resume. This package is
the engine's *forward* surface for continuously-arriving crawl data:
the same Arrow-batched stages run unchanged under ``readStream``.
"""
