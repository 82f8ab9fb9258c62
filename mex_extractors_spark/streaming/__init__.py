"""Incremental / streaming layer: replay driver, metrics, checkpointing."""

from mex_extractors_spark.streaming.replay import ReplayEngine

__all__ = ["ReplayEngine"]
