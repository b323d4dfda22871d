"""Benchmark harness (reference M3/M4 equivalents + roofline accounting)."""

from .harness import measure_call, throughput_report

__all__ = ["measure_call", "throughput_report"]
